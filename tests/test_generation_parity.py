"""Generator torch-twin conversion parity (round-4, VERDICT item 5).

Random-init torch transcriptions of the reference generator architectures —
with the reference's exact module naming, so the converter path is the one
official checkpoints would take — are converted and must reproduce the Flax
generators' outputs elementwise.  This proves the TTP/M3D/CDTP/LTP,
GE-AdvGAN, and ADA conversion paths and settles GE_ADVGAN's output-mapping
semantics (tanh output IS the perturbation, ``ge_advgan.py:165-180``).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.normal_(0, 0.05)


def _convert_and_check(tmodel, module, dummy_args, atol=6e-3):
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    converted = torch_state_dict_to_flax(tmodel.state_dict(), prefix="")
    variables = module.init(jax.random.PRNGKey(0), *dummy_args)
    variables, report = reconcile_with_module(converted, variables)
    assert not report["missing"], report["missing"][:8]
    assert not report["mismatched"], report["mismatched"][:8]
    out = module.apply(variables, *dummy_args)
    return np.asarray(out)


class TResidualBlock(tnn.Module):
    """``cdtp.py:101-130`` (Sequential: pad, conv, bn, relu, dropout, pad,
    conv, bn)."""

    def __init__(self, nf):
        super().__init__()
        self.block = tnn.Sequential(
            tnn.ReflectionPad2d(1),
            tnn.Conv2d(nf, nf, 3, padding=0, bias=False),
            tnn.BatchNorm2d(nf),
            tnn.ReLU(True),
            tnn.Dropout(0.5),
            tnn.ReflectionPad2d(1),
            tnn.Conv2d(nf, nf, 3, padding=0, bias=False),
            tnn.BatchNorm2d(nf),
        )

    def forward(self, x):
        return x + self.block(x)


class TGeneratorResnet(tnn.Module):
    """``cdtp.py:23-108`` with the shipped state_dict naming."""

    def __init__(self, ngf=64):
        super().__init__()
        self.block1 = tnn.Sequential(
            tnn.ReflectionPad2d(3),
            tnn.Conv2d(3, ngf, 7, padding=0, bias=False),
            tnn.BatchNorm2d(ngf), tnn.ReLU(True))
        self.block2 = tnn.Sequential(
            tnn.Conv2d(ngf, ngf * 2, 3, stride=2, padding=1, bias=False),
            tnn.BatchNorm2d(ngf * 2), tnn.ReLU(True))
        self.block3 = tnn.Sequential(
            tnn.Conv2d(ngf * 2, ngf * 4, 3, stride=2, padding=1, bias=False),
            tnn.BatchNorm2d(ngf * 4), tnn.ReLU(True))
        for i in range(1, 7):
            setattr(self, f"resblock{i}", TResidualBlock(ngf * 4))
        self.upsampl1 = tnn.Sequential(
            tnn.ConvTranspose2d(ngf * 4, ngf * 2, 3, stride=2, padding=1,
                                output_padding=1, bias=False),
            tnn.BatchNorm2d(ngf * 2), tnn.ReLU(True))
        self.upsampl2 = tnn.Sequential(
            tnn.ConvTranspose2d(ngf * 2, ngf, 3, stride=2, padding=1,
                                output_padding=1, bias=False),
            tnn.BatchNorm2d(ngf), tnn.ReLU(True))
        self.blockf = tnn.Sequential(
            tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, 3, 7, padding=0))

    def forward(self, x):
        x = self.block3(self.block2(self.block1(x)))
        for i in range(1, 7):
            x = getattr(self, f"resblock{i}")(x)
        x = self.blockf(self.upsampl2(self.upsampl1(x)))
        return (torch.tanh(x) + 1) / 2


def test_generator_resnet_conversion_parity():
    from transferattack_tpu.generation.generators import GeneratorResnet

    torch.manual_seed(50)
    tmodel = TGeneratorResnet().eval()
    _randomize_bn(tmodel)
    rng = np.random.RandomState(0)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(
            x.transpose(0, 3, 1, 2).copy())).numpy().transpose(0, 2, 3, 1)
    import jax.numpy as jnp

    out = _convert_and_check(tmodel, GeneratorResnet(), (jnp.asarray(x),))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=6e-3)
    assert float(np.abs(out - ref).mean()) < 1e-3


class TAdvGANResnetBlock(tnn.Module):
    """``ge_advgan.py:12-52`` (reflect padding, BatchNorm, no bias)."""

    def __init__(self, dim):
        super().__init__()
        self.conv_block = tnn.Sequential(
            tnn.ReflectionPad2d(1),
            tnn.Conv2d(dim, dim, 3, padding=0, bias=False),
            tnn.BatchNorm2d(dim), tnn.ReLU(True),
            tnn.ReflectionPad2d(1),
            tnn.Conv2d(dim, dim, 3, padding=0, bias=False),
            tnn.BatchNorm2d(dim))

    def forward(self, x):
        return x + self.conv_block(x)


class TAdvGANGenerator(tnn.Module):
    """``ge_advgan.py:55-106``."""

    def __init__(self, c=3):
        super().__init__()
        self.encoder = tnn.Sequential(
            tnn.Conv2d(c, 8, 3, 1, 0, bias=True), tnn.InstanceNorm2d(8),
            tnn.ReLU(),
            tnn.Conv2d(8, 16, 3, 2, 0, bias=True), tnn.InstanceNorm2d(16),
            tnn.ReLU(),
            tnn.Conv2d(16, 32, 3, 2, 0, bias=True), tnn.InstanceNorm2d(32),
            tnn.ReLU())
        self.bottle_neck = tnn.Sequential(*[TAdvGANResnetBlock(32)
                                            for _ in range(4)])
        self.decoder = tnn.Sequential(
            tnn.ConvTranspose2d(32, 16, 3, 2, 0, bias=False),
            tnn.InstanceNorm2d(16), tnn.ReLU(),
            tnn.ConvTranspose2d(16, 8, 3, 2, 0, bias=False),
            tnn.InstanceNorm2d(8), tnn.ReLU(),
            tnn.ConvTranspose2d(8, c, 6, 1, 0, bias=False), tnn.Tanh())

    def forward(self, x):
        return self.decoder(self.bottle_neck(self.encoder(x)))


def test_advgan_generator_conversion_parity():
    from transferattack_tpu.generation.generators import AdvGANGenerator

    torch.manual_seed(51)
    tmodel = TAdvGANGenerator().eval()
    _randomize_bn(tmodel)
    rng = np.random.RandomState(1)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(
            x.transpose(0, 3, 1, 2).copy())).numpy().transpose(0, 2, 3, 1)
    import jax.numpy as jnp

    out = _convert_and_check(tmodel, AdvGANGenerator(), (jnp.asarray(x),))
    assert out.shape == ref.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(out, ref, atol=6e-3)


def test_ge_advgan_output_mapping():
    """The attack's delta must equal clamp(G(x), ±eps) re-clipped into the
    image box — the reference's forward (``ge_advgan.py:165-180``), not a
    [0,1]→[−eps,eps] recentering."""
    import warnings

    import jax
    import transferattack_tpu as ta

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        atk = ta.load_attack_class("ge_advgan")(model_name="resnet18",
                                                pretrained=False)
    rng = np.random.RandomState(2)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    delta = np.asarray(atk(x, y))
    variables = atk._generator_variables(0, (1, 32, 32, 3))
    pert = np.asarray(atk.generator.apply(variables, jax.numpy.asarray(x)))
    expect = np.clip(x + np.clip(pert, -atk.eps, atk.eps), 0, 1) - x
    # jit-vs-eager conv reduction order leaves ~1e-6 wiggle at clip edges
    np.testing.assert_allclose(delta, expect, atol=1e-4)


class TUNetDown(tnn.Module):
    def __init__(self, in_size, out_size, normalize=True):
        super().__init__()
        self.conv = tnn.Conv2d(in_size, out_size, 3, 2, padding=1, bias=False)
        self.norm = tnn.BatchNorm2d(out_size, eps=1e-10) if normalize else None
        self.fn = tnn.LeakyReLU(0.2)

    def forward(self, x, z=None):
        if z is not None:
            width = x.shape[2]
            tile = torch.unsqueeze(torch.unsqueeze(z, -1).expand(
                -1, -1, width), -1).expand(-1, -1, -1, x.shape[3])
            x = torch.cat((x, tile), 1)
        out = self.conv(x)
        if self.norm is not None:
            out = self.norm(out)
        return self.fn(out)


class TUNetUp(tnn.Module):
    def __init__(self, in_size, out_size, output_padding=1):
        super().__init__()
        self.upconv = tnn.ConvTranspose2d(in_size, out_size, 3, 2, padding=1,
                                          output_padding=output_padding)
        self.norm = tnn.BatchNorm2d(out_size, eps=1e-10)
        self.fn = tnn.ReLU(inplace=True)

    def forward(self, x, skip_input):
        out = self.fn(self.norm(self.upconv(x)))
        if skip_input is not None:
            out = torch.cat((out, skip_input), 1)
        return out


class TAttackGenerator(tnn.Module):
    """``ada.py:154-203`` at base 64, z 16, deeper_layer=False."""

    def __init__(self, base=64, z=16):
        super().__init__()
        self.down0 = TUNetDown(3 + z, base, normalize=False)
        self.down1 = TUNetDown(base + z, base)
        self.down2 = TUNetDown(base + z, base * 2, normalize=False)
        self.up2 = TUNetUp(base * 2, base, output_padding=0)
        self.up1 = TUNetUp(base * 2, base)
        self.up0 = TUNetUp(base * 2, base, output_padding=0)
        self.final = tnn.Sequential(
            tnn.Conv2d(base, 3, 3, 1, padding=1, bias=False), tnn.Tanh())
        self.z_encoder = tnn.Sequential(
            tnn.Linear(z, z), tnn.ReLU(), tnn.Linear(z, z), tnn.ReLU())

    def forward(self, x, z):
        ze = self.z_encoder(z)
        d0 = self.down0(x, ze)
        d1 = self.down1(d0, ze)
        d2 = self.down2(d1, ze)
        u2 = self.up2(d2, d1)
        u1 = self.up1(u2, d0)
        u0 = self.up0(u1, None)
        return self.final(u0)


def test_ada_generator_conversion_parity():
    from transferattack_tpu.generation.generators import ADAGenerator

    torch.manual_seed(52)
    tmodel = TAttackGenerator(base=16, z=16).eval()
    _randomize_bn(tmodel)
    rng = np.random.RandomState(3)
    # side ≡ 3 (mod 4): the only sizes where the skip shapes close (299)
    x = rng.rand(2, 35, 35, 3).astype(np.float32)
    z = rng.randn(2, 16).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()),
                     torch.from_numpy(z)).numpy().transpose(0, 2, 3, 1)
    import jax.numpy as jnp

    out = _convert_and_check(
        tmodel, ADAGenerator(base=16), (jnp.asarray(x), jnp.asarray(z)))
    assert out.shape == ref.shape == (2, 35, 35, 3)
    np.testing.assert_allclose(out, ref, atol=6e-3)


def test_convert_generator_roundtrip(tmp_path, monkeypatch):
    """The converter CLI path (``convert_generator``) must round-trip a
    torch GeneratorResnet checkpoint into an npz the attack actually loads
    and reproduce the torch outputs — the path official TTP/M3D/CDTP/LTP
    weights take."""
    import warnings

    import jax.numpy as jnp

    from transferattack_tpu.models import load_npz_variables
    from transferattack_tpu.generation.generators import GeneratorResnet
    from transferattack_tpu.utils.convert import convert_generator

    torch.manual_seed(53)
    tmodel = TGeneratorResnet().eval()
    _randomize_bn(tmodel)
    pth = tmp_path / "netG_resnet50_IN_19_24.pth"
    torch.save(tmodel.state_dict(), pth)
    monkeypatch.setenv("TA_TPU_WEIGHTS_DIR", str(tmp_path))
    out = convert_generator("ttp_resnet50_24", str(pth))
    variables = load_npz_variables(out)

    rng = np.random.RandomState(4)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(
            x.transpose(0, 3, 1, 2).copy())).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(GeneratorResnet().apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=6e-3)

    # and the TTP attack loads it for target-class index 0 (class 24)
    import transferattack_tpu as ta

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        atk = ta.load_attack_class("ttp")(model_name="resnet50")
        delta = np.asarray(atk(x, np.array([[1, 24]]), idx=0))
    assert atk._var_cache, "TTP did not cache generator variables"
    assert np.abs(delta).max() <= 16 / 255 + 1e-6
    assert np.abs(delta).max() > 0
