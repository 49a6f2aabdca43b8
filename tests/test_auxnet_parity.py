"""Converter round-trip parity for the learned auxiliary networks
(VERDICT item: PAM SemanticPredictor ``pam.py:215-244``, ATTA_Model
``atta.py:96-105``, STM Ghiasi transformer ``stm.py:113-243``, AITL
encoder/decoder/predictor ``aitl.py:159-276``).

Each torch twin mirrors the reference architecture and naming; its random
state_dict must reconcile with zero missing/mismatched parameters and the
Flax module must reproduce its outputs — proof the official checkpoints
convert."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def _convert_onto(state, ref_vars, prefix=""):
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    converted = torch_state_dict_to_flax(state, prefix=prefix)
    variables, report = reconcile_with_module(converted, ref_vars)
    assert not report["missing"], report["missing"][:10]
    assert not report["mismatched"], report["mismatched"][:10]
    return variables


# --------------------------------------------------------------------- PAM


class TSemanticPredictor(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 3, 5, padding="same")
        self.pool1 = tnn.AvgPool2d(4, stride=4)
        self.conv2 = tnn.Conv2d(3, 1, 5, padding="same")
        self.pool2 = tnn.AvgPool2d(4, stride=4)
        self.fc = tnn.Linear(14 * 14, 8)

    def forward(self, x):
        x = self.pool1(F.relu(self.conv1(x)))
        x = self.pool2(F.relu(self.conv2(x)))
        x = torch.flatten(x, 1)
        return torch.sigmoid(self.fc(x)) * 0.1 + 0.9


def test_pam_semantic_predictor_parity():
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.input_transformation.learned import SemanticPredictor

    torch.manual_seed(21)
    tmodel = TSemanticPredictor().eval()
    sp = SemanticPredictor()
    ref = sp.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    variables = _convert_onto(tmodel.state_dict(), ref)

    x = np.random.RandomState(0).rand(2, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_out = np.asarray(sp.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out, atol=1e-5)


# -------------------------------------------------------------------- ATTA


class TATTAModel(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.Conv2d(3, 3, 3, stride=1, padding=1),
            tnn.LeakyReLU(True),  # negative_slope=True → identity
            tnn.Conv2d(3, 3, 15, stride=1, padding=7),
        )

    def forward(self, x):
        return self.conv(x)


def test_atta_model_parity():
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.input_transformation.learned import ATTAModel

    torch.manual_seed(22)
    tmodel = TATTAModel().eval()
    atta = ATTAModel()
    ref = atta.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    variables = _convert_onto(tmodel.state_dict(), ref)

    x = np.random.RandomState(1).rand(2, 32, 32, 3).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    with torch.no_grad():
        t_out = tmodel(
            torch.from_numpy(((x - mean) / std).transpose(0, 3, 1, 2))
        ).numpy()
    j_out = np.asarray(atta.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out.transpose(0, 2, 3, 1), atol=1e-5)


# ---------------------------------------------------------------- STM Ghiasi


class TConvInRelu(tnn.Module):
    def __init__(self, cin, cout, k, stride=1):
        super().__init__()
        self.reflection_pad = tnn.ReflectionPad2d(k // 2)
        self.conv = tnn.Conv2d(cin, cout, k, stride, padding=0)
        self.instancenorm = tnn.InstanceNorm2d(cout)

    def forward(self, x):
        return F.relu(self.instancenorm(self.conv(self.reflection_pad(x))))


class TUpsampleConvInRelu(tnn.Module):
    def __init__(self, cin, cout, k, upsample, activation=True):
        super().__init__()
        self.upsample = upsample
        if upsample:
            self.upsample_layer = tnn.Upsample(scale_factor=upsample)
        self.reflection_pad = tnn.ReflectionPad2d(k // 2)
        self.conv = tnn.Conv2d(cin, cout, k, 1)
        self.instancenorm = tnn.InstanceNorm2d(cout)
        self.fc_beta = tnn.Linear(100, cout)
        self.fc_gamma = tnn.Linear(100, cout)
        self.activation = activation

    def forward(self, x, style):
        beta = self.fc_beta(style)[:, :, None, None]
        gamma = self.fc_gamma(style)[:, :, None, None]
        if self.upsample:
            x = self.upsample_layer(x)
        x = self.instancenorm(self.conv(self.reflection_pad(x)))
        x = gamma * x + beta
        return F.relu(x) if self.activation else x


class TResidualStyleBlock(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.reflection_pad = tnn.ReflectionPad2d(1)
        self.conv1 = tnn.Conv2d(ch, ch, 3, 1, 0)
        self.conv2 = tnn.Conv2d(ch, ch, 3, 1, 0)
        self.instancenorm = tnn.InstanceNorm2d(ch)
        self.fc_beta1 = tnn.Linear(100, ch)
        self.fc_gamma1 = tnn.Linear(100, ch)
        self.fc_beta2 = tnn.Linear(100, ch)
        self.fc_gamma2 = tnn.Linear(100, ch)

    def forward(self, x, style):
        b1 = self.fc_beta1(style)[:, :, None, None]
        g1 = self.fc_gamma1(style)[:, :, None, None]
        b2 = self.fc_beta2(style)[:, :, None, None]
        g2 = self.fc_gamma2(style)[:, :, None, None]
        y = self.instancenorm(self.conv1(self.reflection_pad(x)))
        y = F.relu(g1 * y + b1)
        y = self.instancenorm(self.conv2(self.reflection_pad(y)))
        y = g2 * y + b2
        return x + y


class TGhiasi(tnn.Module):
    def __init__(self):
        super().__init__()
        self.layers = tnn.ModuleList([
            TConvInRelu(3, 32, 9, 1),
            TConvInRelu(32, 64, 3, 2),
            TConvInRelu(64, 128, 3, 2),
            TResidualStyleBlock(128),
            TResidualStyleBlock(128),
            TResidualStyleBlock(128),
            TResidualStyleBlock(128),
            TResidualStyleBlock(128),
            TUpsampleConvInRelu(128, 64, 3, 2),
            TUpsampleConvInRelu(64, 32, 3, 2),
            TUpsampleConvInRelu(32, 3, 9, None, activation=False),
        ])

    def forward(self, x, style):
        for i, layer in enumerate(self.layers):
            x = layer(x) if i < 3 else layer(x, style)
        return torch.sigmoid(x)


def test_stm_ghiasi_parity():
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.input_transformation.learned import StyleNet

    torch.manual_seed(23)
    tmodel = TGhiasi().eval()
    net = StyleNet()
    ref = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   jnp.zeros((1, 100)))
    variables = _convert_onto(tmodel.state_dict(), ref)

    rng = np.random.RandomState(2)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    style = rng.randn(2, 100).astype(np.float32) * 0.2
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                       torch.from_numpy(style)).numpy()
    j_out = np.asarray(net.apply(variables, jnp.asarray(x), jnp.asarray(style)))
    np.testing.assert_allclose(j_out, t_out.transpose(0, 2, 3, 1), atol=5e-4)


# -------------------------------------------------------------------- AITL


class TAITLEncoder(tnn.Module):
    def __init__(self, input_dim=80, hidden=128):
        super().__init__()
        for i, (din, dout) in enumerate(
                [(input_dim, hidden), (hidden, hidden), (hidden, hidden)], 1):
            setattr(self, f"fc{i}", tnn.Sequential(
                tnn.Linear(din, dout), tnn.ReLU(), tnn.Dropout(0.1),
                tnn.BatchNorm1d(dout, eps=1e-5, momentum=0.9),
            ))

    def forward(self, x):
        return self.fc3(self.fc2(self.fc1(x)))


class TAITLDecoder(tnn.Module):
    """Only fc4 participates in the reference forward (``aitl.py:223-228``);
    the dead fc1-3 stay in the checkpoint and are ignored by the converter."""

    def __init__(self, hidden=128, out=80):
        super().__init__()
        self.fc4 = tnn.Linear(hidden, out)

    def forward(self, x):
        return self.fc4(x)


def test_aitl_encoder_decoder_parity():
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.input_transformation.learned import (
        AITLDecoder, AITLEncoder,
    )

    torch.manual_seed(24)
    tenc = TAITLEncoder().eval()
    with torch.no_grad():
        for m in tenc.modules():
            if isinstance(m, tnn.BatchNorm1d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    tdec = TAITLDecoder().eval()

    enc = AITLEncoder()
    eref = enc.init(jax.random.PRNGKey(0), jnp.zeros((2, 80)))
    evars = _convert_onto(tenc.state_dict(), eref)
    dec = AITLDecoder()
    dref = dec.init(jax.random.PRNGKey(0), jnp.zeros((2, 128)))
    dvars = _convert_onto(tdec.state_dict(), dref)

    x = np.random.RandomState(3).rand(2, 80).astype(np.float32)
    with torch.no_grad():
        t_h = tenc(torch.from_numpy(x))
        t_out = tdec(t_h).numpy()
    j_h = enc.apply(evars, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_h), t_h.numpy(), atol=1e-4)
    j_out = np.asarray(dec.apply(dvars, j_h))
    np.testing.assert_allclose(j_out, t_out, atol=1e-4)


def test_aitl_predictor_parity():
    import jax
    import jax.numpy as jnp

    from test_torch_parity import TorchMobileNetV2
    from transferattack_tpu.input_transformation.learned import AITLPredictor

    torch.manual_seed(25)

    class TPredictor(tnn.Module):
        def __init__(self, hidden=128):
            super().__init__()
            self.backbone = TorchMobileNetV2()
            self.backbone.classifier = tnn.Linear(1280, hidden)
            self.fc1 = tnn.Sequential(tnn.Linear(hidden * 2, hidden),
                                      tnn.ReLU(), tnn.Dropout(0.5))
            self.fc5 = tnn.Sequential(tnn.Linear(hidden, hidden),
                                      tnn.ReLU(), tnn.Dropout(0.5))
            self.fc6 = tnn.Linear(hidden, 1)

        def forward(self, images, feature_trans):
            f = self.backbone(images)
            h = torch.cat([f, feature_trans], dim=1)
            return self.fc6(self.fc5(self.fc1(h)))

    tmodel = TPredictor().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)

    pred = AITLPredictor()
    ref = pred.init(jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3)),
                    jnp.zeros((2, 128)))
    # the replaced plain-Linear classifier maps onto our classifier_1 slot
    # (this rename is part of the AITL conversion recipe)
    state = {
        (k.replace("backbone.classifier.", "backbone.classifier.1.")
         if k.startswith("backbone.classifier.") else k): v
        for k, v in tmodel.state_dict().items()
    }
    variables = _convert_onto(state, ref)

    rng = np.random.RandomState(4)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    feat = rng.randn(2, 128).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                       torch.from_numpy(feat)).numpy()
    j_out = np.asarray(pred.apply(variables, jnp.asarray(x), jnp.asarray(feat)))
    np.testing.assert_allclose(j_out, t_out, atol=2e-3)
