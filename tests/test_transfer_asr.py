"""Toy-scale transfer-ASR parity (SURVEY.md §4 layer (c), offline proxy).

The project's real gate is transfer ASR on pretrained models (±1%,
BASELINE.json) — unobservable offline.  This harness closes the loop at toy
scale: each family flagship attacks a *converted torch-twin surrogate* twice
— once with a raw-PyTorch transcription of the reference loop, once with the
repo attack on the converted weights — and both deltas are evaluated on a
panel of *correlated sibling* twins (surrogate weights + 5% relative
jitter; independently-initialized random nets are mutually insensitive —
transfer ASR 0 — whereas trained models correlate, which the siblings
mimic: measured sibling transfer ≈ 0.67 for MI-FGSM vs 0.17 for random
noise at ε).  The transfer ASRs must agree:

* deterministic attacks (mifgsm, sgm, fia@drop0, logit, ens): deltas
  sign-agree >98%, so ASR must match within ``DET_TOL``;
* paired-RNG estimators (vmi, gra, ssm — VERDICT r4 #7): identical banked
  draws injected through the attacks' noise seams on both sides, one draw
  per iteration shared across samples, so these also run at ``DET_TOL``;
* resampler-coupled estimators (dim, bsr, sia, tgr): their draws feed
  resamplers that legitimately differ between frameworks (torch bilinear
  grid_sample vs the gather-free separable warps / antialiased
  scale_and_translate), so value-level pairing cannot be exact — these stay
  at ``STO_TOL`` as distribution sanity checks, with their block/edge math
  pinned by the paired loop twins in test_attack_parity{,2}.py instead.

This converts "constraint-tested" into "transfer-parity-tested" for each
family's flagship: a sign flip in GRA's decay indicator or a wrong Admix/SSM
mix weight shifts transfer ASR far beyond these tolerances.
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from tests.test_torch_parity import TorchResNet18  # noqa: E402

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)
EPS, ALPHA, EPOCH = 16 / 255, 1.6 / 255, 10
B, SIZE = 12, 64
N_HOLD = 3               # sibling panel size (ASR granularity 1/(B·N_HOLD))
DET_TOL = 0.10 + 1e-6    # deterministic: deltas sign-agree >98%
STO_TOL = 0.25 + 1e-6    # stochastic: independent RNG streams


def _make_twin(seed):
    torch.manual_seed(seed)
    m = TorchResNet18().eval()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.5, 1.5)
    return m


def _convert(tmodel):
    from transferattack_tpu.models import make_model
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    converted = torch_state_dict_to_flax(tmodel.state_dict())
    surrogate = make_model("resnet18", pretrained=False, input_size=SIZE)
    variables, report = reconcile_with_module(converted, surrogate.variables)
    assert not (report["missing"] or report["mismatched"])
    surrogate.variables = variables
    return surrogate


def _t_forward(tmodel, x_nchw):
    mean = torch.from_numpy(MEAN).view(1, 3, 1, 1)
    std = torch.from_numpy(STD).view(1, 3, 1, 1)
    return tmodel((x_nchw - mean) / std)


def _preds(tmodel, x_nhwc):
    with torch.no_grad():
        out = _t_forward(tmodel, torch.from_numpy(
            np.transpose(x_nhwc, (0, 3, 1, 2)).copy()))
    return out.argmax(1).numpy()


def _sibling(t_sur, seed, jitter=0.05):
    import copy

    torch.manual_seed(seed)
    t_hold = copy.deepcopy(t_sur)
    with torch.no_grad():
        for p in t_hold.parameters():
            p.add_(torch.randn_like(p) * jitter * p.abs().mean())
    return t_hold.eval()


@pytest.fixture(scope="module")
def env():
    """Surrogate twin (torch + converted JAX), sibling panel, data, labels."""
    t_sur = _make_twin(21)
    surrogate = _convert(t_sur)
    holdouts = [_sibling(t_sur, 97 + i) for i in range(N_HOLD)]
    rng = np.random.RandomState(0)
    x = rng.rand(B, SIZE, SIZE, 3).astype(np.float32)
    # attack the surrogate's own predictions so the white-box loss moves
    y = _preds(t_sur, x).astype(np.int32)
    hold_clean = [_preds(h, x) for h in holdouts]
    return dict(t_sur=t_sur, surrogate=surrogate, holdouts=holdouts,
                x=x, y=y, hold_clean=hold_clean)


def _transfer_asr(env, delta):
    adv = np.clip(env["x"] + delta, 0, 1).astype(np.float32)
    return float(np.mean([
        (_preds(h, adv) != c).mean()
        for h, c in zip(env["holdouts"], env["hold_clean"])]))


def _repo_delta(env, name, **kwargs):
    import transferattack_tpu as ta

    atk = ta.load_attack_class(name)(model_name="resnet18", pretrained=False,
                                     input_size=SIZE, **kwargs)
    atk.model = env["surrogate"]
    return np.asarray(atk(env["x"], env["y"]))


def _repo_paired(env, cls, **kwargs):
    """Like :func:`_repo_delta` but with a pre-built (seam-overridden)
    attack class — the paired-RNG path (VERDICT r4 #7)."""
    atk = cls(model_name="resnet18", pretrained=False, input_size=SIZE,
              **kwargs)
    atk.model = env["surrogate"]
    return np.asarray(atk(env["x"], env["y"]))


def _check(env, ref_delta, ours_delta, tol, label):
    a_ref = _transfer_asr(env, ref_delta)
    a_ours = _transfer_asr(env, ours_delta)
    assert a_ref > 0, f"{label}: reference delta does not transfer (vacuous)"
    assert abs(a_ref - a_ours) <= tol, (
        f"{label}: transfer ASR ref={a_ref:.3f} ours={a_ours:.3f}")


# ---------------------------------------------------------------- torch loops

def _mi_step(xt, delta, grad, momentum, alpha=ALPHA, eps=EPS, decay=1.0,
             step_scale=None):
    """Reference get_momentum + update_delta (``attack.py:124-153``)."""
    momentum = decay * momentum + grad / grad.abs().mean(
        dim=(1, 2, 3), keepdim=True)
    step = alpha if step_scale is None else alpha * step_scale
    d = torch.clamp(delta.data + step * momentum.sign(), -eps, eps)
    delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    return delta, momentum


def _loop_setup(env):
    xt = torch.from_numpy(np.transpose(env["x"], (0, 3, 1, 2)).copy())
    yt = torch.from_numpy(env["y"]).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    return xt, yt, delta, momentum


def _nhwc(delta):
    return np.transpose(delta.detach().numpy(), (0, 2, 3, 1))


def test_transfer_mifgsm(env):
    xt, yt, delta, momentum = _loop_setup(env)
    for _ in range(EPOCH):
        loss = F.cross_entropy(_t_forward(env["t_sur"], xt + delta), yt)
        grad = torch.autograd.grad(loss, delta)[0]
        delta, momentum = _mi_step(xt, delta, grad, momentum)
    ours = _repo_delta(env, "mifgsm")
    _check(env, _nhwc(delta), ours, DET_TOL, "mifgsm")


def test_transfer_vmifgsm(env):
    """``gradient/vmifgsm.py:42-96``: momentum on grad+variance; variance =
    mean neighbor grad − current grad, neighbors ~ U(−β·eps, β·eps).
    Paired RNG (VERDICT r4 #7): one banked draw per iteration shared by all
    neighbors on both sides, so the twin runs at DET_TOL."""
    import jax.numpy as jnp

    n_nb, radius = 4, 1.5 * EPS
    rng = np.random.RandomState(100)
    bank = rng.uniform(-radius, radius,
                       (EPOCH, B, SIZE, SIZE, 3)).astype(np.float32)
    xt, yt, delta, momentum = _loop_setup(env)
    variance = torch.zeros_like(xt)
    for it in range(EPOCH):
        loss = F.cross_entropy(_t_forward(env["t_sur"], xt + delta), yt)
        grad = torch.autograd.grad(loss, delta)[0]
        delta2, momentum = _mi_step(xt, delta, grad + variance, momentum)
        noise = torch.from_numpy(np.transpose(bank[it], (0, 3, 1, 2)).copy())
        loss = F.cross_entropy(
            _t_forward(env["t_sur"], xt + delta + noise), yt)
        variance = torch.autograd.grad(loss, delta)[0] - grad
        delta = delta2

    import transferattack_tpu as ta

    VMI = ta.load_attack_class("vmifgsm")

    class PairedVMI(VMI):
        def neighbor_noise(self, key, xx, state):
            return jnp.asarray(bank)[state.step]

    ours = _repo_paired(env, PairedVMI, num_neighbor=n_nb)
    _check(env, _nhwc(delta), ours, DET_TOL, "vmifgsm")


def test_transfer_gra(env):
    """``gradient/gra.py:40-151``: cosine fusion of current and neighborhood
    gradients, per-pixel decay indicator M updated by momentum sign
    agreement, step = M·α."""
    import jax.numpy as jnp

    n_nb, radius, eta = 4, 3.5 * EPS, 0.94
    rng = np.random.RandomState(101)
    bank = rng.uniform(-radius, radius,
                       (EPOCH, B, SIZE, SIZE, 3)).astype(np.float32)
    xt, yt, delta, momentum = _loop_setup(env)
    M = torch.full_like(xt, 1 / eta)
    for it in range(EPOCH):
        loss = F.cross_entropy(_t_forward(env["t_sur"], xt + delta), yt)
        grad = torch.autograd.grad(loss, delta)[0]
        noise = torch.from_numpy(np.transpose(bank[it], (0, 3, 1, 2)).copy())
        loss = F.cross_entropy(
            _t_forward(env["t_sur"], xt + delta + noise), yt)
        samgrad = torch.autograd.grad(loss, delta)[0]
        cf = grad.flatten(1)
        sf = samgrad.flatten(1)
        s = ((cf * sf).sum(1) / (cf.norm(dim=1) * sf.norm(dim=1)))
        s = s.view(-1, 1, 1, 1)
        fused = s * grad + (1 - s) * samgrad
        last_momentum = momentum
        momentum = momentum + fused / fused.abs().mean(
            dim=(1, 2, 3), keepdim=True)
        eq_m = (torch.sign(last_momentum) == torch.sign(momentum)).float()
        M = M * (eq_m + (1.0 - eq_m) * eta)
        d = torch.clamp(delta.data + M * ALPHA * momentum.sign(), -EPS, EPS)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)

    import transferattack_tpu as ta

    GRA = ta.load_attack_class("gra")

    class PairedGRA(GRA):
        def neighbor_noise(self, key, xx, state):
            return jnp.asarray(bank)[state.step]

    ours = _repo_paired(env, PairedGRA, num_neighbor=n_nb)
    _check(env, _nhwc(delta), ours, DET_TOL, "gra")


def _dim_transform(x, resize_rate=1.1, p=0.5):
    """``input_transformation/dim.py:42-68``."""
    if float(torch.rand(1)) > p:
        return x
    s = x.shape[-1]
    r = int(s * resize_rate)
    rnd = int(torch.randint(low=s, high=r, size=(1,)))
    resc = F.interpolate(x, size=[rnd, rnd], mode="bilinear",
                         align_corners=False)
    rem = r - rnd
    top = int(torch.randint(low=0, high=rem, size=(1,)))
    left = int(torch.randint(low=0, high=rem, size=(1,)))
    padded = F.pad(resc, [left, rem - left, top, rem - top], value=0)
    return F.interpolate(padded, size=[s, s], mode="bilinear",
                         align_corners=False)


def test_transfer_dim(env):
    torch.manual_seed(102)
    xt, yt, delta, momentum = _loop_setup(env)
    for _ in range(EPOCH):
        loss = F.cross_entropy(
            _t_forward(env["t_sur"], _dim_transform(xt + delta)), yt)
        grad = torch.autograd.grad(loss, delta)[0]
        delta, momentum = _mi_step(xt, delta, grad, momentum)
    ours = _repo_delta(env, "dim")
    _check(env, _nhwc(delta), ours, STO_TOL, "dim")


def test_transfer_ssm(env):
    """``input_transformation/ssm.py:42-96``: per-sample DCT mask + gaussian
    noise; gradient taken at the transformed point (x_idct is the leaf)."""
    from scipy.fft import dctn, idctn

    import jax.numpy as jnp

    n_spec, rho = 4, 0.5
    rng = np.random.RandomState(103)
    # paired banks, one draw per iteration shared by all spectrum samples
    # (NCHW to match the torch loop; transposed for the NHWC repo side)
    g_bank = (rng.randn(EPOCH, B, 3, SIZE, SIZE).astype(np.float32) * EPS)
    m_bank = (rng.rand(EPOCH, B, 3, SIZE, SIZE).astype(np.float32)
              * 2 * rho + 1 - rho)
    xt, yt, delta, momentum = _loop_setup(env)
    for it in range(EPOCH):
        base = (xt + delta).detach().numpy()
        spec = dctn(base + g_bank[it], type=2, norm="ortho", axes=(2, 3))
        point = idctn(spec * m_bank[it], type=2, norm="ortho",
                      axes=(2, 3)).astype(np.float32)
        pt = torch.from_numpy(point).requires_grad_(True)
        loss = F.cross_entropy(_t_forward(env["t_sur"], pt), yt)
        grads = torch.autograd.grad(loss, pt)[0]
        delta, momentum = _mi_step(xt, delta.requires_grad_(True),
                                   grads, momentum)

    import transferattack_tpu as ta

    g_nhwc = jnp.asarray(np.transpose(g_bank, (0, 1, 3, 4, 2)))
    m_nhwc = jnp.asarray(np.transpose(m_bank, (0, 1, 3, 4, 2)))
    SSM = ta.load_attack_class("ssm")

    class PairedSSM(SSM):
        def spectral_draws(self, key, xx, step):
            return g_nhwc[step], m_nhwc[step]

    ours = _repo_paired(env, PairedSSM, num_spectrum=n_spec, sample_chunk=1)
    _check(env, _nhwc(delta), ours, DET_TOL, "ssm")


def _rotate(x, deg):
    th = math.radians(float(deg))
    m = torch.tensor([[math.cos(th), -math.sin(th), 0.0],
                      [math.sin(th), math.cos(th), 0.0]], dtype=torch.float32)
    grid = F.affine_grid(m[None].expand(x.shape[0], 2, 3), x.shape,
                         align_corners=False)
    return F.grid_sample(x, grid, mode="bilinear", align_corners=False)


def _bsr_shuffle(x, rng, num_block=2):
    """``input_transformation/bsr.py:42-65`` (RandomRotation via affine
    grid — torchvision is unavailable in this environment)."""
    def lengths(total):
        r = rng.uniform(size=num_block) * 2
        ln = np.round(r / r.sum() * total).astype(int)
        ln[ln.argmax()] += total - ln.sum()
        return [int(v) for v in ln]

    dims = [2, 3]
    rng.shuffle(dims)
    strips = list(torch.split(x, lengths(x.shape[dims[0]]), dim=dims[0]))
    rng.shuffle(strips)
    outs = []
    for strip in strips:
        if 0 in strip.shape:
            continue
        strip = _rotate(strip, rng.uniform(-24, 24))
        subs = list(torch.split(strip, lengths(strip.shape[dims[1]]),
                                dim=dims[1]))
        rng.shuffle(subs)
        outs.append(torch.cat([s for s in subs if 0 not in s.shape],
                              dim=dims[1]))
    return torch.cat(outs, dim=dims[0])


def test_transfer_bsr(env):
    n_scale = 4
    rng = np.random.RandomState(104)
    xt, yt, delta, momentum = _loop_setup(env)
    for _ in range(EPOCH):
        copies = torch.cat(
            [_bsr_shuffle(xt + delta, rng) for _ in range(n_scale)])
        loss = F.cross_entropy(_t_forward(env["t_sur"], copies),
                               yt.repeat(n_scale))
        grad = torch.autograd.grad(loss, delta)[0]
        delta, momentum = _mi_step(xt, delta, grad, momentum)
    ours = _repo_delta(env, "bsr", num_scale=n_scale, num_block=2)
    _check(env, _nhwc(delta), ours, STO_TOL, "bsr")


def _sia_blocktransform(x, rng, num_block=3):
    """``input_transformation/sia.py:43-95``: per-block random op from
    {vshift, hshift, vflip, hflip, rot180, scale, noise}."""
    _, _, w, h = x.shape
    ys = [0] + sorted(rng.choice(range(1, h), num_block - 1,
                                 replace=False).tolist()) + [h]
    xs = [0] + sorted(rng.choice(range(1, w), num_block - 1,
                                 replace=False).tolist()) + [w]

    def vshift(b):
        return b.roll(int(rng.randint(0, w)), dims=2)

    def hshift(b):
        return b.roll(int(rng.randint(0, h)), dims=3)

    ops = [vshift, hshift,
           lambda b: b.flip(dims=(2,)),
           lambda b: b.flip(dims=(3,)),
           lambda b: b.rot90(k=2, dims=(2, 3)),
           lambda b: float(rng.rand()) * b,
           lambda b: torch.clip(
               b + torch.from_numpy(rng.uniform(
                   -EPS, EPS, b.shape).astype(np.float32)), 0, 1)]
    rows = []
    for i in range(num_block):
        cols = []
        for j in range(num_block):
            blk = x[:, :, xs[i]:xs[i + 1], ys[j]:ys[j + 1]]
            cols.append(ops[int(rng.randint(0, len(ops)))](blk))
        rows.append(torch.cat(cols, dim=3))
    return torch.cat(rows, dim=2)


def test_transfer_sia(env):
    n_scale = 4
    rng = np.random.RandomState(105)
    xt, yt, delta, momentum = _loop_setup(env)
    for _ in range(EPOCH):
        copies = torch.cat(
            [_sia_blocktransform(xt + delta, rng) for _ in range(n_scale)])
        loss = F.cross_entropy(_t_forward(env["t_sur"], copies),
                               yt.repeat(n_scale))
        grad = torch.autograd.grad(loss, delta)[0]
        delta, momentum = _mi_step(xt, delta, grad, momentum)
    ours = _repo_delta(env, "sia", num_scale=n_scale)
    _check(env, _nhwc(delta), ours, STO_TOL, "sia")


def test_transfer_fia(env):
    """``advanced_objective/fia.py:64-114``: bernoulli pixel-drop weight
    aggregation (stochastic), per-sample L2 norm, then plain sign descent
    on the weighted feature loss (no momentum)."""
    import transferattack_tpu as ta

    n_ens, drop = 6, 0.3
    torch.manual_seed(106)
    t_sur = env["t_sur"]
    xt, yt, delta, _ = _loop_setup(env)

    captured = {}
    fwd_h = t_sur.layer2.register_forward_hook(
        lambda m, i, o: captured.__setitem__("feat", o))
    agg = 0
    for _ in range(n_ens):
        mask = torch.bernoulli(torch.ones_like(xt) * (1 - drop))
        xd = (xt * mask).requires_grad_(True)
        probs = torch.softmax(_t_forward(t_sur, xd), 1)
        loss = probs.gather(1, yt[:, None]).sum()
        feat = captured["feat"]
        agg = agg + torch.autograd.grad(loss, feat)[0]
    agg = agg / agg.flatten(1).norm(dim=1).view(-1, 1, 1, 1)
    agg = agg.detach()
    for _ in range(EPOCH):
        _t_forward(t_sur, xt + delta)
        floss = (captured["feat"] * agg).sum()
        grad = torch.autograd.grad(floss, delta)[0]
        d = torch.clamp(delta.data + ALPHA * torch.sign(-grad), -EPS, EPS)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    fwd_h.remove()

    atk = ta.load_attack_class("fia")(
        model_name="resnet18", pretrained=False, input_size=SIZE,
        num_ens=n_ens, drop_rate=drop, feature_layer="layer2")
    atk.model = env["surrogate"]
    ours = np.asarray(atk(env["x"], env["y"]))
    _check(env, _nhwc(delta), ours, STO_TOL, "fia")


def test_transfer_sgm(env):
    """``model_related/sgm.py:47-97``: γ^0.5-scaled ReLU backward hooks —
    the SurgeryConfig custom-vjp trajectory must transfer identically."""
    import transferattack_tpu as ta
    from tests.test_surgery_parity import _register_sgm_hooks
    from transferattack_tpu.models import make_model
    from transferattack_tpu.models.resnet import SurgeryConfig
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    t_sur = env["t_sur"]
    converted = torch_state_dict_to_flax(t_sur.state_dict())
    surrogate = make_model("resnet18", pretrained=False, input_size=SIZE,
                           surgery=SurgeryConfig(gamma=0.2))
    variables, report = reconcile_with_module(converted, surrogate.variables)
    assert not (report["missing"] or report["mismatched"])
    surrogate.variables = variables

    import copy

    wrapped = tnn.Sequential(tnn.Identity(), copy.deepcopy(t_sur)).eval()
    _register_sgm_hooks(wrapped, gamma=0.2)
    xt, yt, delta, momentum = _loop_setup(env)
    mean = torch.from_numpy(MEAN).view(1, 3, 1, 1)
    std = torch.from_numpy(STD).view(1, 3, 1, 1)
    for _ in range(EPOCH):
        loss = F.cross_entropy(wrapped((xt + delta - mean) / std), yt)
        grad = torch.autograd.grad(loss, delta)[0]
        delta, momentum = _mi_step(xt, delta, grad, momentum)

    import transferattack_tpu as ta

    atk = ta.load_attack_class("sgm")(model_name="resnet18", pretrained=False,
                                      input_size=SIZE, gamma=0.2)
    atk.model = surrogate
    ours = np.asarray(atk(env["x"], env["y"]))
    _check(env, _nhwc(delta), ours, DET_TOL, "sgm")


def _target_rank(env, delta, tgt):
    """Mean normalized rank of the target class on the sibling panel."""
    adv = np.clip(env["x"] + delta, 0, 1).astype(np.float32)
    ranks = []
    for h in env["holdouts"]:
        with torch.no_grad():
            out = _t_forward(h, torch.from_numpy(
                np.transpose(adv, (0, 3, 1, 2)).copy())).numpy()
        ranks.append(
            (out > np.take_along_axis(out, tgt[:, None], 1)).sum(1) / 1000.0)
    return float(np.mean(ranks))


def test_transfer_logit_targeted(env):
    """Targeted logit protocol (``advanced_objective/logit.py:31-89``,
    T=300 abbreviated to 40): target-logit ascent + TI + raw momentum, DI
    off for determinism.  Targeted sibling transfer is measured as the
    target class's mean rank on the panel — both implementations must move
    it by the same amount."""
    import transferattack_tpu as ta
    from transferattack_tpu.ops import gaussian_kernel

    epoch = 40
    rng = np.random.RandomState(107)
    tgt = rng.randint(0, 1000, (B,)).astype(np.int32)
    pairs = np.stack([env["y"], tgt], axis=1)
    kern = torch.from_numpy(gaussian_kernel(5))[None, None].repeat(3, 1, 1, 1)
    xt, _, delta, momentum = _loop_setup(env)
    tt = torch.from_numpy(tgt).long()
    for _ in range(epoch):
        logits = _t_forward(env["t_sur"], xt + delta)
        loss = logits.gather(1, tt[:, None]).sum()
        grad = torch.autograd.grad(loss, delta)[0]
        grad = F.conv2d(grad, kern, padding="same", groups=3)
        momentum = grad + momentum
        d = torch.clamp(delta.data + 2 / 255 * momentum.sign(), -EPS, EPS)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)

    atk = ta.load_attack_class("logit")(
        model_name="resnet18", pretrained=False, input_size=SIZE,
        epoch=epoch, diversity_prob=0.0, kernel_size=5, targeted=True)
    atk.model = env["surrogate"]
    ours = np.asarray(atk(env["x"], pairs))

    clean_rank = _target_rank(env, np.zeros_like(ours), tgt)
    r_ref = _target_rank(env, _nhwc(delta), tgt)
    r_ours = _target_rank(env, ours, tgt)
    assert r_ref < clean_rank - 0.02, (
        f"logit: reference delta does not move the target rank "
        f"({clean_rank:.3f} -> {r_ref:.3f})")
    assert abs(r_ref - r_ours) < 0.05, (
        f"logit: target rank ref={r_ref:.3f} ours={r_ours:.3f}")


def test_transfer_ens(env):
    """4-CNN paper ensemble abbreviated to two twins: logit-mean ensemble
    MI-FGSM (``ensemble/ens.py`` + ``utils.py:94-101``)."""
    import transferattack_tpu as ta
    from transferattack_tpu.models import make_ensemble

    t2 = _make_twin(31)
    xt, yt, delta, momentum = _loop_setup(env)
    for _ in range(EPOCH):
        logits = (_t_forward(env["t_sur"], xt + delta)
                  + _t_forward(t2, xt + delta)) / 2
        loss = F.cross_entropy(logits, yt)
        grad = torch.autograd.grad(loss, delta)[0]
        delta, momentum = _mi_step(xt, delta, grad, momentum)

    atk = ta.load_attack_class("ens")(
        model_name=["resnet18", "resnet18"], pretrained=False,
        input_size=SIZE)
    # pack the two converted twins into the ensemble's members_{i} slots
    s2 = _convert(t2)
    packed = {
        "params": {"members_0": env["surrogate"].variables["params"],
                   "members_1": s2.variables["params"]},
        "batch_stats": {"members_0": env["surrogate"].variables["batch_stats"],
                        "members_1": s2.variables["batch_stats"]},
    }
    atk.model.variables = packed
    ours = np.asarray(atk(env["x"], env["y"]))
    _check(env, _nhwc(delta), ours, DET_TOL, "ens")


def test_transfer_tgr():
    """TGR on the tiny ViT twin (``model_related/tgr.py:49-244``): γ-scaled
    token-gradient truncation hooks vs the ViTSurgery custom-vjp, run at the
    reference's mandated batchsize=1 per image, transfer-evaluated on ViT
    siblings."""
    import transferattack_tpu as ta
    from tests.test_surgery_parity import (
        TViT, _register_tgr_hooks, _tiny_vit_surrogate,
    )
    from transferattack_tpu.model_related.vit_attacks import TGR_SURGERY

    torch.manual_seed(46)
    tmodel = TViT().eval()
    surrogate = _tiny_vit_surrogate(tmodel, TGR_SURGERY)
    hooked = TViT().eval()
    hooked.load_state_dict(tmodel.state_dict())
    _register_tgr_hooks(hooked)

    nB, size = 8, 32
    rng = np.random.RandomState(108)
    x = rng.rand(nB, size, size, 3).astype(np.float32)
    mean = torch.from_numpy(MEAN).view(1, 3, 1, 1)
    std = torch.from_numpy(STD).view(1, 3, 1, 1)

    def fwd(m, x_nchw):
        return m((x_nchw - mean) / std)

    with torch.no_grad():
        y = fwd(tmodel, torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)).copy())).argmax(1).numpy()
    y = y.astype(np.int32)

    ref = np.zeros_like(x)
    for i in range(nB):  # reference TGR mandates batchsize=1
        xt = torch.from_numpy(np.transpose(x[i:i + 1], (0, 3, 1, 2)).copy())
        yt = torch.from_numpy(y[i:i + 1]).long()
        delta = torch.zeros_like(xt, requires_grad=True)
        momentum = torch.zeros_like(xt)
        for _ in range(EPOCH):
            loss = F.cross_entropy(fwd(hooked, xt + delta), yt)
            grad = torch.autograd.grad(loss, delta)[0]
            delta, momentum = _mi_step(xt, delta, grad, momentum)
        ref[i] = np.transpose(delta.detach().numpy(), (0, 2, 3, 1))[0]

    atk = ta.load_attack_class("tgr")(
        model_name="vit_small_patch16_224", pretrained=False, input_size=size)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))

    # sibling panel on the ViT twin
    holdouts = []
    for s in range(3):
        import copy

        torch.manual_seed(90 + s)
        h = copy.deepcopy(tmodel)
        with torch.no_grad():
            for p in h.parameters():
                p.add_(torch.randn_like(p) * 0.05 * p.abs().mean())
        holdouts.append(h.eval())

    def asr(delta):
        adv = np.clip(x + delta, 0, 1).astype(np.float32)
        vals = []
        for h in holdouts:
            with torch.no_grad():
                pc = fwd(h, torch.from_numpy(
                    np.transpose(x, (0, 3, 1, 2)).copy())).argmax(1).numpy()
                pa = fwd(h, torch.from_numpy(
                    np.transpose(adv, (0, 3, 1, 2)).copy())).argmax(1).numpy()
            vals.append((pa != pc).mean())
        return float(np.mean(vals))

    a_ref, a_ours = asr(ref), asr(ours)
    assert a_ref > 0, "tgr: reference delta does not transfer (vacuous)"
    assert abs(a_ref - a_ours) <= STO_TOL, (
        f"tgr: transfer ASR ref={a_ref:.3f} ours={a_ours:.3f}")
