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
* stochastic estimators (vmi, gra, dim, ssm, bsr, sia, tgr): different RNG
  streams ⇒ statistical agreement within ``STO_TOL`` plus a non-vacuity
  check (the reference delta must actually transfer).

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
    mean neighbor grad − current grad, neighbors ~ U(−β·eps, β·eps)."""
    n_nb, radius = 4, 1.5 * EPS
    torch.manual_seed(100)
    xt, yt, delta, momentum = _loop_setup(env)
    variance = torch.zeros_like(xt)
    for _ in range(EPOCH):
        loss = F.cross_entropy(_t_forward(env["t_sur"], xt + delta), yt)
        grad = torch.autograd.grad(loss, delta)[0]
        delta2, momentum = _mi_step(xt, delta, grad + variance, momentum)
        nb = torch.zeros_like(xt)
        for _ in range(n_nb):
            noise = torch.zeros_like(xt).uniform_(-radius, radius)
            loss = F.cross_entropy(
                _t_forward(env["t_sur"], xt + delta + noise), yt)
            nb = nb + torch.autograd.grad(loss, delta)[0]
        variance = nb / n_nb - grad
        delta = delta2
    ours = _repo_delta(env, "vmifgsm", num_neighbor=n_nb)
    _check(env, _nhwc(delta), ours, STO_TOL, "vmifgsm")


def test_transfer_gra(env):
    """``gradient/gra.py:40-151``: cosine fusion of current and neighborhood
    gradients, per-pixel decay indicator M updated by momentum sign
    agreement, step = M·α."""
    n_nb, radius, eta = 4, 3.5 * EPS, 0.94
    torch.manual_seed(101)
    xt, yt, delta, momentum = _loop_setup(env)
    M = torch.full_like(xt, 1 / eta)
    for _ in range(EPOCH):
        loss = F.cross_entropy(_t_forward(env["t_sur"], xt + delta), yt)
        grad = torch.autograd.grad(loss, delta)[0]
        nb = torch.zeros_like(xt)
        for _ in range(n_nb):
            noise = torch.zeros_like(xt).uniform_(-radius, radius)
            loss = F.cross_entropy(
                _t_forward(env["t_sur"], xt + delta + noise), yt)
            nb = nb + torch.autograd.grad(loss, delta)[0]
        samgrad = nb / n_nb
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
    ours = _repo_delta(env, "gra", num_neighbor=n_nb)
    _check(env, _nhwc(delta), ours, STO_TOL, "gra")


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

    n_spec, rho = 4, 0.5
    rng = np.random.RandomState(103)
    xt, yt, delta, momentum = _loop_setup(env)
    for _ in range(EPOCH):
        grads = torch.zeros_like(xt)
        for _ in range(n_spec):
            base = (xt + delta).detach().numpy()
            gauss = rng.randn(*base.shape).astype(np.float32) * EPS
            mask = (rng.rand(*base.shape).astype(np.float32) * 2 * rho
                    + 1 - rho)
            spec = dctn(base + gauss, type=2, norm="ortho", axes=(2, 3))
            point = idctn(spec * mask, type=2, norm="ortho",
                          axes=(2, 3)).astype(np.float32)
            pt = torch.from_numpy(point).requires_grad_(True)
            loss = F.cross_entropy(_t_forward(env["t_sur"], pt), yt)
            grads = grads + torch.autograd.grad(loss, pt)[0]
        delta, momentum = _mi_step(xt, delta.requires_grad_(True),
                                   grads / n_spec, momentum)
    ours = _repo_delta(env, "ssm", num_spectrum=n_spec, sample_chunk=1)
    _check(env, _nhwc(delta), ours, STO_TOL, "ssm")


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
