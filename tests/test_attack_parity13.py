"""Loop-level parity twins, stage 13: the last untwinned tail — SASD-WS
(fixed 0.93 conv-weight scaling + TI + targeted protocol), the SSM trick
variants (SSM_H's band-passed 20-sample point-gradient estimator, SSM_P's
single-draw chain-gradient with the row/column band mask), and FAP's
full-image-DCT tile gate + global top-n importance mask.

Each torch side is a raw transcription of the reference loop
(``ensemble/sasd_ws.py``, ``input_transformation/ssm_with_tricks.py``,
``generation/fap.py``); randomness is paired through pre-drawn banks so the
twins run at the deterministic sign-agreement bar.  The reference's
unnormalized SSA DCT pair differs from our orthonormal DCT only by a
diagonal coefficient rescaling, which commutes with every pointwise
spectral mask used here — so the torch sides use ``scipy.fft`` ortho
transforms and the equivalence is exercised live.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from tests.test_attack_parity import _fresh_pair, torch_forward  # noqa: E402

EPS, ALPHA = 16 / 255, 1.6 / 255


def _mi_norm(g):
    return g / g.abs().mean(dim=(1, 2, 3), keepdim=True)


def _sign_agree(a, b):
    return (np.sign(a) == np.sign(b)).mean()


def _scale_torch_convs(tmodel, p):
    """``sasd_ws.py:137-200``: every nn.Conv2d weight times the fixed p."""
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.Conv2d):
                m.weight.mul_(p)


def _scale_jax_convs(surrogate, p):
    import jax

    surrogate.variables = jax.tree.map(
        lambda l: l * p if getattr(l, "ndim", 0) == 4 else l,
        surrogate.variables,
    )
    return surrogate


def _gkern(kernlen=5, nsig=3):
    x = np.linspace(-nsig, nsig, kernlen)
    k1 = np.exp(-0.5 * x**2) / np.sqrt(2 * np.pi)
    k = np.outer(k1, k1)
    return (k / k.sum()).astype(np.float32)


def test_sasd_ws_scaled_weights_loop_parity():
    """SASD-WS trajectory (``sasd_ws.py:97-135``): conv kernels scaled once
    by p=0.93 at load, targeted −CE, TI 5×5 conv on the gradient
    (padding 2), MI momentum, alpha=2/255.  The DI draws are pinned to the
    pass-through branch (``c > 0.7``, ``sasd_ws.py:90-95``) on both sides —
    a legitimate sampler trajectory; DI's continuous equivalence is covered
    by the DIM transfer twin."""
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(131)
    _scale_torch_convs(tmodel, 0.93)

    rng = np.random.RandomState(131)
    B, epoch, alpha = 2, 8, 2.0 / 255
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)

    kern = torch.from_numpy(_gkern(5, 3))[None, None].repeat(3, 1, 1, 1)
    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        logits = torch_forward(tmodel, xt + delta)
        loss = -F.cross_entropy(logits, yt)  # targeted on label[1]
        grad = torch.autograd.grad(loss, delta)[0]
        g = F.conv2d(grad.permute(0, 3, 1, 2), kern, stride=1,
                     padding=(2, 2), groups=3)
        grad = g.permute(0, 2, 3, 1)
        momentum = momentum + _mi_norm(grad)
        d = torch.clamp(delta.data + alpha * momentum.sign(), -EPS, EPS)
        delta = torch.clamp(xt + d, 0, 1) - xt
        delta.requires_grad_(True)
    ref = delta.detach().numpy()

    SASD = ta.load_attack_class("sasd_ws")

    class _NoDI(SASD):
        def transform(self, xx, state, key):
            return xx[None]

    atk = _NoDI(model_name="resnet18", pretrained=False, input_size=64,
                epoch=epoch, alpha=alpha, targeted=True)
    # the ctor scaled its own fallback model; install the twin and re-apply
    # the load-time scaling to it
    atk.model = _scale_jax_convs(surrogate, 0.93)
    ours = np.asarray(atk(x, np.stack([y, y], axis=1)))
    agree = _sign_agree(ref, ours)
    assert agree > 0.98, f"SASD_WS delta sign agreement {agree:.4f}"


def test_ssm_h_highfreq_loop_parity():
    """SSM_H trajectory (``ssm_with_tricks.py:17-115``): gauss + spectral
    mask applied only outside the low-5% corner (the corner's coefficients
    pass UNMASKED: ``x_dct·mask·(1−low) + x_dct·low``), gradient taken AT
    the transformed point, per-iteration averaging (pinned single-draw)."""
    import jax.numpy as jnp
    from scipy.fft import dctn, idctn

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(132)
    rng = np.random.RandomState(132)
    B, epoch, rho = 2, 6, 0.5
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)
    g_bank = (rng.randn(epoch, B, 64, 64, 3).astype(np.float32) * EPS)
    m_bank = (rng.rand(epoch, B, 64, 64, 3).astype(np.float32)
              * 2 * rho + 1 - rho)
    lh = int(64 * 0.05)
    low = np.zeros((64, 64, 1), np.float32)
    low[:lh, :lh] = 1.0

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt)
    momentum = torch.zeros_like(xt)
    for it in range(epoch):
        base = (xt + delta).numpy()
        spec = dctn(base + g_bank[it], type=2, norm="ortho", axes=(1, 2))
        gated = spec * m_bank[it] * (1 - low) + spec * low
        point = idctn(gated, type=2, norm="ortho", axes=(1, 2)).astype(
            np.float32)
        pt = torch.from_numpy(point).requires_grad_(True)
        loss = F.cross_entropy(torch_forward(tmodel, pt), yt)
        grad = torch.autograd.grad(loss, pt)[0]
        momentum = momentum + _mi_norm(grad)
        delta = torch.clamp(delta + ALPHA * momentum.sign(), -EPS, EPS)
        delta = torch.clamp(xt + delta, 0, 1) - xt
    ref = delta.numpy()

    SSMH = ta.load_attack_class("ssm_h")
    jg, jm = jnp.asarray(g_bank), jnp.asarray(m_bank)

    class _Paired(SSMH):
        def spectral_draws(self, key, xx, step):
            return jg[step], jm[step]

    atk = _Paired(model_name="resnet18", pretrained=False, input_size=64,
                  epoch=epoch, num_spectrum=1, rho=rho, sample_chunk=1)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = _sign_agree(ref, ours)
    assert agree > 0.98, f"SSM_H delta sign agreement {agree:.4f}"


def test_ssm_p_chain_grad_loop_parity():
    """SSM_P trajectory (``ssm_with_tricks.py:228-320``): ONE draw per
    iteration, the mask zeroed over the low-row AND low-column bands
    (``high_frequency_mask[:, :, lh:, lw:] = 1``), and the gradient taken
    w.r.t. delta THROUGH the DCT chain (``get_grad(loss, delta)``)."""
    import jax.numpy as jnp
    from scipy.fft import dctn, idctn

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(133)
    rng = np.random.RandomState(133)
    B, epoch, rho = 2, 6, 0.5
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)
    g_bank = (rng.randn(epoch, B, 64, 64, 3).astype(np.float32) * EPS)
    m_bank = (rng.rand(epoch, B, 64, 64, 3).astype(np.float32)
              * 2 * rho + 1 - rho)
    lh = int(64 * 0.05)
    band = np.zeros((64, 64, 1), np.float32)
    band[lh:, lh:] = 1.0

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    dct_mat = None
    for it in range(epoch):
        # chain gradient: build the transform differentiably in torch via
        # the orthonormal DCT as matmuls (scipy has no autograd)
        if dct_mat is None:
            N = 64
            n = np.arange(N)
            D = np.cos(np.pi * (2 * n[None, :] + 1) * n[:, None] / (2 * N))
            D = D * np.sqrt(2.0 / N)
            D[0] *= np.sqrt(0.5)
            dct_mat = torch.from_numpy(D.astype(np.float32))
        gauss = torch.from_numpy(g_bank[it])
        mask = torch.from_numpy(m_bank[it] * band)
        xa = (xt + delta + gauss).permute(0, 3, 1, 2)  # (B,C,H,W)
        spec = dct_mat @ xa @ dct_mat.T
        point = (dct_mat.T @ (spec * mask.permute(0, 3, 1, 2)) @ dct_mat)
        point = point.permute(0, 2, 3, 1)
        loss = F.cross_entropy(torch_forward(tmodel, point), yt)
        grad = torch.autograd.grad(loss, delta)[0]
        momentum = momentum + _mi_norm(grad)
        d = torch.clamp(delta.data + ALPHA * momentum.sign(), -EPS, EPS)
        delta = torch.clamp(xt + d, 0, 1) - xt
        delta.requires_grad_(True)
    ref = delta.detach().numpy()

    SSMP = ta.load_attack_class("ssm_p")
    jg, jm = jnp.asarray(g_bank), jnp.asarray(m_bank)

    class _Paired(SSMP):
        def spectral_draws(self, key, xx, step):
            return jg[step], jm[step]

    atk = _Paired(model_name="resnet18", pretrained=False, input_size=64,
                  epoch=epoch, rho=rho)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = _sign_agree(ref, ours)
    assert agree > 0.98, f"SSM_P delta sign agreement {agree:.4f}"


# ------------------------------------------------------------------- FAP
def _t_dct_mat(N):
    n = np.arange(N)
    D = np.cos(np.pi * (2 * n[None, :] + 1) * n[:, None] / (2 * N))
    D = D * np.sqrt(2.0 / N)
    D[0] *= np.sqrt(0.5)
    return torch.from_numpy(D.astype(np.float32))


def _t_rgb_to_ycbcr(x):
    """``fap.py:301-313`` channel mixing (NCHW)."""
    r, g, b = x[:, 0:1], x[:, 1:2], x[:, 2:3]
    yy = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b
    return torch.cat([yy, cb, cr], 1)


def _t_ycbcr_to_rgb(x):
    yy, cb, cr = x[:, 0:1], x[:, 1:2], x[:, 2:3]
    m = np.linalg.inv(np.array([[0.299, 0.587, 0.114],
                                [-0.168736, -0.331264, 0.5],
                                [0.5, -0.418688, -0.081312]], np.float32))
    r = m[0, 0] * yy + m[0, 1] * cb + m[0, 2] * cr
    g = m[1, 0] * yy + m[1, 1] * cb + m[1, 2] * cr
    b = m[2, 0] * yy + m[2, 1] * cb + m[2, 2] * cr
    return torch.cat([r, g, b], 1)


def _t_blockify(v, size):
    """``fap.py:315-322``: tile the (B,C,H,W) plane into (B,C,N,s,s)."""
    b, c, h, w = v.shape
    t = v.view(b, c, h // size, size, w // size, size)
    return t.permute(0, 1, 2, 4, 3, 5).reshape(
        b, c, (h // size) * (w // size), size, size)


def _t_deblockify(t, size, H, W):
    b, c = t.shape[0], t.shape[1]
    v = t.view(b, c, H // size, W // size, size, size)
    return v.permute(0, 1, 2, 4, 3, 5).reshape(b, c, H, W)


def _t_gate(delta_nchw, mask, D):
    """``fap.py:108-126``: YCbCr → FULL-image DCT → tile → mask → untile →
    IDCT → RGB → clamp[0,1] (ortho DCT is exact here: pointwise tile masks
    commute with the unnormalized pair's diagonal rescaling)."""
    H, W = delta_nchw.shape[2], delta_nchw.shape[3]
    v = D @ _t_rgb_to_ycbcr(delta_nchw) @ D.T
    u = _t_blockify(v, mask.shape[-1])
    u = u * mask[None, :, None]
    v = _t_deblockify(u, mask.shape[-1], H, W)
    rgb = _t_ycbcr_to_rgb(D.T @ v @ D)
    return torch.clamp(rgb, 0.0, 1.0)


def test_fap_gate_math_parity():
    """The frequency gate alone, against the torch transcription, with an
    arbitrary (3, 8, 8) mask."""
    import jax.numpy as jnp

    import transferattack_tpu as ta
    from transferattack_tpu.generation.fap import FAP

    rng = np.random.RandomState(134)
    delta = (rng.rand(2, 64, 64, 3).astype(np.float32) - 0.5) * 0.2
    mask = (rng.rand(3, 8, 8) > 0.6).astype(np.float32)

    atk = ta.load_attack_class("fap")(model_name="toy_cnn", epoch=1)
    atk._freq_mask = jnp.asarray(mask.transpose(1, 2, 0))
    ours = np.asarray(atk.gate_delta(jnp.asarray(delta)))

    D = _t_dct_mat(64)
    ref = _t_gate(torch.from_numpy(delta).permute(0, 3, 1, 2),
                  torch.from_numpy(mask), D)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_fap_importance_mask_and_loop_parity(tmp_path):
    """The grad-importance mask (mean |tiled DCT of input grad|, ONE global
    top-n — ``fap.py:160-190``) built by both sides from the same background
    set must be identical, and the full FAP trajectory with that mask must
    agree (``fap.py:83-107``: gate the delta, grad AT x+delta', update the
    raw delta with the 192/top_n-scaled budget)."""
    import jax.numpy as jnp

    import transferattack_tpu as ta
    from tests.make_fake_data import make_fake_dataset

    tmodel, _, surrogate = _fresh_pair(135)
    rng = np.random.RandomState(135)
    bgdir = make_fake_dataset(str(tmp_path / "bg"), n=8, size=64, seed=44)

    B, epoch, top_n = 2, 6, 24
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)

    atk = ta.load_attack_class("fap")(
        model_name="resnet18", pretrained=False, input_size=64,
        epoch=epoch, top_n=top_n, bg_dir=bgdir, bg_num=8)
    atk.model = surrogate
    ours_mask = np.asarray(atk.freq_mask()).transpose(2, 0, 1)

    # torch-side mask from the same images
    from transferattack_tpu.utils.data import AdvDataset

    ds = AdvDataset(input_dir=bgdir, size=(64, 64))
    D = _t_dct_mat(64)
    imp = torch.zeros(3, 8, 8)
    for xs, ys, _ in ds.as_batches(16):
        xb = torch.from_numpy(np.asarray(xs)).requires_grad_(True)
        loss = F.cross_entropy(torch_forward(tmodel, xb),
                               torch.from_numpy(np.asarray(ys)).long())
        g = torch.autograd.grad(loss, xb)[0].permute(0, 3, 1, 2)
        gf = D @ _t_rgb_to_ycbcr(g) @ D.T
        gu = _t_blockify(gf, 8)
        imp += gu.abs().mean(dim=2).mean(dim=0)
        break
    flat = imp.reshape(-1)
    keep = torch.topk(flat, k=top_n).indices
    ref_mask = torch.zeros_like(flat)
    ref_mask[keep] = 1.0
    ref_mask = ref_mask.view(3, 8, 8).numpy()
    np.testing.assert_array_equal(ours_mask, ref_mask)

    # full loop with the agreed mask
    eff_eps = EPS * 192.0 / top_n
    alpha = eff_eps / epoch
    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros(B, 3, 64, 64)
    momentum = torch.zeros_like(delta)
    tm = torch.from_numpy(ref_mask)
    for _ in range(epoch):
        dp = _t_gate(delta, tm, D)
        pt = (xt.permute(0, 3, 1, 2) + dp).detach().requires_grad_(True)
        loss = F.cross_entropy(
            torch_forward(tmodel, pt.permute(0, 2, 3, 1)), yt)
        grad = torch.autograd.grad(loss, pt)[0]
        momentum = momentum + _mi_norm(grad)
        d = torch.clamp(delta + alpha * momentum.sign(), -eff_eps, eff_eps)
        delta = torch.clamp(xt.permute(0, 3, 1, 2) + d, 0, 1) \
            - xt.permute(0, 3, 1, 2)
    ref = delta.permute(0, 2, 3, 1).numpy()

    ours = np.asarray(atk(x, y))
    agree = _sign_agree(ref, ours)
    assert agree > 0.98, f"FAP delta sign agreement {agree:.4f}"
