"""Loop-level parity twins, stage 2 (VERDICT r3 item 8): the estimator
families whose math carries state across iterations — GRA's per-pixel decay
indicator, PGN's two-point lookahead gradient, DeCowA's inner TPS-map descent.

Each reference loop is transcribed in raw PyTorch from the cited file and run
on the converted torch twin of our ResNet-18; stochastic neighborhoods are
made deterministic by zeroing their sampling radius (``beta=0`` /
``noise_scale=0``), which leaves every state-update rule, fusion formula and
projection live while removing RNG mismatch between frameworks.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from tests.test_attack_parity import MEAN, STD, _fresh_pair, torch_forward  # noqa: E402


def _mi_normalize(g):
    return g / g.abs().mean(dim=(1, 2, 3), keepdim=True)


def test_gra_decay_indicator_loop_parity():
    """GRA full 10-iter trajectory (``gradient/gra.py:42-151``) at beta=0:
    every neighbor equals the center so samgrad == grad and the cosine score
    is exactly 1, leaving the M decay-indicator dynamics (init 1/eta, shrink
    by eta where the momentum sign flips, per-pixel M*alpha step) as the
    system under test."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(21)
    rng = np.random.RandomState(8)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, eta, epoch = 16 / 255, 1.6 / 255, 1.0, 0.94, 10

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    M = torch.full_like(xt, 1.0 / eta)
    for _ in range(epoch):
        loss = tnn.functional.cross_entropy(torch_forward(tmodel, xt + delta), yt)
        grad = torch.autograd.grad(loss, delta)[0]
        # beta=0: the num_neighbor average is the center gradient itself
        samgrad = grad
        cf = grad.reshape(grad.size(0), -1)
        sf = samgrad.reshape(samgrad.size(0), -1)
        s = (cf * sf).sum(1) / (cf.pow(2).sum(1).sqrt() * sf.pow(2).sum(1).sqrt())
        s = s[:, None, None, None]
        current = s * grad + (1 - s) * samgrad
        last_momentum = momentum
        momentum = decay * momentum + _mi_normalize(current)
        eq_m = (last_momentum.sign() == momentum.sign()).float()
        M = M * (eq_m + (1 - eq_m) * eta)
        d = torch.clamp(delta.data + (M * alpha) * momentum.sign(), -eps, eps)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("gra")(
        model_name="resnet18", pretrained=False, input_size=64,
        beta=0.0, num_neighbor=2, epoch=epoch)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"GRA delta sign agreement {agree:.4f}"
    # the per-pixel step sizes must show real M decay (not all-ones)
    assert float(np.abs(ref).max()) > 0


def test_pgn_lookahead_loop_parity():
    """PGN full 10-iter trajectory (``gradient/pgn.py:43-108``) at beta=0:
    x_near is the center point, so the (1-gamma)*g1 + gamma*g2 two-point
    mixture, the alpha=eps/epoch step and the l1-normalized lookahead descent
    are all exercised deterministically."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(22)
    rng = np.random.RandomState(9)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, gamma, decay, epoch = 16 / 255, 0.5, 1.0, 10
    alpha = eps / epoch

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        x_near = xt + delta
        loss1 = tnn.functional.cross_entropy(torch_forward(tmodel, x_near), yt)
        g1 = torch.autograd.grad(loss1, delta, create_graph=False)[0]
        x_next = (x_near.detach() - alpha * _mi_normalize(g1)).requires_grad_(True)
        loss2 = tnn.functional.cross_entropy(torch_forward(tmodel, x_next), yt)
        g2 = torch.autograd.grad(loss2, x_next)[0]
        avg = (1 - gamma) * g1 + gamma * g2
        momentum = decay * momentum + _mi_normalize(avg)
        d = torch.clamp(delta.data + alpha * momentum.sign(), -eps, eps)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("pgn")(
        model_name="resnet18", pretrained=False, input_size=64,
        beta=0.0, num_neighbor=2, epoch=epoch)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"PGN delta sign agreement {agree:.4f}"


# ---------------------------------------------------------------------------
# DeCowA: reference TPS machinery transcribed from
# ``input_transformation/decowa.py:110-199`` for the twin
# ---------------------------------------------------------------------------

def _t_k_matrix(X, Y):
    D2 = torch.pow(X[:, :, None, :] - Y[:, None, :, :], 2).sum(-1)
    return D2 * torch.log(D2 + 1e-9)


def _t_p_matrix(X):
    n, k = X.shape[:2]
    P = torch.ones(n, k, 3)
    P[:, :, 1:] = X
    return P


def _t_tps_grid(Xc, Yc, h, w):
    n, k = Xc.shape[:2]
    Z = torch.zeros(1, k + 3, 2)
    P = torch.ones(n, k, 3)
    L = torch.zeros(n, k + 3, k + 3)
    K = _t_k_matrix(Xc, Xc)
    P[:, :, 1:] = Xc
    Z[:, :k, :] = Yc
    L[:, :k, :k] = K
    L[:, :k, k:] = P
    L[:, k:, :k] = P.permute(0, 2, 1)
    Q = torch.linalg.solve(L, Z)
    W_, A = Q[:, :k], Q[:, k:]
    grid = torch.ones(1, h, w, 2)
    grid[:, :, :, 0] = torch.linspace(-1, 1, w)
    grid[:, :, :, 1] = torch.linspace(-1, 1, h)[..., None]
    pts = grid.view(-1, h * w, 2)
    U = _t_k_matrix(pts, Xc)
    Pg = _t_p_matrix(pts)
    return (Pg @ A + U @ W_).view(-1, h, w, 2)


def _t_grid_points_2d(width, height):
    xx, yy = torch.meshgrid(
        [torch.linspace(-1.0, 1.0, height), torch.linspace(-1.0, 1.0, width)],
        indexing="ij")
    return torch.stack([yy, xx], dim=-1).contiguous().view(-1, 2)


def _t_vwt(x_nhwc, noise_map, mesh_w, mesh_h):
    """Reference ``vwt`` (``decowa.py:46-55``) on NHWC raw pixels."""
    x = x_nhwc.permute(0, 3, 1, 2)
    n, c, hh, ww = x.shape
    X = _t_grid_points_2d(mesh_w, mesh_h)
    mod = torch.zeros([mesh_h, mesh_w, 2])
    mod[1:mesh_h - 1, 1:mesh_w - 1, :] = noise_map
    Y = X + mod.reshape(-1, 2)
    warped = _t_tps_grid(X[None], Y[None], hh, ww).repeat(n, 1, 1, 1)
    out = torch.grid_sampler_2d(x, warped, 0, 0, False)
    return out.permute(0, 2, 3, 1)


def test_decowa_warp_loop_parity():
    """DeCowA 5-iter trajectory (``decowa.py:46-107``) at noise_scale=0:
    nm0 = 0 exactly, so the inner rho-step on the TPS control points, the
    align_corners=False bilinear warp, and the warped-gradient MI loop are
    all deterministic.  Pins ``tps_grid``/``grid_sample`` against the
    reference's ``TPS``/``torch.grid_sampler_2d``."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(23)
    rng = np.random.RandomState(10)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, rho, epoch = 16 / 255, 1.6 / 255, 1.0, 0.01, 5
    mesh_w = mesh_h = 3

    def t_forward(xp):
        return torch_forward(tmodel, xp)

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        grads = 0
        for _ in range(2):  # num_warping identical copies at noise_scale=0
            adv = (xt + delta).detach()
            nm = torch.zeros([mesh_h - 2, mesh_w - 2, 2], requires_grad=True)
            loss_in = tnn.functional.cross_entropy(
                t_forward(_t_vwt(adv, nm, mesh_w, mesh_h)), yt)
            g_nm = torch.autograd.grad(loss_in, nm)[0]
            nm = (nm.detach() - rho * g_nm).detach()
            loss = tnn.functional.cross_entropy(
                t_forward(_t_vwt(xt + delta, nm, mesh_w, mesh_h)), yt)
            grads = grads + torch.autograd.grad(loss, delta)[0]
        grads = grads / 2
        momentum = decay * momentum + _mi_normalize(grads)
        d = torch.clamp(delta.data + alpha * momentum.sign(), -eps, eps)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    ref = delta.detach().numpy()

    import os

    # exact bilinear path: pins tps_grid/grid_sample math against torch
    os.environ["TA_TPU_DECOWA_WARP"] = "bilinear"
    try:
        atk = ta.load_attack_class("decowa")(
            model_name="resnet18", pretrained=False, input_size=64,
            noise_scale=0.0, num_warping=2, epoch=epoch, rho=rho)
        atk.model = surrogate
        ours = np.asarray(atk(x, y))
    finally:
        del os.environ["TA_TPU_DECOWA_WARP"]
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.97, f"DeCowA delta sign agreement {agree:.4f}"

    # default gather-free separable warp (the v5e production path, 19x
    # faster than bilinear's scatter backward): first-order in the smooth
    # TPS field — measured 0.961 on this 5-iter twin
    atk2 = ta.load_attack_class("decowa")(
        model_name="resnet18", pretrained=False, input_size=64,
        noise_scale=0.0, num_warping=2, epoch=epoch, rho=rho)
    atk2.model = surrogate
    ours2 = np.asarray(atk2(x, y))
    agree2 = (np.sign(ref) == np.sign(ours2)).mean()
    assert agree2 > 0.94, f"DeCowA sep-warp sign agreement {agree2:.4f}"


# ---------------------------------------------------------------------------
# SIA / BSR: fixed-parameter twins.  The repo transforms accept an explicit
# ``params`` dict (sampling bypass), so the same cuts / ops / permutations
# drive both the jitted index-map implementation and a raw-torch transcription
# of the reference's dynamic-slice ops — elementwise transform equality plus
# full-loop sign parity.
# ---------------------------------------------------------------------------

def _sia_params(seed, H, W, nb, B):
    """Random but FIXED parameter set shared by both implementations."""
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    h_edges = np.sort(rng.choice(np.arange(1, H), nb - 1, replace=False))
    w_edges = np.sort(rng.choice(np.arange(1, W), nb - 1, replace=False))
    return {
        "h_edges": jnp.asarray(np.concatenate([h_edges, [H]]).astype(np.int32)),
        "w_edges": jnp.asarray(np.concatenate([w_edges, [W]]).astype(np.int32)),
        "ops": jnp.asarray(rng.randint(0, 7, size=(nb, nb)).astype(np.int32)),
        "shift_v": jnp.asarray(rng.rand(nb, nb).astype(np.float32)),
        "shift_h": jnp.asarray(rng.rand(nb, nb).astype(np.float32)),
        "scale": jnp.asarray(rng.rand(nb, nb).astype(np.float32)),
        "noise": jnp.asarray(
            rng.uniform(-16 / 255, 16 / 255, size=(B, H, W, 3)).astype(np.float32)),
    }


def _t_sia_blocktransform(x, params, nb):
    """Reference ``blocktransform`` (``sia.py:44-112``) with injected
    parameters, matching the repo's roll direction (out[r] = in[r+step],
    wrap) — the reference's uniform-random roll is sign-symmetric."""
    p = {k: np.asarray(v) for k, v in params.items()}
    he, we = p["h_edges"], p["w_edges"]
    hs = [0] + list(he[:-1])
    ws = [0] + list(we[:-1])
    out = x.clone()
    for i in range(nb):
        for j in range(nb):
            cell = out[:, hs[i]:he[i], ws[j]:we[j], :]
            op = int(p["ops"][i, j])
            lh, lw = he[i] - hs[i], we[j] - ws[j]
            if op == 0:
                cell = torch.roll(cell, -int(p["shift_v"][i, j] * lh), dims=1)
            elif op == 1:
                cell = torch.roll(cell, -int(p["shift_h"][i, j] * lw), dims=2)
            elif op == 2:
                cell = cell.flip(dims=(1,))
            elif op == 3:
                cell = cell.flip(dims=(2,))
            elif op == 4:
                cell = cell.flip(dims=(1, 2))
            elif op == 5:
                cell = cell * float(p["scale"][i, j])
            else:
                nz = torch.from_numpy(p["noise"][:, hs[i]:he[i], ws[j]:we[j], :])
                cell = torch.clip(cell + nz, 0, 1)
            out[:, hs[i]:he[i], ws[j]:we[j], :] = cell
    return out


def test_sia_fixed_transform_and_loop_parity():
    import jax.numpy as jnp

    import transferattack_tpu as ta
    from transferattack_tpu.input_transformation.sia import (
        SIA, sia_blocktransform,
    )

    tmodel, _, surrogate = _fresh_pair(24)
    rng = np.random.RandomState(11)
    B, H, W, nb = 2, 64, 64, 3
    x = rng.rand(B, H, W, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)
    plist = [_sia_params(31, H, W, nb, B), _sia_params(32, H, W, nb, B)]

    # (a) transform-level: exact elementwise equality
    for p in plist:
        ours_t = np.asarray(sia_blocktransform(jnp.asarray(x), None, nb, params=p))
        ref_t = _t_sia_blocktransform(torch.from_numpy(x), p, nb).numpy()
        np.testing.assert_allclose(ours_t, ref_t, atol=1e-6)

    # (b) loop-level: 10-iter MI trajectory over the two fixed copies
    class _FixedSIA(SIA):
        def transform(self, xx, state, key):
            return jnp.stack(
                [sia_blocktransform(xx, None, nb, params=p) for p in plist])

    eps, alpha, decay, epoch = 16 / 255, 1.6 / 255, 1.0, 10
    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        copies = torch.cat(
            [_t_sia_blocktransform(xt + delta, p, nb) for p in plist])
        loss = tnn.functional.cross_entropy(
            torch_forward(tmodel, copies), yt.repeat(2))
        grad = torch.autograd.grad(loss, delta)[0]
        momentum = decay * momentum + _mi_normalize(grad)
        d = torch.clamp(delta.data + alpha * momentum.sign(), -eps, eps)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    ref = delta.detach().numpy()

    atk = _FixedSIA(model_name="resnet18", pretrained=False, input_size=64,
                    num_scale=2, num_block=nb, epoch=epoch)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"SIA delta sign agreement {agree:.4f}"


def _bsr_params(seed, H, W, nb, flip):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)

    def edges(size):
        r = rng.uniform(0, 2, size=nb)
        e = np.round(np.cumsum(r) / r.sum() * size).astype(np.int32)
        e[-1] = size
        return e

    return {
        "h_edges": jnp.asarray(edges(H)),
        "angles": jnp.zeros((nb,), jnp.float32),
        "w_edges": jnp.asarray(np.stack([edges(W) for _ in range(nb)])),
        "col_perms": jnp.asarray(
            np.stack([rng.permutation(nb) for _ in range(nb)]).astype(np.int32)),
        "row_perm": jnp.asarray(rng.permutation(nb).astype(np.int32)),
        "flip": flip,
    }


def _t_bsr_one_copy(x, params, nb):
    """Reference ``shuffle`` (``bsr.py:47-61``) with injected lengths and
    permutations, rotation fixed at 0°."""
    p = {k: (np.asarray(v) if k != "flip" else v) for k, v in params.items()}
    if p["flip"]:
        return _t_bsr_one_copy(
            x.permute(0, 2, 1, 3),
            {**params, "flip": False}, nb).permute(0, 2, 1, 3)
    he = p["h_edges"]
    hs = [0] + list(he[:-1])
    strips = [x[:, hs[s]:he[s]] for s in range(nb)]
    colshuf = []
    for s, strip in enumerate(strips):
        we = p["w_edges"][s]
        ws = [0] + list(we[:-1])
        cs = [strip[:, :, ws[j]:we[j]] for j in range(nb)]
        colshuf.append(torch.cat([cs[q] for q in p["col_perms"][s]], dim=2))
    return torch.cat([colshuf[q] for q in p["row_perm"]], dim=1)


def test_bsr_fixed_transform_and_loop_parity():
    import jax.numpy as jnp

    import transferattack_tpu as ta
    from transferattack_tpu.input_transformation.bsr import BSR, bsr_one_copy

    tmodel, _, surrogate = _fresh_pair(25)
    rng = np.random.RandomState(12)
    B, H, W, nb = 2, 64, 64, 3
    x = rng.rand(B, H, W, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)
    plist = [_bsr_params(41, H, W, nb, False), _bsr_params(42, H, W, nb, True)]

    # (a) transform-level: pure index shuffles at 0° must agree exactly,
    # including the flipped (cols-first) orientation select
    for p in plist:
        ours_t = np.asarray(bsr_one_copy(jnp.asarray(x), None, nb, params=p))
        ref_t = _t_bsr_one_copy(torch.from_numpy(x), p, nb).numpy()
        np.testing.assert_allclose(ours_t, ref_t, atol=1e-5)

    class _FixedBSR(BSR):
        def transform(self, xx, state, key):
            return jnp.stack(
                [bsr_one_copy(xx, None, nb, params=p) for p in plist])

    eps, alpha, decay, epoch = 16 / 255, 1.6 / 255, 1.0, 10
    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        copies = torch.cat([_t_bsr_one_copy(xt + delta, p, nb) for p in plist])
        loss = tnn.functional.cross_entropy(
            torch_forward(tmodel, copies), yt.repeat(2))
        grad = torch.autograd.grad(loss, delta)[0]
        momentum = decay * momentum + _mi_normalize(grad)
        d = torch.clamp(delta.data + alpha * momentum.sign(), -eps, eps)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    ref = delta.detach().numpy()

    atk = _FixedBSR(model_name="resnet18", pretrained=False, input_size=64,
                    num_scale=2, num_block=nb, epoch=epoch)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"BSR delta sign agreement {agree:.4f}"


def test_bsr_rotation_matches_direct_bilinear():
    """The Paeth three-shear strip rotation equals a direct bilinear rotation
    about the image center (sampling the input at R(-θ)); BSR draws θ from
    the symmetric ±24° range so the sign convention is immaterial.  Interior
    mean error on a smooth image bounds the per-pass-linear vs direct
    bilinear interpolation difference."""
    import jax.image
    import jax.numpy as jnp

    from transferattack_tpu.input_transformation.bsr import _rotate_row_strips

    H = W = 64
    rng = np.random.RandomState(0)
    base = jnp.asarray(rng.rand(8, 8, 3))
    x = np.asarray(jax.image.resize(base, (H, W, 3), "cubic"))[None].astype(
        np.float32)
    theta = np.deg2rad(15.0)
    out = np.asarray(_rotate_row_strips(
        jnp.asarray(x), jnp.asarray([H], jnp.int32),
        jnp.asarray([theta], jnp.float32)))

    def direct_rot(img, th):
        hh, ww = img.shape[1:3]
        cy, cx = (hh - 1) / 2, (ww - 1) / 2
        r, c = np.meshgrid(np.arange(hh), np.arange(ww), indexing="ij")
        xr, yr = c - cx, r - cy
        sx = np.cos(th) * xr - np.sin(th) * yr + cx
        sy = np.sin(th) * xr + np.cos(th) * yr + cy
        x0, y0 = np.floor(sx), np.floor(sy)
        wx, wy = sx - x0, sy - y0
        acc = np.zeros_like(img)
        for dy in (0, 1):
            for dx in (0, 1):
                ix, iy = (x0 + dx).astype(int), (y0 + dy).astype(int)
                inside = (ix >= 0) & (ix < ww) & (iy >= 0) & (iy < hh)
                w = (wx if dx else 1 - wx) * (wy if dy else 1 - wy)
                v = img[:, np.clip(iy, 0, hh - 1), np.clip(ix, 0, ww - 1), :]
                acc += v * inside[None, :, :, None] * w[None, :, :, None]
        return acc

    ref = direct_rot(x, -theta)
    err = np.abs(out - ref)[:, 8:-8, 8:-8, :].mean()
    assert err < 0.01, f"rotation interior error {err:.4f}"
    # and it is a real rotation, not a near-identity
    assert np.abs(out - x)[:, 8:-8, 8:-8, :].mean() > 0.05


def test_emifgsm_bar_grad_loop_parity():
    """EMI-FGSM full trajectory (``gradient/emifgsm.py:75-106``): the
    num_sample points along the PREVIOUS iteration's l1-normalized gradient
    (bar_grad starts at 0 → first iteration samples the center num_sample
    times), batch-concat logits, MI momentum.  Fully deterministic."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(31)
    rng = np.random.RandomState(11)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, epoch = 16 / 255, 1.6 / 255, 1.0, 10
    n_sample, radius = 5, 7.0

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    bar_grad = torch.zeros_like(xt)
    factors = np.linspace(-radius, radius, n_sample)
    for _ in range(epoch):
        pts = torch.cat([xt + delta + float(f) * alpha * bar_grad
                         for f in factors])
        loss = tnn.functional.cross_entropy(
            torch_forward(tmodel, pts), yt.repeat(n_sample))
        grad = torch.autograd.grad(loss, delta)[0]
        bar_grad = _mi_normalize(grad).detach()
        momentum = decay * momentum + _mi_normalize(grad)
        d = torch.clamp(delta.data + alpha * momentum.sign(), -eps, eps)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("emifgsm")(
        model_name="resnet18", pretrained=False, input_size=64,
        num_sample=n_sample, radius=radius, epoch=epoch)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"EMI-FGSM delta sign agreement {agree:.4f}"


def test_aifgtm_adam_tanh_loop_parity():
    """AI-FGTM full trajectory (``gradient/aifgtm.py:60-106``): mu-scaled
    first/second moment accumulators, the bias-correction alpha schedule
    summing to eps, and the lam-scaled tanh step.  Deterministic."""
    import math

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(32)
    rng = np.random.RandomState(12)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, epoch = 16 / 255, 10
    b1, b2, lam, mu1, mu2 = 0.9, 0.99, 1.3, 1.5, 1.9

    corr = [(1 - b1 ** (t + 1)) / math.sqrt(1 - b2 ** (t + 1))
            for t in range(epoch)]
    alphas = [eps / sum(corr) * c for c in corr]

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    v = torch.zeros_like(xt)
    for t in range(epoch):
        loss = tnn.functional.cross_entropy(
            torch_forward(tmodel, xt + delta), yt)
        grad = torch.autograd.grad(loss, delta)[0]
        momentum = momentum + mu1 * grad
        v = v + mu2 * grad * grad
        direction = lam * momentum / (v.sqrt() + 1e-20)
        d = torch.clamp(delta.data + alphas[t] * direction.tanh(), -eps, eps)
        # reference clamps to the image box only (update_delta, aifgtm.py:57)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("aifgtm")(
        model_name="resnet18", pretrained=False, input_size=64, epoch=epoch)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.95, f"AI-FGTM delta sign agreement {agree:.4f}"
    # tanh steps: the delta must NOT be a pure ±eps staircase
    interior = (np.abs(ours) > 1e-6) & (np.abs(np.abs(ours) - eps) > 1e-4)
    assert interior.mean() > 0.1


def test_smifgrm_rescaled_momentum_loop_parity():
    """SMI-FGRM full trajectory (``gradient/smifgrm.py:45-102``) at beta=0:
    the depth-first walk collapses to num_neighbor center evaluations,
    leaving the log2-rescale applied to the STORED momentum (the reference
    reassigns momentum = rescale(momentum) before the sign step, so the
    next iteration accumulates from the rescaled value)."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(33)
    rng = np.random.RandomState(14)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, epoch, factor = 16 / 255, 1.6 / 255, 1.0, 10, 2.0
    n_nb = 3

    def rescale(g):
        la = (g.abs() + 1e-38).log2()
        mean = la.mean(dim=(1, 2, 3), keepdim=True)
        std = la.std(dim=(1, 2, 3), keepdim=True)
        return factor * g.sign() * torch.sigmoid((la - mean) / (std + 1e-12))

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        grad = 0
        for _ in range(n_nb):  # beta=0: every walk point is the center
            loss = tnn.functional.cross_entropy(
                torch_forward(tmodel, xt + delta), yt)
            grad = grad + torch.autograd.grad(loss, delta)[0]
        grad = grad / n_nb
        momentum = decay * momentum + _mi_normalize(grad)
        momentum = rescale(momentum)
        d = torch.clamp(delta.data + alpha * momentum.sign(), -eps, eps)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("smifgrm")(
        model_name="resnet18", pretrained=False, input_size=64,
        beta=0.0, num_neighbor=n_nb, epoch=epoch)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"SMI-FGRM delta sign agreement {agree:.4f}"
