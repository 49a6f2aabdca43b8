"""Loop-level parity twins, stage 6: the neighborhood-estimator tail.

VA-I-FGSM's auxiliary-label multi-step update, VNI-FGSM's variance tuning
with the post-momentum neighbor sweep, GAA's two-step lookahead fusion,
MEF's conditional sampling + PGIA recurrence, and FGSRA's spectral neighbor
relevance weighting.

Stochastic draws are PAIRED: each attack exposes a noise seam
(``neighbor_noise`` / ``spectral_draws`` / ``sample_aux_labels``) that the
test subclass overrides with a pre-drawn numpy bank indexed by
``state.step``; the torch transcription consumes the identical bank, so
these run at the deterministic tolerance.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tests.test_attack_parity import _fresh_pair, torch_forward  # noqa: E402


def _mi_norm(g):
    return g / g.abs().mean(dim=(1, 2, 3), keepdim=True)


def test_vaifgsm_aux_label_loop_parity():
    """VA-I-FGSM full trajectory (``gradient/vaifgsm.py:77-122``): one
    forward per iteration, a sign step on the true-label CE gradient then a
    negated sign step per auxiliary label (all grads from the same retained
    logits), image-box clip after every step, eps-ball clip only at the
    very end.  Aux labels injected identically on both sides.

    Horizon 5: VA-I-FGSM steps on RAW gradient signs (no momentum
    smoothing), so near-zero components flip with f32 rounding and the
    trajectories drift chaotically past ~5 iterations (agreement
    1.0/0.9996/1.0/0.989/0.998/0.972 at iters 1-6, perfect at iter 1)."""
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(71)
    rng = np.random.RandomState(71)
    B = 2
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)
    eps, alpha, epoch, aux_num = 16 / 255, 0.007, 5, 2
    # fixed distinct aux labels != true label
    aux = np.stack([(y + 3 + 11 * i) % 1000 for i in range(aux_num)])

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt)
    for _ in range(epoch):
        d = delta.clone().requires_grad_(True)
        logits = torch_forward(tmodel, xt + d)
        losses = [F.cross_entropy(logits, yt)]
        for i in range(aux_num):
            losses.append(-F.cross_entropy(
                logits, torch.from_numpy(aux[i]).long()))
        grads = [torch.autograd.grad(l, d, retain_graph=True)[0]
                 for l in losses]
        for g in grads:
            delta = delta + alpha * g.sign()
            delta = torch.clamp(xt + delta, 0, 1) - xt
    ref = torch.clamp(delta, -eps, eps).numpy()

    VAIFGSM = ta.load_attack_class("vaifgsm")

    class _Fixed(VAIFGSM):
        def sample_aux_labels(self, key, yy, num_classes):
            return jnp.asarray(aux)

    atk = _Fixed(model_name="resnet18", pretrained=False, input_size=64,
                 epoch=epoch, alpha=alpha, aux_num=aux_num)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"VA-I-FGSM delta sign agreement {agree:.4f}"


def test_vnifgsm_variance_loop_parity():
    """VNI-FGSM full trajectory (``gradient/vmifgsm.py:42-96`` +
    ``vnifgsm.py:58-60``): main gradient at the OLD momentum's Nesterov
    lookahead, momentum from grad + previous variance, THEN the neighbor
    sweep at the NEW momentum's lookahead for the next variance.  One
    neighbor with an injected draw per iteration pins the ordering."""
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(72)
    rng = np.random.RandomState(72)
    B = 2
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)
    eps, alpha, decay, epoch, beta = 16 / 255, 1.6 / 255, 1.0, 8, 1.5
    radius = beta * eps
    bank = rng.uniform(-radius, radius,
                       size=(epoch, B, 64, 64, 3)).astype(np.float32)

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt)
    momentum = torch.zeros_like(xt)
    variance = torch.zeros_like(xt)
    for it in range(epoch):
        d = delta.clone().requires_grad_(True)
        point = xt + d + alpha * decay * momentum
        loss = F.cross_entropy(torch_forward(tmodel, point), yt)
        grad = torch.autograd.grad(loss, d)[0]
        momentum = decay * momentum + _mi_norm(grad + variance)
        d = delta.clone().requires_grad_(True)
        npoint = xt + d + torch.from_numpy(bank[it]) \
            + alpha * decay * momentum
        nloss = F.cross_entropy(torch_forward(tmodel, npoint), yt)
        variance = torch.autograd.grad(nloss, d)[0] - grad
        delta = torch.clamp(delta + alpha * momentum.sign(), -eps, eps)
        delta = torch.clamp(xt + delta, 0, 1) - xt
    ref = delta.numpy()

    VNIFGSM = ta.load_attack_class("vnifgsm")
    jbank = jnp.asarray(bank)

    class _Fixed(VNIFGSM):
        def neighbor_noise(self, key, xx, state):
            return jbank[state.step]

    atk = _Fixed(model_name="resnet18", pretrained=False, input_size=64,
                 epoch=epoch, beta=beta, num_neighbor=1, sample_chunk=1)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"VNI-FGSM delta sign agreement {agree:.4f}"


def test_gaa_lookahead_fusion_loop_parity():
    """GAA full trajectory (``gradient/gaa.py:44-121``): per sample a
    xi-ball draw clipped to the image box, gradient g', L1-normalized
    rho-lookahead to x_hat, gradient g_hat, fused as
    g_hat + (1-λ)g' + (1+λ)g_hat; per-sample L1-SUM-normalized momentum and
    alpha = eps/epoch."""
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(73)
    rng = np.random.RandomState(73)
    B = 2
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)
    eps, decay, epoch = 16 / 255, 1.0, 6
    rho, lam = 1.6 / 255, 0.2
    xi = 3.5 * eps
    alpha = eps / epoch
    bank = rng.uniform(-xi, xi, size=(epoch, B, 64, 64, 3)).astype(np.float32)

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt)
    momentum = torch.zeros_like(xt)
    for it in range(epoch):
        x_prime = torch.clamp(
            xt + delta + torch.from_numpy(bank[it]), 0, 1
        ).requires_grad_(True)
        loss = F.cross_entropy(torch_forward(tmodel, x_prime), yt)
        g_prime = torch.autograd.grad(loss, x_prime)[0]
        n1 = g_prime.abs().sum(dim=(1, 2, 3), keepdim=True)
        x_hat = (x_prime.detach() + rho * g_prime / (n1 + 1e-8)
                 ).requires_grad_(True)
        loss2 = F.cross_entropy(torch_forward(tmodel, x_hat), yt)
        g_hat = torch.autograd.grad(loss2, x_hat)[0]
        g_bar = g_hat + (1 - lam) * g_prime + (1 + lam) * g_hat
        gn = g_bar.abs().sum(dim=(1, 2, 3), keepdim=True)
        momentum = decay * momentum + g_bar / (gn + 1e-8)
        delta = torch.clamp(delta + alpha * momentum.sign(), -eps, eps)
        delta = torch.clamp(xt + delta, 0, 1) - xt
    ref = delta.numpy()

    GAA = ta.load_attack_class("gaa")
    jbank = jnp.asarray(bank)

    class _Fixed(GAA):
        def neighbor_noise(self, key, xx, state):
            return jbank[state.step]

    atk = _Fixed(model_name="resnet18", pretrained=False, input_size=64,
                 epoch=epoch, rho=rho, lambda_param=lam, N=1, sample_chunk=1)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"GAA delta sign agreement {agree:.4f}"


def test_mef_pgia_loop_parity():
    """MEF full trajectory (``gradient/mef.py:57-128``): per-neighbor
    conditional samples delta + u(±2eps) + 0.15eps·grad_pgia, mean gradient
    over neighbors, PGIA recurrence normalized-grad − 0.9·pgia, momentum on
    the neighbor SUM with decay 0.5."""
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(74)
    rng = np.random.RandomState(74)
    B, n = 2, 2
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)
    eps, alpha, epoch = 16 / 255, 1.6 / 255, 6
    gamma, kesai, inner_decay, decay = 2.0 * eps, 0.15 * eps, 0.9, 0.5
    bank = rng.uniform(-gamma, gamma,
                       size=(epoch, n, B, 64, 64, 3)).astype(np.float32)

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt)
    momentum = torch.zeros_like(xt)
    pgia = torch.zeros((n, B, 64, 64, 3))
    for it in range(epoch):
        sample_delta = delta[None] + torch.from_numpy(bank[it]) + kesai * pgia
        grads = []
        for i in range(n):
            p = (xt + sample_delta[i]).detach().requires_grad_(True)
            loss = F.cross_entropy(torch_forward(tmodel, p), yt)
            grads.append(torch.autograd.grad(loss, p)[0])
        gradient = torch.stack(grads) / n
        denom = gradient.abs().mean(dim=(2, 3, 4), keepdim=True)
        pgia = gradient / denom - inner_decay * pgia
        momentum = decay * momentum + _mi_norm(gradient.sum(0))
        delta = torch.clamp(delta + alpha * momentum.sign(), -eps, eps)
        delta = torch.clamp(xt + delta, 0, 1) - xt
    ref = delta.numpy()

    MEF = ta.load_attack_class("mef")
    jbank = jnp.asarray(bank)

    class _Fixed(MEF):
        def neighbor_noise(self, key, xx, state):
            return jbank[state.step]

    atk = _Fixed(model_name="resnet18", pretrained=False, input_size=64,
                 epoch=epoch, num_neighbor=n)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"MEF delta sign agreement {agree:.4f}"


def _ref_dct(x):
    """Reference FFT-based unnormalized DCT-II (``fgsra.py:49-73``)."""
    x_shape = x.shape
    N = x_shape[-1]
    x = x.contiguous().view(-1, N)
    v = torch.cat([x[:, ::2], x[:, 1::2].flip([1])], dim=1)
    Vc = torch.fft.fft(v)
    k = -torch.arange(N, dtype=torch.float32)[None, :] * np.pi / (2 * N)
    V = Vc.real * torch.cos(k) - Vc.imag * torch.sin(k)
    return (2 * V).view(*x_shape)


def _ref_idct(X):
    """Reference FFT-based inverse (``fgsra.py:75-107``)."""
    x_shape = X.shape
    N = x_shape[-1]
    X_v = X.contiguous().view(-1, N) / 2
    k = torch.arange(N, dtype=torch.float32)[None, :] * np.pi / (2 * N)
    W_r, W_i = torch.cos(k), torch.sin(k)
    V_t_r = X_v
    V_t_i = torch.cat([X_v[:, :1] * 0, -X_v.flip([1])[:, :-1]], dim=1)
    V_r = V_t_r * W_r - V_t_i * W_i
    V_i = V_t_r * W_i + V_t_i * W_r
    v = torch.fft.ifft(torch.complex(V_r, V_i))
    out = v.new_zeros(v.shape)
    out[:, ::2] += v[:, : N - (N // 2)]
    out[:, 1::2] += v.flip([1])[:, : N // 2]
    return out.view(*x_shape).real


def _ref_dct_2d(x):
    X1 = _ref_dct(x)
    return _ref_dct(X1.transpose(-1, -2)).transpose(-1, -2)


def _ref_idct_2d(x):
    X1 = _ref_idct(x)
    return _ref_idct(X1.transpose(-1, -2)).transpose(-1, -2)


def test_fgsra_spectral_loop_parity():
    """FGSRA full trajectory (``gradient/fgsra.py:154-216``): per neighbor
    idct(dct(x+gauss)·mask) with the reference's own unnormalized FFT DCT
    pair, gradient w.r.t. delta THROUGH the DCT chain, input-space cosine
    relevance weights, gradient-space cosine fusion with the current
    gradient, and the GRA-style 0.94 decay indicator scaling alpha.

    Also the live check of the orthonormal-vs-unnormalized DCT equivalence
    claim in ``ops/dct.py``: the torch side uses the reference's FFT pair,
    the repo side its orthonormal matmul DCT."""
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(75)
    rng = np.random.RandomState(75)
    B, n = 2, 2
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)
    eps, alpha, decay, epoch = 16 / 255, 1.6 / 255, 1.0, 6
    rho, beta = 0.7, 2.0
    gauss_bank = rng.uniform(-eps * beta, eps * beta,
                             size=(epoch, n, B, 64, 64, 3)).astype(np.float32)
    mask_bank = rng.uniform(1 - rho, 1 + rho,
                            size=(epoch, n, B, 64, 64, 3)).astype(np.float32)

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt)
    momentum = torch.zeros_like(xt)
    m = torch.ones_like(xt) * 10 / 9.4
    for it in range(epoch):
        d = delta.clone().requires_grad_(True)
        xadv = xt + d
        loss = F.cross_entropy(torch_forward(tmodel, xadv), yt)
        current_grad = torch.autograd.grad(loss, d)[0]
        avg_grad = torch.zeros_like(xt)
        for i in range(n):
            d = delta.clone().requires_grad_(True)
            xadv = xt + d
            gauss = torch.from_numpy(gauss_bank[it, i])
            mask = torch.from_numpy(mask_bank[it, i])
            # DCT over H,W: NHWC → NCHW for the last-two-dims transform
            nchw = (xadv + gauss).permute(0, 3, 1, 2)
            x_dct = _ref_dct_2d(nchw)
            x_idct = _ref_idct_2d(
                x_dct * mask.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            loss_i = F.cross_entropy(torch_forward(tmodel, x_idct), yt)
            grad_i = torch.autograd.grad(loss_i, d)[0]
            num = (xadv.detach() * x_idct.detach()).sum(
                dim=(1, 2, 3), keepdim=True)
            den = xadv.detach().pow(2).sum((1, 2, 3), keepdim=True).sqrt() \
                * x_idct.detach().pow(2).sum((1, 2, 3), keepdim=True).sqrt()
            avg_grad = avg_grad + grad_i * (num / den)
        cs = (current_grad * avg_grad).sum(dim=(1, 2, 3), keepdim=True) / (
            current_grad.pow(2).sum((1, 2, 3), keepdim=True).sqrt()
            * avg_grad.pow(2).sum((1, 2, 3), keepdim=True).sqrt())
        current = cs * current_grad + (1 - cs) * avg_grad
        momentum = decay * momentum + _mi_norm(current)
        eqm = (torch.sign(momentum) == torch.sign(current)).float()
        m = m * (eqm + (1 - eqm) * 0.94)
        delta = torch.clamp(delta + alpha * m * momentum.sign(), -eps, eps)
        delta = torch.clamp(xt + delta, 0, 1) - xt
    ref = delta.numpy()

    FGSRA = ta.load_attack_class("fgsra")
    jg, jm = jnp.asarray(gauss_bank), jnp.asarray(mask_bank)

    class _Fixed(FGSRA):
        def spectral_draws(self, key, xx, state):
            return jg[state.step], jm[state.step]

    atk = _Fixed(model_name="resnet18", pretrained=False, input_size=64,
                 epoch=epoch, rho=rho, beta=beta, max_iter=n)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"FGSRA delta sign agreement {agree:.4f}"
