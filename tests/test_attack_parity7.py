"""Loop-level parity twins, stage 7: the copy-stack transform tail.

MaskBlock's zeroed-grid-cell copies (deterministic), US-MM's
scale × mix-mask copies with gradients taken AT the transformed points
(not back-propagated through the scale/mask chain), and MFI's soft
frequency mixing through the FFT.

Stochastic draws are paired through the ``mix_perms`` / ``mix_draws``
seams with pre-drawn numpy banks indexed by ``state.step``, so all three
run at the deterministic sign-agreement bar.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tests.test_attack_parity import _fresh_pair, torch_forward  # noqa: E402


def _mi_norm(g):
    return g / g.abs().mean(dim=(1, 2, 3), keepdim=True)


def test_maskblock_loop_parity():
    """MaskBlock full trajectory (``input_transformation/maskblock.py:41-60``):
    one copy per patch_size grid cell with that cell zeroed, row-major order,
    mean CE over all copies, alpha=2/255.  Fully deterministic."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(81)
    rng = np.random.RandomState(81)
    B = 2
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)
    eps, alpha, decay, epoch, ps = 16 / 255, 2 / 255, 1.0, 10, 32

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        d = delta.clone().requires_grad_(True)
        xadv = xt + d
        copies = []
        for i in range(0, 64, ps):
            for j in range(0, 64, ps):
                c = xadv.clone()
                c[:, i : i + ps, j : j + ps, :] = 0
                copies.append(c)
        n = len(copies)
        logits = torch_forward(tmodel, torch.cat(copies, 0))
        loss = F.cross_entropy(logits, yt.repeat(n))
        grad = torch.autograd.grad(loss, d)[0]
        momentum = decay * momentum + _mi_norm(grad)
        delta = torch.clamp(delta + alpha * momentum.sign(), -eps, eps)
        delta = torch.clamp(xt + delta, 0, 1) - xt
    ref = delta.numpy()

    atk = ta.load_attack_class("maskblock")(
        model_name="resnet18", pretrained=False, input_size=64,
        epoch=epoch, patch_size=ps)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"MaskBlock delta sign agreement {agree:.4f}"


def test_usmm_detached_point_grad_loop_parity():
    """US-MM full trajectory (``input_transformation/usmm.py:46-103``):
    5 uniform scales × 3 mix masks (fresh shuffled-batch perm per
    (mix, scale) copy, ``usmm.py:52``), copies clamped to [0,1], gradient
    taken w.r.t. the DETACHED transformed points and SUMMED over copies
    (``usmm.py:85-90``) — the scale/mask chain is not back-propagated."""
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(82)
    rng = np.random.RandomState(82)
    B = 2
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)
    eps, alpha, decay, epoch = 16 / 255, 1.6 / 255, 1.0, 8
    s_lo, s_hi, n_scale, n_mix, mix_range = 0.1, 0.75, 5, 3, 0.5
    scales = [s_lo + (s_hi - s_lo) * i / (n_scale - 1) for i in range(n_scale)]
    # one permutation per (epoch, mix, scale)
    perm_bank = np.stack([
        np.stack([np.stack([np.random.RandomState(82_000 + 100 * e + 10 * m + s)
                            .permutation(B) for s in range(n_scale)])
                  for m in range(n_mix)]) for e in range(epoch)
    ]).astype(np.int32)

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt)
    momentum = torch.zeros_like(xt)
    for it in range(epoch):
        xadv = xt + delta
        copies = []
        for m in range(n_mix):
            for s, scale in enumerate(scales):
                perm = torch.from_numpy(perm_bank[it, m, s]).long()
                mask = (1 - mix_range) + 2 * mix_range * xadv[perm].detach()
                copies.append((xadv * scale) * mask)
        n = len(copies)
        x_trans = torch.clamp(torch.cat(copies, 0), 0, 1
                              ).clone().detach().requires_grad_(True)
        logits = torch_forward(tmodel, x_trans)
        loss = F.cross_entropy(logits, yt.repeat(n))
        g = torch.autograd.grad(loss, x_trans)[0]
        grad = torch.stack(g.split(B)).sum(0)
        momentum = decay * momentum + _mi_norm(grad)
        delta = torch.clamp(delta + alpha * momentum.sign(), -eps, eps)
        delta = torch.clamp(xt + delta, 0, 1) - xt
    ref = delta.numpy()

    USMM = ta.load_attack_class("usmm")
    jbank = jnp.asarray(perm_bank)

    class _Fixed(USMM):
        def mix_perms(self, key, BB, state):
            return jbank[state.step]

    atk = _Fixed(model_name="resnet18", pretrained=False, input_size=64,
                 epoch=epoch)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"US-MM delta sign agreement {agree:.4f}"


def test_mfi_soft_frequency_mix_loop_parity():
    """MFI full trajectory (``input_transformation/mfi.py:84-165``): per
    sample a shuffled-batch pool, soft radial sigmoid mask
    sigmoid(-(dist-r)/10), SMFI blend X·m_l + α·X·m_h + (1-α)·M·m_h through
    fft2/fftshift, + N(0,(σ/255)²) noise, then 5 SIM scales (scale-major
    copy order).  Gradients chain through the FFT.  The reference's
    ``get_loss`` references a nonexistent ``num_admix`` (latent crash); the
    twin transcribes the intended label repeat by the actual copy count."""
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(83)
    rng = np.random.RandomState(83)
    B, n_sample, n_scale = 2, 3, 5
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)
    eps, alpha_step, decay, epoch = 16 / 255, 1.6 / 255, 1.0, 6
    radius, sigma = 10, 32.0
    perm_bank = np.stack([np.stack([
        np.random.RandomState(83_000 + 10 * e + s).permutation(B)
        for s in range(n_sample)]) for e in range(epoch)]).astype(np.int32)
    alpha_bank = rng.rand(epoch, n_sample).astype(np.float32)
    noise_bank = rng.randn(epoch, n_sample, B, 64, 64, 3).astype(np.float32)

    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    dist = np.sqrt((yy - 32.0) ** 2 + (xx - 32.0) ** 2)
    mask_l = torch.from_numpy(
        1.0 / (1.0 + np.exp((dist - radius) / 10.0))
    ).float()[None, :, :, None]
    mask_h = 1.0 - mask_l

    def fft2s(t):  # NHWC, fft over H,W
        return torch.fft.fftshift(torch.fft.fft2(t, dim=(1, 2)), dim=(1, 2))

    def ifft2s(t):
        return torch.fft.ifft2(
            torch.fft.ifftshift(t, dim=(1, 2)), dim=(1, 2)).real

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt)
    momentum = torch.zeros_like(xt)
    for it in range(epoch):
        d = delta.clone().requires_grad_(True)
        xadv = xt + d
        mixed = []
        for s in range(n_sample):
            pool = xadv[torch.from_numpy(perm_bank[it, s]).long()].detach()
            X, M = fft2s(xadv), fft2s(pool)
            a = float(alpha_bank[it, s])
            mix = X * mask_l + a * (X * mask_h) + (1 - a) * (M * mask_h)
            out = ifft2s(mix) + torch.from_numpy(noise_bank[it, s]) * (
                sigma / 255.0)
            mixed.append(out)
        mixed = torch.cat(mixed, 0)  # (3B,...)
        copies = torch.cat([mixed / 2 ** i for i in range(n_scale)], 0)
        n = n_sample * n_scale
        logits = torch_forward(tmodel, copies)
        loss = F.cross_entropy(logits, yt.repeat(n))
        grad = torch.autograd.grad(loss, d)[0]
        momentum = decay * momentum + _mi_norm(grad)
        delta = torch.clamp(delta + alpha_step * momentum.sign(), -eps, eps)
        delta = torch.clamp(xt + delta, 0, 1) - xt
    ref = delta.numpy()

    MFI = ta.load_attack_class("mfi")
    jp = jnp.asarray(perm_bank)
    ja = jnp.asarray(alpha_bank)
    jn = jnp.asarray(noise_bank)

    class _Fixed(MFI):
        def mix_draws(self, key, xx_, state):
            return jp[state.step], ja[state.step], jn[state.step]

    atk = _Fixed(model_name="resnet18", pretrained=False, input_size=64,
                 epoch=epoch, mask_radius=radius, gaussian_sigma=sigma)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"MFI delta sign agreement {agree:.4f}"
