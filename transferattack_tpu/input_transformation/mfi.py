"""MFI — mixed-frequency inputs (reference:
``transferattack/input_transformation/mfi.py``).

Swaps/blends high-frequency FFT components with a shuffled-batch image inside
a radial mask, adds gaussian noise, then applies SIM scaling — num_sample=3
mixes × num_scale=5 scales.  (The reference's ``get_loss`` references a
nonexistent ``num_admix`` attribute — a latent crash; we repeat labels by the
actual copy count.)  Gradients chain through the FFT like the reference's
autograd.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..attack import AttackState
from ..gradient.mifgsm import MIFGSM


@functools.lru_cache(maxsize=8)
def _radial_mask(H: int, W: int, radius: int, soft: bool, softness: float = 10.0):
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    dist = np.sqrt((yy - H // 2) ** 2 + (xx - W // 2) ** 2)
    if soft:
        mask = 1.0 / (1.0 + np.exp((dist - radius) / softness))
    else:
        mask = (dist <= radius).astype(np.float32)
    return mask.astype(np.float32)[None, :, :, None]


def _fft2_shift(x):
    X = jnp.fft.fft2(x, axes=(1, 2))
    return jnp.fft.fftshift(X, axes=(1, 2))


def _ifft2_shift(X):
    X = jnp.fft.ifftshift(X, axes=(1, 2))
    return jnp.fft.ifft2(X, axes=(1, 2)).real


class MFI(MIFGSM):
    """Official args (``mfi.py:33``): mask_radius=100, gaussian_sigma=32,
    mfi_type='smfi', num_sample=3, num_scale=5."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, mask_radius=100, gaussian_sigma=32, mfi_type="smfi",
                 targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="MFI", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.mask_radius = int(mask_radius)
        self.gaussian_sigma = float(gaussian_sigma)
        self.mfi_type = mfi_type
        self.num_sample = 3
        self.num_scale = 5

    def num_copies(self):
        return self.num_sample * self.num_scale

    def mix_draws(self, key, x, state):
        """(perms, alphas, noises) for all ``num_sample`` mixes
        (``mfi.py:139-158``) — overridable seam for paired-RNG twins."""
        B = x.shape[0]
        keys = jax.random.split(key, self.num_sample)
        perms, alphas, noises = [], [], []
        for k in keys:
            k1, k2, k3 = jax.random.split(k, 3)
            perms.append(jax.random.permutation(k1, B))
            alphas.append(jax.random.uniform(k2, (), x.dtype))
            noises.append(jax.random.normal(k3, x.shape, x.dtype))
        return jnp.stack(perms), jnp.stack(alphas), jnp.stack(noises)

    def _mix_one(self, x, perm, alpha, noise):
        B, H, W, C = x.shape
        pool = jax.lax.stop_gradient(x[perm])
        X = _fft2_shift(x)
        M = _fft2_shift(pool)
        mask_l = jnp.asarray(
            _radial_mask(H, W, self.mask_radius, soft=self.mfi_type == "smfi"),
            x.dtype,
        )
        mask_h = 1.0 - mask_l
        if self.mfi_type == "hmfi":
            mixed = X * mask_l + M * mask_h
        else:
            mixed = X * mask_l + alpha * (X * mask_h) + (1 - alpha) * (M * mask_h)
        out = _ifft2_shift(mixed)
        return out + noise * (self.gaussian_sigma / 255.0)

    def transform(self, x, state: AttackState, key):
        perms, alphas, noises = self.mix_draws(key, x, state)
        mixed = jnp.stack([
            self._mix_one(x, perms[i], alphas[i], noises[i])
            for i in range(self.num_sample)
        ])  # (3, B, ...)
        scales = 1.0 / 2 ** jnp.arange(self.num_scale, dtype=x.dtype)
        out = scales.reshape(-1, 1, 1, 1, 1, 1) * mixed[None]
        return out.reshape((-1,) + x.shape)
