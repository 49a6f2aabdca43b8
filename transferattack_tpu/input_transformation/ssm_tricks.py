"""SSM 'bag of tricks' variants + ODI (reference:
``transferattack/input_transformation/{ssm_with_tricks.py,odi/odi.py}``).

SSM_H: spectral mask applied only to high frequencies (lowest 5% DCT corner
passes untouched).  SSM_P: everything outside the low-frequency corner is
masked-and-perturbed, the corner zeroed.  (The reference registry maps
``ssm_p`` to a mismatched class name — SURVEY.md §2.2 flags it; both
variants are implemented faithfully here.)

ODI renders the adversary as a texture on random 3D objects through
pytorch3d (``odi/odi.py:238-341``).  Without a JAX rasterizer, the render is
approximated by random perspective + thin-plate warps composited on gray —
the same object-surface-distortion effect, documented as an approximation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import AttackState
from ..ops import affine_warp, dct_2d, idct_2d, gaussian_kernel, smooth_conv
from .ssm import SSM


class SSM_H(SSM):
    """High-frequency SSM (``ssm_with_tricks.py:17-96``)."""

    def __init__(self, *args, mask_ratio=0.05, **kwargs):
        kwargs.setdefault("attack", "SSM_H")
        super().__init__(*args, **kwargs)
        self.mask_ratio = float(mask_ratio)

    def spectrum_point(self, x, key):
        k1, k2 = jax.random.split(key)
        H, W = x.shape[1], x.shape[2]
        gauss = jax.random.normal(k1, x.shape, x.dtype) * self.eps
        mask = jax.random.uniform(
            k2, x.shape, x.dtype, minval=1 - self.rho, maxval=1 + self.rho
        )
        lh, lw = int(H * self.mask_ratio), int(W * self.mask_ratio)
        low = jnp.zeros((H, W), x.dtype).at[:lh, :lw].set(1.0)[None, :, :, None]
        x_dct = dct_2d(x + gauss)
        return idct_2d(x_dct * mask * (1 - low) + x_dct * low)


class SSM_P(SSM):
    """Pixel-trick SSM (``ssm_with_tricks.py:228-330``): the low-frequency
    corner is zeroed; everything else spectrally masked."""

    def __init__(self, *args, mask_ratio=0.05, **kwargs):
        kwargs.setdefault("attack", "SSM_P")
        super().__init__(*args, **kwargs)
        self.mask_ratio = float(mask_ratio)

    def spectrum_point(self, x, key):
        k1, k2 = jax.random.split(key)
        H, W = x.shape[1], x.shape[2]
        gauss = jax.random.normal(k1, x.shape, x.dtype) * self.eps
        mask = jax.random.uniform(
            k2, x.shape, x.dtype, minval=1 - self.rho, maxval=1 + self.rho
        )
        lh, lw = int(H * self.mask_ratio), int(W * self.mask_ratio)
        high = jnp.ones((H, W), x.dtype).at[:lh, :lw].set(0.0)[None, :, :, None]
        return idct_2d(dct_2d(x + gauss) * mask * high)


class ODI(SSM):
    """Object-diverse input (``odi/odi.py:10-515``): targeted, epoch=300,
    logit loss; each copy views the adversary on a randomly-posed surface
    (random perspective warp + shading composited on gray background)."""

    def __init__(self, model_name="resnet50", epoch=300, eps=16 / 255, alpha=2 / 255,
                 decay=1.0, num_views=1, targeted=True, random_start=False,
                 norm="linfty", loss="crossentropy", kernel_size=5,
                 attack="ODI", **kwargs):
        kwargs.pop("num_spectrum", None), kwargs.pop("rho", None)
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.num_views = int(num_views)
        self.kernel = gaussian_kernel(int(kernel_size))

    def _render(self, x, key):
        """Random 'object surface' view: perspective-ish affine + brightness
        shading + gray background outside the warped region."""
        B = x.shape[0]
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        ang = jax.random.uniform(k1, (B,), minval=-0.35, maxval=0.35)
        sc = jax.random.uniform(k2, (B,), minval=0.9, maxval=1.4)
        shear = jax.random.uniform(k3, (B,), minval=-0.25, maxval=0.25)
        tx = jax.random.uniform(k4, (B,), minval=-0.15, maxval=0.15)
        ty = jax.random.uniform(k5, (B,), minval=-0.15, maxval=0.15)
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        theta = jnp.stack(
            [
                jnp.stack([cos * sc, (-sin + shear) * sc, tx], -1),
                jnp.stack([sin * sc, cos * sc, ty], -1),
            ],
            axis=1,
        )
        warped = affine_warp(x, theta)
        ones = affine_warp(jnp.ones_like(x), theta)
        shade = 0.7 + 0.3 * jax.random.uniform(
            jax.random.fold_in(key, 7), (B, 1, 1, 1), x.dtype
        )
        return warped * shade * ones + 0.5 * (1 - ones)

    def get_loss(self, logits, y):
        picked = jnp.take_along_axis(
            logits, jnp.broadcast_to(y[None, :, None], logits.shape[:2] + (1,)),
            axis=-1,
        )
        total = picked.sum()
        return total if self.targeted else -total

    def get_grad(self, variables, x, y, state: AttackState, key):
        def loss_fn(delta):
            total = 0.0
            for i in range(self.num_views):
                view = self._render(x + delta, jax.random.fold_in(key, i))
                logits = self.model.apply(variables, view)
                total = total + self.get_loss(logits[None], y)
            return total / self.num_views

        return jax.grad(loss_fn)(state.delta), {}

    def post_grad(self, grad, state: AttackState):
        return smooth_conv(grad, self.kernel)
