"""I-FGS²M — staircase sign method (reference:
``transferattack/gradient/ifgssm.py``).

'Staircase Sign Method for Boosting Adversarial Attacks': replaces sign(g)
with a per-channel percentile staircase — pixels in higher |g| percentile
bins step proportionally farther (``ifgssm.py:39-56``).  The reference's
64-iteration Python threshold loop becomes one vectorized bin search.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..attack import AttackState
from .mifgsm import MIFGSM


def staircase_sign(noise, k: float):
    """sign(noise) weighted by percentile-bin magnitude (``ifgssm.py:39-56``).

    Per (image, channel): thresholds at percentiles k, 2k, …, 100 of |noise|
    ('lower' interpolation); an element in bin j gets magnitude k/100·(1+2j).
    """
    B, H, W, C = noise.shape
    abs_n = jnp.abs(noise)
    qs = jnp.asarray(np.arange(k, 100.1, k) / 100.0, noise.dtype)  # (Q,)
    flat = abs_n.transpose(0, 3, 1, 2).reshape(B, C, H * W)
    med = jnp.quantile(flat, qs, axis=-1, method="lower")  # (Q, B, C)
    med = med.transpose(1, 2, 0)  # (B, C, Q)
    # first bin j with |noise| <= med[j]  ==  count of thresholds < |noise|
    idx = jnp.sum(abs_n[..., None] > med[:, None, None, :, :], axis=-1)
    base = k / 100.0
    weights = base * (1.0 + 2.0 * idx.astype(noise.dtype))
    return jnp.sign(noise) * weights


class IFGSSM(MIFGSM):
    """Official args (``ifgssm.py:24``): k=1.5625 (64 bins), decay=0."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 k=1.5625, targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="I-FGSSM", **kwargs):
        kwargs.pop("decay", None)
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=0.0,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.k = float(k)

    def update_delta(self, delta, x, grad_dir):
        from ..utils import img_max, img_min

        delta = jnp.clip(
            delta + self.alpha * staircase_sign(grad_dir, self.k),
            -self.eps, self.eps,
        )
        return jnp.clip(x + delta, img_min, img_max) - x
