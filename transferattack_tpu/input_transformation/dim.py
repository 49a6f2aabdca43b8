"""DIM / DEM — diverse input & ensemble variant (reference:
``transferattack/input_transformation/{dim,dem}.py``).

DIM: with prob 0.5, resize to a random size in [224, 246) then random-pad to
246 and resize back (``dim.py:42-68``).  The reference's data-dependent
resize/pad becomes one static-shape ``jax.image.scale_and_translate`` — the
same continuous operation without leaving the compiled program.

DEM: an ensemble of 5 DIM region sizes whose logits are averaged, with
diversity_prob=1 and step size = eps (``dem.py:30-117``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import AttackState
from ..gradient.mifgsm import MIFGSM


def random_resize_pad(x, key, resize_rate: float, diversity_prob: float):
    """One DIM draw: downscale into a (rate·size) canvas at a random offset,
    viewed at the original resolution."""
    H, W = x.shape[1], x.shape[2]
    large = float(int(H * resize_rate))
    k1, k2, k3, k4 = jax.random.split(key, 4)
    rnd = jax.random.randint(k1, (), min(H, int(large)), max(H, int(large))).astype(
        x.dtype
    )
    top = jax.random.uniform(k2, (), x.dtype) * (large - rnd)
    left = jax.random.uniform(k3, (), x.dtype) * (large - rnd)
    scale = rnd / large
    out = jax.image.scale_and_translate(
        x, x.shape, (1, 2),
        jnp.stack([scale, scale]),
        jnp.stack([top * H / large, left * W / large]),
        method="linear",
    )
    apply = jax.random.uniform(k4, (), x.dtype) < diversity_prob
    return jnp.where(apply, out, x)


class DIM(MIFGSM):
    """Official args (``dim.py:34``): resize_rate=1.1, diversity_prob=0.5."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, resize_rate=1.1, diversity_prob=0.5, targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 attack="DIM", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        if resize_rate < 1:
            raise ValueError("resize rate should be larger than 1")
        self.resize_rate = float(resize_rate)
        self.diversity_prob = float(diversity_prob)

    def transform(self, x, state: AttackState, key):
        return random_resize_pad(x, key, self.resize_rate, self.diversity_prob)[None]


class DEM(MIFGSM):
    """Official args (``dem.py:40``): resize_rates=[1.14,1.27,1.4,1.53,1.66],
    diversity_prob=1, alpha=eps (region fitting)."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, decay=1.0,
                 resize_rates=(1.14, 1.27, 1.4, 1.53, 1.66), targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 attack="DEM", **kwargs):
        kwargs.pop("alpha", None)
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=eps, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.resize_rates = tuple(resize_rates)

    def get_grad(self, variables, x, y, state: AttackState, key):
        keys = jax.random.split(key, len(self.resize_rates))

        def loss_fn(delta):
            xadv = x + delta
            logits = 0.0
            for rate, k in zip(self.resize_rates, list(keys)):
                xt = random_resize_pad(xadv, k, rate, 1.0)
                logits = logits + self.model.apply(variables, xt)
            logits = logits / len(self.resize_rates)
            return self.get_loss(logits[None], y)

        return jax.grad(loss_fn)(state.delta), {}
