"""MEF — max-min evolutionary flatness (reference:
``transferattack/gradient/mef.py``).

Keeps ``num_neighbor=20`` per-neighbor deltas resampled conditionally each
iteration (previous inverted-gradient direction + fresh uniform noise), takes
a gradient at each, and accumulates their mean into the momentum
(``mef.py:57-128``).  The neighbor axis is a ``lax.map`` inside the scan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState


class MEF(Attack):
    """Official args (``mef.py:28``): num_neighbor=20, gamma=2·eps,
    kesai=0.15·eps, epoch=20, inner_decay=0.9, decay=0.5."""

    def __init__(self, model_name="resnet50", epoch=20, eps=16 / 255, alpha=1.6 / 255,
                 num_neighbor=20, gamma=2.0, kesai=0.15, inner_decay=0.9, decay=0.5,
                 targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="MEF", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.num_neighbor = int(num_neighbor)
        self.gamma = gamma * self.eps
        self.kesai = kesai * self.eps
        self.inner_decay = float(inner_decay)

    def init_extra(self, x, y):
        return {"grad_pgia": jnp.zeros((self.num_neighbor,) + x.shape, x.dtype)}

    def neighbor_noise(self, key, x, state):
        """Per-neighbor uniform draw (``mef.py:59-62``) — overridable seam for
        paired-RNG parity twins."""
        return jax.random.uniform(
            key, (self.num_neighbor,) + x.shape, x.dtype,
            minval=-self.gamma, maxval=self.gamma,
        )

    def get_grad(self, variables, x, y, state: AttackState, key):
        k1, k2 = jax.random.split(key)
        noise = self.neighbor_noise(k1, x, state)
        # conditional samples: delta + noise + kesai·grad_pgia (``mef.py:59-64``)
        sample_delta = state.delta[None] + noise + self.kesai * state.extra["grad_pgia"]

        def one(delta_i):
            return self.input_grad(variables, x + delta_i, y, state, k2)

        grads = jax.lax.map(one, sample_delta)  # (n, B, H, W, C)
        gradient = grads / self.num_neighbor
        axes = tuple(range(2, gradient.ndim))
        denom = jnp.mean(jnp.abs(gradient), axis=axes, keepdims=True)
        grad_pgia = gradient / (denom + 1e-12) - self.inner_decay * state.extra["grad_pgia"]
        return gradient.sum(0), {"grad_pgia": grad_pgia}
