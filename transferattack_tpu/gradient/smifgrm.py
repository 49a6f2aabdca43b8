"""SMI-FGRM — sampling-based fast gradient rescaling (reference:
``transferattack/gradient/smifgrm.py``).

Depth-first random-walk sampling (each sample adds fresh noise to the previous
point, ``smifgrm.py:46-65``) + log2-rescaled momentum replacing the sign
(``smifgrm.py:67-76``).  The walk is a ``lax.scan`` carrying the walk point.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState


class SMIFGRM(Attack):
    """Official args (``smifgrm.py:31``): beta=1.5, num_neighbor=12,
    rescale_factor=2."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 beta=1.5, num_neighbor=12, rescale_factor=2.0, decay=1.0,
                 targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="SMI-FGRM", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.radius = beta * self.eps
        self.num_neighbor = int(num_neighbor)
        self.rescale_factor = float(rescale_factor)

    def rescale(self, g):
        """sign(g) * sigmoid(standardized log2|g|) * factor (``smifgrm.py:67-76``)."""
        log_abs = jnp.log2(jnp.abs(g) + 1e-38)
        axes = tuple(range(1, g.ndim))
        mean = jnp.mean(log_abs, axis=axes, keepdims=True)
        std = jnp.std(log_abs, axis=axes, keepdims=True, ddof=1)
        norm = (log_abs - mean) / (std + 1e-12)
        return self.rescale_factor * jnp.sign(g) * jax.nn.sigmoid(norm)

    def get_grad(self, variables, x, y, state: AttackState, key):
        # random walk: sample i evaluates at point_{i}, then the point moves
        # by fresh uniform noise (first sample is the unperturbed adversary)
        def body(carry, k):
            point, acc = carry
            k1, k2 = jax.random.split(k)
            g = self.input_grad(variables, point, y, state, k1)
            noise = jax.random.uniform(
                k2, x.shape, x.dtype, minval=-self.radius, maxval=self.radius
            )
            return (point + noise, acc + g), None

        keys = jax.random.split(key, self.num_neighbor)
        (_, total), _ = jax.lax.scan(
            body, (x + state.delta, jnp.zeros_like(x)), keys
        )
        return total / self.num_neighbor, {}

    def get_momentum(self, grad, momentum):
        return self.rescale(super().get_momentum(grad, momentum))
