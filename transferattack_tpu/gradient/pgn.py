"""PGN — penalizing gradient norm (reference: ``transferattack/gradient/pgn.py``).

'Boosting Adversarial Transferability by Penalizing Gradient Norm' — each of
``num_neighbor=20`` samples takes a gradient at a random neighbor and a second
gradient at the predicted descent point, then mixes them (``pgn.py:44-77``).
Both inner gradients run inside one scanned sample body.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState, l1_normalize, mean_over_keys


class PGN(Attack):
    """Official args (``pgn.py``): beta=3.0, gamma=0.5, num_neighbor=20,
    alpha=eps/epoch."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, beta=3.0,
                 gamma=0.5, num_neighbor=20, decay=1.0, targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 sample_chunk=4, attack="PGN", **kwargs):
        kwargs.pop("alpha", None)
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=eps / epoch,
                         decay=decay, targeted=targeted, random_start=random_start,
                         norm=norm, loss=loss, attack=attack, **kwargs)
        self.zeta = beta * self.eps
        self.gamma = float(gamma)
        self.num_neighbor = int(num_neighbor)
        self.sample_chunk = int(sample_chunk)

    def get_grad(self, variables, x, y, state: AttackState, key):
        def sample_grad(k):
            k1, k2, k3 = jax.random.split(k, 3)
            noise = jax.random.uniform(
                k1, x.shape, x.dtype, minval=-self.zeta, maxval=self.zeta
            )
            x_near = x + state.delta + noise
            g1 = self.input_grad(variables, x_near, y, state, k2)
            x_next = x_near - self.alpha * l1_normalize(g1)
            g2 = self.input_grad(variables, x_next, y, state, k3)
            return (1 - self.gamma) * g1 + self.gamma * g2

        avg = mean_over_keys(sample_grad, key, self.num_neighbor, self.sample_chunk)
        return avg, {}
