"""GAA — gradient aggregation attack (reference: ``transferattack/gradient/gaa.py``).

Aggregates N pairs of (neighbor gradient, sharpness-aware lookahead gradient)
fused as g_hat + (1-λ)g' + (1+λ)g_hat, with per-sample L1-normalized momentum
(``gaa.py:44-106``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState, mean_over_keys
from ..utils import img_max, img_min


class GAA(Attack):
    """Official args (``gaa.py:33-42``): rho=1.6/255, lambda_param=0.2,
    xi=3.5·eps, N=20, alpha=eps/epoch."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, rho=1.6 / 255,
                 lambda_param=0.2, N=20, decay=1.0, targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 sample_chunk=4, attack="GAA", **kwargs):
        kwargs.pop("alpha", None)
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=eps / epoch,
                         decay=decay, targeted=targeted, random_start=random_start,
                         norm=norm, loss=loss, attack=attack, **kwargs)
        self.rho = float(rho)
        self.lambda_param = float(lambda_param)
        self.xi = 3.5 * self.eps
        self.N = int(N)
        self.sample_chunk = int(sample_chunk)

    def neighbor_noise(self, key, x, state):
        """xi-ball uniform draw (``gaa.py:112-121``) — overridable seam for
        paired-RNG parity twins."""
        return jax.random.uniform(
            key, x.shape, x.dtype, minval=-self.xi, maxval=self.xi
        )

    def get_grad(self, variables, x, y, state: AttackState, key):
        def sample(k):
            k1, k2, k3 = jax.random.split(k, 3)
            pert = self.neighbor_noise(k1, x, state)
            x_prime = jnp.clip(x + state.delta + pert, img_min, img_max)
            g_prime = self.input_grad(variables, x_prime, y, state, k2)
            axes = tuple(range(1, x.ndim))
            n1 = jnp.sum(jnp.abs(g_prime), axis=axes, keepdims=True)
            x_hat = x_prime + self.rho * g_prime / (n1 + 1e-8)
            g_hat = self.input_grad(variables, x_hat, y, state, k3)
            return g_hat + (1 - self.lambda_param) * g_prime + (1 + self.lambda_param) * g_hat

        g_bar = mean_over_keys(sample, key, self.N, self.sample_chunk)
        return g_bar, {}

    def get_momentum(self, grad, momentum):
        axes = tuple(range(1, grad.ndim))
        n1 = jnp.sum(jnp.abs(grad), axis=axes, keepdims=True)
        return momentum * self.decay + grad / (n1 + 1e-8)
