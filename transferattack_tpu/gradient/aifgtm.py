"""AI-FGTM — Adam-style tanh momentum (reference:
``transferattack/gradient/aifgtm.py``).

'Making Adversarial Examples More Transferable and Indistinguishable' (AAAI
2022): raw-gradient first/second moment accumulators, a per-iteration Adam
bias-correction step-size schedule (precomputed host-side into a static
array), and a tanh step instead of sign.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState
from ..utils import img_max, img_min


class AIFGTM(Attack):
    """Official args (``aifgtm.py:31``): beta_1=0.9, beta_2=0.99, lam=1.3,
    mu_1=1.5, mu_2=1.9."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, beta_1=0.9, beta_2=0.99, lam=1.3, mu_1=1.5, mu_2=1.9,
                 targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="AI-FGTM", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.lam, self.mu_1, self.mu_2 = float(lam), float(mu_1), float(mu_2)
        # Adam bias-correction schedule (``aifgtm.py:48-52``): alphas sum to eps
        corr = [
            (1 - beta_1 ** (t + 1)) / math.sqrt(1 - beta_2 ** (t + 1))
            for t in range(self.epoch)
        ]
        total = sum(corr)
        self.alphas = jnp.asarray([self.eps / total * c for c in corr])

    def init_extra(self, x, y):
        return {"v": jnp.zeros_like(x)}

    def step(self, variables, x, y, state: AttackState):
        key, sub = jax.random.split(state.key)
        grad = self.input_grad(variables, x + state.delta, y, state, sub)
        momentum = state.momentum + self.mu_1 * grad
        v = state.extra["v"] + self.mu_2 * grad * grad
        alpha_t = self.alphas[state.step]
        direction = self.lam * momentum / (jnp.sqrt(v) + 1e-20)
        delta = jnp.clip(
            state.delta + alpha_t * jnp.tanh(direction), -self.eps, self.eps
        )
        delta = jnp.clip(x + delta, img_min, img_max) - x
        return state.replace(
            delta=delta, momentum=momentum, key=key, step=state.step + 1,
            extra={"v": v},
        )
