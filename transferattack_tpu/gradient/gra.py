"""GRA — gradient relevance attack (reference: ``transferattack/gradient/gra.py``).

'Boosting Adversarial Transferability via Gradient Relevance Attack' (ICCV
2023): neighborhood-averaged gradient fused with the current gradient by
cosine similarity, plus a per-pixel decay indicator M that shrinks the step
where the momentum sign flips (``gra.py:55-94,120-151``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState, cosine_similarity, mean_over_keys


class GRA(Attack):
    """Official args (``gra.py:33``): beta=3.5, num_neighbor=20, eta=0.94."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 beta=3.5, num_neighbor=20, decay=1.0, eta=0.94, targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 sample_chunk=4, attack="GRA", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.radius = beta * self.eps
        self.num_neighbor = int(num_neighbor)
        self.eta = float(eta)
        self.sample_chunk = int(sample_chunk)

    def init_extra(self, x, y):
        # decay indicator starts at 1/eta so the first step uses M=1 where
        # signs "flip" from the zero momentum (``gra.py:117``)
        return {"M": jnp.full_like(x, 1.0 / self.eta)}

    def neighbor_noise(self, key, x, state):
        """U(−β·eps, β·eps) sample-ball draw (``gra.py:52-60``) — overridable
        seam for paired-RNG parity twins."""
        return jax.random.uniform(
            key, x.shape, x.dtype, minval=-self.radius, maxval=self.radius
        )

    def step(self, variables, x, y, state: AttackState):
        key, k1, k2 = jax.random.split(state.key, 3)
        grad = self.input_grad(variables, x + state.delta, y, state, k1)

        def neighbor_grad(k):
            ka, kb = jax.random.split(k)
            noise = self.neighbor_noise(ka, x, state)
            return self.input_grad(variables, x + state.delta + noise, y, state, kb)

        samgrad = mean_over_keys(neighbor_grad, k2, self.num_neighbor, self.sample_chunk)
        s = cosine_similarity(grad, samgrad)
        current = s * grad + (1 - s) * samgrad

        momentum = self.get_momentum(current, state.momentum)
        # decay indicator: keep M where momentum sign agrees, shrink by eta
        # where it flipped (``gra.py:74-94``)
        eq = (jnp.sign(state.momentum) == jnp.sign(momentum)).astype(x.dtype)
        M = state.extra["M"] * (eq + (1 - eq) * self.eta)
        delta = self.update_delta(state.delta, x, momentum, alpha=M * self.alpha)
        return state.replace(
            delta=delta, momentum=momentum, key=key, step=state.step + 1,
            extra={"M": M},
        )

    def update_delta(self, delta, x, grad_dir, alpha=None):
        from ..utils import img_max, img_min

        a = self.alpha if alpha is None else alpha
        delta = jnp.clip(delta + a * jnp.sign(grad_dir), -self.eps, self.eps)
        return jnp.clip(x + delta, img_min, img_max) - x
