"""FGSRA — frequency-guided sample relevance attack (reference:
``transferattack/gradient/fgsra.py``, CIKM 2024).

Neighbors are sampled in DCT space (random spectral mask ∘ DCT of a noisy
copy), their gradients weighted by input-space cosine relevance, fused with
the current gradient by gradient-space cosine similarity, and stepped with a
GRA-style per-pixel decay indicator.  Pointwise spectral masks commute with
the DCT normalization, so the orthonormal matmul DCT in ``ops.dct`` is exactly
equivalent to the reference's unnormalized FFT DCT pair.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState, cosine_similarity
from ..ops import dct_2d, idct_2d
from ..utils import img_max, img_min


class FGSRA(Attack):
    """Official args (``fgsra.py:30``): rho=0.7, beta=2.0, max_iter=20, eta=0.94."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 rho=0.7, beta=2.0, max_iter=20, decay=1.0, targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 attack="FGSRA", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.rho = float(rho)
        self.beta = float(beta)
        self.max_iter = int(max_iter)

    def init_extra(self, x, y):
        # decay indicator initialized to 10/9.4 = 1/0.94 (``fgsra.py:127``)
        return {"m": jnp.full_like(x, 10.0 / 9.4)}

    def spectral_draws(self, key, x, state):
        """All ``max_iter`` (gauss, mask) draws for one iteration
        (``fgsra.py:184-187``) — overridable seam for paired-RNG twins."""
        ka, kb = jax.random.split(key)
        shape = (self.max_iter,) + x.shape
        gauss = jax.random.uniform(
            ka, shape, x.dtype,
            minval=-self.eps * self.beta, maxval=self.eps * self.beta,
        )
        mask = jax.random.uniform(
            kb, shape, x.dtype, minval=1 - self.rho, maxval=1 + self.rho
        )
        return gauss, mask

    def step(self, variables, x, y, state: AttackState):
        key, k1, k2 = jax.random.split(state.key, 3)
        xadv = x + state.delta
        current_grad = self.input_grad(variables, xadv, y, state, k1)

        def one_sample(draws):
            gauss, mask = draws

            def loss_fn(p):
                x_idct = idct_2d(dct_2d(p + gauss) * mask)
                logits = self.model.apply(variables, x_idct)
                return self.get_loss(logits[None], y), x_idct

            (_, x_idct), grad_i = jax.value_and_grad(loss_fn, has_aux=True)(xadv)
            sim = cosine_similarity(xadv, x_idct)
            return grad_i * sim

        # relevance-weighted *sum* over neighbors (``fgsra.py:148-150``)
        samples = jax.lax.map(one_sample, self.spectral_draws(k2, x, state))
        avg_grad = samples.sum(0)

        s = cosine_similarity(current_grad, avg_grad)
        current = s * current_grad + (1 - s) * avg_grad
        momentum = self.get_momentum(current, state.momentum)
        eq = (jnp.sign(momentum) == jnp.sign(current)).astype(x.dtype)
        m = state.extra["m"] * (eq + (1 - eq) * 0.94)
        delta = jnp.clip(
            state.delta + self.alpha * m * jnp.sign(momentum), -self.eps, self.eps
        )
        delta = jnp.clip(x + delta, img_min, img_max) - x
        return state.replace(
            delta=delta, momentum=momentum, key=key, step=state.step + 1,
            extra={"m": m},
        )
