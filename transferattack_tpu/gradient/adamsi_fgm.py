"""AdaMSI-FGM — adaptive momentum and step size (reference:
``transferattack/gradient/adamsi_fgm.py``).

Non-monotonic adaptive momentum: a second-moment accumulator with
time-varying beta2, a beta1_t schedule from per-sample gradient L1 norms, and
a raw (sign-free) delta update.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import AttackState
from ..utils import img_max, img_min
from .mifgsm import MIFGSM


class AdaMSI_FGM(MIFGSM):
    """Official args (``adamsi_fgm.py:31``): lambda_=0.6."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, lambda_=0.6, targeted=False, random_start=False,
                 norm="linfty", loss="crossentropy", attack="AdaMSI_FGM", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.lambda_ = float(lambda_)

    def init_extra(self, x, y):
        return {
            "v": jnp.zeros_like(x),
            "s_prev": jnp.zeros((x.shape[0],), x.dtype),
        }

    def step(self, variables, x, y, state: AttackState):
        key, sub = jax.random.split(state.key)
        t = (state.step + 1).astype(x.dtype)
        grad = self.input_grad(variables, x + state.delta, y, state, sub)

        axes = tuple(range(1, x.ndim))
        g_norm1 = jnp.sum(jnp.abs(grad), axis=axes)
        s_t = self.lambda_ * (t**2) * g_norm1
        beta1_t = state.extra["s_prev"] / (s_t + 1.0)
        beta2_t = 1.0 - 1.0 / t
        v = beta2_t * state.extra["v"] + (1.0 - beta2_t) * grad * grad
        # replicates the reference's literal expression (``adamsi_fgm.py:45``):
        # V_hat = sqrt(v) + 1e-16/sqrt(t)  (precedence keeps the eps term tiny)
        V_hat = jnp.sqrt(v) + 1e-16 / jnp.sqrt(t)
        shape1 = (-1,) + (1,) * (x.ndim - 1)
        # the reference's (x0 + delta - x_prev) term: x_prev is assigned once
        # (``adamsi_fgm.py:67``) and never updated, so it is literally the
        # CURRENT delta, not a delta difference
        momentum = state.momentum * self.decay + beta1_t.reshape(shape1) * state.delta
        momentum = grad / V_hat + momentum

        delta = jnp.clip(state.delta + self.alpha * momentum, -self.eps, self.eps)
        delta = jnp.clip(x + delta, img_min, img_max) - x
        return state.replace(
            delta=delta, momentum=momentum, key=key, step=state.step + 1,
            extra={"v": v, "s_prev": s_t},
        )
