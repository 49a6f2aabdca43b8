"""DTA — direct tuning attack (reference: ``transferattack/gradient/dta.py``).

'Improving the Transferability of Adversarial Examples via Direct Tuning':
each outer iteration runs K=10 small inner steps from the current adversary
displaced along an accumulated lookahead gt, averages the inner gradients,
and fuses them with the outer gradient.  The inner loop is a nested
``lax.scan``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState, global_l1_normalize


class DTA(Attack):
    """Official args (``dta.py:33``): beta=1.5 (unused by the loop), K=10, u=0.8."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 beta=1.5, K=10, u=0.8, decay=1.0, targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 attack="DTA", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.K = int(K)
        self.u = float(u)

    def get_grad(self, variables, x, y, state: AttackState, key):
        keys = jax.random.split(key, self.K + 1)
        t_grad = self.input_grad(variables, x + state.delta, y, state, keys[0])

        def body(carry, k):
            gt, delta_tk, gtk, momentum_tk = carry
            g = self.input_grad(
                variables, x + delta_tk + gt, y, state, k
            )
            gt = self.u * gt + global_l1_normalize(g)
            gtk = gtk + g
            momentum_tk = self.get_momentum(g, momentum_tk)
            delta_tk = self.update_delta(delta_tk, x, momentum_tk)
            return (gt, delta_tk, gtk, momentum_tk), None

        init = (t_grad, state.delta, jnp.zeros_like(x), jnp.zeros_like(x))
        (gt, _, gtk, _), _ = jax.lax.scan(body, init, keys[1:])
        return self.decay * t_grad + gtk / self.K, {}
