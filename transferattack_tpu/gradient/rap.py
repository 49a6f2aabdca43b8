"""RAP — reverse adversarial perturbation (reference:
``transferattack/gradient/rap.py``).

'Boosting the Transferability of Adversarial Attacks with Reverse Adversarial
Perturbation' (NeurIPS 2022): after ``transpoint`` of ``epoch`` outer
iterations, each step first solves an inner maximization (``adv_steps``
I-FGSM steps *against* the attack loss) for a worst-case perturbation n_rap,
then takes the outer gradient at ``x + delta + n_rap``.  The late start is a
``lax.cond`` on the step counter; the inner loop is a nested ``lax.scan``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState
from ..utils import img_max, img_min


class RAP(Attack):
    """Official args (``rap.py:29``): alpha=2/255, epoch=400, transpoint=100,
    epsilon_n=16/255, alpha_n=2/255, adv_steps=8, decay=1."""

    def __init__(self, model_name="resnet50", epoch=400, eps=16 / 255, alpha=2 / 255,
                 transpoint=100, epsilon_n=16 / 255, alpha_n=2 / 255, adv_steps=8,
                 inner_random_start=True, targeted=False, random_start=False,
                 norm="linfty", loss="crossentropy", attack="RAP", **kwargs):
        kwargs.pop("decay", None)
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=1.0,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.transpoint = int(transpoint)
        self.epsilon_n = float(epsilon_n)
        self.alpha_n = float(alpha_n)
        self.adv_steps = int(adv_steps)
        # the reference hardcodes init_n_rap(random_start=True) (rap.py:88);
        # False zeroes the inner init for deterministic parity twins
        self.inner_random_start = bool(inner_random_start)

    def get_n_rap(self, variables, point, y, state, key):
        """Inner maximization of the *negated* attack loss (``rap.py:91-107``)."""
        k0, kloop = jax.random.split(key)
        if self.inner_random_start:
            n_rap = jax.random.uniform(
                k0, point.shape, point.dtype,
                minval=-self.epsilon_n, maxval=self.epsilon_n,
            )
        else:
            n_rap = jnp.zeros_like(point)
        n_rap = jnp.clip(point + n_rap, img_min, img_max) - point

        def body(n, k):
            g = self.input_grad(variables, point + n, y, state, k)
            # descend the attack loss: loss here is -get_loss (``rap.py:99``)
            n = jnp.clip(n - self.alpha_n * jnp.sign(g), -self.epsilon_n, self.epsilon_n)
            n = jnp.clip(point + n, img_min, img_max) - point
            return n, None

        n_rap, _ = jax.lax.scan(body, n_rap, jax.random.split(kloop, self.adv_steps))
        return n_rap

    def get_grad(self, variables, x, y, state: AttackState, key):
        k1, k2 = jax.random.split(key)

        n_rap = jax.lax.cond(
            state.step >= self.transpoint,
            lambda: self.get_n_rap(variables, x + state.delta, y, state, k1),
            lambda: jnp.zeros_like(x),
        )
        grad = self.input_grad(variables, x + state.delta + n_rap, y, state, k2)
        return grad, {}
