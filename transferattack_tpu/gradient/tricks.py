"""'Bag of tricks' MI-FGSM variants (reference:
``transferattack/gradient/mifgsm_with_tricks.py``): RGMIFGSM (random global
momentum init), DualMIFGSM (dual-example momentum), Ens_FGSM_MIFGSM
(direction-averaged FGSM gradients driving a dual example).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState


class RGMIFGSM(Attack):
    """Random-start global momentum init (``mifgsm_with_tricks.py:16``):
    num_directions random restarts of a 5-iteration alpha·s warmup accumulate
    a shared momentum, then the main loop runs from a fresh random start.
    """

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, pre_epoch=5, s=10, num_directions=5, targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 attack="RGMIFGSM", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.pre_epoch = int(pre_epoch)
        self.s = float(s)
        self.num_directions = int(num_directions)

    def restart_delta(self, key, x, idx):
        """Fresh uniform(-eps, eps) random start, box-clipped
        (``attack.py:130-143``) — overridable seam for paired-RNG twins;
        ``idx`` is the direction index."""
        delta = jax.random.uniform(
            key, x.shape, x.dtype, minval=-self.eps, maxval=self.eps
        )
        from ..utils import img_max, img_min

        return jnp.clip(x + delta, img_min, img_max) - x

    def run(self, variables, x, y, key):
        state = self.init_state(x, y, key)
        base_alpha = self.alpha

        def warm_body(carry, k_idx):
            k, idx = k_idx
            momentum, _ = carry
            delta = self.restart_delta(k, x, idx)

            def inner(c, kk):
                m, d = c
                g = self.input_grad(
                    variables, x + d, y, state.replace(momentum=m), kk
                )
                m = self.get_momentum(g, m)
                self.alpha = base_alpha * self.s
                d = self.update_delta(d, x, m)
                self.alpha = base_alpha
                return (m, d), None

            (momentum, delta), _ = jax.lax.scan(
                inner, (momentum, delta), jax.random.split(k, self.pre_epoch)
            )
            return (momentum, delta), None

        key, wkey = jax.random.split(state.key)
        (momentum, _), _ = jax.lax.scan(
            warm_body,
            (state.momentum, state.delta),
            (jax.random.split(wkey, self.num_directions),
             jnp.arange(self.num_directions)),
        )
        momentum = momentum / self.num_directions
        state = state.replace(momentum=momentum, delta=jnp.zeros_like(x), key=key)
        state, _ = jax.lax.scan(
            lambda st, _: (self.step(variables, x, y, st), None),
            state, None, length=self.epoch,
        )
        return self.finalize(state, x, y)


class DualMIFGSM(Attack):
    """Dual-example momentum (``mifgsm_with_tricks.py:102``): gradients taken
    at fresh random-start points each iteration drive a separate dual
    adversary whose momentum is returned."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="DualMIFGSM", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)

    def init_extra(self, x, y):
        return {"delta_dual": jnp.zeros_like(x), "momentum_dual": jnp.zeros_like(x)}

    def restart_delta(self, key, x, state, idx=0):
        """Per-iteration fresh random start (``mifgsm_with_tricks.py:165``) —
        overridable seam for paired-RNG twins."""
        from ..utils import img_max, img_min

        delta = jax.random.uniform(
            key, x.shape, x.dtype, minval=-self.eps, maxval=self.eps
        )
        return jnp.clip(x + delta, img_min, img_max) - x

    def step(self, variables, x, y, state: AttackState):
        key, k1, k2 = jax.random.split(state.key, 3)
        delta = self.restart_delta(k1, x, state)
        grad = self.input_grad(variables, x + delta, y, state, k2)
        momentum = self.get_momentum(grad, state.momentum)
        momentum_dual = self.get_momentum(grad, state.extra["momentum_dual"])
        delta_dual = self.update_delta(state.extra["delta_dual"], x, momentum_dual)
        return state.replace(
            delta=delta, momentum=momentum, key=key, step=state.step + 1,
            extra={"delta_dual": delta_dual, "momentum_dual": momentum_dual},
        )

    def finalize(self, state: AttackState, x, y):
        from ..utils import img_max, img_min

        return jnp.clip(x + state.extra["delta_dual"], img_min, img_max) - x


class Ens_FGSM_MIFGSM(DualMIFGSM):
    """Direction-ensemble dual MI-FGSM (``mifgsm_with_tricks.py:181``): each
    iteration averages gradients over num_d fresh random starts."""

    def __init__(self, *args, num_d=5, attack="Ens_DualMIFGSM", **kwargs):
        kwargs["attack"] = attack
        super().__init__(*args, **kwargs)
        self.num_directions = int(num_d)

    def step(self, variables, x, y, state: AttackState):
        key, sub = jax.random.split(state.key)
        keys = jax.random.split(sub, self.num_directions)

        def one(k_idx):
            k, idx = k_idx
            ka, kb = jax.random.split(k)
            delta = self.restart_delta(ka, x, state, idx)
            return self.input_grad(variables, x + delta, y, state, kb)

        grads = jax.lax.map(one, (keys, jnp.arange(self.num_directions)))
        grad = grads.mean(0)
        momentum = self.get_momentum(grad, state.momentum)
        momentum_dual = self.get_momentum(grad, state.extra["momentum_dual"])
        delta_dual = self.update_delta(state.extra["delta_dual"], x, momentum_dual)
        return state.replace(
            delta=state.delta, momentum=momentum, key=key, step=state.step + 1,
            extra={"delta_dual": delta_dual, "momentum_dual": momentum_dual},
        )
