"""ILA / ILPD — intermediate-level attacks (reference:
``transferattack/advanced_objective/{ila,ilpd}.py``).

ILA: phase 1 runs the base momentum attack; phase 2 maximizes the projection
of the new mid-layer displacement onto the phase-1 displacement (middle block
of the backbone — ``layer3.0`` for ResNet-50, ``ila.py:70-88``).

ILPD: per-iteration forward-hook that shrinks the adversarial feature toward
a noisy-clean feature (γ·f + (1−γ)·f_clean) — a tap function here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState
from ..models import tap_key
from ..gradient.mifgsm import MIFGSM


class ILA(Attack):
    """Official args (``ila.py:38``): coeff=1.0; mid layer = middle block."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, coeff=1.0, feature_layer="layer3.0", targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 attack="ILA", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.coeff = float(coeff)
        self.feature_layer = feature_layer

    def run(self, variables, x, y, key):
        k1, k2 = jax.random.split(key)
        # phase 1: the inherited momentum attack provides the direction
        init_delta = super().run(variables, x, y, k1)

        _, mid_original = self.model.feature(variables, x, self.feature_layer)
        _, mid_attack = self.model.feature(
            variables, x + init_delta, self.feature_layer
        )
        xdir = (mid_attack - mid_original).reshape(1, -1)
        xnorm = jnp.linalg.norm(xdir) + 1e-12
        xhat = jax.lax.stop_gradient(xdir / xnorm)
        xnorm = jax.lax.stop_gradient(xnorm)
        mid_original = jax.lax.stop_gradient(mid_original)

        state = self.init_state(x, y, k2)

        def proj_loss(delta):
            _, mid_new = self.model.feature(variables, x + delta, self.feature_layer)
            ydir = (mid_new - mid_original).reshape(1, -1)
            return (ydir @ xhat.T)[0, 0] / xnorm

        def body(st, _):
            k, _ = jax.random.split(st.key)
            grad = jax.grad(proj_loss)(st.delta)
            delta = self.update_delta(st.delta, x, grad)
            return st.replace(delta=delta, key=k, step=st.step + 1), None

        state, _ = jax.lax.scan(body, state, None, length=self.epoch)
        return self.finalize(state, x, y)


class ILPD(MIFGSM):
    """ILPD (``ilpd.py:28-70``): tap at layer2.3 mixes γ=0.1 of the live
    feature with the σ=0.05-noised clean feature; the reference hardcodes
    alpha=1/255 and epoch=100 (``ilpd.py:31-34``)."""

    def __init__(self, model_name="resnet50", epoch=100, eps=16 / 255, decay=1.0,
                 sigma=0.05, coef=0.1, feature_layer="layer2.3", targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 attack="ILPD", **kwargs):
        kwargs.pop("alpha", None)
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=1 / 255, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.sigma = float(sigma)
        self.coef = float(coef)
        self.feature_layer = feature_layer

    def get_grad(self, variables, x, y, state: AttackState, key):
        k1, k2 = jax.random.split(key)
        noisy = x + self.sigma * jax.random.normal(k1, x.shape, x.dtype)
        _, ori_ilout = self.model.feature(variables, noisy, self.feature_layer)
        ori_ilout = jax.lax.stop_gradient(ori_ilout)
        key_name = tap_key(self.feature_layer)

        def loss_fn(delta):
            taps = {key_name: lambda f: self.coef * f + (1 - self.coef) * ori_ilout}
            logits = self.model.apply(variables, x + delta, tap_fns=taps)
            return self.get_loss(logits[None], y)

        return jax.grad(loss_fn)(state.delta), {}
