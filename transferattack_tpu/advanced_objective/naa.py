"""NAA / DANAA — neuron attribution attacks (reference:
``transferattack/advanced_objective/{naa,danaa}.py``).

NAA: aggregate feature gradients along the straight path from a black
baseline (N=30 interpolations), then attack the attribution
``(feat - feat_baseline)·agg_grad``.  DANAA replaces the straight path with a
non-linear adversarial path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import AttackState
from ..models import tap_key
from .fia import FIA


class NAA(FIA):
    """Official args (``naa.py:30``): feature_layer='layer1', N=30.

    Like FIA, the reference steps with the RAW negated gradient each
    iteration (``naa.py:100-110`` passes ``-grad`` to ``update_delta``) —
    no momentum accumulation; only DANAA uses momentum."""

    use_momentum = False
    step_sign = -1.0

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, N=30, feature_layer="layer1", targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 attack="NAA", **kwargs):
        kwargs.pop("num_ens", None), kwargs.pop("drop_rate", None)
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         num_ens=N, feature_layer=feature_layer, targeted=targeted,
                         random_start=random_start, norm=norm, loss=loss,
                         attack=attack, **kwargs)
        self.N = int(N)

    def perturb_input(self, x, key, i):
        # straight path from the black baseline (``naa.py:76-78``)
        return x * (i / self.N)

    def run(self, variables, x, y, key):
        key, kagg = jax.random.split(key)
        agg_grad = jax.lax.stop_gradient(
            self.aggregate_grad(variables, x, y, kagg)
        )
        # baseline feature at the black image (``naa.py:100-103``)
        _, y_prime = self.model.feature(
            variables, jnp.zeros_like(x), self.feature_layer
        )
        y_prime = jax.lax.stop_gradient(y_prime)

        state = self.init_state(x, y, key)

        def attr_loss(delta):
            _, feat = self.model.feature(variables, x + delta, self.feature_layer)
            return self.attribution_loss(feat, y_prime, agg_grad)

        def body(st, _):
            k, _sub = jax.random.split(st.key)
            grad = jax.grad(attr_loss)(st.delta)
            if self.use_momentum:
                momentum = self.get_momentum(grad, st.momentum)
                direction = self.step_sign * momentum
            else:
                momentum = st.momentum
                direction = self.step_sign * grad
            delta = self.update_delta(st.delta, x, direction)
            return st.replace(delta=delta, momentum=momentum, key=k,
                              step=st.step + 1), None

        state, _ = jax.lax.scan(body, state, None, length=self.epoch)
        return self.finalize(state, x, y)

    def attribution_loss(self, feat, y_prime, agg_grad):
        """NAA objective (``naa.py:102``): Σ (feat − baseline)·agg."""
        return jnp.sum((feat - y_prime) * agg_grad)

    def aggregate_grad(self, variables, x, y, key):
        keys = jax.random.split(key, self.N)
        feat_shape = self.model.feature_shape(x.shape, self.feature_layer)

        def body(acc, ki):
            k, i = ki
            g = self.feature_grad(variables, self.perturb_input(x, k, i), y)
            return acc + g, None

        agg, _ = jax.lax.scan(
            body, jnp.zeros(feat_shape, x.dtype),
            (keys, jnp.arange(self.N, dtype=x.dtype)),
        )
        return agg / self.N


class DANAA(NAA):
    """DANAA (``danaa.py``): adversarial non-linear path — each sample point
    steps along its own feature-gradient sign before probing.  Unlike
    FIA/NAA, DANAA DOES accumulate momentum and steps with ``+momentum``
    (``danaa.py:144-148``), over the balanced attribution mean
    (``danaa.py:63-80``, gamma=1)."""

    use_momentum = True
    step_sign = 1.0

    def __init__(self, *args, scale_inv=0.6, gamma=1.0, attack="DANAA", **kwargs):
        kwargs["attack"] = attack
        super().__init__(*args, **kwargs)
        self.scale_inv = float(scale_inv)
        self.gamma = float(gamma)

    def attribution_loss(self, feat, y_prime, agg_grad):
        attribution = (feat - y_prime) * agg_grad
        balanced = jnp.where(attribution >= 0, attribution,
                             self.gamma * attribution)
        loss = jnp.mean(balanced)
        return -loss if self.targeted else loss

    def aggregate_grad(self, variables, x, y, key):
        keys = jax.random.split(key, self.N)
        feat_shape = self.model.feature_shape(x.shape, self.feature_layer)

        def body(carry, k):
            acc, xt = carry
            g_in = self.input_grad(
                variables, xt, y,
                AttackState(delta=jnp.zeros_like(x), momentum=jnp.zeros_like(x),
                            key=k, step=jnp.zeros((), jnp.int32), extra={}),
                k,
            )
            xt = xt + self.scale_inv * self.alpha * jnp.sign(g_in)
            g = self.feature_grad(variables, xt, y)
            return (acc + g, xt), None

        (agg, _), _ = jax.lax.scan(
            body, (jnp.zeros(feat_shape, x.dtype), x), keys
        )
        return agg / self.N
