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

    def baseline_and_agg(self, variables, x, y, key):
        """NAA: path-aggregated feature cotangent (/N) + the feature of the
        black image as baseline (``naa.py:92-97``).  DANAA overrides both."""
        agg = self.aggregate_grad(variables, x, y, key)
        _, y_prime = self.model.feature(
            variables, jnp.zeros_like(x), self.feature_layer
        )
        return agg, y_prime

    def run(self, variables, x, y, key):
        key, kagg = jax.random.split(key)
        agg_grad, y_prime = self.baseline_and_agg(variables, x, y, kagg)
        agg_grad = jax.lax.stop_gradient(agg_grad)
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
    """DANAA (``danaa.py:36-150``): adversarial non-linear path — each of the
    num_ens probes evaluates the softmax-prob loss at x_t + N(0, scale²)
    noise, captures the feature cotangent there, and walks x_t by
    lr·sign(input grad).  The aggregate is NEGATED and per-sample
    L2-normalized (``danaa.py:125``); the baseline feature is taken at the
    FINAL walked point x_t, not the black image (``danaa.py:129-131``).
    Unlike FIA/NAA, DANAA accumulates momentum and steps with ``+momentum``
    (``danaa.py:134-150``) over the balanced attribution mean (gamma=1,
    ``danaa.py:63-80``)."""

    use_momentum = True
    step_sign = 1.0

    def __init__(self, *args, scale=0.25, lr=0.0025, gamma=1.0,
                 feature_layer="layer2", attack="DANAA", **kwargs):
        kwargs["attack"] = attack
        kwargs["feature_layer"] = feature_layer
        kwargs.pop("scale_inv", None)  # pre-r4 arg name
        super().__init__(*args, **kwargs)
        self.scale = float(scale)
        self.lr = float(lr)
        self.gamma = float(gamma)

    def attribution_loss(self, feat, y_prime, agg_grad):
        attribution = (feat - y_prime) * agg_grad
        balanced = jnp.where(attribution >= 0, attribution,
                             self.gamma * attribution)
        loss = jnp.mean(balanced)
        return -loss if self.targeted else loss

    def prob_input_grad(self, variables, point, y):
        """d(sum softmax-prob of y)/d(input) — the reference's x_grad
        (``danaa.py:110-117``)."""

        def loss(p):
            probs = jax.nn.softmax(self.model.apply(variables, p), axis=-1)
            return jnp.take_along_axis(probs, y[:, None], axis=1).sum()

        return jax.grad(loss)(point)

    def baseline_and_agg(self, variables, x, y, key):
        keys = jax.random.split(key, self.N)
        feat_shape = self.model.feature_shape(x.shape, self.feature_layer)

        def body(carry, k):
            acc, xt = carry
            point = xt + self.scale * jax.random.normal(k, x.shape, x.dtype)
            g_feat = self.feature_grad(variables, point, y)
            g_in = self.prob_input_grad(variables, point, y)
            xt = xt + self.lr * jnp.sign(g_in)
            return (acc + g_feat, xt), None

        (agg, xt), _ = jax.lax.scan(
            body, (jnp.zeros(feat_shape, x.dtype), x), keys
        )
        axes = tuple(range(1, agg.ndim))
        agg = -agg / (jnp.sqrt(jnp.sum(agg**2, axis=axes, keepdims=True)) + 1e-12)
        _, y_base = self.model.feature(variables, xt, self.feature_layer)
        return agg, y_base
