"""FIA family — feature importance attacks (reference:
``transferattack/advanced_objective/{fia,rpa,fmaa,bfa}.py``).

Phase 1 estimates a feature-importance weight matrix: aggregate the gradient
of the true-class softmax probability w.r.t. a mid-layer feature over
randomly perturbed copies (pixel dropout for FIA, patch masks for RPA,
momentum accumulation for FMAA, adversarial examples for BFA).  Phase 2 runs
the attack minimizing ``sum(feature · agg_grad)``.

Torch's forward/backward hook pair becomes a functional probe: an additive
offset at the tap point whose gradient IS the hooked feature gradient.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState
from ..models import tap_key


class FIA(Attack):
    """Official args (``fia.py:37``): num_ens=30, feature_layer='layer2',
    drop_rate=0.3, decay=1.

    Update rule follows the reference exactly: FIA/FMAA step with the RAW
    negated gradient each iteration — no momentum accumulation
    (``fia.py:103-112``, ``fmaa.py:153`` pass ``-grad`` straight to
    ``update_delta``); RPA accumulates momentum and steps with ``-momentum``
    (``rpa.py:171-174``); BFA accumulates momentum and steps with
    ``+momentum`` (``bfa.py:120-123``).  Encoded via ``use_momentum`` /
    ``step_sign`` class flags."""

    use_momentum = False  # FIA/FMAA: raw grad; RPA/BFA: momentum
    step_sign = -1.0      # descend (FIA/RPA/FMAA) vs ascend (BFA)

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, num_ens=30, feature_layer="layer2", drop_rate=0.3,
                 targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="FIA", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.num_ens = int(num_ens)
        self.feature_layer = feature_layer
        self.drop_rate = float(drop_rate)

    # ---- probing machinery ----

    def feature_grad(self, variables, x, y):
        """d(sum softmax-prob of y)/d(feature at tap) — the backward-hook
        capture (``fia.py:55-61,88-98``)."""
        key = tap_key(self.feature_layer)
        feat_shape = self.model.feature_shape(x.shape, self.feature_layer)

        def prob_loss(offset):
            taps = {key: lambda f: f + offset}
            logits = self.model.apply(variables, x, tap_fns=taps)
            probs = jax.nn.softmax(logits, axis=-1)
            return jnp.take_along_axis(probs, y[:, None], axis=1).sum()

        return jax.grad(prob_loss)(jnp.zeros(feat_shape, x.dtype))

    def perturb_input(self, x, key, i):
        """FIA: random pixel dropout mask (``fia.py:63-69``)."""
        mask = jax.random.bernoulli(key, 1.0 - self.drop_rate, x.shape)
        return x * mask.astype(x.dtype)

    def aggregate_grad(self, variables, x, y, key):
        def one(k, i):
            return self.feature_grad(variables, self.perturb_input(x, k, i), y)

        keys = jax.random.split(key, self.num_ens)
        agg = jnp.zeros_like(one(keys[0], 0))  # shape probe via first sample

        def body(acc, ki):
            k, i = ki
            return acc + one(k, i), None

        agg, _ = jax.lax.scan(
            body, jnp.zeros(agg.shape, x.dtype),
            (keys, jnp.arange(self.num_ens)),
        )
        # per-sample L2 normalize (``fia.py:99-100``)
        axes = tuple(range(1, agg.ndim))
        return agg / (jnp.sqrt(jnp.sum(agg**2, axis=axes, keepdims=True)) + 1e-12)

    # ---- attack loop ----

    def run(self, variables, x, y, key):
        key, kagg = jax.random.split(key)
        agg_grad = jax.lax.stop_gradient(self.aggregate_grad(variables, x, y, kagg))
        state = self.init_state(x, y, key)
        tapname = tap_key(self.feature_layer)

        def feature_loss(delta, k):
            xs = self.transform(x + delta, state, k)
            _, feat = self.model.feature(
                variables, xs.reshape((-1,) + x.shape[1:]), self.feature_layer
            )
            return jnp.sum(feat * agg_grad)

        def body(st, _):
            k, sub = jax.random.split(st.key)
            grad = jax.grad(feature_loss)(st.delta, sub)
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


class RPA(FIA):
    """Random-patch attack (``rpa.py``): FIA weights from patch-masked
    inputs — patches of size 1/3/5/7 randomly kept/scaled."""

    use_momentum = True   # ``rpa.py:170-174``: momentum of +grad, step -momentum
    step_sign = -1.0

    def __init__(self, *args, patch_prob=0.7, attack="RPA", **kwargs):
        kwargs.setdefault("feature_layer", "layer2")
        kwargs.setdefault("num_ens", 60)
        kwargs["attack"] = attack
        super().__init__(*args, **kwargs)
        self.patch_prob = float(patch_prob)

    def perturb_input(self, x, key, i):
        """patch_by_strides (``rpa.py``): bernoulli mask at patch granularity
        cycling sizes [1, 3, 5, 7]; dropped patches scale by U(0,1) noise.
        The traced sample index selects among four statically-shaped branches.
        """
        import functools

        branches = [
            functools.partial(self._patch_mask, size=s) for s in (1, 3, 5, 7)
        ]
        return jax.lax.switch(i % 4, branches, x, key)

    def _patch_mask(self, x, key, size: int):
        B, H, W, C = x.shape
        k1, k2 = jax.random.split(key)
        gh, gw = H // size, W // size
        keep = jax.random.bernoulli(k1, self.patch_prob, (B, gh, gw, C))
        noise = jax.random.uniform(k2, (B, gh, gw, C), x.dtype)
        cell = jnp.where(keep, 1.0, noise)
        mask = jnp.repeat(jnp.repeat(cell, size, axis=1), size, axis=2)
        mask = jnp.pad(
            mask,
            ((0, 0), (0, H - gh * size), (0, W - gw * size), (0, 0)),
            constant_values=1.0,
        )
        return x * mask.astype(x.dtype)


class FMAA(FIA):
    """Feature-momentum attack (``fmaa.py``): the weight matrix itself is
    accumulated with momentum across dropout samples."""

    def __init__(self, *args, fm_decay=1.0, attack="FMAA", **kwargs):
        kwargs.setdefault("feature_layer", "layer2")
        kwargs["attack"] = attack
        super().__init__(*args, **kwargs)
        self.fm_decay = float(fm_decay)

    def aggregate_grad(self, variables, x, y, key):
        keys = jax.random.split(key, self.num_ens)
        feat_shape = self.model.feature_shape(x.shape, self.feature_layer)

        def body(mom, k):
            g = self.feature_grad(variables, self.perturb_input(x, k, 0), y)
            axes = tuple(range(1, g.ndim))
            g = g / (jnp.mean(jnp.abs(g), axis=axes, keepdims=True) + 1e-12)
            return self.fm_decay * mom + g, None

        agg, _ = jax.lax.scan(body, jnp.zeros(feat_shape, x.dtype), keys)
        axes = tuple(range(1, agg.ndim))
        return agg / (jnp.sqrt(jnp.sum(agg**2, axis=axes, keepdims=True)) + 1e-12)


class BFA(FIA):
    """Black-box feature attack (``bfa.py``): weights estimated at I-FGSM
    adversarial points with mask-gradient dropout."""

    use_momentum = True   # ``bfa.py:119-123``: momentum of grad, step +momentum
    step_sign = 1.0

    def __init__(self, *args, warmup_epoch=5, attack="BFA", **kwargs):
        kwargs.setdefault("feature_layer", "layer2")
        kwargs["attack"] = attack
        super().__init__(*args, **kwargs)
        self.warmup_epoch = int(warmup_epoch)

    def aggregate_grad(self, variables, x, y, key):
        # quick I-FGSM to get an adversarial vantage point (``bfa.py``)
        delta = jnp.zeros_like(x)
        from ..utils import img_max, img_min

        def ifgsm_body(d, _):
            def ce(dd):
                logits = self.model.apply(variables, x + dd)
                from ..attack import softmax_cross_entropy

                return softmax_cross_entropy(logits, y).mean()

            g = jax.grad(ce)(d)
            d = jnp.clip(d + self.alpha * jnp.sign(g), -self.eps, self.eps)
            return jnp.clip(x + d, img_min, img_max) - x, None

        delta, _ = jax.lax.scan(ifgsm_body, delta, None, length=self.warmup_epoch)
        return super().aggregate_grad(variables, x + delta, y, key)
