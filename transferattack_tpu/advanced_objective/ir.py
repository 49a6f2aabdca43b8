"""IR / P2FA / TRAP (reference:
``transferattack/advanced_objective/{ir,p2fa,trap}.py``).

IR: Shapley-interaction regularizer via paired grid-masked perturbations.
P2FA: perturb features directly (aggregate gradient pushes a feature target),
then 10 inner pixel steps match it.
TRAP: ILA-style two-phase with an EMA feature anchor and strong random
affine viewing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState, softmax_cross_entropy
from ..gradient.mifgsm import MIFGSM
from ..models import tap_key
from ..ops import affine_warp_fast, affine_warp_sep
from ..utils import img_max, img_min


class IR(MIFGSM):
    """Official args (``ir.py:101``): grid_scale=16, grid_num=32,
    sample_times=1, lam=1."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, grid_scale=16, grid_num=32, sample_times=1, lam=1.0,
                 targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="ir", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.grid_scale = int(grid_scale)
        self.grid_num = int(grid_num)
        self.sample_times = int(sample_times)
        self.lam = float(lam)

    def _grid_mask(self, key, shape):
        """One (B,H,W,C)-broadcastable mask selecting grid_num random cells."""
        H, W = shape[1], shape[2]
        gs = self.grid_scale
        ids = jax.random.randint(key, (self.grid_num,), 0, gs * gs)
        cell = jnp.zeros((gs * gs,), jnp.float32).at[ids].set(1.0)
        cell = cell.reshape(gs, gs)
        mask = jnp.repeat(jnp.repeat(cell, H // gs, axis=0), W // gs, axis=1)
        return mask[None, :, :, None]

    def get_grad(self, variables, x, y, state: AttackState, key):
        logits_now = jax.lax.stop_gradient(
            self.model.apply(variables, x + state.delta)
        )
        masked = logits_now - 1e9 * jax.nn.one_hot(
            y, logits_now.shape[-1], dtype=logits_now.dtype
        )
        other_max = masked.argmax(axis=-1)

        def pair_score(lg):
            return (
                jnp.take_along_axis(lg, other_max[:, None], axis=1)
                - jnp.take_along_axis(lg, y[:, None], axis=1)
            )[:, 0]

        keys = jax.random.split(key, 5)

        def loss_fn(delta):
            interaction = 0.0
            outputs = self.model.apply(variables, x + delta)
            zero_outputs = self.model.apply(variables, x)
            for k in keys:
                mask = self._grid_mask(k, x.shape).astype(x.dtype)
                only_add = self.model.apply(variables, x + delta * mask)
                leave_one = self.model.apply(variables, x + delta * (1 - mask))
                interaction = interaction + (
                    pair_score(outputs) - pair_score(leave_one)
                    - pair_score(only_add) + pair_score(zero_outputs)
                ).mean()
            l1 = -softmax_cross_entropy(outputs, y).mean()
            return l1 - self.lam * interaction / 32.0

        grad = jax.grad(loss_fn)(state.delta)
        # the reference steps along -momentum of this loss (``ir.py:145``)
        return -grad, {}


class P2FA(MIFGSM):
    """Official args (``p2fa.py:39``): feature_layer='layer2', num_ens=30,
    eta=28 (in normalized space; applied in pixel space here post-division)."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, num_ens=30, feature_layer="layer2", eta=28.0,
                 targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", inner_steps=10, attack="P2FA", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.num_ens = int(num_ens)
        self.feature_layer = feature_layer
        self.eta = float(eta)
        self.inner_steps = int(inner_steps)

    def _aggregate_grad(self, variables, x, y):
        """Walk along normalized CE input-gradients, accumulating the grad of
        the true-logit sum w.r.t. the feature (``p2fa.py:49-75``)."""
        feat_shape = self.model.feature_shape(x.shape, self.feature_layer)
        keyname = tap_key(self.feature_layer)

        def body(carry, _):
            imgs, agg = carry

            def ce(p):
                return softmax_cross_entropy(self.model.apply(variables, p), y).mean()

            g = jax.grad(ce)(imgs)
            axes = tuple(range(1, x.ndim))
            g = g / (jnp.sqrt(jnp.sum(g**2, axis=axes, keepdims=True)) + 1e-12)
            imgs = imgs + self.eta / 255.0 * g

            def logit_sum(offset):
                taps = {keyname: lambda f: f + offset}
                lg = self.model.apply(variables, imgs, tap_fns=taps)
                return jnp.take_along_axis(lg, y[:, None], axis=1).mean()

            fg = jax.grad(logit_sum)(jnp.zeros(feat_shape, x.dtype))
            return (imgs, agg + fg), None

        (_, agg), _ = jax.lax.scan(
            body, (x, jnp.zeros(feat_shape, x.dtype)), None, length=self.num_ens
        )
        axes = tuple(range(1, agg.ndim))
        agg = agg / (jnp.sqrt(jnp.sum(agg**2, axis=axes, keepdims=True)) + 1e-12)
        return -agg

    def run(self, variables, x, y, key):
        state = self.init_state(x, y, key)
        feat_axes = None

        def body(st, _):
            k, _ = jax.random.split(st.key)
            agg = jax.lax.stop_gradient(
                self._aggregate_grad(variables, x + st.delta, y)
            )
            _, feat_now = self.model.feature(
                variables, x + st.delta, self.feature_layer
            )
            g_feat = self.decay * st.extra["g_feat"] + agg
            axes = tuple(range(1, g_feat.ndim))
            target_feat = jax.lax.stop_gradient(
                feat_now
                + 1e5 * g_feat
                / (jnp.sqrt(jnp.sum(g_feat**2, axis=axes, keepdims=True)) + 1e-12)
            )

            def match_loss(delta):
                _, f = self.model.feature(variables, x + delta, self.feature_layer)
                return jnp.sum((f - target_feat) ** 2, axis=axes).mean()

            delta = st.delta
            for _i in range(self.inner_steps):
                grad = jax.grad(match_loss)(delta)
                delta = self.update_delta(delta, x, -grad)
            return st.replace(delta=delta, key=k, step=st.step + 1,
                              extra={"g_feat": g_feat}), None

        feat_shape = self.model.feature_shape(x.shape, self.feature_layer)
        state = state.replace(extra={"g_feat": jnp.zeros(feat_shape, x.dtype)})
        state, _ = jax.lax.scan(body, state, None, length=self.epoch)
        return self.finalize(state, x, y)

    def update_delta(self, delta, x, grad_dir):
        # raw-gradient step (no sign) like the reference inner loop
        delta = jnp.clip(delta + self.alpha * jnp.sign(grad_dir), -self.eps, self.eps)
        return jnp.clip(x + delta, img_min, img_max) - x


class TRAP(MIFGSM):
    """Official args (``trap.py:47``): beta=0.8, epoch=300 total with
    baseline_epoch=150, feature_layer='layer3', probb=0.9, coeff=0.8."""

    def __init__(self, model_name="resnet50", epoch=300, eps=16 / 255,
                 baseline_epoch=150, beta=0.8, probb=0.9, coeff=0.8,
                 feature_layer="layer3", decay=1.0, targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 attack="TRAP", **kwargs):
        kwargs.pop("alpha", None)
        super().__init__(model_name, epoch=baseline_epoch, eps=eps,
                         alpha=eps / baseline_epoch, decay=decay, targeted=targeted,
                         random_start=random_start, norm=norm, loss=loss,
                         attack=attack, **kwargs)
        self.beta = float(beta)
        # epoch < baseline_epoch (e.g. a CLI --epoch override) would give a
        # negative enhance scan length; clamp to 0 (baseline-only attack)
        self.enhance_epoch = max(0, int(epoch) - int(baseline_epoch))
        self.probb = float(probb)
        self.coeff = float(coeff)
        self.feature_layer = feature_layer

    def _rand_affine(self, x, key):
        """RandomAffine(degrees=90, translate=0.1, scale=(0.5,1.5),
        shear=±30) with probability probb (``trap.py:52,74-77``)."""
        B = x.shape[0]
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        ang = jax.random.uniform(k1, (B,), minval=-90.0, maxval=90.0) * jnp.pi / 180
        sx = jax.random.uniform(k2, (B,), minval=-30.0, maxval=30.0) * jnp.pi / 180
        sy = jax.random.uniform(k3, (B,), minval=-30.0, maxval=30.0) * jnp.pi / 180
        sc = jax.random.uniform(k4, (B,), minval=0.5, maxval=1.5)
        tx = jax.random.uniform(k5, (B,), minval=-0.2, maxval=0.2)
        ty = jax.random.uniform(k6, (B,), minval=-0.2, maxval=0.2)
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        # inverse-map affine: rotation+shear scaled by 1/sc, plus translation
        a = cos / sc
        b = (-sin + jnp.tan(sx)) / sc
        c = (sin + jnp.tan(sy)) / sc
        d = cos / sc
        theta = jnp.stack(
            [jnp.stack([a, b, tx], -1), jnp.stack([c, d, ty], -1)], axis=1
        )
        # affine_warp_fast: gather-only backward.  The exact scatter
        # adjoint ran this attack at 0.65 img/s (v5e worker-crash class);
        # the r4 gather-free alternative (affine_warp_sep, RQ multi-pass)
        # was measured and ALSO crashes the worker at 224² — its
        # full-extent tap windows unroll to ~670 slice ops per pass
        # (BASELINE.md r4 "TRAP warp experiments").  The gather forward
        # (~80 ms/iter) is the remaining documented cost; the approximate
        # adjoint is quantified end-to-end in tests/test_warp_adjoint.py.
        warped = affine_warp_fast(x, theta)
        apply = jax.random.bernoulli(key, self.probb, (1,))[0]
        return jnp.where(apply, warped, x)

    def run(self, variables, x, y, key):
        k1, k2 = jax.random.split(key)
        init_delta = super().run(variables, x, y, k1)

        _, h_x = self.model.feature(variables, x, self.feature_layer)
        _, h_star0 = self.model.feature(variables, x + init_delta, self.feature_layer)
        h_x = jax.lax.stop_gradient(h_x)
        alpha_enh = self.eps / self.enhance_epoch

        state = self.init_state(x, y, k2)
        state = state.replace(extra={"h_star": jax.lax.stop_gradient(h_star0)})

        def trap_loss(delta, h_star, k):
            xt = self._rand_affine(x + delta, k)
            _, h_adv = self.model.feature(variables, xt, self.feature_layer)
            xdir = (h_star - h_x).reshape(1, -1)
            ydir = (h_adv - h_x).reshape(1, -1)
            xn = jnp.linalg.norm(xdir) + 1e-12
            yn = jnp.linalg.norm(ydir) + 1e-12
            angle = (xdir / xn) @ (ydir / yn).T
            loss = angle[0, 0] + (yn / xn) * self.coeff
            return (-loss if self.targeted else loss), h_adv

        def body(st, _):
            k, sub = jax.random.split(st.key)
            (loss, h_adv), grad = jax.value_and_grad(
                trap_loss, has_aux=True
            )(st.delta, st.extra["h_star"], sub)
            momentum = self.get_momentum(grad, st.momentum)
            delta = jnp.clip(
                st.delta + alpha_enh * jnp.sign(momentum), -self.eps, self.eps
            )
            delta = jnp.clip(x + delta, img_min, img_max) - x
            h_star = jax.lax.stop_gradient(
                (1 - self.beta) * h_adv + self.beta * st.extra["h_star"]
            )
            return st.replace(delta=delta, momentum=momentum, key=k,
                              step=st.step + 1, extra={"h_star": h_star}), None

        state, _ = jax.lax.scan(body, state, None, length=self.enhance_epoch)
        return self.finalize(state, x, y)
