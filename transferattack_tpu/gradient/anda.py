"""ANDA — asymptotic normal distribution learning (reference:
``transferattack/gradient/anda.py``).

Collects the gradients of ``n_ens=25`` translated views (a 5×5 grid of
normalized offsets in [-aug_max, aug_max]) across iterations into running
first/second-moment statistics, and steps on the sign of the running mean
(``anda.py:46-160``).  The reference is batchsize=1-only; here the statistics
are kept per-image so any batch size works (vmapped over the batch).  With
``sample=True`` the final adversary adds one Gaussian sample from the learned
covariance (low-rank deviation rows, ``ANDA_STATISTICS.sample``,
``anda.py:171-189``), using a fixed-size preallocated deviation buffer to
stay jit-static.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..attack import Attack, AttackState, softmax_cross_entropy
from ..ops import translate_sep
from ..utils import img_max, img_min


class ANDA(Attack):
    """Official args (``anda.py:46``): n_ens=25, aug_max=0.3, decay=0."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 n_ens=25, aug_max=0.3, sample=False, targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 attack="ANDA", **kwargs):
        kwargs.pop("decay", None)
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=0.0,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        n = int(np.sqrt(n_ens))
        assert n * n == n_ens, "n_ens must be a square number"
        self.n_ens = int(n_ens)
        self.aug_max = float(aug_max)
        self.sample = bool(sample)
        # 5×5 translation grid (``anda.py:61-75``)
        r = np.linspace(-self.aug_max, self.aug_max, n)
        thetas = []
        for i in r:
            for j in r:
                thetas.append([[1.0, 0.0, i], [0.0, 1.0, j]])
        self.thetas = jnp.asarray(np.asarray(thetas, np.float32))

    def init_extra(self, x, y):
        extra = {
            "mean": jnp.zeros_like(x),
            "count": jnp.zeros((), x.dtype),
        }
        if self.sample:
            D = int(np.prod(x.shape[1:]))
            extra["dev_rows"] = jnp.zeros(
                (self.epoch * self.n_ens, x.shape[0], D), x.dtype
            )
            # the reference samples from the pre-final-update adversary
            # (``anda.py:131-137``)
            extra["prev_delta"] = jnp.zeros_like(x)
        return extra

    def ens_grads(self, variables, xt, y, key):
        """(n_ens, B, H, W, C) per-view gradients w.r.t. the pre-warp image."""

        # the views are pure translations, so translate_sep (gather-free,
        # bit-equal to the grid_sample path — see ops/image.py) replaces
        # affine_warp: 25 scatter-add backwards per iteration become pads
        # and multiplies
        max_shift = int(np.ceil(self.aug_max * max(xt.shape[1], xt.shape[2]) / 2)) + 1

        def one_view(theta):
            def loss_fn(img):
                aug = translate_sep(img, theta[0, 2], theta[1, 2], max_shift)
                logits = self.model.apply(variables, aug)
                ce = softmax_cross_entropy(logits, y).sum()
                return -ce if self.targeted else ce

            return jax.grad(loss_fn)(xt)

        return jax.lax.map(one_view, self.thetas)

    def step(self, variables, x, y, state: AttackState):
        key, sub = jax.random.split(state.key)
        xt = x + state.delta
        grads = self.ens_grads(variables, xt, y, sub)

        # running mean over all collected view-gradients (``anda.py:191-200``)
        n = state.extra["count"]
        mean = state.extra["mean"] * n / (n + self.n_ens) + grads.sum(0) / (n + self.n_ens)
        extra = {"mean": mean, "count": n + self.n_ens}
        if self.sample:
            dev = (grads - mean[None]).reshape(
                self.n_ens, x.shape[0], -1
            )
            rows = jax.lax.dynamic_update_slice(
                state.extra["dev_rows"], dev,
                (state.step * self.n_ens, 0, 0),
            )
            extra["dev_rows"] = rows
            extra["prev_delta"] = state.delta

        xt = xt + self.alpha * jnp.sign(mean)
        xt = jnp.clip(xt, img_min, img_max)
        xt = jnp.clip(xt, x - self.eps, x + self.eps)
        return state.replace(
            delta=xt - x, momentum=state.momentum, key=key,
            step=state.step + 1, extra=extra,
        )

    def finalize(self, state: AttackState, x, y):
        if not self.sample:
            return super().finalize(state, x, y)
        # one Gaussian sample from the learned low-rank covariance
        # (``anda.py:171-189``): mean + z @ dev_rows / sqrt(k-1)
        rows = state.extra["dev_rows"]  # (K, B, D)
        K = rows.shape[0]
        z = jax.random.normal(state.key, (K,), x.dtype)
        cov_sample = jnp.einsum("k,kbd->bd", z, rows) / np.sqrt(K - 1)
        noise = state.extra["mean"] + cov_sample.reshape(x.shape)
        xt = x + state.extra["prev_delta"]
        sample_xt = jnp.clip(xt + self.alpha * jnp.sign(noise), img_min, img_max)
        sample_xt = jnp.clip(sample_xt, x - self.eps, x + self.eps)
        return sample_xt - x
