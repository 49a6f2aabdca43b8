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
from ..ops import translate_scalar, translate_sep
from ..utils import img_max, img_min


class ANDA(Attack):
    """Official args (``anda.py:46``): n_ens=25, aug_max=0.3, decay=0."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 n_ens=25, aug_max=0.3, sample=False, view_chunk=None,
                 targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="ANDA", **kwargs):
        kwargs.pop("decay", None)
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=0.0,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        n = int(np.sqrt(n_ens))
        assert n * n == n_ens, "n_ens must be a square number"
        # r4 on-chip A/B: chunked 5-view batches (batch 160) SPILL the
        # ResNet-50 backward (2.8 img/s vs 12.3 serial — the IDAA fused-
        # batch failure mode), so the serial per-view path stays default;
        # view_chunk>1 remains available for small models/resolutions.
        view_chunk = 1 if view_chunk is None else int(view_chunk)
        assert n_ens % view_chunk == 0, "view_chunk must divide n_ens"
        self.view_chunk = view_chunk
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

    def _max_shift(self, xt):
        return int(np.ceil(self.aug_max * max(xt.shape[1], xt.shape[2]) / 2)) + 1

    def ens_grads(self, variables, xt, y, key):
        """(n_ens, B, H, W, C) per-view gradients w.r.t. the pre-warp image."""

        # the views are pure translations with one scalar offset shared by
        # the batch, so translate_scalar (4 dynamic slices, block-write
        # backward) replaces affine_warp's scatter-add backward AND
        # translate_sep's 2·(2m+2)-slice band sweep (ops/image.py)
        max_shift = self._max_shift(xt)

        def one_view(theta):
            def loss_fn(img):
                # the view's offset is one scalar shared by the batch →
                # translate_scalar (4 dynamic slices) instead of the 2-tap
                # band sweep; r4 on-chip: 12.3 → measured in BASELINE.md
                aug = translate_scalar(img, theta[0, 2], theta[1, 2], max_shift)
                logits = self.model.apply(variables, aug)
                ce = softmax_cross_entropy(logits, y).sum()
                return -ce if self.targeted else ce

            return jax.grad(loss_fn)(xt)

        return jax.lax.map(one_view, self.thetas)

    def sum_grads(self, variables, xt, y):
        """Σ_views ∂loss/∂xt in ``view_chunk``-view batched passes.

        By linearity this equals ``ens_grads(...).sum(0)`` — the only
        quantity ``step`` needs when ``sample=False`` — running the model
        on (chunk·B)-image batches instead of serial B-image backwards.
        On-chip this LOSES for ResNet-50 at 224² (backward spills at batch
        160, BASELINE.md r4) but wins for small models/resolutions; kept
        behind ``view_chunk>1``."""
        max_shift = self._max_shift(xt)
        c = self.view_chunk
        thetas = self.thetas.reshape(self.n_ens // c, c, 2, 3)

        def one_chunk(th):
            def loss_fn(img):
                aug = jax.vmap(
                    lambda t: translate_sep(img, t[0, 2], t[1, 2], max_shift)
                )(th)
                logits = self.model.apply(
                    variables, aug.reshape((-1,) + img.shape[1:])
                )
                ce = softmax_cross_entropy(
                    logits, jnp.tile(y, c)).sum()
                return -ce if self.targeted else ce

            return jax.grad(loss_fn)(xt)

        return jax.lax.map(one_chunk, thetas).sum(0)

    def sum_grads_serial(self, variables, xt, y):
        """Σ_views ∂loss/∂xt with a scan-carried accumulator: same serial
        per-view passes as ``ens_grads`` but never materializes the
        (n_ens, B, H, W, C) gradient stack (482 MB at batch 32 / 224²)
        that ``lax.map(...).sum(0)`` writes to HBM each iteration."""
        max_shift = self._max_shift(xt)

        def body(acc, theta):
            def loss_fn(img):
                aug = translate_scalar(img, theta[0, 2], theta[1, 2], max_shift)
                logits = self.model.apply(variables, aug)
                ce = softmax_cross_entropy(logits, y).sum()
                return -ce if self.targeted else ce

            return acc + jax.grad(loss_fn)(xt), None

        acc, _ = jax.lax.scan(body, jnp.zeros_like(xt), self.thetas)
        return acc

    def step(self, variables, x, y, state: AttackState):
        key, sub = jax.random.split(state.key)
        xt = x + state.delta
        if self.sample:
            grads = self.ens_grads(variables, xt, y, sub)
            gsum = grads.sum(0)
        elif self.view_chunk == 1:
            gsum = self.sum_grads_serial(variables, xt, y)
        else:
            gsum = self.sum_grads(variables, xt, y)

        # running mean over all collected view-gradients (``anda.py:191-200``)
        n = state.extra["count"]
        mean = state.extra["mean"] * n / (n + self.n_ens) + gsum / (n + self.n_ens)
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
