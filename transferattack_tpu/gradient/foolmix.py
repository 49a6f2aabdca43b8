"""Foolmix — dual-blending + direction update (reference:
``transferattack/gradient/foolmix.py``, TIFS 2024).

Per iteration: (1) images whose true label fell out of the surrogate's
top-(k+1) get a direction-update correction built from class-vs-topk logit
gradients; (2) n gaussian 'pixel blocks' blend with the adversary at m scale
levels for the mixed gradient and at z scale levels under random other-class
labels for the subtracted 'lens' gradient.  The reference's GPU plumbing
(AMP, OOM-retry chunking, gradient cache, timing prints,
``foolmix.py:186-330``) is noise under XLA and intentionally dropped; the
copy loops are ``lax.map``s over a stacked (n·m) axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState, softmax_cross_entropy
from ..utils import img_max, img_min


class Foolmix(Attack):
    """Official args (``foolmix.py:21-23``): m=5, n=3, z=1, k=5, zeta=0.2,
    beta=1.0, gamma=0.1."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, m=5, n=3, z=1, k=5, zeta=0.2, beta=1.0, gamma=0.1,
                 targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="Foolmix", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.m, self.n, self.z, self.k = int(m), int(n), int(z), int(k)
        self.zeta, self.beta, self.gamma = float(zeta), float(beta), float(gamma)

    def _ce_grad_at(self, variables, point, labels):
        """Per-point CE input-gradient (the reference's
        ``calculate_gradient_batch`` without the chunk/AMP scaffolding)."""

        def loss_fn(p):
            logits = self.model.apply(variables, p)
            ce = softmax_cross_entropy(logits, labels).mean()
            return -ce if self.targeted else ce

        return jax.grad(loss_fn)(point)

    def _direction_adjust(self, variables, x, delta, y):
        """Direction update for images misclassified out of the top-(k+1)
        (``foolmix.py:85-100,236-280``), applied batched under a mask."""
        xadv = x + delta
        logits = self.model.apply(variables, xadv)
        topk_idx = jax.lax.top_k(logits, self.k + 1)[1]  # (B, k+1)
        in_topk = jnp.any(topk_idx == y[:, None], axis=1)

        def mean_topk_logits(p):
            lg = self.model.apply(variables, p)
            picked = jnp.take_along_axis(lg, topk_idx, axis=1)
            return picked.mean(axis=1).sum()

        def class_logits(p):
            lg = self.model.apply(variables, p)
            return jnp.take_along_axis(lg, y[:, None], axis=1).sum()

        omega_y = jax.grad(class_logits)(xadv)
        omega_topk = jax.grad(mean_topk_logits)(xadv)
        xdir = omega_y - omega_topk

        f_y = jnp.take_along_axis(logits, y[:, None], axis=1)[:, 0]
        f_topk = jnp.take_along_axis(logits, topk_idx, axis=1).mean(axis=1)
        shape1 = (-1,) + (1,) * (x.ndim - 1)
        numerator = jnp.abs(f_y - f_topk).reshape(shape1)
        axes = tuple(range(1, x.ndim))
        denominator = jnp.sum(jnp.abs(xdir), axis=axes, keepdims=True)
        d_dir = numerator / (denominator + 1e-8) * jnp.sign(xdir)

        d_mean = jnp.mean(jnp.abs(d_dir), axis=axes, keepdims=True)
        adjusted = delta - self.gamma * d_dir * (self.alpha / (d_mean + 1e-8))
        misclassified = (~in_topk).reshape(shape1)
        return jnp.where(misclassified, adjusted, delta)

    def pixel_blocks(self, key, x, step):
        """N(0, 0.1²) pixel blocks, (n, B, H, W, C)
        (``foolmix.py:351-355``) — overridable seam for parity twins."""
        return jax.random.normal(key, (self.n,) + x.shape, x.dtype) * 0.1

    def other_labels(self, key, batch, step):
        """Uniform random class labels, (n, z, B)
        (``foolmix.py:357-366``) — seam."""
        return jax.random.randint(
            key, (self.n, self.z, batch), 0, self.model.num_classes
        )

    def step(self, variables, x, y, state: AttackState):
        key, kP, kL = jax.random.split(state.key, 3)
        delta = state.delta
        if not self.targeted:
            delta = self._direction_adjust(variables, x, delta, y)

        B = x.shape[0]
        P = self.pixel_blocks(kP, x, state.step)
        L = self.other_labels(kL, B, state.step)
        xadv = x + delta

        # 'lens' gradient: other-class labels at z scale levels (``:125-155``)
        def lens_one(args):
            P_j, L_jk, scale = args
            point = scale * (xadv + self.zeta * P_j)
            return self._ce_grad_at(variables, point, L_jk)

        lens_args = (
            jnp.repeat(P, self.z, axis=0),
            L.reshape(self.n * self.z, B),
            jnp.tile(1.0 / 2 ** jnp.arange(self.z, dtype=x.dtype), self.n),
        )
        g_lens = jax.lax.map(lens_one, lens_args).mean(0)

        # blended gradient: true labels at m scale levels (``:157-185``)
        def mix_one(args):
            P_j, scale = args
            point = scale * (xadv + self.zeta * P_j)
            return self._ce_grad_at(variables, point, y)

        mix_args = (
            jnp.repeat(P, self.m, axis=0),
            jnp.tile(1.0 / 2 ** jnp.arange(self.m, dtype=x.dtype), self.n),
        )
        g_mix = jax.lax.map(mix_one, mix_args).mean(0) - self.beta * g_lens

        axes = tuple(range(1, x.ndim))
        g_norm = jnp.sum(jnp.abs(g_mix), axis=axes, keepdims=True)
        momentum = self.decay * state.momentum + g_mix / (g_norm + 1e-8)
        new_delta = jnp.clip(
            delta + self.alpha * jnp.sign(momentum), -self.eps, self.eps
        )
        new_delta = jnp.clip(x + new_delta, img_min, img_max) - x
        return state.replace(
            delta=new_delta, momentum=momentum, key=key, step=state.step + 1
        )
