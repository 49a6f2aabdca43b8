"""MUMODIG — multiple monotonic diversified integrated gradients (reference:
``transferattack/gradient/mumodig.py``, AAAI 2025).

Integrated gradients along a refined path from a per-channel random lower-
bound quantization baseline, plus the same IG applied to ``N_trans`` randomly
transformed copies (roll / flip / rotate / resize-and-pad).  Random resize-
and-pad becomes a static-shape ``jax.image.scale_and_translate``; transform
choice is a ``lax.switch``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..attack import AttackState
from .mifgsm import MIFGSM


def lb_quantize(x, key, region_num: int):
    """Lower-bound quantization baseline (``LBQuantization``,
    ``mumodig.py:209-274``): per (image, channel), ``region_num-1`` random
    thresholds between min and max; each pixel maps to its region's left end.
    NHWC layout; fully vectorized."""
    B, H, W, C = x.shape
    flat = x.transpose(0, 3, 1, 2).reshape(B * C, H * W)
    mn = flat.min(axis=1)
    mx = flat.max(axis=1)
    R = region_num
    u = jax.random.uniform(key, (B * C, R - 1), x.dtype)
    thresholds = u * (mx - mn)[:, None] + mn[:, None]
    lefts = jnp.sort(jnp.concatenate([mn[:, None], thresholds], axis=1), axis=1)
    # region id = count of left-ends <= v, minus 1
    idx = jnp.sum(flat[:, :, None] >= lefts[:, None, :], axis=-1) - 1
    idx = jnp.clip(idx, 0, R - 1)
    proxy = jnp.take_along_axis(lefts, idx, axis=1)
    return proxy.reshape(B, C, H, W).transpose(0, 2, 3, 1)


class MUMODIG(MIFGSM):
    """Official args (``mumodig.py:35``): N_trans=6, N_base=1, N_interpolate=1,
    region_num=2, lamb=0.65."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, N_trans=6, N_base=1, N_interpolate=1, region_num=2,
                 lamb=0.65, targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="MUMODIG", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.N_trans = int(N_trans)
        self.N_base = int(N_base)
        self.N_interpolate = int(N_interpolate)
        self.region_num = int(region_num)
        self.lamb = float(lamb)

    # --- the 7 random transforms (``mumodig.py:107-143``) ---

    def _rand_transform(self, x, key):
        from ..ops import rotate_shear

        k_outer, k_op, k_param = jax.random.split(key, 3)
        H, W = x.shape[1], x.shape[2]

        def vshift(k):
            step = jax.random.randint(k, (), 0, H)
            return jnp.roll(x, step, axis=1)

        def hshift(k):
            step = jax.random.randint(k, (), 0, W)
            return jnp.roll(x, step, axis=2)

        def vflip(k):
            return x[:, ::-1, :, :]

        def hflip(k):
            return x[:, :, ::-1, :]

        def rrotate(k):
            # per-image random angles ≤45°: gather-free three-shear (the
            # warp gathers fault the v5e worker under the vmapped switch)
            ang = jax.random.uniform(k, (x.shape[0],), minval=-45.0, maxval=45.0)
            return rotate_shear(x, ang * jnp.pi / 180.0, max_angle=jnp.pi / 4)

        def affine(k):
            i = jax.random.randint(k, (), 0, 5)
            return jax.lax.switch(
                i, [vshift, hshift, vflip, hflip, rrotate], k_param
            )

        def resize_pad(k):
            # random resize into a 245 canvas at a random offset, downscaled
            # back to H — one static-shape scale_and_translate
            # (``mumodig.py:126-137``)
            k1, k2, k3 = jax.random.split(k, 3)
            large = 245.0
            inter = jax.random.randint(k1, (), min(W, 245), max(W, 245)).astype(x.dtype)
            top = jax.random.uniform(k2, (), x.dtype) * (large - inter)
            left = jax.random.uniform(k3, (), x.dtype) * (large - inter)
            scale = inter / large
            ty = top * H / large
            tx = left * W / large
            return jax.image.scale_and_translate(
                x, x.shape, (1, 2),
                jnp.stack([scale, scale]), jnp.stack([ty, tx]),
                method="linear",
            )

        branch = jax.random.randint(k_op, (), 0, 2)
        return jax.lax.switch(branch, [affine, resize_pad], k_param)

    def _ig_at(self, variables, x_point, y, state, key):
        """IG along the path from the quantization baseline of ``x_point``."""
        kq = key
        ig = jnp.zeros_like(x_point)
        for _ in range(self.N_base):
            kq, kb = jax.random.split(kq)
            baseline = jax.lax.stop_gradient(
                lb_quantize(x_point, kb, self.region_num)
            )
            path = x_point - baseline
            acc = jnp.zeros_like(x_point)
            for i_inter in range(self.N_interpolate):

                def loss_fn(p, bl=baseline, ii=i_inter):
                    x_int = bl + (ii + self.lamb) * (p - bl) / self.N_interpolate
                    logits = self.model.apply(variables, x_int)
                    return self.get_loss(logits[None], y)

                acc = acc + jax.grad(loss_fn)(x_point)
            ig = ig + acc * path
        return ig

    def get_grad(self, variables, x, y, state: AttackState, key):
        keys = jax.random.split(key, self.N_trans + 1)
        xadv = x + state.delta
        sole = self._ig_at(variables, xadv, y, state, keys[0])

        def one_trans(k):
            """IG of one transformed copy (``mumodig.py:exp_ig``): the
            gradient chains through the random transform back to the input;
            the multiplier path lives in transformed space."""
            k1, k2 = jax.random.split(k)
            x_t_val = self._rand_transform(xadv, k1)
            baseline = jax.lax.stop_gradient(
                lb_quantize(x_t_val, k2, self.region_num)
            )
            path = x_t_val - baseline
            acc = jnp.zeros_like(x)
            for i_inter in range(self.N_interpolate):

                def loss_fn(p, ii=i_inter):
                    x_t = self._rand_transform(p, k1)
                    x_int = baseline + (ii + self.lamb) / self.N_interpolate * (
                        x_t - baseline
                    )
                    logits = self.model.apply(variables, x_int)
                    return self.get_loss(logits[None], y)

                acc = acc + jax.grad(loss_fn)(xadv)
            return acc * path

        exp = jnp.zeros_like(x)
        for i in range(self.N_trans):
            exp = exp + one_trans(keys[i + 1])
        return sole + exp, {}
