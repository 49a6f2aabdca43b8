"""FAP — frequency-aware perturbation (reference:
``transferattack/generation/fap.py``).

Iterative attack whose delta passes through a frequency gate before the
forward: RGB → YCbCr, ONE full-image 2-D DCT, the coefficient plane tiled
into 8×8 blocks, every tile multiplied by the same per-channel (3, 8, 8)
mask, untiled, inverse-DCT, YCbCr → RGB, clamp (``fap.py:108-126`` — note
the reference DCTs the whole image and blockifies the COEFFICIENT plane,
``_dct_2d_safe`` → ``blockify``; it is not a per-block DCT).  The mask keeps
the top-n globally most important coefficients, importance = mean |tiled
DCT of the input gradient| over a background set (``fap.py:160-190``; the
reference also tries SHAP first).  Elementwise masks commute with the
diagonal scaling between the reference's unnormalized SSA DCT pair and our
orthonormal matmul DCT, so the gate is exactly equivalent — and one big
(H, H) matmul per axis on the MXU instead of FFT machinery.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..attack import Attack, AttackState
from ..ops import dct_2d, idct_2d

_RGB2YCBCR = np.array(
    [[0.299, 0.587, 0.114],
     [-0.168736, -0.331264, 0.5],
     [0.5, -0.418688, -0.081312]], np.float32
)
_YCBCR2RGB = np.linalg.inv(_RGB2YCBCR).astype(np.float32)


def rgb_to_ycbcr(x):
    return jnp.einsum("bhwc,dc->bhwd", x, jnp.asarray(_RGB2YCBCR, x.dtype))


def ycbcr_to_rgb(x):
    return jnp.einsum("bhwc,dc->bhwd", x, jnp.asarray(_YCBCR2RGB, x.dtype))


def tile_coeffs(v, block: int):
    """(B, H, W, C) coefficient plane → (B, nh, nw, block, block, C) tiles
    (the reference's ``blockify`` on the DCT output, ``fap.py:315-322``)."""
    B, H, W, C = v.shape
    t = v.reshape(B, H // block, block, W // block, block, C)
    return t.transpose(0, 1, 3, 2, 4, 5)


def untile_coeffs(t, block: int, H: int, W: int):
    B, C = t.shape[0], t.shape[-1]
    return t.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


# backwards-compatible aliases (tests exercise the tiling round-trip)
def block_dct(x, block: int):
    """Tiled full-image DCT (see module docstring)."""
    return tile_coeffs(dct_2d(x), block)


def block_idct(u, block: int, H: int, W: int):
    return idct_2d(untile_coeffs(u, block, H, W))


def zigzag_lowfreq_mask(block: int, top_n: int) -> np.ndarray:
    """Keep the top_n globally-lowest (channel, i+j)-order coefficients of
    the (3, block, block) stack (fallback when no background set exists —
    the reference cannot run at all then; luma coefficients rank first at
    equal zigzag order, mirroring where gradient energy concentrates)."""
    order = np.add.outer(np.arange(block), np.arange(block))
    order = np.stack([order * 3 + c for c in range(3)]).reshape(-1)
    keep = np.zeros(3 * block * block, np.float32)
    keep[np.argsort(order, kind="stable")[:top_n]] = 1.0
    return keep.reshape(3, block, block)


class FAP(Attack):
    """Official args (``fap.py:44-76``): top_n=64, block=8, epoch=20, eps
    scaled by 192/top_n, alpha=eps/epoch."""

    def __init__(self, model_name="resnet50", epoch=20, eps=16 / 255, alpha=None,
                 decay=1.0, top_n=64, block_size=8, bg_dir=None, bg_num=100,
                 targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="FAP", **kwargs):
        eff_eps = eps * (192.0 / float(top_n))
        super().__init__(model_name, epoch=epoch, eps=eff_eps,
                         alpha=(eff_eps / epoch) if alpha is None else alpha,
                         decay=decay, targeted=targeted,
                         random_start=random_start, norm=norm, loss=loss,
                         attack=attack, **kwargs)
        self.top_n = int(top_n)
        self.block = int(block_size)
        self.bg_dir = bg_dir
        self.bg_num = int(bg_num)
        self._freq_mask = None

    def _grad_importance_mask(self):
        """Mean |tiled full-image DCT of the input grad| over background
        images (``fap.py:160-182``), then ONE global top-n over the
        flattened (3, block, block) map (``fap.py:184-188`` — per-channel
        top-n would keep 3× as many coefficients)."""
        from ..utils.data import AdvDataset

        # background images at the surrogate's native resolution (the
        # reference loads its AdvDataset at the dataset's 224)
        s = getattr(self.model, "input_size", None) or 224
        ds = AdvDataset(input_dir=self.bg_dir, size=(s, s))
        imp = np.zeros((3, self.block, self.block), np.float32)
        count = 0

        @jax.jit
        def grad_at(x, y):
            def loss_fn(p):
                logits = self.model.apply(self.model.variables, p)
                from ..attack import softmax_cross_entropy

                return softmax_cross_entropy(logits, y).mean()

            return jax.grad(loss_fn)(x)

        for xs, ys, _ in ds.as_batches(16):
            if count >= self.bg_num:
                break
            g = grad_at(jnp.asarray(xs), jnp.asarray(ys))
            u = tile_coeffs(dct_2d(rgb_to_ycbcr(g)), self.block)
            imp += np.asarray(
                jnp.abs(u).mean(axis=(0, 1, 2)).transpose(2, 0, 1)
            )
            count += len(xs)
        flat = imp.reshape(-1)
        keep = np.argsort(flat)[::-1][: self.top_n]
        mask = np.zeros_like(flat)
        mask[keep] = 1.0
        return mask.reshape(3, self.block, self.block)

    def freq_mask(self):
        if self._freq_mask is None:
            if self.bg_dir and os.path.isdir(self.bg_dir):
                mask = self._grad_importance_mask()
            else:
                mask = zigzag_lowfreq_mask(self.block, self.top_n)
            self._freq_mask = jnp.asarray(mask.transpose(1, 2, 0))  # (b,b,C)
        return self._freq_mask

    def gate_delta(self, delta):
        """YCbCr full-image DCT, tiled mask, IDCT (``fap.py:108-126``)."""
        H, W = delta.shape[1], delta.shape[2]
        t = tile_coeffs(dct_2d(rgb_to_ycbcr(delta)), self.block)
        mask = self.freq_mask()[None, None, None]
        rgb = ycbcr_to_rgb(idct_2d(untile_coeffs(t * mask, self.block, H, W)))
        return jnp.clip(rgb, 0.0, 1.0)

    def get_grad(self, variables, x, y, state: AttackState, key):
        delta_prime = self.gate_delta(state.delta)
        point = jax.lax.stop_gradient(x + delta_prime)

        def loss_fn(p):
            logits = self.model.apply(variables, p)
            return self.get_loss(logits[None], y)

        return jax.grad(loss_fn)(point), {}

    # finalize: the reference returns the RAW delta (``fap.py:87``) — bounded
    # by the scaled epsilon (192/top_n ×), not the gated version; inherited
    # base finalize matches that.
