"""FAP — frequency-aware perturbation (reference:
``transferattack/generation/fap.py``).

Iterative attack whose delta passes through a frequency gate: 8×8 block DCT
in YCbCr space, keeping only the top-n most important coefficients per
channel.  Importance comes from gradient magnitudes over a background image
set (the reference also tries SHAP); with no background directory a low-
frequency zigzag mask is used.  Block DCTs are MXU matmuls via ``ops.dct``.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..attack import Attack, AttackState
from ..ops.dct import _dct_matrix

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


def block_dct(x, block: int):
    """(B, H, W, C) → (B, nh, nw, block, block, C) per-block DCT-II."""
    B, H, W, C = x.shape
    D = jnp.asarray(_dct_matrix(block), x.dtype)
    blocks = x.reshape(B, H // block, block, W // block, block, C)
    blocks = blocks.transpose(0, 1, 3, 2, 4, 5)  # (B, nh, nw, bh, bw, C)
    out = jnp.einsum("ij,bnmjkc->bnmikc", D, blocks)
    return jnp.einsum("kl,bnmikc->bnmilc", D, out.transpose(0, 1, 2, 3, 4, 5))


def block_idct(u, block: int, H: int, W: int):
    D = jnp.asarray(_dct_matrix(block), u.dtype)
    out = jnp.einsum("ji,bnmjkc->bnmikc", D, u)
    out = jnp.einsum("kj,bnmijc->bnmikc", D, out)
    B = u.shape[0]
    C = u.shape[-1]
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def zigzag_lowfreq_mask(block: int, top_n: int) -> np.ndarray:
    """Keep the top_n lowest (i+j)-order coefficients (fallback mask)."""
    order = np.add.outer(np.arange(block), np.arange(block)).reshape(-1)
    keep = np.zeros(block * block, np.float32)
    keep[np.argsort(order, kind="stable")[:top_n]] = 1.0
    return keep.reshape(block, block)


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
        """Per-channel mean |block-DCT of input grad| over background images
        (``fap.py:160-190``); top_n coefficients kept."""
        from ..utils.data import AdvDataset

        ds = AdvDataset(input_dir=self.bg_dir)
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
            u = block_dct(rgb_to_ycbcr(g), self.block)
            imp += np.asarray(
                jnp.abs(u).mean(axis=(0, 1, 2)).transpose(2, 0, 1)
            )
            count += len(xs)
        mask = np.zeros_like(imp)
        for c in range(3):
            flat = imp[c].reshape(-1)
            keep = np.argsort(flat)[::-1][: self.top_n]
            m = np.zeros_like(flat)
            m[keep] = 1.0
            mask[c] = m.reshape(self.block, self.block)
        return mask

    def freq_mask(self):
        if self._freq_mask is None:
            if self.bg_dir and os.path.isdir(self.bg_dir):
                mask = self._grad_importance_mask()
            else:
                mask = np.stack([zigzag_lowfreq_mask(self.block, self.top_n)] * 3)
            self._freq_mask = jnp.asarray(mask.transpose(1, 2, 0))  # (b,b,C)
        return self._freq_mask

    def gate_delta(self, delta):
        """YCbCr block-DCT gate (``fap.py:108-128``)."""
        H, W = delta.shape[1], delta.shape[2]
        v = block_dct(rgb_to_ycbcr(delta), self.block)
        mask = self.freq_mask()[None, None, None]
        rgb = ycbcr_to_rgb(block_idct(v * mask, self.block, H, W))
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
