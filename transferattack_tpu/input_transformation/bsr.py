"""BSR — block shuffle and rotation (reference:
``transferattack/input_transformation/bsr.py``, CVPR 2024).

Splits the image into strips at random proportional cuts, rotates each strip
(±24° bilinear, zero fill), shuffles sub-strips along the other axis, then
shuffles the strips.  The reference's dynamically-shaped ``torch.split`` +
``random.shuffle`` pipeline becomes per-pixel index maps + one bilinear
gather per copy — static shapes, vmapped over ``num_scale=20`` copies.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import AttackState
from ..gradient.mifgsm import MIFGSM
from ..ops.blocks import block_bounds, block_id, bsr_lengths, permute_strips


def _rotate_row_strips(x, h_edges, angles):
    """Rotate each row strip around its own center (bilinear, zero outside
    the strip) via one gather."""
    B, H, W, C = x.shape
    h_id = block_id(h_edges, H)
    starts, lens = block_bounds(h_edges)

    rows = jnp.arange(H)[:, None]  # (H, 1)
    cols = jnp.arange(W)[None, :]  # (1, W)
    k = h_id[:, None]
    a = starts[k].astype(x.dtype)
    lh = lens[k].astype(x.dtype)
    cy = a + (lh - 1) / 2.0
    cx = (W - 1) / 2.0
    theta = angles[h_id][:, None]
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    dy = rows.astype(x.dtype) - cy
    dx = cols.astype(x.dtype) - cx
    src_c = cos * dx + sin * dy + cx
    src_r = -sin * dx + cos * dy + cy

    r0 = jnp.floor(src_r)
    c0 = jnp.floor(src_c)
    wr = src_r - r0
    wc = src_c - c0

    lo_r = starts[k].astype(x.dtype)
    hi_r = lo_r + lh - 1.0

    def tap(ri, ci):
        valid = (ri >= lo_r) & (ri <= hi_r) & (ci >= 0) & (ci <= W - 1)
        ric = jnp.clip(ri, 0, H - 1).astype(jnp.int32)
        cic = jnp.clip(ci, 0, W - 1).astype(jnp.int32)
        vals = x[:, ric, cic, :]
        return vals * valid[None, :, :, None].astype(x.dtype)

    return (
        tap(r0, c0) * ((1 - wr) * (1 - wc))[None, :, :, None]
        + tap(r0, c0 + 1) * ((1 - wr) * wc)[None, :, :, None]
        + tap(r0 + 1, c0) * (wr * (1 - wc))[None, :, :, None]
        + tap(r0 + 1, c0 + 1) * (wr * wc)[None, :, :, None]
    )


def bsr_shuffle_rows_first(x, key, num_block: int, max_angle_deg: float = 24.0):
    B, H, W, C = x.shape
    kh, kang, kperm_h, kcols = jax.random.split(key, 4)
    h_edges = bsr_lengths(kh, H, num_block)
    angles = (
        jax.random.uniform(kang, (num_block,), minval=-max_angle_deg, maxval=max_angle_deg)
        * jnp.pi / 180.0
    )
    rotated = _rotate_row_strips(x, h_edges, angles)

    # per-row-strip column shuffle (fresh cuts + permutation per strip)
    h_id = block_id(h_edges, H)
    colmaps = []
    for s in range(num_block):
        k1, k2, kcols = jax.random.split(kcols, 3)
        w_edges = bsr_lengths(k1, W, num_block)
        perm = jax.random.permutation(k2, num_block)
        colmaps.append(permute_strips(w_edges, perm, W))
    colmap = jnp.stack(colmaps)  # (num_block, W)

    # row-strip shuffle
    perm_rows = jax.random.permutation(kperm_h, num_block)
    rowmap = permute_strips(h_edges, perm_rows, H)  # (H,)

    src_rows = rowmap[:, None]  # (H, 1)
    src_cols = colmap[h_id[rowmap]][:, :]  # (H, W)
    return rotated[:, src_rows, src_cols.reshape(H, W), :].reshape(B, H, W, C)


def bsr_one_copy(x, key, num_block: int):
    korder, kmain = jax.random.split(key)
    flip = jax.random.bernoulli(korder)

    def rows_first(xx):
        return bsr_shuffle_rows_first(xx, kmain, num_block)

    def cols_first(xx):
        xt = jnp.swapaxes(xx, 1, 2)
        return jnp.swapaxes(bsr_shuffle_rows_first(xt, kmain, num_block), 1, 2)

    return jax.lax.cond(flip, cols_first, rows_first, x)


class BSR(MIFGSM):
    """Official args (``bsr.py:36``): num_scale=20, num_block=3."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, num_scale=20, num_block=3, targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 attack="BSR", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.num_scale = int(num_scale)
        self.num_block = int(num_block)

    def num_copies(self):
        return self.num_scale

    def transform(self, x, state: AttackState, key):
        keys = jax.random.split(key, self.num_scale)
        return jax.vmap(lambda k: bsr_one_copy(x, k, self.num_block))(keys)
