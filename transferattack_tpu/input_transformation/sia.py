"""SIA — structure-invariant attack (reference:
``transferattack/input_transformation/sia.py``, ICCV 2023).

Splits the image into a ``num_block×num_block`` grid at random cut points and
applies one of 7 random ops per cell (shift/flip/rot180/scale/noise...).  The
reference's dynamic-slice Python loop becomes per-pixel index maps + one
gather per copy — fully static shapes, vmapped over ``num_scale=20`` copies.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import AttackState
from ..gradient.mifgsm import MIFGSM
from ..ops.blocks import block_bounds, block_id, random_cuts

# op indices mirroring the reference list (``sia.py:42``):
# 0 vshift, 1 hshift, 2 vflip, 3 hflip, 4 rot180, 5 scale, 6 noise
NUM_OPS = 7


def sia_blocktransform(x, key, num_block: int, eps_noise: float = 16 / 255,
                       params=None):
    """One SIA copy: per-cell random op, compiled to gather + pointwise.

    ``params`` (optional dict with keys ``h_edges, w_edges, ops, shift_v,
    shift_h, scale, noise``) bypasses sampling entirely — used by the
    fixed-parameter parity twins (``tests/test_attack_parity2.py``) to pin
    the index-map math against the reference's dynamic-slice ops."""
    B, H, W, C = x.shape
    if params is not None:
        h_edges, w_edges = params["h_edges"], params["w_edges"]
        ops = params["ops"]
        shift_v, shift_h = params["shift_v"], params["shift_h"]
        scale, noise = params["scale"], params["noise"]
        return _sia_apply(x, h_edges, w_edges, ops, shift_v, shift_h,
                          scale, noise, num_block)
    kh, kw, kop, kshift_v, kshift_h, kscale, knoise = jax.random.split(key, 7)

    h_edges = random_cuts(kh, H, num_block)
    w_edges = random_cuts(kw, W, num_block)
    ops = jax.random.randint(kop, (num_block, num_block), 0, NUM_OPS)
    # per-cell fractional shift / scale draws
    shift_v = jax.random.uniform(kshift_v, (num_block, num_block))
    shift_h = jax.random.uniform(kshift_h, (num_block, num_block))
    scale = jax.random.uniform(kscale, (num_block, num_block), x.dtype)
    noise = jax.random.uniform(
        knoise, x.shape, x.dtype, minval=-eps_noise, maxval=eps_noise
    )
    return _sia_apply(x, h_edges, w_edges, ops, shift_v, shift_h, scale,
                      noise, num_block)


def _sia_apply(x, h_edges, w_edges, ops, shift_v, shift_h, scale, noise,
               num_block: int):
    B, H, W, C = x.shape
    h_id = block_id(h_edges, H)
    w_id = block_id(w_edges, W)
    h_starts, h_lens = block_bounds(h_edges)
    w_starts, w_lens = block_bounds(w_edges)

    rows = jnp.arange(H)
    cols = jnp.arange(W)
    bi = h_id[:, None]  # (H, 1)
    bj = w_id[None, :]  # (1, W)
    op = ops[bi, bj]  # (H, W)

    a = h_starts[bi]  # block row start
    lh = h_lens[bi]
    c0 = w_starts[bj]
    lw = w_lens[bj]
    r = rows[:, None]
    c = cols[None, :]

    step_v = (shift_v[bi, bj] * lh).astype(jnp.int32)
    step_h = (shift_h[bi, bj] * lw).astype(jnp.int32)

    # source row: vshift → a + (r-a+step)%lh ; vflip/rot180 → mirrored
    src_r = jnp.where(
        op == 0, a + jnp.mod(r - a + step_v, lh),
        jnp.where((op == 2) | (op == 4), a + (lh - 1) - (r - a), r),
    )
    src_c = jnp.where(
        op == 1, c0 + jnp.mod(c - c0 + step_h, lw),
        jnp.where((op == 3) | (op == 4), c0 + (lw - 1) - (c - c0), c),
    )
    gathered = x[:, src_r, src_c, :]  # (B, H, W, C) advanced-index gather

    cell_scale = jnp.where(op == 5, scale[bi, bj], 1.0)[None, :, :, None]
    out = gathered * cell_scale.astype(x.dtype)
    noisy = jnp.clip(gathered + noise, 0.0, 1.0)
    out = jnp.where((op == 6)[None, :, :, None], noisy, out)
    return out


class SIA(MIFGSM):
    """Official args (``sia.py:36``): num_scale=20, num_block=3."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, num_scale=20, num_block=3, targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 attack="SIA", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.num_scale = int(num_scale)
        self.num_block = int(num_block)

    def num_copies(self):
        return self.num_scale

    def transform(self, x, state: AttackState, key):
        keys = jax.random.split(key, self.num_scale)
        return jax.vmap(lambda k: sia_blocktransform(x, k, self.num_block))(keys)
