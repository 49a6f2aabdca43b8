"""Static-shape blockwise image transforms (SIA / BSR machinery).

The reference implements these with Python loops over dynamically-shaped
tensor slices (``input_transformation/sia.py:blocktransform``,
``bsr.py:shuffle``) — impossible under jit.  Here every blockwise operation
is compiled to index arithmetic + one gather: cut points, per-block shifts,
flips, rotations and strip shuffles all become per-pixel source-index maps
with fully static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def random_cuts(key, size: int, num_block: int):
    """``num_block-1`` distinct interior cut points, sorted, as block right
    edges array of length num_block (last = size).  Matches SIA's
    ``np.random.choice(range(1, size), num_block-1, replace=False)``."""
    # distinct via gumbel-top-k over interior positions
    scores = jax.random.uniform(key, (size - 1,))
    _, idx = jax.lax.top_k(scores, num_block - 1)
    cuts = jnp.sort(idx + 1)
    return jnp.concatenate([cuts, jnp.asarray([size])])


def bsr_lengths(key, size: int, num_block: int):
    """BSR's random split lengths (``bsr.py:get_length``): proportional to
    uniform(0,2) draws, summing to ``size``; returned as right edges."""
    r = jax.random.uniform(key, (num_block,), minval=0.0, maxval=2.0)
    ends = jnp.round(jnp.cumsum(r) / jnp.sum(r) * size).astype(jnp.int32)
    ends = ends.at[-1].set(size)
    return ends


def block_id(edges, size: int):
    """Per-position block index from right-edge array: id[p] = #edges <= p."""
    pos = jnp.arange(size)
    return jnp.sum(pos[:, None] >= edges[None, :], axis=1)


def block_bounds(edges):
    """(starts, lengths) from right-edge array."""
    starts = jnp.concatenate([jnp.zeros((1,), edges.dtype), edges[:-1]])
    return starts, edges - starts


def permute_strips(edges, perm, size: int):
    """Index map realizing a strip shuffle: output position p reads input
    position map[p], where strips (defined by ``edges``) are re-ordered by
    ``perm``."""
    starts, lengths = block_bounds(edges)
    out_lengths = lengths[perm]
    out_ends = jnp.cumsum(out_lengths)
    out_starts = out_ends - out_lengths
    pos = jnp.arange(size)
    # which output strip does p fall in
    oid = jnp.sum(pos[:, None] >= out_ends[None, :], axis=1)
    offset = pos - out_starts[oid]
    src_strip = perm[oid]
    return starts[src_strip] + offset
