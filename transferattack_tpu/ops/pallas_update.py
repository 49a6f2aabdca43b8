"""Pallas TPU kernel for the fused attack-update step.

The inner-loop epilogue of every sign-based attack is

    delta' = clip(x + clip(delta + α·sign(m), −ε, ε), 0, 1) − x

— four elementwise passes over three (B,H,W,C) tensors.  Arrays are
processed as flattened (rows, 128) tiles (fp32 native tiling is (8, 128));
ragged tails fall back to the jnp path.

Measured on a v5e chip (batch 128 @ 224², 20 reps, remote tunnel): the
Pallas kernel matches XLA bit-exactly but is NOT faster (≈71 ms vs ≈29 ms
per synchronized call; tile size 512–1024 rows makes no difference) — XLA's
own elementwise fusion already achieves one HBM round-trip here, exactly as
SURVEY.md §2.9 predicted for this class of op.  The kernel therefore stays
OPT-IN (``TA_TPU_PALLAS=1``) as the template for update rules XLA cannot
fuse (per-pixel decay masks, staircase quantile signs), with correctness
pinned to the jnp reference via ``interpret=True`` tests.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

LANE = 128
SUBLANE = 8
TILE_ROWS = 512  # (512, 128) fp32 tile = 256 KB / operand in VMEM


def _kernel(delta_ref, m_ref, x_ref, out_ref, *, alpha, eps, lo, hi):
    d = delta_ref[:]
    m = m_ref[:]
    x = x_ref[:]
    stepped = jnp.clip(d + alpha * jnp.sign(m), -eps, eps)
    out_ref[:] = jnp.clip(x + stepped, lo, hi) - x


def _pallas_call(flat_delta, flat_m, flat_x, alpha, eps, lo, hi, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = flat_delta.shape[0]
    grid = (rows // TILE_ROWS,)
    # index_map returns BLOCK indices (scaled by block_shape internally)
    spec = pl.BlockSpec(
        (TILE_ROWS, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    kern = functools.partial(
        _kernel, alpha=alpha, eps=eps, lo=lo, hi=hi
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(flat_delta.shape, flat_delta.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(flat_delta, flat_m, flat_x)


def pallas_enabled() -> bool:
    if os.environ.get("TA_TPU_PALLAS", "0") != "1":
        return False
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def fused_sign_update(delta, momentum, x, alpha: float, eps: float,
                      lo: float = 0.0, hi: float = 1.0,
                      interpret: bool = False):
    """Fused sign-step + eps-ball + image-bound projection.

    Shapes must match; any shape whose element count is divisible by
    TILE_ROWS·128 runs the Pallas kernel, others use the identical jnp path.
    """
    n = delta.size
    tile = TILE_ROWS * LANE
    if delta.dtype == jnp.float32 and n % tile == 0:
        shape = delta.shape
        out = _pallas_call(
            delta.reshape(-1, LANE), momentum.reshape(-1, LANE),
            x.reshape(-1, LANE), float(alpha), float(eps), float(lo),
            float(hi), interpret,
        )
        return out.reshape(shape)
    stepped = jnp.clip(delta + alpha * jnp.sign(momentum), -eps, eps)
    return jnp.clip(x + stepped, lo, hi) - x
