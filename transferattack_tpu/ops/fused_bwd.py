"""Pallas fused conv-backward-input pipeline for the ResNet bottleneck.

VERDICT r2 item 2 asked for a *measured* (not extrapolated) verdict on
the one remaining throughput lever in the MI-FGSM/ResNet-50 roofline:
BASELINE.md attributes the 527 → ~990 img/s gap to backward elementwise
traffic (ReLU mask select, dtype converts, residual adds) that XLA only
partially fuses into the conv backward.  These kernels implement the
bottleneck's backward-input chain with the elementwise ops fused into
the GEMMs so that mask/skip tensors make exactly one HBM round-trip:

  ``fused_bwd_1x1``   dx = (g · mask) @ Wᵀ (+ skip)
                      — the backward-input of a 1×1 conv is a plain
                      GEMM; the ReLU mask is a prologue and the
                      residual-gradient add an epilogue, both free in
                      VMEM.
  ``fused_bwd_3x3``   dx = conv3x3_same(g · mask, W′) (+ skip)
                      — backward-input of a SAME 3×3 conv is itself a
                      3×3 conv with the spatially-flipped,
                      channel-transposed kernel (W′ prepared by the
                      caller); realized as in-VMEM im2col (9 shifted
                      copies → one (H·W, 9·C) GEMM) so the 9-tap
                      accumulation is a single MXU pass per image.

Whole-image blocks: at the stage-1 shapes the VERDICT names
(56²×64/256), one image's activations are ≤1.7 MB bf16 — far under the
~16 MB VMEM budget — so the grid is simply (batch,) [3×3] or row-tiles
[1×1].

Correctness is pinned against the jnp composition in
``tests/test_fused_bwd.py`` (interpret mode on CPU); the A/B against
XLA's own fusion runs on the real chip via ``scripts/bench_fused_bwd.py``
and the verdict is recorded in BASELINE.md.  Like ``pallas_update``,
nothing routes through these kernels by default — they are the measured
answer to "would a hand-fused backward beat XLA here".

Reference context: the torch reference has no custom kernels for this
(``transferattack/gradient/mifgsm.py`` relies on cuDNN autograd); the
roofline work is TPU-specific.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LANE = 128


def _bwd_1x1_kernel(g_ref, m_ref, wt_ref, skip_ref, out_ref):
    gm = g_ref[:] * m_ref[:]
    acc = jnp.dot(gm, wt_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (acc + skip_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def _bwd_1x1_kernel_noskip(g_ref, m_ref, wt_ref, out_ref):
    gm = g_ref[:] * m_ref[:]
    acc = jnp.dot(gm, wt_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def fused_bwd_1x1(g, mask, wt, skip=None, *, tile_m: int = 1024,
                  interpret: bool = False):
    """(g · mask) @ wt (+ skip), tiled over rows.

    g, mask: (M, Cout); wt: (Cout, Cin) — the *transposed* forward
    kernel; skip: optional (M, Cin).  M must be a multiple of tile_m
    (callers flatten B·H·W, which is 128·56·56 here).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, cout = g.shape
    cin = wt.shape[1]
    tile_m = min(tile_m, m)
    assert m % tile_m == 0, (m, tile_m)
    grid = (m // tile_m,)
    row_spec = pl.BlockSpec((tile_m, cout), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((cout, cin), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_m, cin), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    if skip is None:
        return pl.pallas_call(
            _bwd_1x1_kernel_noskip,
            out_shape=jax.ShapeDtypeStruct((m, cin), g.dtype),
            grid=grid, in_specs=[row_spec, row_spec, w_spec],
            out_specs=out_spec, interpret=interpret,
        )(g, mask, wt)
    skip_spec = pl.BlockSpec((tile_m, cin), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_1x1_kernel,
        out_shape=jax.ShapeDtypeStruct((m, cin), g.dtype),
        grid=grid, in_specs=[row_spec, row_spec, w_spec, skip_spec],
        out_specs=out_spec, interpret=interpret,
    )(g, mask, wt, skip)


def _bwd_3x3_kernel(g_ref, m_ref, w_ref, out_ref, pad_ref, col_ref, *,
                    h, w, cout):
    # gm, zero-padded by 1 in both spatial dims
    pad_ref[:] = jnp.zeros_like(pad_ref)
    pad_ref[1:h + 1, 1:w + 1, :] = g_ref[0] * m_ref[0]
    # im2col: 9 shifted (H, W, Cout) views → (H·W, 9·Cout)
    for t, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                 for dx in range(3)):
        col_ref[:, t * cout:(t + 1) * cout] = (
            pad_ref[dy:dy + h, dx:dx + w, :].reshape(h * w, cout))
    acc = jnp.dot(col_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype).reshape(h, w, -1)


def fused_bwd_3x3(g, mask, w_col, *, interpret: bool = False):
    """conv3x3_same(g · mask, W′) via in-VMEM im2col, one image per step.

    g, mask: (B, H, W, Cout); w_col: (9·Cout, Cin) — the flipped/
    transposed backward kernel already laid out in im2col order
    (tap-major, see ``flip_3x3_for_bwd``).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, cout = g.shape
    cin = w_col.shape[1]
    img_spec = pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((9 * cout, cin), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_bwd_3x3_kernel, h=h, w=w, cout=cout)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, w, cin), g.dtype),
        grid=(b,),
        in_specs=[img_spec, img_spec, w_spec],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, cout), g.dtype),
            pltpu.VMEM((h * w, 9 * cout), g.dtype),
        ],
        interpret=interpret,
    )(g, mask, w_col)


def flip_3x3_for_bwd(w):
    """(3, 3, Cin, Cout) forward kernel → (9·Cout, Cin) im2col backward
    kernel: spatial flip + channel transpose, tap-major rows."""
    wf = w[::-1, ::-1]                       # spatial flip
    wf = jnp.transpose(wf, (0, 1, 3, 2))     # (3, 3, Cout, Cin)
    return wf.reshape(9 * w.shape[3], w.shape[2])


# ---------------------------------------------------------------------------
# reference jnp composition (what XLA fuses on its own) — used for both
# the correctness pin and the A/B baseline
# ---------------------------------------------------------------------------

def jnp_bwd_1x1(g, mask, wt, skip=None):
    acc = jnp.dot(g * mask, wt, preferred_element_type=jnp.float32)
    if skip is not None:
        acc = acc + skip.astype(jnp.float32)
    return acc.astype(g.dtype)


def jnp_bwd_3x3(g, mask, w):
    """XLA composition: mask multiply + conv_general_dilated transpose."""
    gm = g * mask
    # backward-input of SAME 3x3 stride-1 conv == SAME conv with
    # flipped kernel and swapped channels
    wf = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    return jax.lax.conv_general_dilated(
        gm, wf, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(g.dtype)


def bottleneck_bwd_input_jnp(g, masks, weights):
    """Backward-input chain of one stage-1 bottleneck (XLA baseline).

    g: (B, H, W, 256) gradient at the block output; masks: dict with
    out/(256), c2/(64), c1/(64) ReLU masks; weights: w1 (1,1,256,64),
    w2 (3,3,64,64), w3 (1,1,64,256) forward HWIO kernels.
    """
    b, h, w, _ = g.shape
    g_in = g * masks["out"]                       # relu at block output
    flat = g_in.reshape(b * h * w, -1)
    d2 = jnp.dot(flat, weights["w3"][0, 0].T,
                 preferred_element_type=jnp.float32).astype(g.dtype)
    d2 = d2.reshape(b, h, w, -1)
    d1 = jnp_bwd_3x3(d2, masks["c2"], weights["w2"])
    dx = jnp_bwd_1x1(d1.reshape(b * h * w, -1), masks["c1"].reshape(b * h * w, -1),
                     weights["w1"][0, 0].T, skip=flat)
    return dx.reshape(b, h, w, -1)


def bottleneck_bwd_input_pallas(g, masks, weights, *, interpret=False):
    """Same chain with the three fused Pallas kernels."""
    b, h, w, _ = g.shape
    flat_g = g.reshape(b * h * w, -1)
    d2 = fused_bwd_1x1(flat_g, masks["out"].reshape(b * h * w, -1),
                       weights["w3"][0, 0].T, interpret=interpret)
    d2 = d2.reshape(b, h, w, -1)
    d1 = fused_bwd_3x3(d2, masks["c2"], flip_3x3_for_bwd(weights["w2"]),
                       interpret=interpret)
    gm_out = flat_g * masks["out"].reshape(b * h * w, -1)
    dx = fused_bwd_1x1(d1.reshape(b * h * w, -1),
                       masks["c1"].reshape(b * h * w, -1),
                       weights["w1"][0, 0].T, skip=gm_out,
                       interpret=interpret)
    return dx.reshape(b, h, w, -1)
