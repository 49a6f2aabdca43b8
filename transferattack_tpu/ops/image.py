"""Differentiable image warping (torch ``affine_grid``/``grid_sample`` parity).

Semantics match ``align_corners=False`` with zero padding and bilinear
interpolation — the mode every reference attack uses (ANDA
``gradient/anda.py:152-155``, SIA, DeCowA, L2T affine ops).  NHWC layout; the
gather-based bilinear sample vectorizes over the batch and is fully
differentiable, so gradients flow through augmentations exactly as they do
through torch's grid_sample backward.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def affine_grid(theta, H: int, W: int):
    """Sampling grid for a batch of 2×3 affine matrices.

    ``theta``: (B, 2, 3) mapping output normalized coords to input normalized
    coords (torch convention: row 0 → x_src, row 1 → y_src).
    Returns (B, H, W, 2) normalized (x, y) source coordinates in [-1, 1].
    """
    ys = (2.0 * jnp.arange(H, dtype=theta.dtype) + 1.0) / H - 1.0
    xs = (2.0 * jnp.arange(W, dtype=theta.dtype) + 1.0) / W - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (H, W)
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1)  # (H, W, 3)
    # (B, H, W, 2) = base @ theta^T
    return jnp.einsum("hwk,bik->bhwi", base, theta)


def grid_sample(x, grid):
    """Bilinear zero-padded sample. ``x``: (B,H,W,C); ``grid``: (B,Ho,Wo,2)
    normalized (x, y) coords, align_corners=False.

    The taps (and therefore the backward scatter-add) run in float32
    regardless of input dtype: bfloat16 gather/scatter kernels at batch ≳32
    were implicated in TPU v5e runtime faults during round-2 testing
    (IDAA/DeCowA sweeps), and fp32 tap arithmetic also avoids bf16
    interpolation error in the warp itself."""
    in_dtype = x.dtype
    x = x.astype(jnp.float32)
    grid = grid.astype(jnp.float32)
    B, H, W, C = x.shape
    gx = (grid[..., 0] + 1.0) * W / 2.0 - 0.5
    gy = (grid[..., 1] + 1.0) * H / 2.0 - 0.5

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    x1, y1 = x0 + 1, y0 + 1
    wx1 = gx - x0
    wy1 = gy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(ix, iy):
        inside = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        # per-image gather: (B, Ho, Wo, C)
        vals = jax.vmap(lambda img, yy, xx: img[yy, xx])(x, iyc, ixc)
        return vals * inside[..., None].astype(x.dtype)

    out = (
        gather(x0, y0) * (wx0 * wy0)[..., None]
        + gather(x1, y0) * (wx1 * wy0)[..., None]
        + gather(x0, y1) * (wx0 * wy1)[..., None]
        + gather(x1, y1) * (wx1 * wy1)[..., None]
    )
    return out.astype(in_dtype)


def affine_warp(x, theta):
    """Apply (B, 2, 3) affine matrices to an NHWC batch."""
    grid = affine_grid(theta, x.shape[1], x.shape[2])
    return grid_sample(x, grid)


@jax.custom_vjp
def affine_warp_fast(x, theta):
    """:func:`affine_warp` with a gather-only backward.

    The exact VJP of a bilinear warp is a scatter-add, which runs through
    the TPU's scalar engine (~1 s per (96,224,224,3) pass) and was
    implicated in v5e worker crashes (round 2/3, BASELINE.md).  This
    variant substitutes the continuous-operator adjoint: for sampling map
    ``src = N·p + τ`` (normalized coords), ``⟨g, W_N x⟩ = ⟨|det N|⁻¹ ·
    W_{N⁻¹} g, x⟩`` — the cotangent is *inverse-warped*, another gather.
    For bilinear resampling this is approximate at the interpolation-
    kernel scale.  Measured (``tests/test_warp_adjoint.py``, r4): with
    *model-gradient* cotangents at 64² under TRAP's harsh RandomAffine
    distribution (±90°, scale 0.5–1.5, shear ±30°) per-cotangent cosine
    vs the exact adjoint is 0.92 mean / 0.78 worst, sign agreement 0.89;
    pure translations/shears (AITL's ops) are near-exact.  End-to-end the
    aggregated sign dynamics wash the error out: TRAP fast-vs-exact toy
    deltas cosine 0.86 with sibling transfer-ASR delta 0.028, AITL
    bit-identical (BASELINE.md "approximate warp adjoint").  Every
    consumer (IR/TRAP's RandomAffine, AITL's affine op, OPS's rotations)
    uses the warp as a random augmentation whose aggregated gradient sign
    is what matters.  **No gradient flows to theta** (the parameters are
    random draws in all consumers); use :func:`affine_warp` where exact
    autodiff through the warp or theta gradients are required.
    """
    return affine_warp(x, theta)


def _affine_warp_fast_fwd(x, theta):
    return affine_warp(x, theta), theta


def _affine_warp_fast_bwd(theta, g):
    th = theta.astype(jnp.float32)
    N = th[:, :, :2]
    tau = th[:, :, 2]
    det = N[:, 0, 0] * N[:, 1, 1] - N[:, 0, 1] * N[:, 1, 0]
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-8, 1e-8, det)
    Ninv = jnp.stack(
        [
            jnp.stack([N[:, 1, 1], -N[:, 0, 1]], -1),
            jnp.stack([-N[:, 1, 0], N[:, 0, 0]], -1),
        ],
        axis=1,
    ) * inv_det[:, None, None]
    tau_inv = -jnp.einsum("bij,bj->bi", Ninv, tau)
    theta_inv = jnp.concatenate([Ninv, tau_inv[..., None]], axis=-1)
    x_ct = affine_warp(g.astype(jnp.float32), theta_inv)
    x_ct = (x_ct / jnp.abs(det)[:, None, None, None]).astype(g.dtype)
    return x_ct, jnp.zeros_like(theta)


affine_warp_fast.defvjp(_affine_warp_fast_fwd, _affine_warp_fast_bwd)


def translate(x, tx, ty):
    """Translate by normalized offsets (torch affine_grid convention: the
    theta translation column shifts the *sampling* grid, so +tx samples from
    the right, moving content left)."""
    B = x.shape[0]
    tx = jnp.broadcast_to(jnp.asarray(tx, x.dtype), (B,))
    ty = jnp.broadcast_to(jnp.asarray(ty, x.dtype), (B,))
    zeros = jnp.zeros_like(tx)
    ones = jnp.ones_like(tx)
    theta = jnp.stack(
        [
            jnp.stack([ones, zeros, tx], axis=-1),
            jnp.stack([zeros, ones, ty], axis=-1),
        ],
        axis=1,
    )
    return affine_warp(x, theta)


def rotate_fast(x, angle):
    """:func:`rotate` on the :func:`affine_warp_fast` path (gather-only
    backward, no theta gradient) — for rotation *augmentations* inside
    vmapped op switches where every branch executes and the exact
    scatter-add adjoint is the dominant cost (OPS, MuMoDIG)."""
    B = x.shape[0]
    a = jnp.broadcast_to(jnp.asarray(angle, x.dtype), (B,))
    c, s = jnp.cos(a), jnp.sin(a)
    zeros = jnp.zeros_like(a)
    theta = jnp.stack(
        [
            jnp.stack([c, -s, zeros], axis=-1),
            jnp.stack([s, c, zeros], axis=-1),
        ],
        axis=1,
    )
    return affine_warp_fast(x, theta)


def _lerp_rows(src, size):
    """(..., N_out, size) two-tap linear-interp operator rows from per-output
    source coordinates; taps outside [0, size) contribute zero."""
    p0 = jnp.floor(src)
    w = (src - p0)[..., None]
    grid = jnp.arange(size, dtype=src.dtype)
    hit0 = (grid == p0[..., None]).astype(src.dtype)
    hit1 = (grid == p0[..., None] + 1.0).astype(src.dtype)
    return hit0 * (1.0 - w) + hit1 * w


def rotate_mm(x, angle_deg: float):
    """Rotation by a *static, batch-shared* angle as dense banded matmuls.

    Exact quarter turns compose via ``jnp.rot90``; the ±45° residual is the
    Paeth three-shear, each pass an einsum with an on-the-fly (H, W, W)
    two-tap operator (shared across the batch — the whole-image version of
    BSR's strip trick).  No gather anywhere in forward or backward: for
    OPS's fixed-angle rotation branches, where both the scatter adjoint
    and (since round 3) the plain gather crash the v5e worker.  Matches
    :func:`rotate` to quarter-turn-exactness at 90/180 and to three-pass
    resampling at residual angles (same coordinate map).
    """
    import math

    B, H, W, C = x.shape
    a = float(angle_deg) % 360.0
    if a > 180.0:
        a -= 360.0
    q = int(round(a / 90.0))
    psi = math.radians(a - 90.0 * q)
    # rotate(x, θ) samples src = R(θ)·out; rot90(k=1) on (H, W) axes equals
    # rotate by −90° in that convention (verified against rotate() in
    # tests), so quarter turns use k = q
    out = jnp.rot90(x, k=q % 4, axes=(1, 2)) if q % 4 else x
    if abs(psi) < 1e-12:
        return out
    in_dtype = out.dtype
    xf = out.astype(jnp.float32)
    alpha = -math.tan(psi / 2.0)
    beta = math.sin(psi)
    rows = jnp.arange(H, dtype=jnp.float32)
    cols = jnp.arange(W, dtype=jnp.float32)
    y_norm = (2.0 * rows + 1.0) / H - 1.0
    x_norm = (2.0 * cols + 1.0) / W - 1.0
    # pass 1/3 (x-shear): src_c(h, o) = o + α·y_norm(h)·W/2, (H, W, W)
    src_x = cols[None, :] + (alpha * (W / 2.0)) * y_norm[:, None]
    Mx = _lerp_rows(src_x, W)
    # pass 2 (y-shear): src_r(w, v) = v + β·x_norm(w)·H/2, (W, H, H)
    src_y = rows[None, :] + (beta * (H / 2.0)) * x_norm[:, None]
    My = _lerp_rows(src_y, H)
    h1 = jnp.einsum("hvw,bhwc->bhvc", Mx, xf)
    h2 = jnp.einsum("wvh,bhwc->bvwc", My, h1)
    h3 = jnp.einsum("hvw,bhwc->bhvc", Mx, h2)
    return h3.astype(in_dtype)


def rotate(x, angle):
    """Rotate around the image center by ``angle`` radians (per-image or scalar)."""
    B = x.shape[0]
    a = jnp.broadcast_to(jnp.asarray(angle, x.dtype), (B,))
    c, s = jnp.cos(a), jnp.sin(a)
    zeros = jnp.zeros_like(a)
    theta = jnp.stack(
        [
            jnp.stack([c, -s, zeros], axis=-1),
            jnp.stack([s, c, zeros], axis=-1),
        ],
        axis=1,
    )
    return affine_warp(x, theta)


def scale_around_center(x, factor):
    """Zoom by ``factor`` (>1 zooms out / shrinks content, torch convention
    theta=diag(f): samples from a wider window)."""
    B = x.shape[0]
    f = jnp.broadcast_to(jnp.asarray(factor, x.dtype), (B,))
    zeros = jnp.zeros_like(f)
    theta = jnp.stack(
        [
            jnp.stack([f, zeros, zeros], axis=-1),
            jnp.stack([zeros, f, zeros], axis=-1),
        ],
        axis=1,
    )
    return affine_warp(x, theta)


def resize_bilinear(x, h: int, w: int):
    """Half-pixel bilinear resize (torch ``interpolate(align_corners=False)``)."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="bilinear")


def _shift_loop(xf, shift, axis: int, M: int, diff_weights: bool = False):
    """Σ_t w_t(shift)·slice_t(pad(x)) — the shared fwd/bwd kernel of
    :func:`shift_interp`.  ``diff_weights`` swaps the 2-hot interpolation
    weights (1−f, f) for (−1, +1), yielding ∂out/∂shift instead."""
    L = xf.shape[axis]
    s = jnp.clip(jnp.asarray(shift, jnp.float32), -M, M)
    k = jnp.floor(s)
    f = s - k
    kM = k + M
    pad = [(0, 0)] * xf.ndim
    pad[axis] = (M, M + 1)
    xp = jnp.pad(xf, pad)
    out = jnp.zeros_like(xf)
    for t in range(2 * M + 2):
        if diff_weights:
            w = jnp.where(kM + 1 == t, 1.0, 0.0) - jnp.where(kM == t, 1.0, 0.0)
        else:
            w = jnp.where(kM == t, 1.0 - f, 0.0) + jnp.where(kM + 1 == t, f, 0.0)
        sl = [slice(None)] * xf.ndim
        sl[axis] = slice(t, t + L)
        out = out + xp[tuple(sl)] * w[..., None]
    return out


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def shift_interp(x, shift, axis: int, max_shift: int):
    """Gather-free 1-D linear-interp shift with zero padding.

    ``out[o] = (1-f)·x[o+k] + f·x[o+k+1]`` along ``axis`` where
    ``shift = k+f`` (sampling convention ``src = out + shift``: positive
    shift moves content toward index 0, same as :func:`translate`).
    ``shift`` must be broadcastable to ``x.shape[:3]`` — e.g. ``(B, 1, 1)``
    for a per-image shift along W, ``(B, H, 1)`` for a per-row shear, or
    ``(B, H, W)`` for a fully per-pixel 1-D resample (the building block of
    :func:`warp_field_sep`).  Taps outside the image read zero (grid_sample
    zero padding); shifts are clamped to ``±max_shift``.

    When the shift varies *along the shifted axis itself* the hand-written
    VJP below (``S(s)ᵀ ≈ S(−s)``) is the continuous-operator adjoint — the
    same first-order approximation :func:`affine_warp_fast` uses — exact
    for shifts constant along the axis, accurate to O(∂s/∂o) otherwise.
    All consumers of the per-pixel mode are random augmentations with
    smooth fields whose aggregated gradient sign is what matters.

    Built from ``2·max_shift+2`` static slices of a zero-padded copy with
    2-hot weights, so both directions are pads, slices, and multiply-adds:
    no gather in the forward and — the point — no scatter-add in the
    backward.  The TPU's scalar scatter path makes a (96,224,224,3) warp
    fwd+bwd cost ~1012 ms; this form measures in single-digit ms (L2T
    probe, BASELINE.md round 3).  Taps run in float32 like
    :func:`grid_sample` (bf16 scatter faults + interp error, round 2).

    The VJP is hand-written because the 2-tap band is self-transpose:
    ``S(s)ᵀ = S(−s)`` (contributions ``o=i−k`` at weight ``1−f`` and
    ``o=i−k−1`` at weight ``f`` are exactly the taps of the negated
    shift), so the backward is the same forward-style loop and autodiff
    never sees the tap sum — without this, XLA materializes per-tap
    (n·B,H,W,C) temps and a 10-copy IDAA pass OOMs at 71 GB HBM.
    """
    return _shift_loop(x.astype(jnp.float32), shift, axis,
                       int(max_shift)).astype(x.dtype)


def _shift_interp_fwd(x, shift, axis, max_shift):
    return shift_interp(x, shift, axis, max_shift), (x, shift)


def _shift_interp_bwd(axis, max_shift, res, g):
    x, shift = res
    M = int(max_shift)
    gf = g.astype(jnp.float32)
    s = jnp.asarray(shift, jnp.float32)
    x_ct = _shift_loop(gf, -s, axis, M).astype(x.dtype)
    # ∂out/∂shift = x[o+k+1] − x[o+k]; reduce g·(∂out/∂shift) onto shift's
    # shape (channels always, plus every broadcast axis).  Dead-code
    # eliminated by XLA when the caller's shift is a random draw.
    dxds = _shift_loop(x.astype(jnp.float32), s, axis, M, diff_weights=True)
    red = (gf * dxds).sum(-1)
    s_shape = jnp.shape(jnp.asarray(shift))
    red = red.sum(tuple(range(red.ndim - len(s_shape))))
    for d, size in enumerate(s_shape):
        if size == 1 and red.shape[d] != 1:
            red = red.sum(d, keepdims=True)
    s_ct = red.astype(jnp.asarray(shift).dtype)
    return x_ct, s_ct


shift_interp.defvjp(_shift_interp_fwd, _shift_interp_bwd)


def translate_sep(x, tx, ty, max_shift: int):
    """:func:`translate` (normalized offsets, zero padding) as two
    gather-free :func:`shift_interp` passes.

    Bilinear zero-padded translation is exactly separable — the 4-tap
    weights factor as ``wx·wy`` and the tap rows/columns are independent —
    so this matches :func:`translate` to float rounding while avoiding its
    scatter-add backward.  ``max_shift`` bounds ``|t|·{W,H}/2`` in pixels
    and must be static.
    """
    B, H, W, _ = x.shape
    tx = jnp.broadcast_to(jnp.asarray(tx, jnp.float32), (B,))
    ty = jnp.broadcast_to(jnp.asarray(ty, jnp.float32), (B,))
    out = shift_interp(x, (tx * (W / 2.0))[:, None, None], 2, max_shift)
    return shift_interp(out, (ty * (H / 2.0))[:, None, None], 1, max_shift)


def translate_scalar(x, tx, ty, max_shift: int):
    """:func:`translate` for a *scalar* (per-call, batch-shared) offset.

    When the shift is one traced scalar — ANDA's per-view translations
    under ``lax.map``, where every image in the batch shares the view's
    offset — the 2-tap band of :func:`translate_sep` collapses to four
    ``dynamic_slice`` reads of a zero-padded copy blended bilinearly:
    2 + 2 slices instead of ``2·(2·max_shift+2)``.  The backward is
    ``dynamic_update_slice`` block writes — contiguous DMA, not the
    scalar-engine scatter-add fault class.  Matches :func:`translate`'s
    convention (``src = out + t``, zero padding) to float rounding;
    offsets are clamped to ``±max_shift``.
    """
    B, H, W, C = x.shape
    m = int(max_shift)
    sx = jnp.clip(jnp.asarray(tx, jnp.float32) * (W / 2.0), -m, m - 1e-3)
    sy = jnp.clip(jnp.asarray(ty, jnp.float32) * (H / 2.0), -m, m - 1e-3)
    kx = jnp.floor(sx)
    ky = jnp.floor(sy)
    fx = (sx - kx).astype(x.dtype)
    fy = (sy - ky).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (m, m + 1), (m, m + 1), (0, 0)))
    kxi = kx.astype(jnp.int32) + m
    kyi = ky.astype(jnp.int32) + m

    def sl(dy, dx):
        return jax.lax.dynamic_slice(
            xp, (0, kyi + dy, kxi + dx, 0), (B, H, W, C))

    return ((1 - fy) * (1 - fx) * sl(0, 0) + (1 - fy) * fx * sl(0, 1)
            + fy * (1 - fx) * sl(1, 0) + fy * fx * sl(1, 1))


def rotate_shear(x, angle, max_angle: float = 0.25):
    """Rotation as the Paeth three-shear decomposition — three gather-free
    :func:`shift_interp` passes instead of a 2-D warp.

    ``Shx(−tan θ/2)·Shy(sin θ)·Shx(−tan θ/2) = R(θ)`` exactly as a
    coordinate map; each shear is a per-row (or per-column) 1-D shift, so
    the whole resample is slices and multiply-adds with no gather/scatter
    (the same rewrite that made BSR 9.7× faster, ``bsr.py``, but with
    per-image angles, which rules out that file's shared dense matrices).
    Interpolation is per-pass linear — the classic three-pass rotation —
    rather than direct bilinear: same map, slightly different resampling
    (max abs pixel diff ≈2e-2 vs :func:`rotate` at |θ|≤0.2 on natural
    images).  Use for augmentation sampling (the reference's L2T rotates
    via ``torchvision.functional.rotate``, itself a different resampler —
    ``l2t.py:60-85``); keep :func:`rotate` where grid_sample parity is
    pinned.  ``max_angle`` (radians, static) bounds the shear tap windows.
    """
    import math

    B, H, W, _ = x.shape
    a = jnp.broadcast_to(jnp.asarray(angle, jnp.float32), (B,))
    alpha = -jnp.tan(a / 2.0)
    beta = jnp.sin(a)
    y_norm = (2.0 * jnp.arange(H, dtype=jnp.float32) + 1.0) / H - 1.0
    x_norm = (2.0 * jnp.arange(W, dtype=jnp.float32) + 1.0) / W - 1.0
    s_x = alpha[:, None] * y_norm[None, :] * (W / 2.0)  # (B, H)
    s_y = beta[:, None] * x_norm[None, :] * (H / 2.0)  # (B, W)
    Mx = int(math.ceil(math.tan(max_angle / 2.0) * (W / 2.0)))
    My = int(math.ceil(math.sin(max_angle) * (H / 2.0)))
    out = shift_interp(x, s_x[:, :, None], 2, Mx)
    out = shift_interp(out, s_y[:, None, :], 1, My)
    return shift_interp(out, s_x[:, :, None], 2, Mx)


def affine_warp_sep(x, theta):
    """:func:`affine_warp` as gather-free 1-D resample passes.

    Factors the sampling map ``src = N·p + τ`` (torch affine_grid
    convention, per-image (B, 2, 3) theta) as ``N = R·T`` (Givens RQ:
    rotation × upper-triangular), then

    1. embeds the image in a 1.5×-padded canvas (so no intermediate pass
       loses content — the classic multi-pass "bottleneck");
    2. applies the rotation as an exact per-image rot90·k (4-way select of
       transpose/flips) plus a ≤45° residual via the Paeth three-shear
       decomposition (:func:`rotate_shear`'s form);
    3. applies ``T`` as two triangular passes whose intermediate
       coordinates *are* the final source coordinates (no bottleneck):
       a y-resample ``src_y = t22·y + τ'_y`` (``t22 < 0`` handled by an
       exact flip select) and an x-resample ``src_x = t11·x + t12·y +
       τ'_x``, with ``τ' = Rᵀτ``;
    4. crops the center back to (H, W).

    Every resample is :func:`shift_interp`, so forward AND backward are
    pads, slices, and multiply-adds — no gather and no scatter-add (the
    v5e worker-crash class).  Same coordinate map as grid_sample,
    per-pass linear interpolation rather than direct bilinear
    (pixel-level differences at the interpolation-kernel scale, like
    :func:`rotate_shear`).  Square images only (the rot90 pivot needs
    H == W); keep :func:`affine_warp` elsewhere.

    **Cost caveat (measured, r4)**: the triangular passes need
    full-extent tap windows for wide scale ranges, and
    :func:`shift_interp` unrolls ``2·M+2`` static slices — at 224²
    (padded 336) that is ~670 slice ops per pass, which blew up the HLO
    and crashed the TPU worker when wired into TRAP's 300-iteration scan
    (BASELINE.md r4 "TRAP warp experiments").  Use at toy/medium
    resolutions or with narrow parameter ranges; TRAP keeps
    :func:`affine_warp_fast`.
    """
    B, H, W, _ = x.shape
    assert H == W, "affine_warp_sep: rot90 pivot requires square images"
    S = H
    th = theta.astype(jnp.float32)
    N = th[:, :, :2]
    # centered-pixel translation: src_cpx = N·p_cpx + τ·S/2 exactly
    tau = th[:, :, 2] * (S / 2.0)

    # Givens RQ on the first column: N = R(phi)·T, t11 ≥ 0
    a11, a12 = N[:, 0, 0], N[:, 0, 1]
    a21, a22 = N[:, 1, 0], N[:, 1, 1]
    t11 = jnp.sqrt(a11 * a11 + a21 * a21) + 1e-12
    c, s = a11 / t11, a21 / t11
    phi = jnp.arctan2(a21, a11)
    t12 = c * a12 + s * a22
    t22 = -s * a12 + c * a22
    tpx = c * tau[:, 0] + s * tau[:, 1]   # τ' = Rᵀ τ
    tpy = -s * tau[:, 0] + c * tau[:, 1]

    # ---- padded canvas ----------------------------------------------------
    Sp = int(math.ceil(S * 0.75)) * 2  # 1.5×, even
    pad = (Sp - S) // 2
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (pad, Sp - S - pad), (pad, Sp - S - pad), (0, 0)))

    # ---- exact rot90·k, residual |phi_r| ≤ π/4 ---------------------------
    k = jnp.round(phi / (jnp.pi / 2.0))
    phi_r = phi - k * (jnp.pi / 2.0)
    ki = jnp.mod(k.astype(jnp.int32), 4)
    # in(R_k q) for q in centered pixels: R_k rotates the sampling grid by
    # k·90° CCW in (x, y); on the index grid that is the inverse image
    # rotation — select the exactly-permuted copy per image.
    r1 = jnp.flip(jnp.swapaxes(xp, 1, 2), 1)   # in(R₁q): [i,j] ← in[j, -i]
    r2 = jnp.flip(xp, (1, 2))                  # in(R₂q): [i,j] ← in[-i, -j]
    r3 = jnp.flip(jnp.swapaxes(xp, 1, 2), 2)   # in(R₃q): [i,j] ← in[-j, i]
    kb = ki[:, None, None, None]
    g = jnp.where(kb == 1, r1, jnp.where(kb == 2, r2,
                                         jnp.where(kb == 3, r3, xp)))

    # residual rotation: Paeth three shears (coordinate map of R(phi_r))
    cp = (jnp.arange(Sp, dtype=jnp.float32) + 0.5) - Sp / 2.0  # centered px
    alpha = -jnp.tan(phi_r / 2.0)
    beta = jnp.sin(phi_r)
    Mx = int(math.ceil(math.tan(math.pi / 8.0) * Sp / 2.0)) + 1
    My = int(math.ceil(math.sin(math.pi / 4.0) * Sp / 2.0)) + 1
    sx_ = alpha[:, None] * cp[None, :]  # (B, Sp) by row (y)
    sy_ = beta[:, None] * cp[None, :]   # (B, Sp) by column (x)
    g = shift_interp(g, sx_[:, :, None], 2, Mx)
    g = shift_interp(g, sy_[:, None, :], 1, My)
    g = shift_interp(g, sx_[:, :, None], 2, Mx)

    # ---- triangular passes (intermediates = final coordinates) -----------
    # y-pass: src_y = t22·y + τ'_y; negative t22 via exact flip of g
    neg = t22 < 0
    gf = jnp.flip(g, 1)
    g = jnp.where(neg[:, None, None, None], gf, g)
    a22p = jnp.abs(t22)
    typ = jnp.where(neg, -tpy, tpy)
    s1 = (a22p - 1.0)[:, None] * cp[None, :] + typ[:, None]     # (B, Sp)
    g = shift_interp(g, s1[:, :, None], 1, Sp)
    # x-pass: src_x = t11·x + t12·y + τ'_x (y here is the OUTPUT row
    # coordinate — the flip above only re-expresses g inside the y-pass)
    s2 = ((t11 - 1.0)[:, None, None] * cp[None, None, :]
          + t12[:, None, None] * cp[None, :, None]
          + tpx[:, None, None])                                 # (B, Sp, Sp)
    g = shift_interp(g, s2, 2, Sp)

    return g[:, pad:pad + S, pad:pad + S, :].astype(x.dtype)


def warp_field_sep(x, dx, dy, max_x: int, max_y: int, zero_beyond=False):
    """Approximate 2-D displacement warp as two per-pixel 1-D resamples.

    ``dx``/``dy``: (B, H, W) source displacements in *pixels*
    (``src = p + d(p)``, grid_sample orientation).  Pass 1 resamples along
    W by ``dx``, pass 2 along H by ``dy`` — the Catmull–Smith-style
    separable decomposition, first-order exact for smooth fields (the
    y-field is evaluated on the pre-warp grid, error O(|d|·∂d)).  Both
    passes are :func:`shift_interp`, so forward AND backward are pads,
    slices, and multiply-adds — no gather/scatter anywhere (plain gathers
    in warp backwards fault the v5e worker at attack batch scale,
    BASELINE.md round 3).

    ``zero_beyond``: zero pixels whose displacement exceeds the clamp
    window — for warps (fisheye) whose large-displacement ring samples
    outside the image, where zero padding, not clamped resampling, is the
    faithful result.
    """
    out = shift_interp(x, dx, 2, max_x)
    out = shift_interp(out, dy, 1, max_y)
    if zero_beyond:
        valid = (jnp.abs(dx) <= max_x) & (jnp.abs(dy) <= max_y)
        out = out * valid[..., None].astype(out.dtype)
    return out


def _norm_grid(H: int, W: int, dtype=jnp.float32):
    """align_corners=False normalized pixel-center coordinates."""
    ys = (2.0 * jnp.arange(H, dtype=dtype) + 1.0) / H - 1.0
    xs = (2.0 * jnp.arange(W, dtype=dtype) + 1.0) / W - 1.0
    return jnp.meshgrid(ys, xs, indexing="ij")  # (H, W) each


def homography_field(src_corners, H: int, W: int, dst_corners=None):
    """Per-pixel displacement field of the homography T with
    ``T(dst_corners_i) = src_corners_i`` evaluated on the output grid
    (``dst_corners`` defaults to the output corners (±1, ±1)); corners are
    (B, 4, 2) normalized (x, y), order (-1,-1), (1,-1), (1,1), (-1,1).
    Returns (dx, dy) in pixels for :func:`warp_field_sep`.  The 8×8 DLT
    solve is batched dense algebra — no gather."""
    B = src_corners.shape[0]
    base = jnp.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]],
                     jnp.float32)
    if dst_corners is None:
        dst_corners = jnp.broadcast_to(base, (B, 4, 2))

    def dlt_rows(p, q):
        # p: output corner (x, y); q: source corner (u, v)
        x, y = p[0], p[1]
        u, v = q[0], q[1]
        r1 = jnp.stack([x, y, 1.0, 0.0 * x, 0.0 * x, 0.0 * x, -u * x, -u * y])
        r2 = jnp.stack([0.0 * x, 0.0 * x, 0.0 * x, x, y, 1.0, -v * x, -v * y])
        return jnp.stack([r1, r2]), jnp.stack([u, v])

    def solve_one(dst, corners):
        rows, rhs = jax.vmap(dlt_rows)(dst, corners)
        A = rows.reshape(8, 8)
        b = rhs.reshape(8)
        h = jnp.linalg.solve(A, b)
        return jnp.concatenate([h, jnp.ones((1,), h.dtype)]).reshape(3, 3)

    Hm = jax.vmap(solve_one)(dst_corners.astype(jnp.float32),
                             src_corners.astype(jnp.float32))  # (B, 3, 3)
    gy, gx = _norm_grid(H, W)
    ones = jnp.ones_like(gx)
    pts = jnp.stack([gx, gy, ones], axis=-1)  # (H, W, 3)
    proj = jnp.einsum("bij,hwj->bhwi", Hm, pts)
    sx = proj[..., 0] / proj[..., 2]
    sy = proj[..., 1] / proj[..., 2]
    dx = (sx - gx[None]) * (W / 2.0)
    dy = (sy - gy[None]) * (H / 2.0)
    return dx, dy


def tps_field(offsets, H: int, W: int, grid_n: int = 3):
    """Thin-plate-spline displacement field from a ``grid_n × grid_n``
    control grid on [-1, 1]² displaced by ``offsets`` (B, grid_n², 2)
    normalized.  Exact TPS (U(r) = r²·log r²) — the control points are
    static, so the (K+P) system inverse is a compile-time constant and the
    evaluation is one einsum.  Returns (dx, dy) in pixels."""
    import numpy as np

    n = grid_n * grid_n
    lin = np.linspace(-1.0, 1.0, grid_n, dtype=np.float32)
    cy, cx = np.meshgrid(lin, lin, indexing="ij")
    ctrl = np.stack([cx.ravel(), cy.ravel()], -1)  # (n, 2)

    def U(r2):
        return r2 * np.log(r2 + 1e-9)

    d2 = ((ctrl[:, None, :] - ctrl[None, :, :]) ** 2).sum(-1)
    K = U(d2)
    P = np.concatenate([np.ones((n, 1), np.float32), ctrl], 1)  # (n, 3)
    L = np.zeros((n + 3, n + 3), np.float32)
    L[:n, :n] = K
    L[:n, n:] = P
    L[n:, :n] = P.T
    Linv = jnp.asarray(np.linalg.inv(L))  # static

    gy, gx = _norm_grid(H, W)
    pts = jnp.stack([gx.ravel(), gy.ravel()], -1)  # (HW, 2)
    r2 = ((pts[:, None, :] - jnp.asarray(ctrl)[None]) ** 2).sum(-1)
    Ue = r2 * jnp.log(r2 + 1e-9)  # (HW, n)
    Pe = jnp.concatenate([jnp.ones((pts.shape[0], 1)), pts], 1)  # (HW, 3)
    basis = jnp.concatenate([Ue, Pe], 1)  # (HW, n+3)

    rhs = jnp.concatenate(
        [offsets.astype(jnp.float32),
         jnp.zeros((offsets.shape[0], 3, 2), jnp.float32)], axis=1)
    wa = jnp.einsum("ij,bjk->bik", Linv, rhs)  # (B, n+3, 2)
    f = jnp.einsum("pj,bjk->bpk", basis, wa).reshape(
        offsets.shape[0], H, W, 2)
    return f[..., 0] * (W / 2.0), f[..., 1] * (H / 2.0)


def gaussian_blur_sep(field, kernel_size: int, sigma_x: float, sigma_y: float):
    """Separable gaussian blur of a (B, H, W, C) field via two depthwise
    convs (kornia ``gaussian_blur2d`` semantics, reflect-free same padding)."""
    def kern(sig):
        half = (kernel_size - 1) / 2.0
        t = jnp.arange(kernel_size, dtype=jnp.float32) - half
        k = jnp.exp(-0.5 * (t / sig) ** 2)
        return k / k.sum()

    C = field.shape[-1]
    kx = jnp.tile(kern(sigma_x).reshape(1, kernel_size, 1, 1), (1, 1, 1, C))
    ky = jnp.tile(kern(sigma_y).reshape(kernel_size, 1, 1, 1), (1, 1, 1, C))
    dn = jax.lax.conv_dimension_numbers(field.shape, kx.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        field.astype(jnp.float32), kx, (1, 1), "SAME", dimension_numbers=dn,
        feature_group_count=C)
    out = jax.lax.conv_general_dilated(
        out, ky, (1, 1), "SAME", dimension_numbers=dn, feature_group_count=C)
    return out
