"""Differentiable image warping (torch ``affine_grid``/``grid_sample`` parity).

Semantics match ``align_corners=False`` with zero padding and bilinear
interpolation — the mode every reference attack uses (ANDA
``gradient/anda.py:152-155``, SIA, DeCowA, L2T affine ops).  NHWC layout; the
gather-based bilinear sample vectorizes over the batch and is fully
differentiable, so gradients flow through augmentations exactly as they do
through torch's grid_sample backward.
"""
from __future__ import annotations

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
