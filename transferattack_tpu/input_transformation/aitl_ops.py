"""AITL's 20 input transformations (reference
``transferattack/input_transformation/aitl.py:280-533``), as static-shape
JAX ops indexed 1..20 for ``lax.switch``.

Reference quirks preserved deliberately (bug-faithful):

* ``input_invert`` computes the nice 1−x flip then overwrites it with plain
  negation (``aitl.py:436-439``) — we return ``-x``;
* ``input_rotate`` passes radians to torchvision's *degrees* parameter
  (``aitl.py:383-386``) — the rotation is ±0.52°, nearly identity;
* ``input_sharpness``'s kernel sums over RGB into one channel that then
  broadcasts against the 3-channel image (``aitl.py:318-330``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import affine_warp_fast
from .dim import random_resize_pad


def _u(key, lo, hi, shape=()):
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


def _blend(degenerate, x, factor):
    return jnp.clip(degenerate * (1 - factor) + x * factor, 0.0, 1.0)


def _gray(x):
    g = 0.2989 * x[..., 0] + 0.5870 * x[..., 1] + 0.1140 * x[..., 2]
    return g[..., None]


def _affine(x, a, b, tx, c, d, ty):
    B = x.shape[0]
    row0 = jnp.stack([a, b, tx])
    row1 = jnp.stack([c, d, ty])
    theta = jnp.broadcast_to(jnp.stack([row0, row1]), (B, 2, 3)).astype(x.dtype)
    return affine_warp_fast(x, theta)


def _one(v):
    return jnp.asarray(v, jnp.float32)


def op_crop(x, key):
    """Random center-crop-and-place: resize to rnd∈[200,H), zero-pad at a
    random offset (``aitl.py:388-404``)."""
    H, W = x.shape[1], x.shape[2]
    k1, k2, k3 = jax.random.split(key, 3)
    lo = min(200, H - 1)
    rnd = jax.random.randint(k1, (), lo, H).astype(x.dtype)
    s = rnd / H
    top = jnp.floor(_u(k2, 0.0, 1.0) * (H - rnd))
    left = jnp.floor(_u(k3, 0.0, 1.0) * (W - rnd))
    return jax.image.scale_and_translate(
        x, x.shape, (1, 2), jnp.stack([s, s]), jnp.stack([top, left]),
        method="linear",
    )


def op_brightness(x, key):
    return _blend(jnp.zeros_like(x), x, _u(key, 0.5, 1.5))


def op_color(x, key):
    return _blend(jnp.broadcast_to(_gray(x), x.shape), x, _u(key, 0.5, 1.5))


def op_translate_x(x, key):
    t = _u(key, -0.4, 0.4)
    return _affine(x, _one(1), _one(0), t, _one(0), _one(1), _one(0))


def op_translate_y(x, key):
    t = _u(key, -0.4, 0.4)
    return _affine(x, _one(1), _one(0), _one(0), _one(0), _one(1), t)


def op_admix(x, key, portion=0.2):
    perm = jax.random.permutation(key, x.shape[0])
    return jnp.clip(x + portion * x[perm], 0.0, 1.0)


def op_shear_y(x, key):
    f = _u(key, -0.5, 0.5)
    return _affine(x, _one(1), _one(0), _one(0), f, _one(1), _one(0))


def op_resize(x, key):
    return random_resize_pad(x, key, 1.15, 1.0)


def op_contrast(x, key):
    g = _gray(x)
    mean = g.mean(axis=(1, 2, 3), keepdims=True)
    return _blend(jnp.ones_like(x) * mean, x, _u(key, 0.5, 1.5))


def op_cutout(x, key):
    """RandomErasing(p=1, scale=0.04, ratio=0.4, value=0)."""
    H, W = x.shape[1], x.shape[2]
    area = 0.04 * H * W
    h = jnp.sqrt(area * 0.4)
    w = area / h
    k1, k2 = jax.random.split(key)
    top = _u(k1, 0.0, 1.0) * (H - h)
    left = _u(k2, 0.0, 1.0) * (W - w)
    rows = jnp.arange(H, dtype=x.dtype)[None, :, None, None]
    cols = jnp.arange(W, dtype=x.dtype)[None, None, :, None]
    inside = ((rows >= top) & (rows < top + h)
              & (cols >= left) & (cols < left + w))
    return jnp.where(inside, 0.0, x)


def _rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    df = mx - mn + 1e-12
    h = jnp.where(
        mx == r, (g - b) / df % 6.0,
        jnp.where(mx == g, (b - r) / df + 2.0, (r - g) / df + 4.0),
    ) / 6.0
    s = jnp.where(mx > 0, df / (mx + 1e-12), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def op_hue(x, key, delta=0.2):
    B = x.shape[0]
    d = jax.random.uniform(key, (B, 1, 1), minval=-delta, maxval=delta)
    hsv = _rgb_to_hsv(x)
    # hue is circular: torchvision adjust_hue wraps mod 1.0 (clipping would
    # saturate reds near the 0/1 boundary instead of rotating through)
    hsv = hsv.at[..., 0].set(jnp.mod(hsv[..., 0] + d, 1.0))
    hsv = hsv.at[..., 1:].set(jnp.clip(hsv[..., 1:], 0.0, 1.0))
    return _hsv_to_rgb(hsv)


def op_invert(x, key):
    return -x  # bug-faithful (see module docstring)


def op_reshape(x, key):
    ks = jax.random.split(key, 6)
    sx, sy = _u(ks[0], 0.5, 1.5), _u(ks[1], 0.5, 1.5)
    shx, shy = _u(ks[2], -0.5, 0.5), _u(ks[3], -0.5, 0.5)
    tx, ty = _u(ks[4], -0.5, 0.5), _u(ks[5], -0.5, 0.5)
    return _affine(x, sx, shx, tx, shy, sy, ty)


def op_gamma(x, key, delta=1.0):
    B = x.shape[0]
    g = jax.random.uniform(key, (B, 1, 1, 1), minval=1 - delta, maxval=1 + delta)
    return jnp.clip(jnp.power(x + 1e-10, g), 0.0, 1.0)


def op_sharpness(x, key):
    k = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    # reference kernel sums the smoothed RGB channels into one map that
    # broadcasts back over channels
    kern = jnp.stack([k] * 3, axis=-1)[..., None]  # (3,3,3,1) HWIO
    deg = jax.lax.conv_general_dilated(
        x, kern, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return _blend(deg, x, _u(key, 0.5, 1.5))


def op_shear_x(x, key):
    f = _u(key, -0.5, 0.5)
    return _affine(x, _one(1), f, _one(0), _one(0), _one(1), _one(0))


def op_scale(x, key):
    s = 2.0 ** jax.random.randint(key, (), 0, 5).astype(x.dtype)
    return x / s


def op_rotate(x, key):
    # torchvision degrees=np.pi/6 → ±0.5236 DEGREES (bug-faithful)
    ang = _u(key, -jnp.pi / 6, jnp.pi / 6) * (jnp.pi / 180.0)
    c, s = jnp.cos(ang), jnp.sin(ang)
    return _affine(x, c, -s, _one(0), s, c, _one(0))


def op_admix_and_scale(x, key, portion=0.2):
    k1, k2 = jax.random.split(key)
    perm = jax.random.permutation(k1, x.shape[0])
    s = 2.0 ** jax.random.randint(k2, (), 0, 5).astype(x.dtype)
    return jnp.clip((x + portion * x[perm]) / s, 0.0, 1.0)


def op_saturation(x, key):
    # ColorJitter(saturation=10): factor ~ U[0, 11] blending with grayscale
    f = _u(key, 0.0, 11.0)
    return _blend(jnp.broadcast_to(_gray(x), x.shape), x, f)


AITL_OPS = (
    op_crop, op_brightness, op_color, op_translate_x, op_translate_y,
    op_admix, op_shear_y, op_resize, op_contrast, op_cutout, op_hue,
    op_invert, op_reshape, op_gamma, op_sharpness, op_shear_x, op_scale,
    op_rotate, op_admix_and_scale, op_saturation,
)


def apply_aitl_op(x, index_1based, key):
    """``transform_index`` (``aitl.py:533``): dispatch on a traced index."""
    return jax.lax.switch(index_1based - 1, AITL_OPS, x, key)
