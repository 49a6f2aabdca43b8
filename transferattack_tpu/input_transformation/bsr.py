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


def _lerp_matrix(src, size, dtype):
    """Banded interpolation operator from per-output source coordinates.

    ``src``: (..., N_out) fractional source positions.  Returns
    (..., N_out, size) with the two linear-interpolation taps per row; taps
    falling outside [0, size) contribute zero (the reference's zero fill).
    Dense on purpose: applied as an einsum it runs on the MXU, whereas the
    equivalent 2-D gather (and its scatter-add backward) goes through the
    TPU's scalar gather engine at ~25× the attack's whole model cost
    (measured 1.66 img/s vs the 20.5 img/s copy-count-bound of SSM).
    """
    p0 = jnp.floor(src)
    w = (src - p0)[..., None]
    grid = jnp.arange(size, dtype=src.dtype)
    hit0 = (grid == p0[..., None]).astype(dtype)
    hit1 = (grid == p0[..., None] + 1.0).astype(dtype)
    return hit0 * (1.0 - w).astype(dtype) + hit1 * w.astype(dtype)


def _rotate_row_strips(x, h_edges, angles):
    """Rotate each row strip around its own center (bilinear, zero outside
    the strip) as a Paeth shear triple — three banded einsums on the MXU.

    R(θ) = Shx(−tan θ/2)·Shy(sin θ)·Shx(−tan θ/2); each shear is row- (or
    column-) local, so the whole resample is three batched matmuls instead
    of an unstructured 2-D gather.  Interpolation is per-pass linear (the
    classic three-pass rotation) rather than direct bilinear — same map,
    equivalent augmentation.
    """
    B, H, W, C = x.shape
    h_id = block_id(h_edges, H)
    starts, lens = block_bounds(h_edges)

    rows = jnp.arange(H, dtype=x.dtype)
    cols = jnp.arange(W, dtype=x.dtype)
    a = starts[h_id].astype(x.dtype)
    lh = lens[h_id].astype(x.dtype)
    cy = a + (lh - 1) / 2.0          # (H,) own-strip center row
    cx = (W - 1) / 2.0
    theta = angles[h_id]             # (H,)
    alpha = -jnp.tan(theta / 2.0)
    beta = jnp.sin(theta)

    # pass 1 (horizontal): src_c = c − α_r·(r − cy_r)
    src1 = cols[None, :] - (alpha * (rows - cy))[:, None]          # (H, W)
    M1 = _lerp_matrix(src1, W, x.dtype)                            # (H, W, W)
    h1 = jnp.einsum("hvw,bhwc->bhvc", M1, x)

    # pass 2 (vertical): src_r = r − β_{k(r)}·(c − cx), taps confined to the
    # target row's own strip (zero fill outside, as the reference samples)
    src2 = rows[None, :] - beta[None, :] * (cols[:, None] - cx)    # (W, H)
    M2 = _lerp_matrix(src2, H, x.dtype)                            # (W, H, H)
    lo = a[None, :, None]
    hi = (a + lh - 1.0)[None, :, None]
    grid_r = jnp.arange(H, dtype=x.dtype)[None, None, :]
    M2 = M2 * ((grid_r >= lo) & (grid_r <= hi)).astype(x.dtype)
    h2 = jnp.einsum("cvr,brcj->bvcj", M2, h1)

    # pass 3 (horizontal): same α shear again — M1 is reused
    return jnp.einsum("hvw,bhwc->bhvc", M1, h2)


def bsr_shuffle_rows_first(x, key, num_block: int, max_angle_deg: float = 24.0,
                           params=None):
    """``params`` (optional dict: ``h_edges, angles, w_edges (nb, nb),
    col_perms (nb, nb), row_perm``) bypasses sampling — used by the
    fixed-parameter parity twins (``tests/test_attack_parity2.py``)."""
    B, H, W, C = x.shape
    if params is None:
        kh, kang, kperm_h, kcols = jax.random.split(key, 4)
        h_edges = bsr_lengths(kh, H, num_block)
        angles = (
            jax.random.uniform(kang, (num_block,), minval=-max_angle_deg,
                               maxval=max_angle_deg)
            * jnp.pi / 180.0
        )
    else:
        h_edges, angles = params["h_edges"], params["angles"]
    rotated = _rotate_row_strips(x, h_edges, angles)

    # per-row-strip column shuffle (fresh cuts + permutation per strip)
    h_id = block_id(h_edges, H)
    colmaps = []
    for s in range(num_block):
        if params is None:
            k1, k2, kcols = jax.random.split(kcols, 3)
            w_edges = bsr_lengths(k1, W, num_block)
            perm = jax.random.permutation(k2, num_block)
        else:
            w_edges, perm = params["w_edges"][s], params["col_perms"][s]
        colmaps.append(permute_strips(w_edges, perm, W))
    colmap = jnp.stack(colmaps)  # (num_block, W)

    # row-strip shuffle
    if params is None:
        perm_rows = jax.random.permutation(kperm_h, num_block)
    else:
        perm_rows = params["row_perm"]
    rowmap = permute_strips(h_edges, perm_rows, H)  # (H,)

    # structured axis-take for rows, one-hot einsum for the per-strip column
    # permutation (MXU; see _lerp_matrix on why not a 2-D gather)
    taken = jnp.take(rotated, rowmap, axis=1)
    src_cols = colmap[h_id[rowmap]]  # (H, W)
    CP = (src_cols[:, :, None]
          == jnp.arange(W)[None, None, :]).astype(x.dtype)
    return jnp.einsum("hvw,bhwc->bhvc", CP, taken)


def bsr_one_copy(x, key, num_block: int, params=None):
    if params is None:
        korder, kmain = jax.random.split(key)
        flip = jax.random.bernoulli(korder)
    else:
        kmain = key
        flip = params["flip"]

    B, H, W, C = x.shape
    if H == W:
        # Orientation flip as two cheap selects around ONE shuffle pass.
        # Under the copies-axis vmap a ``lax.cond`` executes both branches,
        # doubling the whole transform (measured: BSR below its copy bound,
        # BASELINE.md round 3); for square inputs the flip commutes with a
        # transpose of the same static shape.
        xin = jnp.where(flip, jnp.swapaxes(x, 1, 2), x)
        out = bsr_shuffle_rows_first(xin, kmain, num_block, params=params)
        return jnp.where(flip, jnp.swapaxes(out, 1, 2), out)

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
