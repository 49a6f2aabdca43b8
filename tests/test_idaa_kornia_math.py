"""IDAA warp fields vs independent transcriptions of kornia's math
(VERDICT r4 #6: pin against kornia, not the repo's own warp library).

Each test feeds identical parameters to the repo's field builder and to a
from-scratch numpy transcription of the corresponding kornia operation
(``reference/input_transformation/idaa.py:79-90``), comparing the SOURCE
COORDINATE FIELDS — math-level, no resampling noise:

* perspective — kornia ``warp_perspective(get_perspective_transform(start,
  end))`` samples src at M⁻¹·p (M inverted inside warp_perspective), so the
  content moves INWARD; transcribed with an SVD nullspace DLT.
* TPS — kornia's exact thin-plate solve through the 3×3 control grid
  (kernel constant is absorbed by the solve, so any r²·log r form gives the
  same interpolant); transcribed with an independent lstsq fit.
* elastic — U(−1,1) noise → 27-tap gaussian blur (σx=33, σy=31) → per-axis
  α=(0.1, 1.0) in normalized units.
* fisheye — src = p + (p−c)·γ·r² on the normalized center grid.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

H, W = 32, 40  # non-square so axis mixups can't cancel


def _grid(h, w):
    """align_corners=False normalized pixel centers, (y, x)."""
    ys = (2.0 * np.arange(h) + 1.0) / h - 1.0
    xs = (2.0 * np.arange(w) + 1.0) / w - 1.0
    return np.meshgrid(ys, xs, indexing="ij")


BASE = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]],
                np.float32)  # TL, TR, BR, BL in (x, y)


def _dlt_svd(src_pts, dst_pts):
    """Homography T with T(src_i) = dst_i via the 9-parameter SVD nullspace
    (independent of the repo's 8×8 solve)."""
    rows = []
    for (x, y), (u, v) in zip(src_pts, dst_pts):
        rows.append([x, y, 1, 0, 0, 0, -u * x, -u * y, -u])
        rows.append([0, 0, 0, x, y, 1, -v * x, -v * y, -v])
    A = np.asarray(rows, np.float64)
    _, _, vt = np.linalg.svd(A)
    return (vt[-1] / vt[-1][-1]).reshape(3, 3)


def _apply_h(M, gx, gy):
    den = M[2, 0] * gx + M[2, 1] * gy + M[2, 2]
    sx = (M[0, 0] * gx + M[0, 1] * gy + M[0, 2]) / den
    sy = (M[1, 0] * gx + M[1, 1] * gy + M[1, 2]) / den
    return sx, sy


def test_perspective_field_matches_kornia_direction():
    """kornia RandomPerspective: end = start + U(0, scale)·inward; the warp
    samples src(M⁻¹·p) with M: start→end, i.e. out(end_i) = src(start_i) —
    content moves inward.  The repo field must produce the same source
    coordinates for every output pixel."""
    from transferattack_tpu.input_transformation.idaa import (
        _perspective_field,
    )

    rng = np.random.RandomState(3)
    d = rng.uniform(0, 0.5, (2, 4, 2)).astype(np.float32)
    inward = np.array([[1, 1], [-1, 1], [-1, -1], [1, -1]], np.float32)
    gy, gx = _grid(H, W)

    dx_r, dy_r = _perspective_field(jnp.asarray(d), H, W)
    for b in range(2):
        end = BASE + inward * d[b]
        M = _dlt_svd(BASE, end)           # start -> end
        Minv = np.linalg.inv(M)           # what warp_perspective applies
        sx, sy = _apply_h(Minv, gx, gy)
        # repo fields are pixel displacements: src = p + d(p)
        np.testing.assert_allclose(
            np.asarray(dx_r[b]), (sx - gx) * W / 2.0, atol=5e-3,
            err_msg="perspective x-field != kornia M^-1 sampling",
        )
        np.testing.assert_allclose(
            np.asarray(dy_r[b]), (sy - gy) * H / 2.0, atol=5e-3,
            err_msg="perspective y-field != kornia M^-1 sampling",
        )


def test_tps_field_matches_independent_solve():
    """Exact TPS through the 3×3 control grid: independent numpy fit
    (lstsq on the augmented system, U = r²·log r²) evaluated on the pixel
    grid must reproduce the repo's precomputed-inverse field."""
    from transferattack_tpu.ops.image import tps_field

    rng = np.random.RandomState(5)
    off = rng.uniform(-0.3, 0.3, (2, 9, 2)).astype(np.float32)
    dx_r, dy_r = tps_field(jnp.asarray(off), H, W)

    lin = np.linspace(-1, 1, 3)
    cyy, cxx = np.meshgrid(lin, lin, indexing="ij")
    ctrl = np.stack([cxx.ravel(), cyy.ravel()], -1)  # (9, 2) (x, y)

    def fit_eval(vals, pts):
        # solve TPS interpolant f(ctrl_i) = vals_i with affine part
        d2 = ((ctrl[:, None] - ctrl[None]) ** 2).sum(-1)
        K = d2 * np.log(d2 + 1e-9)
        P = np.concatenate([np.ones((9, 1)), ctrl], 1)
        L = np.zeros((12, 12))
        L[:9, :9], L[:9, 9:], L[9:, :9] = K, P, P.T
        rhs = np.concatenate([vals, np.zeros(3)])
        sol = np.linalg.lstsq(L, rhs, rcond=None)[0]
        r2 = ((pts[:, None] - ctrl[None]) ** 2).sum(-1)
        Ue = r2 * np.log(r2 + 1e-9)
        Pe = np.concatenate([np.ones((pts.shape[0], 1)), pts], 1)
        return Ue @ sol[:9] + Pe @ sol[9:]

    gy, gx = _grid(H, W)
    pts = np.stack([gx.ravel(), gy.ravel()], -1)
    for b in range(2):
        fx = fit_eval(off[b, :, 0].astype(np.float64), pts).reshape(H, W)
        fy = fit_eval(off[b, :, 1].astype(np.float64), pts).reshape(H, W)
        np.testing.assert_allclose(np.asarray(dx_r[b]), fx * W / 2.0,
                                   atol=1e-2)
        np.testing.assert_allclose(np.asarray(dy_r[b]), fy * H / 2.0,
                                   atol=1e-2)


def test_elastic_blur_matches_kornia_gaussian():
    """kornia gaussian_blur2d semantics: normalized 27-tap separable
    gaussian, σ=(x 33, y 31), then α=(0.1, 1.0) per axis in normalized
    units (``idaa.py:88``)."""
    from transferattack_tpu.ops.image import gaussian_blur_sep

    rng = np.random.RandomState(7)
    noise = rng.uniform(-1, 1, (1, H, W, 2)).astype(np.float32)

    def kern(sig, n=27):
        t = np.arange(n) - (n - 1) / 2.0
        k = np.exp(-0.5 * (t / sig) ** 2)
        return k / k.sum()

    kx, ky = kern(33.0), kern(31.0)
    ref = noise[0].astype(np.float64)
    # blur x then y with zero ("same") padding, per channel
    pad = 13
    tmp = np.zeros_like(ref)
    padded = np.pad(ref, ((0, 0), (pad, pad), (0, 0)))
    for i in range(27):
        tmp += kx[i] * padded[:, i:i + W, :]
    out = np.zeros_like(ref)
    padded = np.pad(tmp, ((pad, pad), (0, 0), (0, 0)))
    for i in range(27):
        out += ky[i] * padded[i:i + H, :, :]

    got = np.asarray(gaussian_blur_sep(jnp.asarray(noise), 27, 33.0, 31.0))[0]
    np.testing.assert_allclose(got, out, atol=1e-5)


def test_fisheye_field_matches_formula():
    """kornia RandomFisheye: src = p + (p−c)·γ·r², r² = |p−c|² on the
    normalized grid (``idaa.py:89``)."""
    from transferattack_tpu.input_transformation.idaa import _fisheye_field

    rng = np.random.RandomState(9)
    cx = rng.uniform(-0.3, 0.3, (2,)).astype(np.float32)
    cy = rng.uniform(-0.3, 0.3, (2,)).astype(np.float32)
    g = rng.uniform(0.9, 1.0, (2,)).astype(np.float32)

    dx_r, dy_r = _fisheye_field(jnp.asarray(cx), jnp.asarray(cy),
                                jnp.asarray(g), H, W)
    gy, gx = _grid(H, W)
    for b in range(2):
        rx, ry = gx - cx[b], gy - cy[b]
        r2 = rx * rx + ry * ry
        np.testing.assert_allclose(np.asarray(dx_r[b]),
                                   rx * g[b] * r2 * W / 2.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dy_r[b]),
                                   ry * g[b] * r2 * H / 2.0, atol=1e-4)
