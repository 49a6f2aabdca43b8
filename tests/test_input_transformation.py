"""Input-transformation family tests (SURVEY.md §2.2) + ops-library units."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import transferattack_tpu as ta

EPS = 16 / 255

IT_ATTACKS = [
    ("dim", {}),
    ("dem", {"resize_rates": (1.14, 1.27)}),
    ("tim", {"kernel_size": 5}),
    ("sim", {"num_scale": 3}),
    ("admix", {"num_scale": 2, "num_admix": 2}),
    ("usmm", {"num_scale": 2, "num_mix": 2}),
    ("ssm", {"num_spectrum": 4, "sample_chunk": 2}),
    ("maskblock", {"patch_size": 8}),
    ("sia", {"num_scale": 3}),
    ("bsr", {"num_scale": 3}),
    ("mfi", {}),
    ("decowa", {"num_warping": 2}),
    ("ops", {"num_sample_neighbor": 2, "num_sample_operator": 2, "epoch": 3}),
]


@pytest.mark.parametrize("name,overrides", IT_ATTACKS, ids=[n for n, _ in IT_ATTACKS])
def test_it_attack_constraints(toy_batch, name, overrides):
    x, y = toy_batch
    atk = ta.load_attack_class(name)(model_name="toy_cnn", **overrides)
    delta = np.asarray(atk(x, y))
    assert delta.shape == x.shape
    assert np.all(np.abs(delta) <= EPS + 1e-5), f"{name}: eps violated"
    adv = x + delta
    assert adv.min() >= -1e-5 and adv.max() <= 1 + 1e-5, f"{name}: bounds"
    assert np.any(delta != 0), f"{name}: zero perturbation"


def test_dct_roundtrip():
    from transferattack_tpu.ops import dct_2d, idct_2d

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    np.testing.assert_allclose(np.asarray(idct_2d(dct_2d(x))), np.asarray(x), atol=1e-4)
    # orthonormality: energy preserved
    np.testing.assert_allclose(
        float(jnp.sum(dct_2d(x) ** 2)), float(jnp.sum(x**2)), rtol=1e-4
    )


def test_affine_warp_identity_and_translate():
    from transferattack_tpu.ops import affine_warp, translate

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 8, 8, 1).astype(np.float32))
    eye = jnp.asarray([[[1.0, 0, 0], [0, 1, 0]]])
    np.testing.assert_allclose(np.asarray(affine_warp(x, eye)), np.asarray(x), atol=1e-5)
    # shift sampling grid by exactly 2 pixels right (normalized 2*2/8=0.5):
    # content moves left; out[..., j] == x[..., j+2]
    out = np.asarray(translate(x, 0.5, 0.0))[0, :, :-2, 0]
    np.testing.assert_allclose(out, np.asarray(x)[0, :, 2:, 0], atol=1e-4)


def test_grid_sample_differentiable():
    from transferattack_tpu.ops import rotate

    x = jnp.ones((1, 8, 8, 1))
    g = jax.grad(lambda im: rotate(im, 0.3).sum())(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_translate_sep_matches_gather_translate():
    # the gather-free separable path must match grid_sample semantics to
    # float rounding (same taps, same weights) — it replaces the scatter
    # backward in L2T's op_affine
    from transferattack_tpu.ops import translate, translate_sep

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
    tx = jnp.asarray(rng.uniform(-0.1, 0.1, 4).astype(np.float32))
    ty = jnp.asarray(rng.uniform(-0.1, 0.1, 4).astype(np.float32))
    a = np.asarray(translate(x, tx, ty))
    b = np.asarray(translate_sep(x, tx, ty, max_shift=3))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_rotate_shear_map_matches_direct_rotate():
    from transferattack_tpu.ops import rotate, rotate_shear

    # zero angle is exactly the identity
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 32, 32, 1).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(rotate_shear(x, jnp.zeros(2))), np.asarray(x), atol=0)

    # same coordinate map as the direct warp: on a smooth image the two
    # resamplers agree closely (three-pass linear vs direct bilinear), and
    # the rotated centroid lands in the same place
    H = W = 48
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    blob = np.exp(-(((yy - 14) ** 2 + (xx - 30) ** 2) / 50.0)).astype(np.float32)
    xb = jnp.asarray(blob[None, :, :, None])
    ang = jnp.asarray([0.15])
    r1 = np.asarray(rotate(xb, ang))[0, :, :, 0]
    r2 = np.asarray(rotate_shear(xb, ang, 0.2))[0, :, :, 0]
    assert np.abs(r1 - r2).max() < 0.02
    for im_a, im_b in [(r1, r2)]:
        ca = ((im_a * yy).sum() / im_a.sum(), (im_a * xx).sum() / im_a.sum())
        cb = ((im_b * yy).sum() / im_b.sum(), (im_b * xx).sum() / im_b.sum())
        assert abs(ca[0] - cb[0]) < 0.01 and abs(ca[1] - cb[1]) < 0.01

    g = jax.grad(lambda im: (rotate_shear(im, ang, 0.2) ** 2).sum())(xb)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_rotate_mm_static_angles():
    # OPS's fixed-angle rotation: exact at quarter turns (pure rot90),
    # three-pass resampling at residual angles — no gather in either
    # direction (the gather warp faults the TPU worker, BASELINE.md r3)
    from transferattack_tpu.ops import rotate, rotate_mm

    H = W = 32
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    blob = np.exp(-(((yy - 9) ** 2 + (xx - 20) ** 2) / 30.0)).astype(np.float32)
    x = jnp.asarray(blob[None, :, :, None])
    for deg in [90, -90, 180]:
        r1 = np.asarray(rotate(x, jnp.asarray([deg * np.pi / 180])))
        r2 = np.asarray(rotate_mm(x, deg))
        np.testing.assert_allclose(r1, r2, atol=1e-5)
    for deg in [5, -15, 45]:
        r1 = np.asarray(rotate(x, jnp.asarray([deg * np.pi / 180])))
        r2 = np.asarray(rotate_mm(x, deg))
        assert np.abs(r1 - r2).max() < 0.06
    g = jax.grad(lambda im: (rotate_mm(im, 45) ** 2).sum())(x)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_tim_kernel_matches_scipy_free_formula():
    from transferattack_tpu.ops import gaussian_kernel

    k = gaussian_kernel(15)
    assert k.shape == (15, 15)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    assert k[7, 7] == k.max()


def test_sia_blocktransform_preserves_shape_and_content():
    from transferattack_tpu.input_transformation.sia import sia_blocktransform

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    out = sia_blocktransform(x, jax.random.PRNGKey(0), 3)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_bsr_permutation_is_content_preserving_without_rotation():
    """Strip shuffles are pure permutations: row sums multiset preserved."""
    from transferattack_tpu.ops.blocks import bsr_lengths, permute_strips

    key = jax.random.PRNGKey(3)
    edges = bsr_lengths(key, 16, 3)
    perm = jax.random.permutation(jax.random.PRNGKey(4), 3)
    rowmap = np.asarray(permute_strips(edges, perm, 16))
    assert sorted(rowmap.tolist()) == list(range(16))


def test_pallas_fused_update_matches_reference():
    import jax.numpy as jnp

    from transferattack_tpu.ops.pallas_update import fused_sign_update

    rng = np.random.RandomState(0)
    d = jnp.asarray(rng.randn(4, 128, 128, 8).astype(np.float32)) * 0.05
    m = jnp.asarray(rng.randn(4, 128, 128, 8).astype(np.float32))
    x = jnp.asarray(rng.rand(4, 128, 128, 8).astype(np.float32))
    ref = jnp.clip(x + jnp.clip(d + 0.01 * jnp.sign(m), -16 / 255, 16 / 255),
                   0, 1) - x
    out = fused_sign_update(d, m, x, 0.01, 16 / 255, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    # ragged shapes use the identical jnp fallback
    out2 = fused_sign_update(d[:, :100], m[:, :100], x[:, :100], 0.01, 16 / 255)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref)[:, :100],
                               atol=1e-6)


def test_odi_renders_true_3d_surface():
    """VERDICT r1 item 7: the ODI render must differ from a plain affine warp
    — true surface wrapping (per-pixel barycentric UV + shading), not a
    global linear map of pixel coordinates."""
    from transferattack_tpu.ops import affine_warp
    from transferattack_tpu.ops.render3d import (
        ODI_MODEL_SETTINGS, ODI_TEXTURE_SIZES, load_mesh, render_odi,
    )

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32))
    mesh = load_mesh("pack")
    out = render_odi(img, mesh, ODI_MODEL_SETTINGS["pack"],
                     ODI_TEXTURE_SIZES["pack"], jax.random.PRNGKey(5), 64, 64)
    assert out.shape == (64, 64, 3)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0

    # no affine warp of the input can reproduce the render: fit the best
    # linear map of coordinates via least squares on bright image content
    # and verify the residual stays large (surfaces fold/occlude/shade)
    best_err = np.inf
    for sc in (0.8, 1.0, 1.25):
        for ang in (-0.4, 0.0, 0.4):
            c, s = np.cos(ang) * sc, np.sin(ang) * sc
            theta = jnp.asarray([[[c, -s, 0.0], [s, c, 0.0]]], jnp.float32)
            warped = affine_warp(img[None], theta)[0]
            best_err = min(best_err, float(jnp.abs(warped - out).mean()))
    assert best_err > 0.05, f"render looks affine (err {best_err:.4f})"

    # gradients reach the input through the texture path
    g = jax.grad(lambda im: render_odi(
        im, mesh, ODI_MODEL_SETTINGS["pack"], ODI_TEXTURE_SIZES["pack"],
        jax.random.PRNGKey(5), 64, 64).sum())(img)
    assert float(jnp.abs(g).sum()) > 0


def test_odi_attack_constraints(toy_batch):
    x, y = toy_batch
    y2 = np.stack([y, (y + 5) % 10], axis=1)  # targeted pairs
    atk = ta.load_attack_class("odi")(model_name="toy_cnn", epoch=2)
    delta = np.asarray(atk(x, y2))
    assert delta.shape == x.shape
    assert np.all(np.abs(delta) <= EPS + 1e-5)
    assert np.any(delta != 0)


def test_warp_field_sep_matches_grid_sample_on_smooth_fields():
    """The separable per-pixel field warp (round 4, IDAA's previously
    dropped kornia ops) must track the exact 2-D bilinear warp for smooth
    displacement fields: affine field (exactly representable) and a TPS
    field (first-order separability error only)."""
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.ops.image import (
        affine_grid, grid_sample, tps_field, warp_field_sep, _norm_grid,
    )

    # smooth test images (white noise makes any two resamplers differ at
    # O(pixel range) regardless of field accuracy)
    ii, jj = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    chans = [np.sin(ii / 5.0 + c) * np.cos(jj / 7.0 - c) * 0.5 + 0.5
             for c in range(3)]
    x = jnp.asarray(np.stack(
        [np.stack(chans, -1), np.stack(chans[::-1], -1)]).astype(np.float32))
    gy, gx = _norm_grid(32, 32)

    # affine field
    theta = jnp.asarray(np.tile(np.array(
        [[1.0, 0.04, 0.08], [0.02, 1.0, -0.06]], np.float32), (2, 1, 1)))
    grid = affine_grid(theta, 32, 32)
    dx = (grid[..., 0] - gx[None]) * 16.0
    dy = (grid[..., 1] - gy[None]) * 16.0
    ref = grid_sample(x, grid)
    got = warp_field_sep(x, dx, dy, 6, 6)
    # first-order separability error (y-field evaluated pre-x-warp) plus
    # boundary zero-padding differences; interior tracks tightly
    assert float(jnp.abs(got - ref).mean()) < 0.02
    assert float(jnp.abs(got - ref)[:, 4:-4, 4:-4].mean()) < 0.012

    # TPS field (scale 0.2)
    off = jax.random.uniform(jax.random.PRNGKey(3), (2, 9, 2),
                             minval=-0.2, maxval=0.2)
    dx, dy = tps_field(off, 32, 32)
    grid = jnp.stack([gx[None] + dx / 16.0, gy[None] + dy / 16.0], -1)
    ref = grid_sample(x, grid)
    got = warp_field_sep(x, dx, dy, 8, 8)
    assert float(jnp.abs(got - ref).mean()) < 0.03
    # interior pixels (away from zero-padding boundary handling) agree well
    assert float(jnp.abs(got - ref)[:, 4:-4, 4:-4].mean()) < 0.02


def test_idaa_ten_op_cycle():
    """All ten reference ops (``idaa.py:79-90``) run, change their block,
    keep shapes static, and pass gradients (gather-free backward)."""
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.input_transformation.idaa import (
        _IDAA_OPS, _op_cycle,
    )

    assert len(_IDAA_OPS) == 10
    rng = np.random.RandomState(6)
    flat = jnp.asarray(rng.rand(20, 32, 32, 3).astype(np.float32))
    key = jax.random.PRNGKey(0)
    out = _op_cycle(flat, key)
    assert out.shape == flat.shape
    # every op's block differs from the input except where its RNG gate
    # keeps it (vflip p=0.6 can pass some images through)
    assert float(jnp.abs(out - flat).mean()) > 0.01
    for j, op in enumerate(_IDAA_OPS):
        seg = op(flat[:2], jax.random.fold_in(key, 100 + j))
        assert seg.shape == (2, 32, 32, 3), op.__name__
        assert bool(jnp.isfinite(seg).all()), op.__name__

    # gradients flow through the full cycle without gather/scatter faults
    g = jax.grad(lambda f: _op_cycle(f, key).sum())(flat)
    assert g.shape == flat.shape and bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).sum()) > 0


def test_translate_scalar_matches_gather_translate():
    # ANDA's per-view path: one scalar offset shared by the batch — four
    # dynamic slices must reproduce grid_sample translation semantics
    from transferattack_tpu.ops import translate, translate_scalar

    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
    for tx, ty in [(0.0, 0.0), (0.17, -0.23), (-0.3, 0.3), (0.299, 0.299)]:
        a = np.asarray(translate(x, tx, ty))
        b = np.asarray(translate_scalar(x, tx, ty, max_shift=6))
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=f"t=({tx},{ty})")
    # gradient path: block-write backward, finite and nonzero
    g = jax.grad(lambda v: (translate_scalar(v, 0.21, -0.11, 6) ** 2).sum())(x)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_affine_warp_sep_matches_gather_warp():
    """RQ + padded three-shear + triangular passes vs direct grid_sample
    over TRAP's harsh RandomAffine distribution (``ir.py:197-216``): the
    multi-pass resampler agrees on smooth images away from edges, is
    near-exact for pure translations and the rot90-pivot path, and
    backpropagates finite gradients."""
    from transferattack_tpu.ops import affine_warp, affine_warp_sep

    B, S = 16, 64
    yy, xx = np.meshgrid(np.linspace(0, 3, S), np.linspace(0, 3, S),
                         indexing="ij")
    base = 0.5 + 0.3 * np.sin(2 * yy + 1) * np.cos(3 * xx) + 0.2 * np.cos(yy * xx)
    x = jnp.asarray(np.broadcast_to(
        base[None, :, :, None], (B, S, S, 3)).astype(np.float32))

    k1, k2, k3, k4, k5, k6 = jax.random.split(jax.random.PRNGKey(1), 6)
    ang = jax.random.uniform(k1, (B,), minval=-90.0, maxval=90.0) * jnp.pi / 180
    sx = jax.random.uniform(k2, (B,), minval=-30.0, maxval=30.0) * jnp.pi / 180
    sy = jax.random.uniform(k3, (B,), minval=-30.0, maxval=30.0) * jnp.pi / 180
    sc = jax.random.uniform(k4, (B,), minval=0.5, maxval=1.5)
    tx = jax.random.uniform(k5, (B,), minval=-0.2, maxval=0.2)
    ty = jax.random.uniform(k6, (B,), minval=-0.2, maxval=0.2)
    c, s = jnp.cos(ang), jnp.sin(ang)
    theta = jnp.stack(
        [jnp.stack([c / sc, (-s + jnp.tan(sx)) / sc, tx], -1),
         jnp.stack([(s + jnp.tan(sy)) / sc, c / sc, ty], -1)], 1)

    ref = np.asarray(affine_warp(x, theta))
    got = np.asarray(affine_warp_sep(x, theta))
    m = np.zeros((S, S), bool)
    m[4:-4, 4:-4] = True
    assert np.abs(ref - got)[:, m].mean() < 0.02
    assert np.abs(ref - got)[:, m].max() < 0.35  # kernel-scale, multi-pass

    # pure translation: exact to rounding
    tr = jnp.zeros((B, 2, 3)).at[:, 0, 0].set(1.0).at[:, 1, 1].set(1.0)
    tr = tr.at[:, 0, 2].set(jnp.linspace(-0.3, 0.3, B)).at[:, 1, 2].set(0.12)
    np.testing.assert_allclose(np.asarray(affine_warp(x, tr)),
                               np.asarray(affine_warp_sep(x, tr)), atol=1e-4)

    # near-90° rotation exercises the exact rot90 pivot
    ang9 = jnp.full((B,), 88.0) * jnp.pi / 180
    c9, s9 = jnp.cos(ang9), jnp.sin(ang9)
    r = jnp.stack([jnp.stack([c9, -s9, jnp.zeros(B)], -1),
                   jnp.stack([s9, c9, jnp.zeros(B)], -1)], 1)
    e = np.abs(np.asarray(affine_warp(x, r)) - np.asarray(affine_warp_sep(x, r)))
    assert e[:, m].max() < 0.05

    g = jax.grad(lambda v: (affine_warp_sep(v, theta) ** 2).sum())(x)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0
