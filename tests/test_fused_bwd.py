"""Correctness pins for the fused conv-backward Pallas kernels
(ops/fused_bwd.py) against their jnp/XLA compositions, interpret mode.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transferattack_tpu.ops import fused_bwd as fb


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


def test_fused_bwd_1x1_matches(rng):
    m, cout, cin = 2048, 256, 64
    g = jnp.asarray(rng.randn(m, cout).astype(np.float32))
    mask = jnp.asarray((rng.rand(m, cout) > 0.5).astype(np.float32))
    wt = jnp.asarray(rng.randn(cout, cin).astype(np.float32) * 0.05)
    out = fb.fused_bwd_1x1(g, mask, wt, interpret=True)
    ref = fb.jnp_bwd_1x1(g, mask, wt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_bwd_1x1_skip(rng):
    m, cout, cin = 1024, 64, 256
    g = jnp.asarray(rng.randn(m, cout).astype(np.float32))
    mask = jnp.asarray((rng.rand(m, cout) > 0.5).astype(np.float32))
    wt = jnp.asarray(rng.randn(cout, cin).astype(np.float32) * 0.05)
    skip = jnp.asarray(rng.randn(m, cin).astype(np.float32))
    out = fb.fused_bwd_1x1(g, mask, wt, skip=skip, tile_m=512, interpret=True)
    ref = fb.jnp_bwd_1x1(g, mask, wt, skip=skip)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_bwd_3x3_matches(rng):
    b, h, w, c = 2, 16, 16, 64
    g = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    mask = jnp.asarray((rng.rand(b, h, w, c) > 0.5).astype(np.float32))
    wfwd = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.05)
    out = fb.fused_bwd_3x3(g, mask, fb.flip_3x3_for_bwd(wfwd),
                           interpret=True)
    ref = fb.jnp_bwd_3x3(g, mask, wfwd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_bwd_3x3_is_true_conv_backward(rng):
    """jnp_bwd_3x3 (the A/B baseline) must equal jax.grad of the conv."""
    b, h, w, c = 1, 8, 8, 4
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    wfwd = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))

    def f(inp):
        y = jax.lax.conv_general_dilated(
            inp, wfwd, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y * g)

    ref = jax.grad(f)(x)
    out = fb.jnp_bwd_3x3(g, jnp.ones_like(g), wfwd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_bottleneck_chain_matches(rng):
    b, h, w = 2, 8, 8
    g = jnp.asarray(rng.randn(b, h, w, 256).astype(np.float32))
    masks = {
        "out": jnp.asarray((rng.rand(b, h, w, 256) > 0.5).astype(np.float32)),
        "c2": jnp.asarray((rng.rand(b, h, w, 64) > 0.5).astype(np.float32)),
        "c1": jnp.asarray((rng.rand(b, h, w, 64) > 0.5).astype(np.float32)),
    }
    weights = {
        "w1": jnp.asarray(rng.randn(1, 1, 256, 64).astype(np.float32) * 0.05),
        "w2": jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05),
        "w3": jnp.asarray(rng.randn(1, 1, 64, 256).astype(np.float32) * 0.05),
    }
    ref = fb.bottleneck_bwd_input_jnp(g, masks, weights)
    out = fb.bottleneck_bwd_input_pallas(g, masks, weights, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
