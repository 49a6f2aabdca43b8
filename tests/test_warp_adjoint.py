"""Quantify the :func:`affine_warp_fast` approximate adjoint (VERDICT r3 §7).

``affine_warp_fast`` (``ops/image.py:81-127``) substitutes the
continuous-operator adjoint (inverse-warp the cotangent, gather-only) for the
exact bilinear-warp VJP (scatter-add — the TPU v5e worker-crash class).  It is
load-bearing in TRAP's RandomAffine view (``advanced_objective/ir.py:221``),
AITL's affine ops (``input_transformation/aitl_ops.py:41``) and the
rotate_fast consumers (OPS, MuMoDIG).  These tests bound the approximation

* directly — cotangent agreement against the exact autodiff adjoint over the
  TRAP parameter distribution (degrees 90 / translate 0.1 / scale 0.5-1.5 /
  shear 30, the harshest consumer), and
* end-to-end — TRAP and AITL toy runs under identical RNG with the
  gather-free path vs the exact autodiff warp: delta cosine / sign
  agreement and sibling-panel transfer-ASR difference (harness of
  ``test_transfer_asr.py``).  Both consumers use :func:`affine_warp_fast`
  (adjoint-only approximation; the fully gather-free
  :func:`affine_warp_sep` was measured and rejected for TRAP at 224² —
  BASELINE.md r4).

Measured bounds are recorded in BASELINE.md ("approximate warp adjoint").
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_transfer_asr import (  # noqa: E402
    B, SIZE, _convert, _make_twin, _preds, _sibling,
)


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


def _trap_thetas(key, n):
    """TRAP's RandomAffine parameter distribution (``ir.py:197-216``)."""
    import jax
    import jax.numpy as jnp

    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    ang = jax.random.uniform(k1, (n,), minval=-90.0, maxval=90.0) * jnp.pi / 180
    sx = jax.random.uniform(k2, (n,), minval=-30.0, maxval=30.0) * jnp.pi / 180
    sy = jax.random.uniform(k3, (n,), minval=-30.0, maxval=30.0) * jnp.pi / 180
    sc = jax.random.uniform(k4, (n,), minval=0.5, maxval=1.5)
    tx = jax.random.uniform(k5, (n,), minval=-0.2, maxval=0.2)
    ty = jax.random.uniform(k6, (n,), minval=-0.2, maxval=0.2)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    a = cos / sc
    b = (-sin + jnp.tan(sx)) / sc
    c = (sin + jnp.tan(sy)) / sc
    d = cos / sc
    return jnp.stack([jnp.stack([a, b, tx], -1), jnp.stack([c, d, ty], -1)], 1)


def test_adjoint_cotangent_agreement():
    """Fast-vs-exact cotangents over 32 TRAP-distribution affines with a
    *model-gradient* cotangent (the one the attacks actually propagate)."""
    import jax
    import jax.numpy as jnp

    t_sur = _make_twin(55)
    sur = _convert(t_sur)
    from transferattack_tpu.attack import softmax_cross_entropy
    from transferattack_tpu.ops import affine_warp, affine_warp_fast

    rng = np.random.RandomState(7)
    n = 32
    x = jnp.asarray(rng.rand(n, SIZE, SIZE, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 1000, (n,)).astype(np.int32))
    theta = _trap_thetas(jax.random.PRNGKey(3), n)

    def loss(xw):
        return softmax_cross_entropy(sur.apply(sur.variables, xw), y).mean()

    def g_fast(xi):
        return jax.grad(lambda v: loss(affine_warp_fast(v, theta)))(xi)

    def g_exact(xi):
        return jax.grad(lambda v: loss(affine_warp(v, theta)))(xi)

    gf = np.asarray(jax.jit(g_fast)(x))
    ge = np.asarray(jax.jit(g_exact)(x))
    per_img = np.array([_cos(gf[i], ge[i]) for i in range(n)])
    nz = (np.sign(gf) == np.sign(ge))[np.abs(ge) > 1e-12]
    # Measured (recorded in BASELINE.md): mean cosine 0.915, worst-affine
    # 0.784, sign agreement 0.887 — the old ">0.99" figure held only for
    # analytically smooth cotangents; toy-model gradients at 64² are rough
    # at the interpolation-kernel scale.  The end-to-end tests below show
    # the aggregated attack outcome is insensitive; thresholds here are
    # regression floors under the measured values.
    assert per_img.mean() > 0.85, per_img.mean()
    assert per_img.min() > 0.70, per_img.min()
    assert nz.mean() > 0.75, nz.mean()
    print(f"adjoint: mean_cos={per_img.mean():.4f} min_cos={per_img.min():.4f}"
          f" sign_agree={nz.mean():.4f}")


@pytest.fixture(scope="module")
def toyenv():
    t_sur = _make_twin(21)
    sur = _convert(t_sur)
    holdouts = [_sibling(t_sur, 97 + i) for i in range(3)]
    rng = np.random.RandomState(0)
    x = rng.rand(B, SIZE, SIZE, 3).astype(np.float32)
    y = _preds(t_sur, x).astype(np.int32)
    clean = [_preds(h, x) for h in holdouts]
    return dict(sur=sur, holdouts=holdouts, x=x, y=y, clean=clean)


def _asr(env, delta):
    adv = np.clip(env["x"] + delta, 0, 1).astype(np.float32)
    return float(np.mean([(_preds(h, adv) != c).mean()
                          for h, c in zip(env["holdouts"], env["clean"])]))


def _run_pair(env, monkeypatch, module, name, make_atk):
    """Run the attack twice under identical RNG: the module's gather-free
    warp (its real code path) vs the exact autodiff warp."""
    from transferattack_tpu.ops import affine_warp

    fast_fn = getattr(module, name)
    deltas = {}
    for label, fn in (("fast", fast_fn), ("exact", affine_warp)):
        monkeypatch.setattr(module, name, fn)
        atk = make_atk()
        atk.model = env["sur"]
        deltas[label] = np.asarray(atk(env["x"], env["y"]))
    return deltas["fast"], deltas["exact"]


def test_trap_outcome_fast_vs_exact(toyenv, monkeypatch):
    """TRAP's enhance phase backpropagates *through* the strong random
    affine every iteration — the worst case for the approximation."""
    import transferattack_tpu as ta
    import transferattack_tpu.advanced_objective.ir as ir_mod

    def make():
        return ta.load_attack_class("trap")(
            model_name="resnet18", pretrained=False, input_size=SIZE,
            epoch=10, baseline_epoch=4, feature_layer="layer2")

    fast, exact = _run_pair(toyenv, monkeypatch, ir_mod,
                            "affine_warp_fast", make)
    sign = (np.sign(fast) == np.sign(exact)).mean()
    cos = _cos(fast, exact)
    d_asr = abs(_asr(toyenv, fast) - _asr(toyenv, exact))
    print(f"trap: cos={cos:.4f} sign={sign:.4f} d_asr={d_asr:.4f}")
    assert cos > 0.80, f"trap delta cosine {cos:.3f}"
    assert sign > 0.80, f"trap delta sign agreement {sign:.3f}"
    assert d_asr <= 0.15 + 1e-6, f"trap transfer-ASR delta {d_asr:.3f}"


def test_aitl_outcome_fast_vs_exact(toyenv, monkeypatch):
    """AITL routes 6 of its 20 ops through the fast affine; identical RNG
    means identical op draws, so the difference is purely the adjoint."""
    import transferattack_tpu as ta
    import transferattack_tpu.input_transformation.aitl_ops as ops_mod

    def make():
        return ta.load_attack_class("aitl")(
            model_name="resnet18", pretrained=False, input_size=SIZE,
            epoch=6)

    fast, exact = _run_pair(toyenv, monkeypatch, ops_mod,
                            "affine_warp_fast", make)
    sign = (np.sign(fast) == np.sign(exact)).mean()
    cos = _cos(fast, exact)
    d_asr = abs(_asr(toyenv, fast) - _asr(toyenv, exact))
    print(f"aitl: cos={cos:.4f} sign={sign:.4f} d_asr={d_asr:.4f}")
    assert cos > 0.80, f"aitl delta cosine {cos:.3f}"
    assert sign > 0.80, f"aitl delta sign agreement {sign:.3f}"
    assert d_asr <= 0.15 + 1e-6, f"aitl transfer-ASR delta {d_asr:.3f}"
