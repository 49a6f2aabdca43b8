"""Semantics tests for the gradient attack family (SURVEY.md §2.1).

Every attack runs on the 32×32 toy CNN with sampling counts cut down so the
full family compiles quickly on the CPU test mesh.  Checks: shape, eps-ball
constraint, image bounds, and (for the core attacks) loss increase.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import transferattack_tpu as ta
from transferattack_tpu.attack import softmax_cross_entropy

EPS = 16 / 255

# (registry key, constructor overrides to keep CPU compile cheap)
GRADIENT_ATTACKS = [
    ("pifgsm", {}),
    ("vmifgsm", {"num_neighbor": 4, "sample_chunk": 2}),
    ("vnifgsm", {"num_neighbor": 4, "sample_chunk": 2}),
    ("emifgsm", {"num_sample": 3}),
    ("aifgtm", {}),
    ("ifgssm", {}),
    ("smifgrm", {"num_neighbor": 3}),
    ("vaifgsm", {"epoch": 5}),
    ("rap", {"epoch": 6, "transpoint": 3, "adv_steps": 2}),
    ("pcifgsm", {}),
    ("iefgsm", {}),
    ("gra", {"num_neighbor": 4, "sample_chunk": 2}),
    ("gnp", {}),
    ("mig", {"s_factor": 4}),
    ("dta", {"K": 3}),
    ("pgn", {"num_neighbor": 4, "sample_chunk": 2}),
    ("mef", {"num_neighbor": 3, "epoch": 5}),
    ("anda", {"n_ens": 4, "epoch": 4}),
    ("anda", {"n_ens": 4, "epoch": 4, "sample": True}),
    ("gifgsm", {"pre_epoch": 2, "epoch": 4}),
    ("rgmifgsm", {"pre_epoch": 2, "epoch": 4, "num_directions": 2}),
    ("dual_mifgsm", {}),
    ("ens_mifgsm", {"num_d": 2}),
    ("fgsra", {"max_iter": 3}),
    ("mumodig", {"N_trans": 2}),
    ("gaa", {"N": 4, "sample_chunk": 2}),
    ("foolmix", {"m": 2, "n": 2, "k": 3}),
    ("adamsi_fgm", {}),
]


@pytest.mark.parametrize("name,overrides", GRADIENT_ATTACKS,
                         ids=[f"{n}{'-sample' if o.get('sample') else ''}"
                              for n, o in GRADIENT_ATTACKS])
def test_gradient_attack_constraints(toy_batch, name, overrides):
    x, y = toy_batch
    cls = ta.load_attack_class(name)
    atk = cls(model_name="toy_cnn", **overrides)
    delta = np.asarray(atk(x, y))
    assert delta.shape == x.shape
    assert np.all(np.abs(delta) <= EPS + 1e-5), f"{name}: eps violated"
    adv = x + delta
    assert adv.min() >= -1e-5 and adv.max() <= 1 + 1e-5, f"{name}: bounds"
    assert np.any(delta != 0), f"{name}: produced a zero perturbation"


@pytest.mark.parametrize("name,overrides", [
    ("vmifgsm", {"num_neighbor": 4, "sample_chunk": 2}),
    ("emifgsm", {"num_sample": 3}),
    ("pgn", {"num_neighbor": 4, "sample_chunk": 2}),
    ("gra", {"num_neighbor": 4, "sample_chunk": 2}),
])
def test_whitebox_loss_increases(toy_batch, name, overrides):
    x, y = toy_batch
    atk = ta.load_attack_class(name)(model_name="toy_cnn", **overrides)
    delta = np.asarray(atk(x, y))

    def loss(imgs):
        logits = atk.model.apply(atk.model.variables, jnp.asarray(imgs))
        return float(softmax_cross_entropy(logits, jnp.asarray(y)).mean())

    assert loss(x + delta) > loss(x), name


def test_staircase_sign_bins():
    from transferattack_tpu.gradient.ifgssm import staircase_sign

    rng = np.random.RandomState(0)
    g = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    out = np.asarray(staircase_sign(g, k=25.0))  # 4 bins
    assert np.sign(out[np.abs(out) > 0]).tolist() == np.sign(
        np.asarray(g)[np.abs(out) > 0]
    ).tolist()
    mags = np.unique(np.round(np.abs(out), 4))
    # expected magnitudes 0.25·(1+2j) for j=0..3
    assert set(mags.tolist()) <= {0.25, 0.75, 1.25, 1.75}
    # staircase averages to ~1 like a plain sign
    np.testing.assert_allclose(np.mean(np.abs(out)), 1.0, atol=0.1)


def test_lb_quantize_regions():
    from transferattack_tpu.gradient.mumodig import lb_quantize

    import jax

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    q = np.asarray(lb_quantize(x, jax.random.PRNGKey(0), 2))
    # every quantized value is one of at most 2 levels per (image, channel)
    for b in range(2):
        for c in range(3):
            assert len(np.unique(q[b, :, :, c])) <= 2
    assert np.all(q <= np.asarray(x) + 1e-6)


def test_anda_sum_grads_matches_per_view(toy_batch):
    """``sum_grads`` (chunk-batched passes, the sample=False fast path) must
    equal the serial per-view ``ens_grads(...).sum(0)`` by linearity, and the
    two step paths must produce the same trajectory."""
    import jax

    x, y = toy_batch
    atk = ta.load_attack_class("anda")(model_name="toy_cnn", n_ens=4,
                                       epoch=3, view_chunk=2)
    v = atk.model.variables
    xt = x + 0.01
    gsum = atk.sum_grads(v, xt, y)
    per_view = atk.ens_grads(v, xt, y, jax.random.PRNGKey(0)).sum(0)
    np.testing.assert_allclose(np.asarray(gsum), np.asarray(per_view),
                               atol=1e-5, rtol=1e-4)

    # full-run equivalence: sample=True routes through ens_grads but with
    # sample=False dynamics when the final draw is ignored -> compare the
    # deterministic sample=False delta across view_chunk settings instead
    d1 = np.asarray(atk(x, y))
    atk4 = ta.load_attack_class("anda")(model_name="toy_cnn", n_ens=4,
                                        epoch=3, view_chunk=4)
    atk4.model = atk.model
    d2 = np.asarray(atk4(x, y))
    np.testing.assert_allclose(d1, d2, atol=1e-5)
