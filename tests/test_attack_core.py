"""Core attack-engine semantics tests (design: SURVEY.md §4 layer (a)/(d))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import transferattack_tpu as ta
from transferattack_tpu.attack import Attack, l1_normalize, softmax_cross_entropy


def run_attack(name, x, y, **kwargs):
    cls = ta.load_attack_class(name)
    atk = cls(model_name="toy_cnn", **kwargs)
    return np.asarray(atk(x, y))


def test_l1_normalize():
    g = jnp.array([[1.0, -3.0], [2.0, 2.0]])
    out = l1_normalize(g)
    np.testing.assert_allclose(np.abs(out).mean(axis=1), 1.0, rtol=1e-5)


def test_cross_entropy_matches_manual():
    logits = jnp.array([[2.0, 1.0, 0.0]])
    y = jnp.array([0])
    ce = softmax_cross_entropy(logits, y)
    manual = -np.log(np.exp(2.0) / np.exp([2.0, 1.0, 0.0]).sum())
    np.testing.assert_allclose(np.asarray(ce)[0], manual, rtol=1e-3)


def test_eps_constraint_and_bounds(toy_batch):
    x, y = toy_batch
    for name in ["fgsm", "ifgsm", "mifgsm", "nifgsm"]:
        delta = run_attack(name, x, y)
        assert delta.shape == x.shape
        assert np.all(np.abs(delta) <= 16 / 255 + 1e-6), name
        adv = x + delta
        assert adv.min() >= -1e-6 and adv.max() <= 1 + 1e-6, name


def test_attack_increases_loss(toy_batch):
    """Untargeted attacks must increase white-box CE loss."""
    x, y = toy_batch
    atk = ta.load_attack_class("mifgsm")(model_name="toy_cnn")
    delta = atk(x, y)

    def loss(imgs):
        logits = atk.model.apply(atk.model.variables, jnp.asarray(imgs))
        return float(softmax_cross_entropy(logits, jnp.asarray(y)).mean())

    assert loss(x + np.asarray(delta)) > loss(x)


def test_targeted_decreases_target_loss(toy_batch):
    x, y = toy_batch
    target = (y + 3) % 10
    atk = ta.load_attack_class("mifgsm")(model_name="toy_cnn", targeted=True)
    delta = atk(x, target)

    def tloss(imgs):
        logits = atk.model.apply(atk.model.variables, jnp.asarray(imgs))
        return float(softmax_cross_entropy(logits, jnp.asarray(target)).mean())

    assert tloss(x + np.asarray(delta)) < tloss(x)


def test_fgsm_is_single_step(toy_batch):
    """FGSM delta must be exactly ±eps or a clipped value at image bounds."""
    x, y = toy_batch
    delta = run_attack("fgsm", x, y)
    adv = x + delta
    eps = 16 / 255
    at_eps = np.isclose(np.abs(delta), eps, atol=1e-6)
    at_bounds = np.isclose(adv, 0.0, atol=1e-6) | np.isclose(adv, 1.0, atol=1e-6)
    zero_grad = np.isclose(delta, 0.0, atol=1e-6)
    assert np.all(at_eps | at_bounds | zero_grad)


def test_determinism(toy_batch):
    x, y = toy_batch
    d1 = run_attack("mifgsm", x, y)
    d2 = run_attack("mifgsm", x, y)
    np.testing.assert_array_equal(d1, d2)


def test_mifgsm_differs_from_ifgsm(toy_batch):
    x, y = toy_batch
    assert not np.allclose(run_attack("mifgsm", x, y), run_attack("ifgsm", x, y))


def test_l2_norm_constraint(toy_batch):
    x, y = toy_batch
    atk = ta.load_attack_class("mifgsm")(
        model_name="toy_cnn", norm="l2", eps=2.0, alpha=0.4
    )
    delta = np.asarray(atk(x, y))
    norms = np.linalg.norm(delta.reshape(len(x), -1), axis=1)
    assert np.all(norms <= 2.0 + 1e-4)


def test_l2_step_is_normalized(toy_batch):
    """The l2 step must be alpha·(g/||g||₂) per sample (reference
    attack.py:149-152), i.e. step size independent of raw grad magnitude."""
    import jax.numpy as jnp
    from transferattack_tpu.attack import Attack

    atk = ta.load_attack_class("mifgsm")(
        model_name="toy_cnn", norm="l2", eps=10.0, alpha=0.5
    )
    x = jnp.zeros((2, 8, 8, 3))
    delta = jnp.zeros_like(x)
    g = jnp.ones_like(x)
    d1 = Attack.update_delta(atk, delta, x + 0.5, g)        # |g|=1 each
    d2 = Attack.update_delta(atk, delta, x + 0.5, 1000 * g)  # scaled grad
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)
    norms = np.linalg.norm(np.asarray(d1).reshape(2, -1), axis=1)
    np.testing.assert_allclose(norms, 0.5, atol=1e-5)


def test_ensemble_model(toy_batch):
    x, y = toy_batch
    atk = ta.load_attack_class("mifgsm")(model_name=["toy_cnn", "toy_cnn2"])
    delta = np.asarray(atk(x, y))
    assert np.all(np.abs(delta) <= 16 / 255 + 1e-6)


def test_unknown_attack_raises():
    with pytest.raises(ValueError):
        ta.load_attack_class("not_an_attack")


def test_segmented_resume_bit_identical(tmp_path, toy_batch):
    """``call_resumable`` (orbax mid-sweep checkpointing, main.py
    --checkpoint_every) is bit-identical to one long scan, including when the
    process restarts from an on-disk checkpoint."""
    import jax

    import transferattack_tpu as ta

    x, y = toy_batch
    atk = ta.load_attack_class("mifgsm")(model_name="toy_cnn", epoch=6)
    ref = np.asarray(atk(x, y))

    d_seg = np.asarray(atk.call_resumable(x, y, str(tmp_path / "ck"), every=2))
    np.testing.assert_array_equal(d_seg, ref)

    # simulate an interrupt: run two iterations, checkpoint, then resume in a
    # fresh attack instance
    key = jax.random.PRNGKey(atk.seed)
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    state = atk.init_state(jnp.asarray(x), atk.prepare_labels(y), key)
    state = atk.run_from(atk.model.variables, jnp.asarray(x),
                         atk.prepare_labels(y), state, 2)
    path = str((tmp_path / "ck2" / "batch_00000").resolve())
    ocp.PyTreeCheckpointer().save(path, state)

    atk2 = ta.load_attack_class("mifgsm")(model_name="toy_cnn", epoch=6)
    d_res = np.asarray(atk2.call_resumable(x, y, str(tmp_path / "ck2"), every=2))
    np.testing.assert_array_equal(d_res, ref)
    assert not (tmp_path / "ck2" / "batch_00000").exists()


def test_ragged_batch_matches_fresh_compile(toy_batch):
    """A ragged final batch rides the compiled-batch jit via cycle-padding;
    for per-sample-independent attacks (MI-FGSM) the result must equal a
    fresh compile at the small batch size (VERDICT r2 weak #3/#8)."""
    x, y = toy_batch  # batch 4
    cls = ta.load_attack_class("mifgsm")
    atk = cls(model_name="toy_cnn")
    _ = atk(x, y)  # compile at batch 4
    d_ragged = np.asarray(atk(x[:2], y[:2], idx=1))
    assert d_ragged.shape == (2,) + x.shape[1:]
    fresh = cls(model_name="toy_cnn")
    d_fresh = np.asarray(fresh(x[:2], y[:2], idx=1))
    np.testing.assert_allclose(d_ragged, d_fresh, atol=1e-5)


def test_ragged_batch_batch_coupled_mixer(toy_batch):
    """Admix draws mix partners from the batch: the ragged path must run and
    produce valid deltas (padded rows are real images cycled, not a skewed
    duplicate of the last sample)."""
    x, y = toy_batch
    cls = ta.load_attack_class("admix")
    atk = cls(model_name="toy_cnn", num_scale=2, num_admix=2)
    _ = atk(x, y)
    d = np.asarray(atk(x[:3], y[:3], idx=1))
    assert d.shape == (3,) + x.shape[1:]
    assert np.all(np.abs(d) <= 16 / 255 + 1e-5)
    assert np.any(d != 0)


def test_get_logits_chunk_remainder(toy_batch):
    """get_logits chunking must stay active when the copies axis is not a
    multiple of logits_chunk (IDAA's default n = num_scale+1 = 11): full
    groups run under lax.map, the remainder as one extra pass, and the
    result must equal the unchunked forward exactly."""
    x, y = toy_batch
    atk = ta.load_attack_class("mifgsm")(model_name="toy_cnn")
    xs = jnp.stack([jnp.asarray(x) * s for s in (1.0, 0.9, 0.8, 0.7, 0.6)])
    ref = np.asarray(atk.get_logits(atk.model.variables, xs))
    atk.logits_chunk = 2  # 5 copies -> 2 groups of 2 + remainder of 1
    chunked = np.asarray(atk.get_logits(atk.model.variables, xs))
    assert chunked.shape == ref.shape
    np.testing.assert_allclose(chunked, ref, atol=1e-5)
