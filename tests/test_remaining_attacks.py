"""Remaining attack families: learned IT, ViT model_related, metassa, L2T,
generation-adjacent (SURVEY.md §2.2/§2.4 tails).  Small configs, toy models.
"""
import warnings

import numpy as np
import pytest

import transferattack_tpu as ta

EPS = 16 / 255
VIT = dict(model_name="vit_small_patch16_224", pretrained=False, input_size=32,
           epoch=3)
RN = dict(model_name="resnet18", pretrained=False, input_size=32, epoch=3)

CASES = [
    ("su", dict(model_name="toy_cnn", feature_layer="stage2", epoch=3), True),
    # num_scale=4 -> n=5 copies: odd, exercises the logits_chunk remainder
    ("idaa", dict(model_name="toy_cnn", num_scale=4, epoch=3), True),
    ("everywhere", dict(model_name="toy_cnn", epoch=3,
                        layers=("stage1", "stage2"), di_margin=8), True),
    ("l2t", dict(model_name="toy_cnn", epoch=3, num_scale=2), False),
    ("atta", dict(model_name="toy_cnn", epoch=3), False),
    ("stm", dict(model_name="toy_cnn", num_style=3, epoch=3, sample_chunk=1), False),
    ("pam", dict(model_name="toy_cnn", epoch=3), False),
    ("aitl", dict(model_name="toy_cnn", epoch=3), False),
    ("ssm_h", dict(model_name="toy_cnn", num_spectrum=3, epoch=3,
                   sample_chunk=1), False),
    ("ssm_p", dict(model_name="toy_cnn", num_spectrum=3, epoch=3,
                   sample_chunk=1), False),
    ("odi", dict(model_name="toy_cnn", epoch=3, num_views=2), True),
    ("metassa", dict(RN, n_sample=2), False),
    # resnet18 lacks 6 layer3 units -> explicit LAG taps
    ("mfaa", dict(RN, num_ens=2,
                  taps=("layer4_1", "layer3_1", "layer3_0", "layer2_1",
                        "layer1_1")), False),
    ("vdc", dict(VIT), False),
    ("fpr", dict(VIT), False),
    ("att", dict(VIT, crop_length=8, sample_num_patches=10), False),
    ("setr", dict(VIT), False),
    ("llta", dict(RN, inner_iters=2, nsample=2, task_num=2, spt_size=4,
                  qry_size=2), False),
    ("ll2s", dict(VIT, num_scale=2, ops_num=1, num_robust_tokens=4), False),
    # ata_vit is a PATCH attack (unbounded delta inside its saliency mask,
    # ``ata_vit.py:97-128``) — tested separately below
]


@pytest.mark.parametrize("name,overrides,targeted", CASES,
                         ids=[c[0] for c in CASES])
def test_remaining_attack_constraints(toy_batch, name, overrides, targeted):
    x, y = toy_batch
    n_cls = 10 if overrides.get("model_name") == "toy_cnn" else 1000
    y = y % n_cls
    tgt = (y + 3) % n_cls
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        atk = ta.load_attack_class(name)(targeted=targeted, **overrides)
        lbl = np.stack([y, tgt], 1) if targeted else y
        delta = np.asarray(atk(x, lbl))
    assert delta.shape == x.shape
    assert np.all(np.abs(delta) <= EPS + 1e-5), f"{name}: eps violated"
    adv = x + delta
    assert adv.min() >= -1e-5 and adv.max() <= 1 + 1e-5, f"{name}: bounds"
    assert np.any(delta != 0), f"{name}: zero perturbation"


def test_everywhere_semantics():
    """Everywhere mechanics pinned to the reference loop
    (``everywhere.py:284-409``): 3×3 floor-division masks that leave the
    last H%3 rows/cols outside every region, disjoint coverage, one
    iteration consumed by clean-feature recording, and the L1-*sum*
    momentum normalization."""
    from transferattack_tpu.input_transformation.idaa import EverywhereAttack

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        atk = EverywhereAttack(model_name="toy_cnn", epoch=4,
                               layers=("stage1", "stage2"), di_margin=8)
    m = np.asarray(atk._masks(32, 32))
    assert m.shape == (9, 32, 32, 1)
    assert m.sum(0).max() == 1.0  # regions are disjoint
    # 32 // 3 = 10: rows/cols 30-31 are outside every mask (reference floor)
    assert m[:, 30:].sum() == 0 and m[:, :, 30:].sum() == 0
    assert m.sum() == 9 * 10 * 10
    assert atk.epoch == 3  # consumed_iteration deducted
    import jax.numpy as jnp

    g = np.random.RandomState(0).randn(2, 4, 4, 3).astype(np.float32)
    mom = np.asarray(atk.get_momentum(jnp.asarray(g), jnp.zeros_like(g)))
    expect = g / np.abs(g).sum(axis=(1, 2, 3), keepdims=True)
    np.testing.assert_allclose(mom, expect, rtol=1e-5)


def test_idaa_semantics():
    """IDAA mechanics pinned to the reference (``idaa.py:133-204``): the
    tanh parameterization spans exactly the per-pixel box
    [−min(x, eps), min(1−x, eps)] with the reference's inverted orientation
    (``ub, lb = get_bound(...)`` swap), so any w yields a valid delta; the
    update is Adam descent without sign or bias correction."""
    import jax.numpy as jnp

    from transferattack_tpu.input_transformation.idaa import IDAA

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        atk = IDAA(model_name="toy_cnn", num_scale=3, epoch=2)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
    lb, ub = atk._bounds(x)
    # w → +inf hits ub = −min(x, eps); w → −inf hits lb = min(1−x, eps)
    np.testing.assert_allclose(
        atk._pert(jnp.full_like(x, 50.0), lb, ub),
        -np.minimum(np.asarray(x), EPS), atol=1e-6)
    np.testing.assert_allclose(
        atk._pert(jnp.full_like(x, -50.0), lb, ub),
        np.minimum(1 - np.asarray(x), EPS), atol=1e-6)
    # arbitrary w: bounds hold by construction
    r = np.asarray(atk._pert(jnp.asarray(
        rng.randn(4, 32, 32, 3).astype(np.float32) * 3), lb, ub))
    assert np.abs(r).max() <= EPS + 1e-6
    assert ((np.asarray(x) + r) >= -1e-6).all()
    assert ((np.asarray(x) + r) <= 1 + 1e-6).all()


def test_ata_vit_patch_attack(toy_batch):
    """ATA-ViT optimizes an unbounded patch inside an entropy-budgeted
    saliency mask (≈2% of pixels); delta is NOT ε-bounded but must stay
    inside the mask and keep adv ∈ [0, 1]."""
    x, y = toy_batch
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        atk = ta.load_attack_class("ata_vit")(
            model_name="vit_small_patch16_224", pretrained=False,
            input_size=32, epoch=3)
        delta = np.asarray(atk(x, y % 1000))
    assert delta.shape == x.shape
    adv = x + delta
    assert adv.min() >= -1e-5 and adv.max() <= 1 + 1e-5
    assert np.any(delta != 0)
    # sparsity: the mask limits perturbed pixels to roughly the budget
    frac = (np.abs(delta) > 1e-6).any(-1).mean()
    assert frac <= 0.2, f"patch mask too dense: {frac:.3f}"


def test_registry_size_covers_reference_zoo():
    """The reference registers ~105 attacks (SURVEY.md §1/L2); ours must
    cover the same key set."""
    assert len(ta.attack_zoo) >= 100


def test_every_registry_key_resolves():
    """Every registered key must import and resolve to a class (catches
    module-path typos across all 127 entries)."""
    for key in ta.attack_zoo:
        cls = ta.load_attack_class(key)
        assert isinstance(cls, type), key


def test_lpm_ga_pipeline(toy_batch):
    """LPM faithful pipeline (``lpm.py:17-329``): batchsize-1 GA over patch
    masks with full inner attacks as fitness, gray-model var+mean scoring,
    final 10-iter multi-mask gradient averaging."""
    x, y = toy_batch
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        atk = ta.load_attack_class("lpm")(
            model_name="toy_cnn", gray_models=("toy_cnn", "toy_cnn2"),
            patch_grid=4, pop_size=4, de_iters=2, score_chunk=2, m_num=2,
            inner_epoch=2, epoch=3)
        assert atk.requires_batchsize == 1
        with pytest.raises(ValueError):
            atk(x, y)
        delta = np.asarray(atk(x[:1], y[:1]))
    assert delta.shape == (1,) + x.shape[1:]
    assert np.all(np.abs(delta) <= EPS + 1e-5)
    adv = x[:1] + delta
    assert adv.min() >= -1e-5 and adv.max() <= 1 + 1e-5
    assert np.any(delta != 0)


def test_lpm_ga_operators_match_reference_semantics():
    """The MyDE operators (``lpm.py:243-329``): inbreeding crossover's
    bit-voting rules, the 90%-ones mutation rows, greedy unique selection."""
    atk = ta.load_attack_class("lpm")(
        model_name="toy_cnn", gray_models=("toy_cnn",),
        patch_grid=4, pop_size=10, de_iters=1, inner_epoch=1)
    rng = np.random.RandomState(0)
    chrom = rng.randint(0, 2, (10, 16))
    cross = atk._ga_crossover(chrom, np.random.RandomState(1))
    assert cross.shape == (3, 16) and set(np.unique(cross)) <= {0, 1}
    # agreement bits must be preserved verbatim from the superior pool rule
    mut = atk._ga_mutation(16, np.random.RandomState(2))
    assert mut.shape == (7, 16)
    assert np.all(mut.sum(axis=1) == 16 - int(0.1 * 16))  # 90% ones rows
    # greedy unique selection: keeps best-by-score unique rows
    off = rng.randint(0, 2, (5, 16))
    Y = np.arange(10, dtype=float)
    f_off = np.array([0.5, 3.3, 0.5, -1.0, 99.0])
    newC, newY = atk._ga_select(chrom, Y, off, f_off)
    assert newY[0] == -1.0 and len(newY) == 10
    assert np.all(np.diff(newY) >= 0)
