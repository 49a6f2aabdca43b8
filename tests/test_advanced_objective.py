"""Advanced-objective family tests (SURVEY.md §2.3) on the toy CNN."""
import os

import numpy as np
import pytest

import transferattack_tpu as ta

EPS = 16 / 255

AO_ATTACKS = [
    ("tap", {"epoch": 5}),
    ("ila", {"feature_layer": "stage1"}),
    ("fia", {"feature_layer": "stage1", "num_ens": 4}),
    ("rpa", {"feature_layer": "stage1", "num_ens": 4}),
    ("fmaa", {"feature_layer": "stage1", "num_ens": 4}),
    ("bfa", {"feature_layer": "stage1", "num_ens": 4, "warmup_epoch": 2}),
    ("naa", {"feature_layer": "stage1", "N": 4}),
    ("danaa", {"feature_layer": "stage1", "N": 4}),
    ("taig", {"steps": 4}),
    ("fuzziness_tuned", {}),
    ("ilpd", {"feature_layer": "stage1"}),
    ("ir", {"grid_scale": 4, "grid_num": 4, "epoch": 3}),
    ("p2fa", {"feature_layer": "stage1", "num_ens": 3, "inner_steps": 2,
              "epoch": 3}),
    ("trap", {"feature_layer": "stage1", "epoch": 6, "baseline_epoch": 3}),
]


@pytest.mark.parametrize("name,overrides", AO_ATTACKS, ids=[n for n, _ in AO_ATTACKS])
def test_ao_attack_constraints(toy_batch, name, overrides):
    x, y = toy_batch
    atk = ta.load_attack_class(name)(model_name="toy_cnn", **overrides)
    delta = np.asarray(atk(x, y))
    assert delta.shape == x.shape
    assert np.all(np.abs(delta) <= EPS + 1e-5), f"{name}: eps violated"
    adv = x + delta
    assert adv.min() >= -1e-5 and adv.max() <= 1 + 1e-5, f"{name}: bounds"
    assert np.any(delta != 0), f"{name}: zero perturbation"


@pytest.mark.parametrize("name,overrides", [
    ("logit", {"epoch": 10}),
    ("logit_margin", {"epoch": 10}),
    ("potrip", {"epoch": 10}),
    ("cfm", {"epoch": 8, "layers": ("stage1", "stage2")}),
    ("ftm", {"epoch": 8, "layers": ("stage1",)}),
    ("fft", {"epoch": 6, "ft_epoch": 3, "num_ens": 2,
             "mid_layer": "stage1", "feature_layer": "stage2"}),
])
def test_targeted_logit_family(toy_batch, name, overrides):
    import jax.numpy as jnp
    from transferattack_tpu.attack import softmax_cross_entropy

    x, y = toy_batch
    target = (y + 3) % 10
    atk = ta.load_attack_class(name)(model_name="toy_cnn", targeted=True, **overrides)
    delta = np.asarray(atk(x, np.stack([y, target], axis=1)))
    assert np.all(np.abs(delta) <= EPS + 1e-5)

    def tloss(imgs):
        logits = atk.model.apply(atk.model.variables, jnp.asarray(imgs))
        return float(softmax_cross_entropy(logits, jnp.asarray(target)).mean())

    assert tloss(x + delta) < tloss(x), name


def test_aa_with_anchor_dataset(tmp_path, toy_batch):
    from tests.make_fake_data import make_fake_dataset

    root = make_fake_dataset(str(tmp_path), n=10, size=32, num_classes=10,
                             targeted=True)
    x, y = toy_batch
    # targets must exist in the anchor set: use labels present in the csv
    import csv

    with open(os.path.join(root, "labels.csv")) as f:
        rows = list(csv.reader(f))[1:]
    labels_present = [int(r[1]) - 1 for r in rows]
    target = np.asarray(labels_present[:4], np.int32)
    atk = ta.load_attack_class("aa")(
        model_name="toy_cnn", input_dir=root, layer_name="stage1", targeted=True
    )
    delta = np.asarray(atk(x, np.stack([y, target], axis=1)))
    assert np.all(np.abs(delta) <= EPS + 1e-5)
    assert np.any(delta != 0)


def test_aa_anchors_not_baked_into_trace(tmp_path, toy_batch):
    """Regression: per-batch host state (AA anchors) must reach the cached
    jit as ARGUMENTS — two same-shape batches with different targets must not
    silently reuse the first batch's anchors (ADVICE r1, aa.py)."""
    from tests.make_fake_data import make_fake_dataset

    root = make_fake_dataset(str(tmp_path), n=10, size=32, num_classes=10,
                             targeted=True)
    x, y = toy_batch
    import csv

    with open(os.path.join(root, "labels.csv")) as f:
        rows = list(csv.reader(f))[1:]
    labels_present = [int(r[1]) - 1 for r in rows]
    atk = ta.load_attack_class("aa")(
        model_name="toy_cnn", input_dir=root, layer_name="stage1", targeted=True
    )
    t1 = np.asarray(labels_present[:4], np.int32)
    t2 = np.asarray(labels_present[4:8], np.int32)
    d1 = np.asarray(atk(x, np.stack([y, t1], axis=1)))
    d2 = np.asarray(atk(x, np.stack([y, t2], axis=1)))
    # same inputs+key, different anchors → different feature targets → deltas differ
    assert not np.allclose(d1, d2), "second batch reused first batch's anchors"
    # and re-running with the FIRST targets again reproduces d1 exactly
    d1b = np.asarray(atk(x, np.stack([y, t1], axis=1)))
    assert np.allclose(d1, d1b)


def test_potrip_source_labels_per_batch(toy_batch):
    """Regression: POTRIP's source labels ride the y argument (ADVICE r1)."""
    x, y = toy_batch
    target = (y + 3) % 10
    atk = ta.load_attack_class("potrip")(model_name="toy_cnn", targeted=True,
                                         epoch=5)
    d1 = np.asarray(atk(x, np.stack([y, target], axis=1)))
    other_src = (y + 5) % 10
    d2 = np.asarray(atk(x, np.stack([other_src, target], axis=1)))
    assert not np.allclose(d1, d2), "triplet term ignored per-batch source labels"


def test_feature_tap_api(toy_batch):
    """Surrogate.feature must return the same activation the sow records."""
    import jax.numpy as jnp
    from transferattack_tpu.models import make_model

    x, _ = toy_batch
    m = make_model("toy_cnn", pretrained=False)
    logits, feat = m.feature(m.variables, jnp.asarray(x), "stage2")
    assert feat.shape[0] == x.shape[0]
    assert logits.shape == (4, 10)
    # tap_fns offset probe shifts logits
    logits2 = m.apply(
        m.variables, jnp.asarray(x),
        tap_fns={"stage2": lambda f: f + 1.0},
    )
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))


def test_aa_ragged_final_batch(tmp_path, toy_batch):
    """Regression (VERDICT r2 weak #3): ``host_inputs()`` arrays (AA's
    anchor batch) must ride the ragged-batch padding — a final 1000 % 32
    batch previously hit the jitted run with mismatched batch dims."""
    from tests.make_fake_data import make_fake_dataset

    root = make_fake_dataset(str(tmp_path), n=10, size=32, num_classes=10,
                             targeted=True)
    x, y = toy_batch
    import csv

    with open(os.path.join(root, "labels.csv")) as f:
        rows = list(csv.reader(f))[1:]
    labels_present = [int(r[1]) - 1 for r in rows]
    target = np.asarray(labels_present[:4], np.int32)
    atk = ta.load_attack_class("aa")(
        model_name="toy_cnn", input_dir=root, layer_name="stage1", targeted=True
    )
    _ = atk(x, np.stack([y, target], axis=1))  # compile at batch 4
    d = np.asarray(atk(x[:2], np.stack([y[:2], target[:2]], axis=1), idx=1))
    assert d.shape == (2,) + x.shape[1:]
    assert np.any(d != 0)


def test_yaila_ridge_fit_matches_reference_formula():
    """yaila_calculate_w vs a literal numpy transcription of the reference
    ``yaila_utils.calculate_w`` (:140-159) on random data."""
    import numpy.linalg as npl

    from transferattack_tpu.advanced_objective.cfm import yaila_calculate_w

    rng = np.random.RandomState(0)
    B, T, D, lam = 3, 5, 40, 1.0
    H = rng.randn(B, T, D).astype(np.float64)
    r = rng.rand(B, T, 1).astype(np.float64)

    Hn = H / npl.norm(H, axis=2, keepdims=True)
    Ht_r = np.einsum("ijk,ikl->ijl", Hn.transpose(0, 2, 1), r)
    H_Ht = np.einsum("ijk,ilk->ijl", Hn, Hn)
    inv = npl.inv(H_Ht + lam * np.repeat(np.eye(T)[None], B, axis=0))
    H_Ht_r = np.einsum("ijk,ikl->ijl", Hn, Ht_r)
    z = np.einsum("ijk,ikl->ijl", inv, H_Ht_r)
    Ht_z = np.einsum("ijk,ikl->ijl", Hn.transpose(0, 2, 1), z)
    ref = np.squeeze(Ht_r - Ht_z, axis=-1)

    ours = np.asarray(yaila_calculate_w(
        np.asarray(H, np.float32), np.asarray(r, np.float32), lam))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_yaila_runs_with_reference_defaults():
    """YAILA's reference-quirk defaults: eps=0.03 (yaila.py:33), mid tap
    layer3_0 (the 1-indexed '3_1' shifted down, yaila.py:57-59)."""
    import transferattack_tpu as ta

    rng = np.random.RandomState(1)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    atk = ta.load_attack_class("yaila")(
        model_name="resnet18", pretrained=False, input_size=32,
        epoch=3, ila_epoch=2)
    assert atk.eps == 0.03 and atk.mid_tap == "layer3_0"
    delta = np.asarray(atk(x, y))
    assert np.all(np.abs(delta) <= 0.03 + 1e-5)
    assert np.any(delta != 0)
    adv = x + delta
    assert adv.min() >= -1e-5 and adv.max() <= 1 + 1e-5
