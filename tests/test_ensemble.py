"""Ensemble family tests (SURVEY.md §2.5) on tiny toy surrogates."""
import numpy as np
import pytest

import transferattack_tpu as ta

EPS = 16 / 255
TOYS = ["toy_cnn", "toy_cnn2"]

ENSEMBLE_ATTACKS = [
    ("ens", {"model_name": TOYS}),
    ("svre", {"model_name": TOYS, "epoch": 4}),
    ("cwa", {"model_name": TOYS, "epoch": 4}),
    ("adaea", {"model_name": TOYS, "epoch": 4}),
    ("smer", {"model_name": TOYS, "epoch": 3}),
]


@pytest.mark.parametrize("name,overrides", ENSEMBLE_ATTACKS,
                         ids=[n for n, _ in ENSEMBLE_ATTACKS])
def test_ensemble_attack_constraints(toy_batch, name, overrides):
    x, y = toy_batch
    atk = ta.load_attack_class(name)(**overrides)
    delta = np.asarray(atk(x, y))
    assert delta.shape == x.shape
    assert np.all(np.abs(delta) <= EPS + 1e-5), f"{name}: eps violated"
    adv = x + delta
    assert adv.min() >= -1e-5 and adv.max() <= 1 + 1e-5, f"{name}: bounds"
    assert np.any(delta != 0), f"{name}: zero perturbation"


def test_lgv_with_jittered_fallback(toy_batch):
    x, y = toy_batch
    with pytest.warns(UserWarning):
        atk = ta.load_attack_class("lgv")(
            model_name="resnet18", pretrained=False, input_size=32,
            n_models=3, epoch=3,
        )
    delta = np.asarray(atk(x, y % 1000))
    assert np.all(np.abs(delta) <= EPS + 1e-5)
    assert np.any(delta != 0)


def test_sasd_ws_targeted(toy_batch):
    x, y = toy_batch
    y = y % 1000
    target = (y + 5) % 1000
    atk = ta.load_attack_class("sasd_ws")(
        model_name="resnet18", pretrained=False, input_size=32, epoch=5,
    )
    delta = np.asarray(atk(x, np.stack([y, target], 1)))
    assert np.all(np.abs(delta) <= EPS + 1e-5)
    assert np.any(delta != 0)


def test_rfcoa_runs_tiny(toy_batch):
    x, y = toy_batch
    y = y % 1000
    atk = ta.load_attack_class("rfcoa")(
        model_name=["resnet18"], pretrained=False, input_size=32, epoch=3,
    )
    delta = np.asarray(atk(x, np.stack([y, (y + 7) % 1000], 1), idx=0))
    assert delta.shape == x.shape
    adv = x + delta
    assert adv.min() >= -1e-5 and adv.max() <= 1 + 1e-5
