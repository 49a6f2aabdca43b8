"""Config registry (SURVEY §5): CLI hyperparameters must actually forward.

The reference parses --eps/--alpha/--epoch/--momentum and silently ignores
them (reference main.py:41); these tests pin the fixed behavior.
"""
import os
import sys

import numpy as np
import pytest

import transferattack_tpu as ta
from transferattack_tpu.config import build_attack, official_defaults


def test_official_defaults_mifgsm():
    d = official_defaults("mifgsm")
    assert d["epoch"] == 10
    assert abs(d["eps"] - 16 / 255) < 1e-9
    assert abs(d["alpha"] - 1.6 / 255) < 1e-9
    assert d["decay"] == 1.0


def test_official_defaults_inherited_through_forwarders():
    # NIFGSM forwards *args/**kwargs to MIFGSM; defaults must still resolve
    d = official_defaults("nifgsm")
    assert d["epoch"] == 10 and "eps" in d


def test_build_attack_overrides_eps(toy_batch):
    x, y = toy_batch
    atk = build_attack("mifgsm", model_name="toy_cnn",
                       overrides={"eps": 4 / 255})
    delta = np.asarray(atk(x, y))
    assert np.all(np.abs(delta) <= 4 / 255 + 1e-6)
    assert np.max(np.abs(delta)) > 2 / 255  # it did step to the new bound


def test_build_attack_none_means_official(toy_batch):
    atk = build_attack("mifgsm", model_name="toy_cnn",
                       overrides={"eps": None, "epoch": None})
    assert abs(atk.eps - 16 / 255) < 1e-9 and atk.epoch == 10


def test_build_attack_momentum_maps_to_decay():
    atk = build_attack("mifgsm", model_name="toy_cnn",
                       overrides={"momentum": 0.5})
    assert atk.decay == 0.5


def test_build_attack_unknown_key_warns_not_raises():
    with pytest.warns(UserWarning, match="override ignored"):
        atk = build_attack("ttp", model_name="toy_cnn",
                           overrides={"alpha": 0.1})
    assert atk is not None


def test_cli_eps_changes_delta_bound(tmp_path, monkeypatch):
    """main.py --eps 8/255 must measurably change the delta bound."""
    from tests.make_fake_data import make_fake_dataset

    root = make_fake_dataset(str(tmp_path / "data"), n=4, size=32,
                             num_classes=10)
    out = str(tmp_path / "adv")
    monkeypatch.setattr(sys, "argv", [
        "main.py", "--attack", "mifgsm", "--model", "toy_cnn",
        "--input_dir", root, "--output_dir", out,
        "--eps", "8/255", "--epoch", "3", "--batchsize", "4", "--no_mesh",
    ])
    import main as cli

    cli.main()
    from transferattack_tpu.utils.data import load_image

    for name in sorted(os.listdir(os.path.join(root, "images"))):
        orig = load_image(os.path.join(root, "images", name), (224, 224))
        adv = load_image(os.path.join(out, name), (224, 224))
        d = np.abs(adv - orig).max()
        # PNG quantization adds ±1/255 slop on top of the 8/255 ball
        assert d <= 8 / 255 + 2 / 255, f"{name}: |delta|={d} exceeds 8/255"
        assert d > 4 / 255, f"{name}: eps override did not take effect"


def test_parse_fraction():
    import main as cli

    assert abs(cli.parse_fraction("16/255") - 16 / 255) < 1e-12
    assert cli.parse_fraction("0.05") == 0.05
