"""ASR-gate protocol coverage (VERDICT r2 item 6).

The gate itself needs converted pretrained weights to produce numbers;
these tests pin the protocol plumbing that must be right regardless:
the BASELINE.md table parser (every published row resolves to a
registry key with 13 numeric cells) and the surrogate/tolerance
assignment that mirrors the reference protocol (`README.md:719,2570`).
"""
import importlib.util
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "asr_gate", os.path.join(REPO, "scripts", "asr_gate.py"))
asr_gate = importlib.util.module_from_spec(spec)
spec.loader.exec_module(asr_gate)


@pytest.fixture(scope="module")
def table():
    return asr_gate.parse_baseline_tables()


def test_row_coverage(table):
    # the full published matrix: >=100 rows incl. the 15 targeted ones
    assert len(table) >= 100
    targeted = [k for k, v in table.items() if v["targeted"]]
    assert len(targeted) == 15
    assert set(targeted) >= {"odi", "logit", "cfm", "ttp", "m3d", "rfcoa"}


def test_every_row_is_a_registry_key(table):
    src = open(os.path.join(
        REPO, "transferattack_tpu", "__init__.py")).read()
    keys = set(re.findall(r'"([a-z0-9_]+)":', src))
    missing = [k for k in table if k not in keys]
    assert not missing, missing


def test_cells_complete_and_numeric(table):
    cols = [c for c, _ in asr_gate.MODEL_COLS] + list(asr_gate.DEFENSE_COLS)
    for key, row in table.items():
        assert set(row["expect"]) == set(cols), key
        for v in row["expect"].values():
            assert 0.0 <= v <= 100.0, (key, v)
    # spot-check transcriptions against BASELINE.md
    assert table["mifgsm"]["expect"]["resnet50"] == 99.9
    assert table["tgr"]["expect"]["vit"] == 99.8
    assert table["logit"]["expect"]["hgd"] == 32.6


def test_surrogate_protocol():
    # reference README.md:719: ViT surrogate for the ViT-attack rows,
    # 4-CNN ensemble for ensemble attacks, ResNet-50 otherwise
    assert asr_gate.surrogate_for("tgr") == ("vit_base_patch16_224", False)
    assert asr_gate.surrogate_for("ll2s")[0] == "vit_base_patch16_224"
    sur, ens = asr_gate.surrogate_for("ens")
    assert ens and sur.split(",") == [
        "resnet50", "vgg16", "mobilenet_v2", "inception_v3"]
    assert asr_gate.surrogate_for("mifgsm") == ("resnet50", False)


def test_tolerance_bands():
    assert asr_gate.tol_for("mifgsm", "resnet50") == 1.0
    assert asr_gate.tol_for("dim", "resnet50") == 2.5      # sampled aug
    assert asr_gate.tol_for("mifgsm", "rs") == 2.5         # MC defense
