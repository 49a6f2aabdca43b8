"""Vendored reference data assets (RFCoA robust features, AIM guides).

The reference ships these in-repo (``transferattack/ensemble/rfcoa/*.npz``,
``transferattack/generation/aim_related/*.JPEG``); ``scripts/convert_ref_assets.py``
vendors them into ``transferattack_tpu/assets/{rfcoa,aim}/``.  These tests
assert (a) bit-for-bit equality with the reference files when the reference
tree is present, and (b) that the attack loaders return the real artifacts,
not the random/flat fallbacks.
"""
import os

import numpy as np
import pytest

PKG = os.path.join(os.path.dirname(__file__), "..", "transferattack_tpu")
REF_RFCOA = "/root/reference/transferattack/ensemble/rfcoa"
REF_AIM = "/root/reference/transferattack/generation/aim_related"
CLASSES = [24, 99, 245, 344, 471, 555, 661, 701, 802, 919]


def test_rfcoa_assets_vendored():
    for cls in CLASSES:
        path = os.path.join(PKG, "assets", "rfcoa", f"{cls}.npz")
        assert os.path.exists(path), f"missing vendored rfcoa feature {cls}"
        arr = np.load(path)["array"]
        assert arr.shape == (1, 512, 7, 7) and arr.dtype == np.float32


def test_aim_assets_vendored():
    for cls in CLASSES:
        path = os.path.join(PKG, "assets", "aim", f"{cls}.JPEG")
        assert os.path.exists(path), f"missing vendored aim guide {cls}"
        assert os.path.getsize(path) > 1000


@pytest.mark.skipif(not os.path.isdir(REF_RFCOA), reason="reference tree absent")
def test_rfcoa_assets_bit_for_bit():
    for cls in CLASSES:
        ours = np.load(os.path.join(PKG, "assets", "rfcoa", f"{cls}.npz"))["array"]
        ref = np.load(os.path.join(REF_RFCOA, f"{cls}.npz"))["array"]
        assert ours.dtype == ref.dtype and ours.shape == ref.shape
        assert np.array_equal(ours, ref), f"rfcoa feature {cls} differs"


@pytest.mark.skipif(not os.path.isdir(REF_AIM), reason="reference tree absent")
def test_aim_assets_bit_for_bit():
    for cls in CLASSES:
        with open(os.path.join(PKG, "assets", "aim", f"{cls}.JPEG"), "rb") as f:
            ours = f.read()
        with open(os.path.join(REF_AIM, f"{cls}.JPEG"), "rb") as f:
            ref = f.read()
        assert ours == ref, f"aim guide {cls} differs"


def test_rfcoa_loader_returns_real_feature():
    """_robust_feature must return the vendored NHWC feature, not random."""
    from transferattack_tpu.ensemble.rfcoa import RFCoA

    class Shim:
        _feat_root = "/nonexistent"

    feat = RFCoA._robust_feature(Shim(), 0, (1, 7, 7, 512))
    ref = np.load(os.path.join(PKG, "assets", "rfcoa", "24.npz"))["array"]
    assert feat.shape == (1, 7, 7, 512)
    np.testing.assert_array_equal(np.asarray(feat), ref.transpose(0, 2, 3, 1))


def test_aim_loader_returns_real_guide(monkeypatch):
    """_guide must decode the vendored JPEG (resized), not the flat fallback."""
    from transferattack_tpu.generation.aim import AIM

    monkeypatch.setenv("TA_TPU_WEIGHTS_DIR", "/nonexistent")
    guide = np.asarray(AIM._guide(object.__new__(AIM), 0, (1, 64, 64, 3)))
    assert guide.shape == (1, 64, 64, 3)
    assert guide.std() > 0.01, "flat fallback guide detected"
    from PIL import Image

    img = Image.open(os.path.join(PKG, "assets", "aim", "24.JPEG"))
    img = img.convert("RGB").resize((64, 64))
    np.testing.assert_allclose(
        guide[0], np.asarray(img, np.float32) / 255.0, atol=1e-6
    )
