"""Converter round-trip parity for the HGD DUNET denoiser.

The torch twin reproduces the reference ``Denoise`` (``defense/hgd/
resnet.py:57-123``) at the exact shipped configuration (block=Conv,
fwd_out=[64,128,256,256,256], ...) with checkpoint naming
(``fwd.i.j.conv`` / ``back.i.j.bn`` / ``final``); its random state_dict must
convert onto ``defense/at.DUNet`` with matching outputs.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

FWD_OUT = (64, 128, 256, 256, 256)
NUM_FWD = (2, 3, 3, 3, 3)
BACK_OUT = (64, 128, 256, 256)
NUM_BACK = (2, 3, 3, 3)


class TConv(tnn.Module):
    def __init__(self, n_in, n_out, stride=1):
        super().__init__()
        self.conv = tnn.Conv2d(n_in, n_out, 3, stride, 1, bias=False)
        self.bn = tnn.BatchNorm2d(n_out)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TDenoise(tnn.Module):
    """Reference Denoise with block=Conv at the shipped config."""

    def __init__(self, h_in=64, w_in=64, fwd_in=3):
        super().__init__()
        h, w = [], []
        for _ in range(len(NUM_FWD)):
            h.append(h_in)
            w.append(w_in)
            h_in = (h_in + 1) // 2
            w_in = (w_in + 1) // 2
        self.sizes = list(zip(h, w))

        fwd = []
        n_in = fwd_in
        for i in range(len(NUM_FWD)):
            group = []
            for j in range(NUM_FWD[i]):
                stride = 1 if (i == 0 or j > 0) else 2
                group.append(TConv(n_in if j == 0 else FWD_OUT[i],
                                   FWD_OUT[i], stride))
            n_in = FWD_OUT[i]
            fwd.append(tnn.Sequential(*group))
        self.fwd = tnn.ModuleList(fwd)

        back = []
        n_in = FWD_OUT[-2] + FWD_OUT[-1]
        for i in range(len(NUM_BACK) - 1, -1, -1):
            group = []
            for j in range(NUM_BACK[i]):
                group.append(TConv(n_in if j == 0 else BACK_OUT[i], BACK_OUT[i]))
            if i != 0:
                n_in = BACK_OUT[i] + FWD_OUT[i - 1]
            back.insert(0, tnn.Sequential(*group))
        self.back = tnn.ModuleList(back)
        self.final = tnn.Conv2d(BACK_OUT[0], fwd_in, 1, bias=False)

    def forward(self, x):
        out = x
        outputs = []
        for i in range(len(self.fwd)):
            out = self.fwd[i](out)
            if i != len(self.fwd) - 1:
                outputs.append(out)
        for i in range(len(self.back) - 1, -1, -1):
            out = F.interpolate(out, size=self.sizes[i], mode="bilinear",
                                align_corners=False)
            out = torch.cat((out, outputs[i]), 1)
            out = self.back[i](out)
        return self.final(out) + x


def test_hgd_dunet_converter_roundtrip():
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.defense.at import DUNet
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    torch.manual_seed(11)
    tmodel = TDenoise().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.05)

    denoiser = DUNet()
    ref = denoiser.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    converted = torch_state_dict_to_flax(tmodel.state_dict(), prefix="")
    variables, report = reconcile_with_module(converted, ref)
    assert not report["missing"], report["missing"][:10]
    assert not report["mismatched"], report["mismatched"][:10]

    rng = np.random.RandomState(0)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_out = np.asarray(denoiser.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(
        j_out, t_out.transpose(0, 2, 3, 1), atol=2e-3, rtol=1e-3
    )


def test_hgd_ensemble_runs_with_toy(tmp_path):
    """Default 4-net path falls back gracefully; single toy member scores."""
    import os
    import warnings

    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from make_fake_data import make_fake_dataset

    from transferattack_tpu.defense.at import run_hgd
    from transferattack_tpu.defense.scoring import asr_from_labels

    input_dir = make_fake_dataset(str(tmp_path / "data"), n=4, size=32)
    out_dir = str(tmp_path / "adv")
    os.makedirs(out_dir + "/", exist_ok=True)
    import shutil
    for f in os.listdir(os.path.join(input_dir, "images")):
        shutil.copy(os.path.join(input_dir, "images", f), os.path.join(out_dir, f))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        csv = run_hgd(input_dir, out_dir, batchsize=4, model_name="toy_cnn",
                      out_csv="hgd_toy.csv")
    asr = asr_from_labels(os.path.join(input_dir, "labels.csv"), csv)
    assert 0.0 <= asr <= 100.0
