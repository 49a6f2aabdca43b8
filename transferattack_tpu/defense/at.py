"""AT / HGD defenses (reference: ``defense/at/main_fast.py`` evaluate mode,
``defense/hgd/defense.py``).

AT: classify adversarial PNGs with a 4px-adversarially-trained ResNet-50
(checkpoint ``at_resnet50_4px.npz``) and emit a prediction CSV.

HGD: a DUNET high-level-guided denoiser in front of the classifier; the
reference's 4-model ensemble (``defense/hgd/{resnet,inceptionresnet,v3,
resnext101}.py``) reduces to denoiser + one configurable classifier per run,
looped over the model list.
"""
from __future__ import annotations

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..models import load_npz_variables, make_model
from .scoring import write_label_csv
from ..utils.weights_manifest import record_fallback


def _classify_dir(surrogate, input_dir, output_dir, batchsize, out_csv):
    from ..utils.data import AdvDataset

    apply = jax.jit(surrogate.module.apply)
    ds = AdvDataset(input_dir=input_dir, output_dir=output_dir, eval_mode=True)
    preds = {}
    for xs, ys, names in ds.as_batches(batchsize):
        p = np.asarray(apply(surrogate.variables, jnp.asarray(xs)).argmax(-1))
        for nm, pi in zip(names, p):
            preds[nm] = int(pi)
    path = os.path.join(output_dir, out_csv)
    write_label_csv(path, preds)
    return path


def run_at(input_dir: str, output_dir: str, batchsize: int = 16,
           model_name: str = "resnet50", ckpt: str = "at_resnet50_4px",
           out_csv: str = "at_predictions.csv") -> str:
    """Evaluate with the fast-AT classifier (``main_fast.py:141``)."""
    surrogate = make_model(model_name)
    root = os.environ.get("TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights"))
    path = os.path.join(root, f"{ckpt}.npz")
    if os.path.exists(path):
        surrogate.variables = load_npz_variables(path)
    else:
        record_fallback(ckpt)
        warnings.warn(f"AT: checkpoint {path} missing; base weights used.")
    return _classify_dir(surrogate, input_dir, output_dir, batchsize, out_csv)


class HGDConvBlock(nn.Module):
    """``defense/hgd/resnet.py:6-17`` Conv: 3×3 conv (no bias) + BN + ReLU."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                         name="bn")(x)
        return nn.relu(x)


class DUNet(nn.Module):
    """HGD's DUNET (``defense/hgd/resnet.py:57-123`` Denoise with
    ``block=Conv`` — the pixel-space configuration every shipped checkpoint
    uses, ``defense/hgd/{res152_wide,inres,v3,resnext101}.py``).

    5-level conv encoder (stride-2 group entries), bilinear-upsample decoder
    with encoder-skip concatenation, 1×1 ``final`` conv, residual add.
    Parameter tree mirrors the checkpoint keys ``net.denoise.0.fwd.i.j.conv``
    → ``fwd_{i}_{j}/conv`` for the generic converter.
    """

    fwd_out: tuple = (64, 128, 256, 256, 256)
    num_fwd: tuple = (2, 3, 3, 3, 3)
    back_out: tuple = (64, 128, 256, 256)
    num_back: tuple = (2, 3, 3, 3)
    out_channels: int = 3

    @nn.compact
    def __call__(self, x):
        out = x
        skips = []
        for i, n in enumerate(self.num_fwd):
            for j in range(n):
                stride = 2 if (j == 0 and i > 0) else 1
                out = HGDConvBlock(self.fwd_out[i], stride,
                                   name=f"fwd_{i}_{j}")(out)
            if i != len(self.num_fwd) - 1:
                skips.append(out)
        for i in reversed(range(len(self.num_back))):
            tgt = skips[i]
            out = jax.image.resize(
                out, (out.shape[0], tgt.shape[1], tgt.shape[2], out.shape[3]),
                method="bilinear",
            )
            out = jnp.concatenate([out, tgt], axis=-1)
            for j in range(self.num_back[i]):
                out = HGDConvBlock(self.back_out[i], 1,
                                   name=f"back_{i}_{j}")(out)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                      name="final")(out)
        return out + x


# the reference's four denoiser+classifier pairs (``defense/hgd/defense.py:
# 88-145``): each net denoises in pixel space then classifies at 299²;
# logits are summed across all four and argmax'd (+1 TF-label offset handled
# by the scorer's START=1)
HGD_ENSEMBLE = (
    ("hgd_resnet152", "resnet152"),              # ← denoise_res_015.ckpt
    ("hgd_inception_resnet_v2", "inception_resnet_v2"),  # denoise_inres_014
    ("hgd_inception_v3", "inception_v3"),        # ← denoise_incepv3_012.ckpt
    ("hgd_resnext101_32x4d", "resnext101_32x4d"),  # ← denoise_rex_001.ckpt
)


def _load_hgd_member(ckpt_name: str, model_name: str, root: str):
    """Build one (denoiser, classifier) pair; checkpoint npz carries both
    subtrees under ``denoise/`` and ``classifier/`` (see convert_hgd)."""
    official = {m for _, m in HGD_ENSEMBLE}
    size = 299 if model_name in official else None  # reference runs at 299²
    surrogate = make_model(model_name, pretrained=False, input_size=size)
    denoiser = DUNet()
    path = os.path.join(root, f"{ckpt_name}.npz")
    if os.path.exists(path):
        both = load_npz_variables(path)
        dvars = both["denoise"]
        surrogate.variables = both["classifier"]
        fallback = False
    else:
        record_fallback(ckpt_name)
        warnings.warn(f"HGD: checkpoint {path} missing; random init.")
        dvars = denoiser.init(jax.random.PRNGKey(5), jnp.zeros((1, 64, 64, 3)))
        fallback = True
    return denoiser, dvars, surrogate, fallback


def run_hgd(input_dir: str, output_dir: str, batchsize: int = 16,
            model_name: str = None, ckpt: str = None,
            out_csv: str = "hgd_predictions.csv", ensemble=None) -> str:
    """Denoise-then-classify with the reference's 4-net ensemble by default
    (``defense/hgd/defense.py:132-147``: per-net pixel denoiser → per-net
    normalization → summed logits → argmax).  Pass ``model_name`` (and
    optionally ``ckpt``) to run a single member instead."""
    from ..utils.data import AdvDataset

    root = os.environ.get("TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights"))
    if model_name is not None:
        members = [(ckpt or f"hgd_{model_name}", model_name)]
    elif ensemble is not None:
        members = [(f"hgd_{n}", n) for n in ensemble]
    else:
        members = list(HGD_ENSEMBLE)
    loaded = [_load_hgd_member(c, m, root) for c, m in members]

    @jax.jit
    def classify(x):
        logits = 0.0
        for denoiser, dvars, surrogate, _ in loaded:
            clean = denoiser.apply(dvars, x)
            logits = logits + surrogate.apply(surrogate.variables, clean)
        return logits.argmax(-1)

    ds = AdvDataset(input_dir=input_dir, output_dir=output_dir, eval_mode=True)
    preds = {}
    for xs, ys, names in ds.as_batches(batchsize):
        p = np.asarray(classify(jnp.asarray(xs)))
        for nm, pi in zip(names, p):
            preds[nm] = int(pi)
    out = os.path.join(output_dir, out_csv)
    write_label_csv(out, preds)
    return out


def convert_hgd(ckpt_path: str, model_name: str, out_name: str = None,
                out_dir: str = None) -> str:
    """Convert an official HGD checkpoint (``denoise_*.ckpt`` — a ``Net``
    state_dict with ``net.denoise.0.*`` denoiser keys and ``net.*``
    classifier keys) into one npz holding both subtrees."""
    import torch

    from ..models import save_npz_variables
    from ..utils.convert import reconcile_with_module, torch_state_dict_to_flax

    state = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    den_state, cls_state = {}, {}
    for k, v in state.items():
        k2 = k[len("module."):] if k.startswith("module.") else k
        if k2.startswith("net.denoise.0."):
            den_state[k2[len("net.denoise.0."):]] = v
        elif k2.startswith("net.") and not k2.startswith("net.denoise"):
            cls_state[k2[len("net."):]] = v
    denoiser = DUNet()
    dref = denoiser.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    dconv = torch_state_dict_to_flax(den_state, prefix="")
    dvars, drep = reconcile_with_module(dconv, dref)
    surrogate = make_model(model_name, pretrained=False, input_size=299)
    cconv = torch_state_dict_to_flax(cls_state)
    cvars, crep = reconcile_with_module(cconv, surrogate.variables)
    for rep, tag in ((drep, "denoiser"), (crep, "classifier")):
        if rep["missing"] or rep["mismatched"]:
            print(f"[convert_hgd] {tag}: {len(rep['missing'])} missing, "
                  f"{len(rep['mismatched'])} mismatched")
            for m in (rep["missing"] + rep["mismatched"])[:10]:
                print("  ", m)
    out_dir = out_dir or os.environ.get(
        "TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights"))
    name = out_name or f"hgd_{model_name}"
    path = os.path.join(out_dir, f"{name}.npz")
    save_npz_variables(path, {"denoise": dvars, "classifier": cvars})
    return path
