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
        warnings.warn(f"AT: checkpoint {path} missing; base weights used.")
    return _classify_dir(surrogate, input_dir, output_dir, batchsize, out_csv)


class DUNet(nn.Module):
    """HGD's denoising U-Net (``defense/hgd/resnet.py:286`` Denoise): conv
    encoder/decoder with skip connections; output is a residual correction."""

    width: int = 64
    levels: int = 3

    @nn.compact
    def __call__(self, x):
        skips = []
        h = x
        for i in range(self.levels):
            h = nn.Conv(self.width * (2**i), (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], name=f"down{i}")(h)
            h = nn.relu(h)
            skips.append(h)
        for i in reversed(range(self.levels)):
            h = jax.image.resize(
                h, (h.shape[0], h.shape[1] * 2, h.shape[2] * 2, h.shape[3]),
                method="bilinear",
            )
            h = jnp.concatenate([h, jax.image.resize(
                skips[i], h.shape[:3] + (skips[i].shape[3],), method="bilinear"
            )], axis=-1)
            h = nn.Conv(self.width * (2**i), (3, 3), padding=[(1, 1), (1, 1)],
                        name=f"up{i}")(h)
            h = nn.relu(h)
        res = nn.Conv(3, (3, 3), padding=[(1, 1), (1, 1)], name="out")(h)
        res = jax.image.resize(res, x.shape, method="bilinear")
        return x - res


def run_hgd(input_dir: str, output_dir: str, batchsize: int = 16,
            model_name: str = "resnet50", ckpt: str = "hgd_denoiser",
            out_csv: str = "hgd_predictions.csv", ensemble=None) -> str:
    """Denoise then classify (``defense/hgd/defense.py:57``).

    The reference fronts a 4-model ensemble (ResNet152-wide, IncResV2, IncV3,
    ResNeXt101 — ``defense/hgd/{resnet,inceptionresnet,v3,resnext101}.py``);
    pass ``ensemble=[names...]`` for the multi-model logit-mean variant (the
    nearest members available in this zoo), or a single ``model_name``."""
    from ..utils.data import AdvDataset

    denoiser = DUNet()
    root = os.environ.get("TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights"))
    path = os.path.join(root, f"{ckpt}.npz")
    if os.path.exists(path):
        dvars = load_npz_variables(path)
    else:
        warnings.warn(f"HGD: denoiser checkpoint {path} missing; random init.")
        dvars = denoiser.init(jax.random.PRNGKey(5), jnp.zeros((1, 64, 64, 3)))
    names_list = ensemble if ensemble else [model_name]
    surrogates = [make_model(n) for n in names_list]

    @jax.jit
    def classify(x):
        clean = jnp.clip(denoiser.apply(dvars, x), 0.0, 1.0)
        logits = 0.0
        for s in surrogates:
            logits = logits + s.apply(s.variables, clean)
        return (logits / len(surrogates)).argmax(-1)

    ds = AdvDataset(input_dir=input_dir, output_dir=output_dir, eval_mode=True)
    preds = {}
    for xs, ys, names in ds.as_batches(batchsize):
        p = np.asarray(classify(jnp.asarray(xs)))
        for nm, pi in zip(names, p):
            preds[nm] = int(pi)
    out = os.path.join(output_dir, out_csv)
    write_label_csv(out, preds)
    return out
