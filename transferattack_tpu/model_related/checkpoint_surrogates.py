"""Alternate-checkpoint surrogate attacks (reference:
``transferattack/model_related/{dra,mta,mup,dsm,ags,ma,ana,qaa}.py``).

Each attack is MI-FGSM against a specially *trained* surrogate.  The
reference downloads .pth checkpoints (docstrings in each file); here the
converted weights are loaded from ``$TA_TPU_WEIGHTS_DIR/<ckpt_name>.npz``
(produce them offline with ``utils/convert.py``).  When absent, the attack
still runs against the base architecture's weights so pipelines stay
executable — ASR parity then requires the converted checkpoint.

QAA's APoT-quantized ResNet (``qaa_utils/archs/apot/quant_layer.py``) is
re-designed TPU-first: symmetric per-channel fake quantization applied to
conv kernels inside the jit program (straight-through estimator), rather
than a vendored 1,100-LoC quantized-module fork.
"""
from __future__ import annotations

import os
import warnings

import jax
import jax.numpy as jnp

from ..attack import AttackState
from ..gradient.mifgsm import MIFGSM
from ..models import load_npz_variables, make_model
from ..utils.weights_manifest import record_fallback


class CheckpointSurrogateAttack(MIFGSM):
    """MI-FGSM against a fine-tuned surrogate checkpoint."""

    base_arch = "resnet50"
    ckpt_name = ""  # e.g. 'dra_resnet50'

    def __init__(self, model_name=None, **kwargs):
        arch = model_name or self.base_arch
        kwargs.setdefault("attack", type(self).__name__)
        model = make_model(arch, pretrained=kwargs.pop("pretrained", True),
                           input_size=kwargs.pop("input_size", None))
        root = os.environ.get(
            "TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights")
        )
        path = os.path.join(root, f"{self.ckpt_name}.npz")
        if self.ckpt_name and os.path.exists(path):
            model.variables = load_npz_variables(path)
        elif self.ckpt_name:
            record_fallback(self.ckpt_name)
            warnings.warn(
                f"{type(self).__name__}: checkpoint {path} not found; "
                "running with base weights (convert the official .pth via "
                "transferattack_tpu.utils.convert for ASR parity)."
            )
        super().__init__(model, **kwargs)


class DRA(CheckpointSurrogateAttack):
    """Distribution-relevant fine-tuned ResNet-50 (``dra.py``)."""

    ckpt_name = "dra_resnet50"


class MTA(CheckpointSurrogateAttack):
    """Meta-surrogate ResNet-18 (``mta.py``)."""

    base_arch = "resnet18"
    ckpt_name = "mta_resnet18"


class DSM(CheckpointSurrogateAttack):
    """Distillation-trained ResNet (``dsm.py``)."""

    ckpt_name = "dsm_resnet50"


class AGS(CheckpointSurrogateAttack):
    """Adversary-centric contrastive ResNet-18 (``ags.py``)."""

    base_arch = "resnet18"
    ckpt_name = "ags_resnet18"


class MA(CheckpointSurrogateAttack):
    """KL-min fine-tuned witness model (``ma.py``)."""

    ckpt_name = "ma_resnet50"


class ANA(CheckpointSurrogateAttack):
    """Alignment-network attack (``ana.py``): an auxiliary CNN (checkpoint)
    aligns mid-features; absent the aux checkpoint we attack the aligned
    surrogate directly."""

    ckpt_name = "ana_resnet50"


def quantize_per_channel(w, bits: int):
    """Symmetric per-output-channel fake quantization with a straight-through
    estimator — the TPU-native stand-in for APoT (``quant_layer.py:240``)."""
    levels = 2 ** (bits - 1) - 1
    axes = tuple(range(w.ndim - 1))
    scale = jnp.max(jnp.abs(w), axis=axes, keepdims=True) / levels + 1e-12
    q = jnp.round(w / scale) * scale
    return w + jax.lax.stop_gradient(q - w)


class QAA(CheckpointSurrogateAttack):
    """Quantization-aware attack (``qaa.py``): attack a quantized surrogate;
    low-bit surrogates transfer better."""

    ckpt_name = "qaa_resnet50"

    def __init__(self, model_name=None, bits=4, **kwargs):
        super().__init__(model_name, **kwargs)
        self.bits = int(bits)
        # quantize conv/dense kernels once (inference-time quantized network)
        params = self.model.variables["params"]

        def q(path, w):
            if w.ndim >= 2 and path[-1].key == "kernel":
                return quantize_per_channel(w, self.bits)
            return w

        self.model.variables = {
            **self.model.variables,
            "params": jax.tree_util.tree_map_with_path(q, params),
        }
