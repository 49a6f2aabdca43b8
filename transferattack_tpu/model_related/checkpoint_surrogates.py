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
    """Dark-surrogate distilled ResNet-18 (``dsm.py:60``: the checkpoint
    loads into ``models.__dict__['resnet18']``)."""

    base_arch = "resnet18"
    ckpt_name = "dsm_resnet18"


class AGS(MIFGSM):
    """Affordable & generalizable substitute training (``ags.py:11-160``).

    The surrogate is the SSL ResNet-50 trunk of ``Basic_SSL_Model``
    (checkpoints ags_coco / ags_comics / ags_paintings — ``f`` holds the
    headless torchvision resnet50 children, so ``f._modules['5']`` is
    layer2).  Labels are unused: the loss maximizes feature dissimilarity
    ``1 − cos(f₅(x), f₅(x+δ))`` against the CLEAN image's feature recorded
    once before the loop (``ags.py:99-116``), and each step uses the RAW
    gradient sign — ``update_delta(delta, data, grad, alpha)`` with no
    momentum (``ags.py:119-121``); random start, alpha=1/255, epoch=300,
    eps=16/255 (the ctor default; the docstring's 25.5/255 is not what the
    shipped code passes)."""

    def __init__(self, model_name="ags_coco", epoch=300, eps=16 / 255,
                 alpha=1.0 / 255, decay=1.0, feature_layer="layer2",
                 targeted=False, random_start=True, norm="linfty",
                 loss="crossentropy", attack="AGS", **kwargs):
        pretrained = kwargs.pop("pretrained", True)
        input_size = kwargs.pop("input_size", None)
        model = make_model(kwargs.pop("base_arch", "resnet50"),
                           pretrained=pretrained, input_size=input_size)
        root = os.environ.get(
            "TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights")
        )
        path = os.path.join(root, f"{model_name}.npz")
        if os.path.exists(path):
            model.variables = load_npz_variables(path)
        else:
            record_fallback(model_name)
            warnings.warn(
                f"AGS: checkpoint {path} not found; running with base "
                "weights (convert the official SSL trunk for ASR parity)."
            )
        # decay=0 ⇒ sign(momentum) = sign(raw grad): the reference's
        # momentum-free update, expressed in the shared engine
        super().__init__(model, epoch=epoch, eps=eps, alpha=alpha, decay=0.0,
                         targeted=targeted, random_start=random_start,
                         norm=norm, loss=loss, attack=attack, **kwargs)
        self.feature_layer = feature_layer

    def init_extra(self, x, y):
        _, mid0 = self.model.feature(
            self.model.variables, x, self.feature_layer
        )
        return {"mid0": jax.lax.stop_gradient(mid0)}

    def get_grad(self, variables, x, y, state: AttackState, key):
        mid0 = state.extra["mid0"].reshape(x.shape[0], -1)

        def loss_fn(delta):
            _, mid = self.model.feature(
                variables, x + delta, self.feature_layer
            )
            mid = mid.reshape(x.shape[0], -1)
            cos = (mid * mid0).sum(-1) / (
                jnp.linalg.norm(mid, axis=-1)
                * jnp.linalg.norm(mid0, axis=-1) + 1e-12
            )
            return (1.0 - cos).mean()

        return jax.grad(loss_fn)(state.delta), {}


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
