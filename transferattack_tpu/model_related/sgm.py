"""CNN gradient-surgery surrogates (reference:
``transferattack/model_related/{sgm,linbp,iaa,bpa,ghost,dhf}.py``).

Every torch backward-hook / module-swap trick becomes a ``SurgeryConfig``
field on the Flax ResNet (``models/resnet.py``): γ-scaled ReLU grads (SGM),
identity-backward ReLUs from a block on (LinBP), Softplus + residual
downweighting (IAA), SiLU-derivative ReLUs + softmax-backward maxpool (BPA),
per-channel random skip scaling drawn each forward (ghost networks), and
benign-feature mixup taps (DHF).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import AttackState
from ..gradient.mifgsm import MIFGSM, NIFGSM
from ..models import make_model
from ..models.resnet import SurgeryConfig

# per-architecture stage sizes for layer-spec → global block index
_STAGE_SIZES = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


def _block_index(layer_spec: str, arch: str = "resnet50") -> int:
    """'3_1' → global block index 8 on ResNet-50 (``linbp.py:35``)."""
    stage, blk = (int(v) for v in layer_spec.split("_"))
    sizes = _STAGE_SIZES.get(arch, (3, 4, 6, 3))
    return sum(sizes[: stage - 1]) + blk


class SGM(MIFGSM):
    """Skip gradient method (``sgm.py:9-97``).

    Faithful to the reference hooks *as registered* (``sgm.py:67-84``):
    γ (γ^0.5 on Bottleneck/DenseNet archs) scales the backward of the inner
    ReLUs of every block except the first block of each stage ('0.relu' name
    exclusion) plus the stem ReLU, and every block output's gradient is
    std-normalized (the ``backward_hook_norm`` block hook).  See
    ``models/resnet.py`` ``std_norm_relu``/``_inner_act``.
    """

    def __init__(self, model_name="resnet50", gamma=0.2, **kwargs):
        sqrt_archs = ("resnet50", "resnet101", "resnet152", "densenet")
        eff = gamma**0.5 if any(k in model_name for k in sqrt_archs) else gamma
        kwargs.setdefault("attack", "SGM")
        surgery = SurgeryConfig(gamma=eff)
        model = make_model(model_name, surgery=surgery,
                           pretrained=kwargs.pop("pretrained", True),
                           input_size=kwargs.pop("input_size", None))
        super().__init__(model, **kwargs)


class LinBP(MIFGSM):
    """Linear backprop (``linbp.py:7-177``): identity ReLU backward from
    linbp_layer='3_1' on; epoch=300 in the reference signature but the zoo
    runs the standard protocol."""

    def __init__(self, model_name="resnet50", linbp_layer="3_1", **kwargs):
        kwargs.setdefault("attack", "LinBP")
        surgery = SurgeryConfig(linbp_start=_block_index(linbp_layer, model_name))
        model = make_model(model_name, surgery=surgery,
                           pretrained=kwargs.pop("pretrained", True),
                           input_size=kwargs.pop("input_size", None))
        super().__init__(model, **kwargs)


class IAA(MIFGSM):
    """Intrinsic adversarial attack (``iaa.py:8-123``): ReLU→Softplus(β) and
    per-stage residual-branch downweighting λ."""

    BETAS = {"resnet18": 20, "resnet34": 20, "resnet50": 20, "resnet152": 32}
    LAMBDAS = {
        "resnet18": (0.98, 0.87, 0.73, 0.19),
        "resnet34": (0.98, 0.87, 0.73, 0.19),
        "resnet50": (0.98, 0.87, 0.73, 0.19),
        "resnet152": (0.89, 0.88, 0.70, 0.20),
    }

    def __init__(self, model_name="resnet50", **kwargs):
        kwargs.setdefault("attack", "IAA")
        if model_name not in self.BETAS:
            raise ValueError(f"IAA does not support {model_name}")
        surgery = SurgeryConfig(
            softplus_beta=float(self.BETAS[model_name]),
            residual_scale=self.LAMBDAS[model_name],
        )
        model = make_model(model_name, surgery=surgery,
                           pretrained=kwargs.pop("pretrained", True),
                           input_size=kwargs.pop("input_size", None))
        super().__init__(model, **kwargs)


class BPA(MIFGSM):
    """Backward-pass alignment (``bpa.py:10-136``): softmax-temperature
    maxpool backward + SiLU-derivative ReLU backward from bpa_layer='3_1'."""

    def __init__(self, model_name="resnet50", bpa_layer="3_1", **kwargs):
        if "resnet" not in model_name:
            raise ValueError("BPA currently supports ResNet only")
        kwargs.setdefault("attack", "BPA")
        surgery = SurgeryConfig(
            bpa_start=_block_index(bpa_layer, model_name), bpa_maxpool=True
        )
        model = make_model(model_name, surgery=surgery,
                           pretrained=kwargs.pop("pretrained", True),
                           input_size=kwargs.pop("input_size", None))
        super().__init__(model, **kwargs)


class GhostNetwork_MIFGSM(MIFGSM):
    """Ghost networks (``ghost.py:31-53``): every forward samples a random
    network from the ghost family.  ResNet surrogates use per-channel skip
    scalings U(1±range) (``ghost_networks/resnet.py:110``); Inception
    surrogates use always-on dropout(1-keep_prob) after every stem conv /
    Mixed block (``ghost_networks/inc_v3.py:38-100``)."""

    rng_collections = ("ghost",)

    def __init__(self, model_name="resnet50", ghost_keep_prob=0.994,
                 ghost_random_range=0.16, **kwargs):
        kwargs.setdefault("attack", "GhostNetwork_MIFGSM")
        pretrained = kwargs.pop("pretrained", True)
        input_size = kwargs.pop("input_size", None)
        if "inc_res" in model_name or "inception_resnet" in model_name:
            # IncRes-v2 ghost: per-channel residual-skip scaling
            # (``ghost_networks/inc_res_v2.py:133,184,244``)
            model = make_model("inception_resnet_v2",
                               ghost_range=float(ghost_random_range),
                               pretrained=pretrained, input_size=input_size)
        elif "inception" in model_name or model_name == "inc_v3":
            model = make_model("inception_v3",
                               ghost_keep_prob=float(ghost_keep_prob),
                               pretrained=pretrained, input_size=input_size)
        else:
            surgery = SurgeryConfig(ghost_range=float(ghost_random_range))
            model = make_model(model_name, surgery=surgery,
                               pretrained=pretrained, input_size=input_size)
        super().__init__(model, **kwargs)


class GhostNetwork_IFGSM(GhostNetwork_MIFGSM):
    def __init__(self, *args, **kwargs):
        kwargs.setdefault("attack", "GhostNetwork_IFGSM")
        kwargs["decay"] = 0.0
        super().__init__(*args, **kwargs)


class GhostNetwork_NIFGSM(GhostNetwork_MIFGSM):
    def __init__(self, *args, **kwargs):
        kwargs.setdefault("attack", "GhostNetwork_NIFGSM")
        super().__init__(*args, **kwargs)

    def transform(self, x, state: AttackState, key):
        return (x + self.alpha * self.decay * state.momentum)[None]
