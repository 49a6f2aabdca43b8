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
from flax import linen as nn

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


class AlignmentNet(nn.Module):
    """``ana.py:8-18``: two same-padded 3×3 convs + ReLU over the layer3
    feature (module names match the Sequential's ``net.0``/``net.2``)."""

    @nn.compact
    def __call__(self, f):
        C = f.shape[-1]
        f = nn.relu(nn.Conv(C, (3, 3), padding=[(1, 1), (1, 1)],
                            name="net_0")(f))
        return nn.relu(nn.Conv(C, (3, 3), padding=[(1, 1), (1, 1)],
                               name="net_2")(f))


class ANA(MIFGSM):
    """Alignment-network attack (``ana.py:67-175``).

    The surrogate is a pretrained ResNet-50 with an AlignmentNetCNN grafted
    after layer3 (checkpoint ``aligned_res50_v3.pth`` under
    ``alignment_state_dict``).  Per iteration (``ana.py:126-174``) THREE
    gradients are taken w.r.t. delta — the CE of the unaligned branch, and
    γ·MSE-sum of each branch's pooled (pre-fc) feature against its CLEAN
    reference — each L2-normalized PER SAMPLE, summed, then fed to the
    usual momentum update.  The ``eta``/``num_ens`` ctor args are dead in
    the reference loop and accepted-but-unused here too."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255,
                 alpha=1.6 / 255, decay=1.0, gamma=2.0, eta=28.0, num_ens=30,
                 feature_layer="layer3", ckpt_name="ana_alignment",
                 targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="ANA", **kwargs):
        kwargs.setdefault("attack", attack)
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha,
                         decay=decay, targeted=targeted,
                         random_start=random_start, norm=norm, loss=loss,
                         **kwargs)
        self.gamma = float(gamma)
        self.feature_layer = feature_layer
        self.align = AlignmentNet()
        # init at the surrogate's own layer3 feature shape (params depend
        # only on the channel count)
        s = getattr(self.model, "input_size", None) or 224
        _, f3 = self.model.feature(
            self.model.variables,
            jnp.zeros((1, s, s, 3), jnp.float32), self.feature_layer)
        self.align_vars = self.align.init(jax.random.PRNGKey(7), f3)
        root = os.environ.get(
            "TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights")
        )
        path = os.path.join(root, f"{ckpt_name}.npz")
        if os.path.exists(path):
            self.align_vars = load_npz_variables(path)
        else:
            record_fallback(ckpt_name)
            warnings.warn(
                f"ANA: alignment checkpoint {path} not found; random-init "
                "alignment net (convert aligned_res50_v3.pth for parity)."
            )

    def _branches(self, variables, x):
        """(logits, pooled_pre, pooled_post_aligned) — the reference's
        ``ResNet50WithAlign.forward(x, x)`` (``ana.py:58-65``): the
        unaligned branch feeds the classifier; the aligned branch replaces
        the layer3 feature with AlignmentNet(feature) and re-runs the
        tail; pooled = pre-fc global mean."""
        from ..models import find_feature, tap_key

        key = tap_key(self.feature_layer)

        def pooled(feats):
            # the deepest stage present = the pre-fc feature (stage4 on the
            # ResNet-50 the reference hardcodes; smaller test surrogates
            # expose fewer stages)
            for name in ("stage4", "stage3", "stage2", "stage1"):
                f = find_feature(feats, name)
                if f is not None:
                    return f.mean(axis=(1, 2))
            raise ValueError("no stage features found")

        logits, feats = self.model.apply_with_feats(variables, x, "stage")
        pre = pooled(feats)
        _, featsB = self.model.apply_with_feats(
            variables, x, "stage",
            tap_fns={key: lambda f: self.align.apply(self.align_vars, f)})
        post = pooled(featsB)
        return logits, pre, post

    def init_extra(self, x, y):
        _, pre, post = self._branches(self.model.variables, x)
        return {"ref_pre": jax.lax.stop_gradient(pre),
                "ref_post": jax.lax.stop_gradient(post)}

    def get_grad(self, variables, x, y, state: AttackState, key):
        from ..attack import softmax_cross_entropy

        ref_pre, ref_post = state.extra["ref_pre"], state.extra["ref_post"]

        def parts(delta):
            logits, pre, post = self._branches(variables, x + delta)
            ce = softmax_cross_entropy(logits, y).mean()
            cls = -ce if self.targeted else ce
            d1 = self.gamma * jnp.sum((pre - ref_pre) ** 2)
            d2 = self.gamma * jnp.sum((post - ref_post) ** 2)
            return cls, d1, d2

        def norm_grad(g):
            flat = g.reshape(g.shape[0], -1)
            denom = jnp.sqrt(jnp.sum(flat ** 2, axis=1)) + 1e-10
            return g / denom[:, None, None, None]

        g_cls = jax.grad(lambda d: parts(d)[0])(state.delta)
        g_d1 = jax.grad(lambda d: parts(d)[1])(state.delta)
        g_d2 = jax.grad(lambda d: parts(d)[2])(state.delta)
        return norm_grad(g_cls) + norm_grad(g_d1) + norm_grad(g_d2), {}


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
