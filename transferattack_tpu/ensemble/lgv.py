"""Checkpoint-set ensemble attacks (reference:
``transferattack/ensemble/{lgv,mba,sasd_ws}.py``).

LGV samples from a collection of cSGD-collected ResNet-50 weight sets each
iteration; MBA uses a Bayesian-optimized fine-tuned set; SASD-WS attacks a
sharpness-aware self-distilled checkpoint with its conv kernels scaled once
by the fixed factor p=0.93.
Converted weight sets load from ``$TA_TPU_WEIGHTS_DIR/<prefix>_<i>.npz``;
absent checkpoints fall back to gaussian-jittered base weights so the
pipeline (and its randomness structure) still executes.
"""
from __future__ import annotations

import os
import warnings

import jax
import jax.numpy as jnp

from ..attack import AttackState
from ..gradient.mifgsm import MIFGSM
from ..input_transformation.dim import random_resize_pad
from ..models import load_npz_variables, make_model
from ..utils.weights_manifest import record_fallback
from ..ops import gaussian_kernel, smooth_conv


def _load_weight_collection(prefix: str, max_sets: int = 40):
    root = os.environ.get("TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights"))
    sets = []
    for i in range(max_sets):
        p = os.path.join(root, f"{prefix}_{i}.npz")
        if os.path.exists(p):
            sets.append(load_npz_variables(p))
    return sets


class LGV(MIFGSM):
    """Large geometric vicinity (``lgv.py:10-116``): per iteration draw one
    model from the collected weight set."""

    def __init__(self, model_name="resnet50", n_models=10, jitter_std=0.01,
                 ckpt_prefix="lgv_resnet50", **kwargs):
        kwargs.setdefault("attack", "LGV")
        model = make_model(model_name, pretrained=kwargs.pop("pretrained", True),
                           input_size=kwargs.pop("input_size", None))
        super().__init__(model, **kwargs)
        sets = _load_weight_collection(ckpt_prefix)
        if sets:
            self._param_sets = [s["params"] for s in sets]
        else:
            record_fallback(ckpt_prefix)
            warnings.warn(
                f"LGV: no {ckpt_prefix}_*.npz weight sets found; sampling "
                "gaussian-jittered base weights instead (convert the official "
                "cSGD collection for ASR parity)."
            )
            base = model.variables["params"]
            key = jax.random.PRNGKey(self.seed + 77)
            self._param_sets = []
            for i in range(int(n_models)):
                key, sub = jax.random.split(key)
                leaves, treedef = jax.tree.flatten(base)
                ks = jax.random.split(sub, len(leaves))
                jittered = [
                    l + jitter_std * jnp.std(l) * jax.random.normal(k, l.shape, l.dtype)
                    for l, k in zip(leaves, ks)
                ]
                self._param_sets.append(jax.tree.unflatten(treedef, jittered))
        # stack for on-device dynamic indexing
        self._stacked = jax.tree.map(
            lambda *ls: jnp.stack(ls), *self._param_sets
        )
        self._num_sets = len(self._param_sets)

    def get_grad(self, variables, x, y, state: AttackState, key):
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (), 0, self._num_sets)
        params = jax.tree.map(lambda s: s[idx], self._stacked)
        v = {**variables, "params": params}

        def loss_fn(delta):
            logits = self.model.apply(v, x + delta)
            return self.get_loss(logits[None], y)

        return jax.grad(loss_fn)(state.delta), {}


class MBA(LGV):
    """Bayesian-optimized model set (``mba.py:9-78``): same sampling
    machinery over the fine-tuned collection."""

    def __init__(self, model_name="resnet50", ckpt_prefix="mba_resnet50", **kwargs):
        kwargs.setdefault("attack", "MBA")
        super().__init__(model_name, ckpt_prefix=ckpt_prefix, **kwargs)


class SASD_WS(MIFGSM):
    """Sharpness-aware self-distillation + weight scaling
    (``sasd_ws.py:10-200``): every conv kernel of the SASD checkpoint is
    scaled ONCE by the fixed factor p=0.93 at load time (``all_scale`` →
    ``AllScaleMethod.compute_mask`` is ``mask *= p`` with no randomness,
    ``sasd_ws.py:137-200``, made permanent by ``prune.remove``); built-in
    DI (resize 1.1, prob 0.7) + TI (gkern 5/3, padding 2); targeted
    protocol T=300, alpha=2/255 (``sasd_ws.py:29``)."""

    def __init__(self, model_name="resnet50", epoch=300, eps=16 / 255, alpha=2 / 255,
                 decay=1.0, p=0.93, resize_rate=1.1, diversity_prob=0.7,
                 kernel_size=5, ckpt_name="sasd_resnet50", targeted=True,
                 random_start=False, norm="linfty", loss="crossentropy",
                 attack="SASD_WS", **kwargs):
        model = make_model(model_name, pretrained=kwargs.pop("pretrained", True),
                           input_size=kwargs.pop("input_size", None))
        root = os.environ.get("TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights"))
        path = os.path.join(root, f"{ckpt_name}.npz")
        if os.path.exists(path):
            model.variables = load_npz_variables(path)
        else:
            record_fallback(ckpt_name)
            warnings.warn(f"SASD_WS: checkpoint {path} not found; base weights used.")
        # the fixed weight-scaling step (conv kernels only — the reference
        # filters ``type(m) == nn.Conv2d``; 4-d leaves are exactly those here)
        model.variables = jax.tree.map(
            lambda l: l * p if getattr(l, "ndim", 0) == 4 else l, model.variables
        )
        super().__init__(model, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.p = float(p)
        self.resize_rate = float(resize_rate)
        self.diversity_prob = float(diversity_prob)
        self.kernel = gaussian_kernel(int(kernel_size))

    def transform(self, x, state: AttackState, key):
        return random_resize_pad(x, key, self.resize_rate, self.diversity_prob)[None]

    def post_grad(self, grad, state: AttackState):
        return smooth_conv(grad, self.kernel)
