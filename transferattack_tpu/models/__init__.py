"""Surrogate-model zoo (reference: ``transferattack/utils.py:29-105``).

Every surrogate is a Flax linen module wrapped with an in-graph preprocessing
stage (resize + normalize, the reference's ``PreprocessingModel``,
``utils.py:72-79``) so attacks operate in raw ``[0, 1]`` pixel space.  Layout
is NHWC throughout (TPU conv-friendly).

Weights: pretrained parameters are loaded from ``$TA_TPU_WEIGHTS_DIR/<name>.npz``
(produced by ``transferattack_tpu.utils.convert`` from a PyTorch state_dict);
absent that, models are randomly initialized with a fixed seed — attack
*semantics* and throughput are weight-independent, ASR parity is not.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
INCEPTION_MEAN = (0.5, 0.5, 0.5)
INCEPTION_STD = (0.5, 0.5, 0.5)

# name -> (builder() -> nn.Module, input_size, mean, std)
_MODEL_REGISTRY: Dict[str, Tuple[Callable[..., nn.Module], int, tuple, tuple]] = {}


def LN(**kw):
    """`nn.LayerNorm` with an opt-in bf16-statistics experiment toggle.

    Flax upcasts normalization statistics to float32
    (``force_float32_reductions``), which under a bf16 model puts a
    convert→reduce→convert chain around every LayerNorm — 30.6% of the
    MI-FGSM/ViT-B step in the round-3 leaf-op trace
    (``convert_reduce_fusion``, BASELINE.md).  ``TA_TPU_LN=bf16`` keeps
    the statistics in bf16 — measured and REJECTED: 95.8 vs 125.9 img/s
    (bf16 reductions defuse XLA's pipeline; BASELINE.md r3).  Off by
    default; kept as the recorded experiment.
    """
    if os.environ.get("TA_TPU_LN", "") == "bf16":
        kw.setdefault("force_float32_reductions", False)
    return nn.LayerNorm(**kw)


def register_model(name, input_size=224, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    def deco(builder):
        _MODEL_REGISTRY[name] = (builder, input_size, mean, std)
        return builder

    return deco


def list_models() -> List[str]:
    return sorted(_MODEL_REGISTRY)


class Preprocess(nn.Module):
    """Resize + normalize fused into the forward graph (``utils.py:72-79``).

    ``jax.image.resize`` with ``method='bilinear'`` uses half-pixel centers,
    matching torch ``align_corners=False`` / torchvision Resize semantics.
    """

    size: int
    mean: tuple
    std: tuple

    @nn.compact
    def __call__(self, x):
        if x.shape[1] != self.size or x.shape[2] != self.size:
            x = jax.image.resize(
                x, (x.shape[0], self.size, self.size, x.shape[3]), method="bilinear"
            )
        mean = jnp.asarray(self.mean, x.dtype)
        std = jnp.asarray(self.std, x.dtype)
        return (x - mean) / std


class WrappedModel(nn.Module):
    """Preprocessing + backbone (the reference's ``wrap_model``, ``utils.py:37-60``)."""

    backbone: nn.Module
    size: int
    mean: tuple
    std: tuple

    @nn.compact
    def __call__(self, x, **kwargs):
        x = Preprocess(self.size, self.mean, self.std, name="preprocess")(x)
        return self.backbone(x, **kwargs)


@dataclasses.dataclass
class Surrogate:
    """A ready-to-attack model: module + variables + metadata."""

    name: str
    module: nn.Module
    variables: Any
    input_size: int
    num_classes: int = 1000
    # set by Attack.__init__ when compute_dtype='bfloat16': every apply()
    # entry point (not just get_logits) runs the forward on the MXU-native
    # dtype and returns fp32 logits — estimator attacks that call
    # model.apply directly (SSM, FIA, VMI neighbors, ...) get the fast path
    compute_dtype: Any = None

    def apply(self, variables, x, **kwargs):
        cd = self.compute_dtype
        if cd is not None and hasattr(x, "dtype") and x.dtype == jnp.float32:
            out = self.module.apply(variables, x.astype(cd), **kwargs)
            return jax.tree.map(
                lambda t: t.astype(jnp.float32)
                if hasattr(t, "dtype") and t.dtype == cd else t, out)
        return self.module.apply(variables, x, **kwargs)

    def feature(self, variables, x, layer: str, **kwargs):
        """(logits, feature) at a named tap.

        ``layer`` uses reference naming: ``layer2`` → per-stage sow
        ``stage2``; ``layer2.3`` → block module ``layer2_3``; Inception mixed
        blocks by their own names.  Replaces FIA-style forward hooks
        (``advanced_objective/fia.py:55-61``).
        """
        key = tap_key(layer)
        logits, feats = self.apply_with_feats(variables, x, key, **kwargs)
        found = find_feature(feats, key)
        if found is None:
            raise KeyError(f"No feature {layer!r} (key {key!r}) in intermediates")
        return logits, found

    def feature_shape(self, x_shape, layer: str):
        """Static shape of a tap's activation (for offset probes)."""
        import jax

        dummy = jnp.zeros(x_shape, jnp.float32)
        shapes = jax.eval_shape(
            lambda v, d: self.feature(v, d, layer)[1], self.variables, dummy
        )
        return shapes.shape

    def apply_with_feats(self, variables, x, layer_filter, **kwargs):
        """Forward pass that also returns intermediate activations.

        Replaces the reference's ``register_forward_hook`` pattern
        (e.g. ``advanced_objective/fia.py:55-61``).  ``layer_filter`` is either
        a path substring or a ``(module, method_name) -> bool`` callable; the
        returned dict maps module paths to their outputs (plus any sown
        per-stage entries).
        """
        if callable(layer_filter):
            filt = layer_filter
        else:
            def filt(mdl, _method):
                return layer_filter in "/".join(str(p) for p in mdl.path)

        cd = self.compute_dtype
        if cd is not None and hasattr(x, "dtype") and x.dtype == jnp.float32:
            x = x.astype(cd)
        logits, state = self.module.apply(
            variables, x, capture_intermediates=filt, mutable=["intermediates"],
            **kwargs,
        )
        if cd is not None:
            to32 = lambda t: (t.astype(jnp.float32)
                              if hasattr(t, "dtype") and t.dtype == cd else t)
            logits = jax.tree.map(to32, logits)
            state = jax.tree.map(to32, state)
        return logits, state["intermediates"]


def tap_key(reference_layer: str) -> str:
    """Map a reference layer spec to our tap/intermediate key:
    ``'layer2'`` → ``'stage2'``; ``'layer2.3'``/``'layer2 3'`` → ``'layer2_3'``;
    anything else passes through (``Mixed_5b``, ``stage1``, ...)."""
    name = reference_layer.replace(" ", ".").strip()
    if "." in name:
        return name.replace(".", "_")
    if name.startswith("layer") and name[5:].isdigit():
        return "stage" + name[5:]
    return name


def find_feature(tree, key: str):
    """DFS for an intermediates entry named ``key``; unwraps sow tuples and
    ``__call__`` capture dicts."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            if k == key:
                node = v
                if isinstance(node, dict) and "__call__" in node:
                    node = node["__call__"]
                if isinstance(node, (tuple, list)):
                    node = node[0]
                return node
            res = find_feature(v, key)
            if res is not None:
                return res
    return None


def _weights_path(name: str) -> Optional[str]:
    root = os.environ.get("TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights"))
    p = os.path.join(root, f"{name}.npz")
    return p if os.path.exists(p) else None


def load_npz_variables(path: str) -> Dict:
    """Load a flattened variables dict saved by the weight converter."""
    flat = dict(np.load(path))
    tree: Dict[str, Any] = {}
    for k, v in flat.items():
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_npz_variables(path: str, variables) -> None:
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, prefix + (str(k),))
        else:
            flat["/".join(prefix)] = np.asarray(node)

    walk(jax.tree.map(np.asarray, jax.device_get(variables)), ())
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def make_model(
    name: str,
    pretrained: bool = True,
    seed: int = 42,
    input_size: Optional[int] = None,
    **kwargs,
) -> Surrogate:
    """Build a wrapped surrogate by registry name (the reference's
    torchvision-then-timm resolution, ``attack.py:51-60``).

    ``input_size`` overrides the registry's native resolution (used by the
    multi-chip dry-run and fast tests; pretrained weights assume the native
    size).
    """
    # reference short names used by ghost/DHF (``model_related/dhf.py:16-22``)
    aliases = {"inc_v3": "inception_v3", "inc_res": "inception_resnet_v2",
               "inc_res_v2": "inception_resnet_v2"}
    name = aliases.get(name, name)
    if name not in _MODEL_REGISTRY:
        raise ValueError(f"Unknown model {name!r}; available: {list_models()}")
    builder, size, mean, std = _MODEL_REGISTRY[name]
    if input_size is not None:
        size = input_size
    backbone = builder(**kwargs)
    module = WrappedModel(backbone=backbone, size=size, mean=mean, std=std)
    wpath = _weights_path(name) if pretrained else None
    if wpath is not None:
        variables = load_npz_variables(wpath)
    else:
        if pretrained:
            # requested pretrained weights but none converted yet — flag the
            # run so results can't silently pass as paper-comparable
            from ..utils.weights_manifest import record_fallback

            record_fallback(name)
        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, size, size, 3), jnp.float32)
        variables = module.init(rng, dummy)
    if os.environ.get("TA_TPU_BN") == "folded" and (
            name.startswith(("resnet", "resnext", "wide_resnet"))):
        # exact conv←BN scale folding (see resnet.FoldedBN); load-time only
        from .resnet import fold_bn_variables

        sub = fold_bn_variables({
            "params": variables["params"]["backbone"],
            "batch_stats": variables.get(
                "batch_stats", {}).get("backbone", {}),
        })
        variables = dict(variables)
        variables["params"] = {**variables["params"],
                               "backbone": sub["params"]}
        if "batch_stats" in variables:
            variables["batch_stats"] = {**variables["batch_stats"],
                                        "backbone": sub.get("batch_stats", {})}
    return Surrogate(
        name=name,
        module=module,
        variables=variables,
        input_size=size,
        num_classes=getattr(backbone, "num_classes", 1000),
    )


class _EnsembleModule(nn.Module):
    """Logit-mean / stacked ensemble (reference ``EnsembleModel``, ``utils.py:82-105``).

    Heterogeneous members run sequentially inside one jit program; XLA
    schedules them back-to-back on-chip.  Homogeneous-architecture ensembles
    should prefer stacked params + vmap (see ``parallel/``).
    """

    members: Tuple[nn.Module, ...]
    mode: str = "mean"

    @nn.compact
    def __call__(self, x, **kwargs):
        outs = [m(x, **kwargs) for m in self.members]
        stacked = jnp.stack(outs, axis=0)
        if self.mode == "mean":
            return jnp.mean(stacked, axis=0)
        elif self.mode == "ind":
            return stacked
        raise NotImplementedError(self.mode)


def make_ensemble(names: Sequence[str], mode: str = "mean", **kwargs) -> Surrogate:
    subs = [make_model(n, **kwargs) for n in names]
    module = _EnsembleModule(
        members=tuple(s.module for s in subs), mode=mode
    )
    variables = {
        "params": {f"members_{i}": s.variables.get("params", {}) for i, s in enumerate(subs)},
        "batch_stats": {
            f"members_{i}": s.variables["batch_stats"]
            for i, s in enumerate(subs)
            if "batch_stats" in s.variables
        },
    }
    if not variables["batch_stats"]:
        del variables["batch_stats"]
    surro = Surrogate(
        name="+".join(names), module=module, variables=variables,
        input_size=max(s.input_size for s in subs),
    )
    surro.members = subs  # type: ignore[attr-defined]
    return surro


def resolve_model(spec, **kwargs) -> Surrogate:
    if isinstance(spec, Surrogate):
        return spec
    if isinstance(spec, str):
        return make_model(spec, **kwargs)
    if isinstance(spec, (list, tuple)):
        return make_ensemble(spec, **kwargs)
    raise TypeError(f"Cannot resolve model spec {spec!r}")


# Import model definition modules for registration side effects.
from . import toy  # noqa: E402,F401
from . import resnet  # noqa: E402,F401
from . import vgg  # noqa: E402,F401
from . import mobilenet  # noqa: E402,F401
from . import inception  # noqa: E402,F401
from . import inception_resnet  # noqa: E402,F401
from . import densenet  # noqa: E402,F401
from . import vit  # noqa: E402,F401
from . import cait  # noqa: E402,F401
from . import pit  # noqa: E402,F401
from . import swin  # noqa: E402,F401
from . import visformer  # noqa: E402,F401
