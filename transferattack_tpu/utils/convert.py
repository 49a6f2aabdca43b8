"""PyTorch state_dict → Flax variables converter.

The reference pulls pretrained surrogates from torchvision/timm at runtime
(``transferattack/attack.py:51-60``).  This environment has no model hub
access, so conversion is offline: the user supplies ``<name>.pth`` (a plain
``state_dict``), this module maps it onto the matching Flax module tree and
saves ``$TA_TPU_WEIGHTS_DIR/<name>.npz`` for ``models.make_model`` to load.

Mapping rules
-------------
* ``Conv2d.weight`` (O,I,H,W) → ``kernel`` (H,W,I,O); depthwise convs
  (I==1, groups==C) → (H,W,1,O).
* ``Linear.weight`` (O,I) → ``kernel`` (I,O); bias passthrough.
* ``BatchNorm``: weight→``scale``, bias→``bias`` under params;
  running_mean→``mean``, running_var→``var`` under batch_stats.
* ``LayerNorm``: weight→``scale``, bias→``bias``.
* Dots in module paths become ``/``; list indices merge with their parent
  (``layer1.0`` → ``layer1_0``, ``blocks.3`` → ``blocks_3``) per each model
  file's documented naming.

CLI: ``python -m transferattack_tpu.utils.convert <name> <state_dict.pth>``.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict

import numpy as np

_BN_SUFFIXES = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}

# module-path fragments that are BatchNorm in our model definitions
_BN_HINTS = re.compile(
    r"(^|/)(bn[0-9]?|bn_[0-9]+|norm[0-9]?|downsample_bn|norm|"
    r"denseblock[0-9]+_denselayer[0-9]+/norm[12])($|/)"
)
_LN_HINTS = re.compile(r"(^|/)(norm1|norm2|norm)($|/)")


def _merge_indices(key: str) -> str:
    """``layer1.0.conv1`` → ``layer1_0/conv1``; ``blocks.3.attn`` →
    ``blocks_3/attn``; plain numeric segments merge into the previous one."""
    parts = key.split(".")
    merged = []
    for p in parts:
        if p.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
    return "/".join(merged)


# post-merge path rewrites aligning torch/timm module trees with the Flax
# module names in ``models/`` (order matters; first match applies per rule)
_REWRITES = [
    # torchvision ResNet downsample Sequential → named conv/bn pair
    (re.compile(r"downsample_0"), "downsample_conv"),
    (re.compile(r"downsample_1"), "downsample_bn"),
    # timm ViT/PiT patch embed conv lives directly on the module here
    (re.compile(r"patch_embed/norm"), "patch_norm"),
    (re.compile(r"patch_embed/proj"), "patch_embed"),
    # Swin/PiT stage-nested blocks are flat names here
    (re.compile(r"(layers_\d+)/blocks_(\d+)"), r"\1_blocks_\2"),
    (re.compile(r"(layers_\d+)/downsample"), r"\1_downsample"),
    (re.compile(r"(transformers_\d+)/blocks_(\d+)"), r"\1_blocks_\2"),
    (re.compile(r"(transformers_\d+)/pool"), r"\1_pool"),
    # DenseNet feature tree prefix
    (re.compile(r"^features/(denseblock\d+)/(denselayer\d+)"), r"\1_\2"),
    (re.compile(r"^features/(transition\d+)"), r"\1"),
    (re.compile(r"^features/(conv0|norm0|norm5)"), r"\1"),
    # MobileNetV2 ConvBNReLU Sequentials: features.0.{0,1} and the per-block
    # conv.{k}.{0,1} pairs become named conv/bn children (prefix-tolerant so
    # nested backbones like AITL's predictor convert too)
    (re.compile(r"(^|/)(features_\d+)_0(?=/)"), r"\1\2/conv"),
    (re.compile(r"(^|/)(features_\d+)_1(?=/)"), r"\1\2/bn"),
    (re.compile(r"(conv_\d+)_0(?=/)"), r"\1/conv"),
    (re.compile(r"(conv_\d+)_1(?=/)"), r"\1/bn"),
    # GeneratorResnet (TTP/M3D/CDTP/LTP/GE-AdvGAN generators,
    # ``generation/cdtp.py:23-130``): torch Sequential indices → named
    # conv/bn children in generation/generators.py (resblock Sequential:
    # 0 pad, 1 conv, 2 bn, 3 relu, 4 dropout, 5 pad, 6 conv, 7 bn)
    (re.compile(r"(^|/)block1_1(?=/)"), r"\1block1_conv"),
    (re.compile(r"(^|/)block1_2(?=/)"), r"\1block1_bn"),
    (re.compile(r"(^|/)block([23])_0(?=/)"), r"\1block\2_conv"),
    (re.compile(r"(^|/)block([23])_1(?=/)"), r"\1block\2_bn"),
    (re.compile(r"(resblock\d+)/block_1(?=/)"), r"\1/conv1"),
    (re.compile(r"(resblock\d+)/block_2(?=/)"), r"\1/bn1"),
    (re.compile(r"(resblock\d+)/block_6(?=/)"), r"\1/conv2"),
    (re.compile(r"(resblock\d+)/block_7(?=/)"), r"\1/bn2"),
    (re.compile(r"(upsampl\d)_0(?=/)"), r"\1_conv"),
    (re.compile(r"(upsampl\d)_1(?=/)"), r"\1_bn"),
    (re.compile(r"(^|/)blockf_1(?=/)"), r"\1blockf_conv"),
    # AGS Basic_SSL_Model trunk (ags.py:131-141): ``f`` holds the headless
    # torchvision resnet50 children — f.0 conv1, f.1 bn1, f.4..7 layer1..4
    # (g = the projection head, unused by the attack, dropped at reconcile)
    (re.compile(r"^f_0(?=/)"), "conv1"),
    (re.compile(r"^f_1(?=/)"), "bn1"),
    (re.compile(r"^f_4(?=[_/])"), "layer1"),
    (re.compile(r"^f_5(?=[_/])"), "layer2"),
    (re.compile(r"^f_6(?=[_/])"), "layer3"),
    (re.compile(r"^f_7(?=[_/])"), "layer4"),
    # Stable-Diffusion stack (diffusers UNet/VAE + HF CLIP text encoder):
    # join the sampler/FF Sequentials into the single Flax module names
    (re.compile(r"(downsamplers_0|upsamplers_0)/conv"), r"\1_conv"),
    (re.compile(r"ff/net_0/proj"), "ff/net_0_proj"),
    # HF CLIPTextModel: drop the text_model/encoder wrappers (our
    # CLIPTextEncoder is the flat text tower); the token embedding is an
    # nn.Embed table (leaf 'embedding', no transpose) and the position
    # embedding a bare (77, width) param
    (re.compile(r"^text_model/encoder/"), ""),
    (re.compile(r"^text_model/"), ""),
    (re.compile(r"^embeddings/token_embedding/weight$"),
     "token_embedding/embedding"),
    (re.compile(r"^embeddings/position_embedding/weight$"),
     "position_embedding"),
]


def _apply_rewrites(path: str) -> str:
    for pat, rep in _REWRITES:
        path = pat.sub(rep, path)
    return path


def convert_tensor(path: str, arr: np.ndarray, is_bn: bool):
    """Returns (collection, leaf_name, converted_array)."""
    leaf = path.rsplit("/", 1)[-1]
    if is_bn and leaf in _BN_SUFFIXES:
        coll, name = _BN_SUFFIXES[leaf]
        return coll, name, arr
    if leaf.startswith("pos_embed") and arr.ndim == 4:
        # PiT/Visformer keep spatial pos embeddings as (1, C, H, W)
        return "params", leaf, arr.transpose(0, 2, 3, 1)
    if leaf == "weight":
        if arr.ndim == 4:  # conv OIHW → HWIO
            return "params", "kernel", arr.transpose(2, 3, 1, 0)
        if arr.ndim == 3 and arr.shape[-1] == 1:
            # Conv1d with kernel 1 (guided-diffusion qkv/proj_out) ≡ Dense
            return "params", "kernel", arr[:, :, 0].T
        if arr.ndim == 2:  # linear
            return "params", "kernel", arr.T
        # 1-D weight outside BN → LayerNorm scale
        return "params", "scale", arr
    if leaf == "bias":
        return "params", "bias", arr
    return "params", leaf, arr


def torch_state_dict_to_flax(
    state: Dict[str, Any],
    bn_paths: re.Pattern = _BN_HINTS,
    prefix: str = "backbone",
) -> Dict[str, Dict]:
    """Convert a flat torch ``state_dict`` (tensors or ndarrays) into a Flax
    variables dict ``{'params': ..., 'batch_stats': ...}``."""
    out: Dict[str, Dict] = {"params": {}, "batch_stats": {}}

    def insert(coll, path_parts, value):
        node = out[coll]
        for p in path_parts[:-1]:
            node = node.setdefault(p, {})
        node[path_parts[-1]] = value

    # pre-scan: module paths that are BatchNorms (they carry running_mean);
    # MobileNetV2's bare ``conv.N`` BN modules then map onto ``bn_{N-1}``
    # (our InvertedResidual names the project conv/bn pair with one index)
    bn_modules = set()
    for key in state:
        if key.endswith("running_mean"):
            bn_modules.add(_merge_indices(key).rsplit("/", 1)[0])
    bn_renames = {}
    for mod in bn_modules:
        m = re.search(r"(.*)/conv_(\d+)$", mod)
        if m:
            bn_renames[mod] = f"{m.group(1)}/bn_{int(m.group(2)) - 1}"

    for key, tensor in state.items():
        if key.endswith(("num_batches_tracked", "relative_position_index",
                         "attn_mask")):
            continue  # derived buffers recomputed on the fly here
        # copy=True: ``Tensor.numpy()`` returns a zero-copy VIEW of torch
        # storage — without the copy, attacks that mutate surrogate weights
        # in place (AWT's SAM, MUP pruning twins) would silently corrupt
        # already-converted params
        arr = np.array(
            tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor,
            copy=True,
        )
        merged = _merge_indices(key)
        mod = merged.rsplit("/", 1)[0] if "/" in merged else ""
        if mod in bn_renames:
            merged = bn_renames[mod] + "/" + merged.rsplit("/", 1)[-1]
        merged = _apply_rewrites(merged)
        mod_path = merged.rsplit("/", 1)[0] if "/" in merged else ""
        is_bn = bool(bn_paths.search(mod_path)) or merged.rsplit("/", 1)[-1] in (
            "running_mean", "running_var",
        )
        coll, leaf, conv = convert_tensor(merged, arr, is_bn)
        parts = ([prefix] if prefix else []) + (
            mod_path.split("/") if mod_path else []
        ) + [leaf]
        insert(coll, parts, conv)

    if not out["batch_stats"]:
        del out["batch_stats"]
    return out


def reconcile_with_module(converted: Dict, reference_vars: Dict) -> Dict:
    """Walk the module's own init tree and pull matching leaves from the
    converted dict — shape-checked, with a report of misses."""
    import jax

    missing, mismatched = [], []

    def walk(ref, conv, path):
        if not isinstance(ref, dict):
            if conv is None:
                missing.append("/".join(path))
                return ref
            if tuple(np.shape(conv)) != tuple(np.shape(ref)):
                mismatched.append(
                    f"{'/'.join(path)}: ckpt{np.shape(conv)} vs model{np.shape(ref)}"
                )
                return ref
            return np.asarray(conv, dtype=np.asarray(ref).dtype)
        return {
            k: walk(v, (conv or {}).get(k) if isinstance(conv, dict) else None,
                    path + [k])
            for k, v in ref.items()
        }

    result = {
        coll: walk(tree, converted.get(coll), [coll])
        for coll, tree in reference_vars.items()
    }
    report = {"missing": missing, "mismatched": mismatched}
    return result, report


# checkpoint npz names that do not embed the classifier architecture
_CKPT_ARCH_OVERRIDES = {
    "ags_coco": "resnet50", "ags_comics": "resnet50",
    "ags_paintings": "resnet50",  # SSL trunk (ags.py:131-141)
}


def _ckpt_arch(name: str):
    """The zoo architecture behind a ``<family>_<arch>[_<variant>]``
    checkpoint npz name (``dra_resnet50`` → resnet50, ``lgv_resnet50_3`` →
    resnet50, ``at_resnet50_4px`` → resnet50, …)."""
    from ..models import list_models

    if name in _CKPT_ARCH_OVERRIDES:
        return _CKPT_ARCH_OVERRIDES[name]
    models = set(list_models())
    if name in models:
        return name
    parts = name.split("_")
    for i in range(len(parts)):
        for j in range(len(parts), i, -1):
            cand = "_".join(parts[i:j])
            if cand in models:
                return cand
    return None


def convert_and_save(name: str, state_dict_path: str, out_dir: str = None) -> str:
    """End-to-end: load .pth, convert, reconcile against the registered
    model (or the zoo architecture a fine-tuned-checkpoint name embeds),
    save npz; returns the npz path."""
    import torch

    from ..models import make_model, save_npz_variables

    state = torch.load(state_dict_path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    elif isinstance(state, dict) and "model" in state and all(
            hasattr(v, "shape") for v in state["model"].values()):
        state = state["model"]  # slightly-robust releases (dsm.py:64-65)
    # DataParallel / robustness-lib wrappers (the reference's per-attack
    # key remapping, e.g. dsm.py:66-77)
    for pref in ("module.attacker.model.", "module.model.", "module."):
        if any(k.startswith(pref) for k in state):
            state = {(k[len(pref):] if k.startswith(pref) else k): v
                     for k, v in state.items()}
    converted = torch_state_dict_to_flax(state)
    arch = _ckpt_arch(name)
    if arch is None:
        raise ValueError(
            f"cannot infer the model behind {name!r}; known models: "
            "use an '<family>_<arch>' npz name or a registry model name")
    surrogate = make_model(arch, pretrained=False)
    variables, report = reconcile_with_module(converted, surrogate.variables)
    if report["missing"] or report["mismatched"]:
        print(f"[convert] {name}: {len(report['missing'])} missing, "
              f"{len(report['mismatched'])} mismatched")
        for m in (report["missing"] + report["mismatched"])[:20]:
            print("  ", m)
    out_dir = out_dir or os.environ.get(
        "TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights")
    )
    path = os.path.join(out_dir, f"{name}.npz")
    save_npz_variables(path, variables)
    return path


_SD_MODULES = {
    "sd_unet": lambda: _sd_module("unet"),
    "sd_vae": lambda: _sd_module("vae"),
    "sd_text": lambda: _sd_module("text"),
}

# generator-npz-name prefixes → generation module factory (param shapes are
# input-size independent, so tiny init shapes suffice)
_GENERATOR_PREFIXES = ("ttp_", "m3d_", "cdtp", "ltp", "dsva", "ge_advgan",
                       "ada", "fap")


# auxiliary non-classifier networks (manifest entries whose target is a
# bespoke Flax module) → (module, init variables); param shapes are
# input-size independent, so tiny init shapes suffice
def _aux_module(name: str):
    import jax
    import jax.numpy as jnp

    k = jax.random.PRNGKey(0)
    if name == "nrp":
        from ..defense.nrp import NRPNet

        net = NRPNet()
        return net, net.init(k, jnp.zeros((1, 32, 32, 3)))
    if name == "diffpure_unet":
        from ..defense.gd_unet import GuidedDiffusionUNet

        net = GuidedDiffusionUNet()
        return net, net.init(k, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,)))
    if name == "atta_model":
        from ..input_transformation.learned import ATTAModel

        net = ATTAModel()
        return net, net.init(k, jnp.zeros((1, 32, 32, 3)))
    if name == "pam_semantic_predictor":
        from ..input_transformation.learned import SemanticPredictor

        net = SemanticPredictor()
        return net, net.init(k, jnp.zeros((1, 224, 224, 3)))
    if name == "stm_stylenet":
        from ..input_transformation.learned import StyleNet

        net = StyleNet()
        return net, net.init(k, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 100)))
    if name == "aitl_encoder":
        from ..input_transformation.learned import AITLEncoder

        net = AITLEncoder()
        return net, net.init(k, jnp.zeros((1, 80)))
    if name == "aitl_decoder":
        from ..input_transformation.learned import AITLDecoder

        net = AITLDecoder()
        return net, net.init(k, jnp.zeros((1, 128)))
    if name == "aitl_predictor":
        from ..input_transformation.learned import AITLPredictor

        net = AITLPredictor()
        return net, net.init(k, jnp.zeros((1, 64, 64, 3)),
                             jnp.zeros((1, 128)))
    if name == "ana_alignment":
        from ..model_related.checkpoint_surrogates import AlignmentNet

        net = AlignmentNet()
        return net, net.init(k, jnp.zeros((1, 14, 14, 1024)))
    return None, None


_AUX_NAMES = ("nrp", "diffpure_unet", "atta_model", "pam_semantic_predictor",
              "stm_stylenet", "aitl_encoder", "aitl_decoder",
              "aitl_predictor", "ana_alignment")

# per-artifact key scrubs (the manifest's conversion notes)
_AUX_PRESCRUB = {
    # the official ATTA checkpoint wraps the CNN as Sequential(Normalize,
    # net) — strip the Sequential's leading '1.' (atta.py:96-105)
    "atta_model": lambda sd: {(k[2:] if k.startswith("1.") else k): v
                              for k, v in sd.items()},
    # the Ghiasi weights live under the 'state_dict_ghiasi' key
    # (stm.py:262-266)
    "stm_stylenet": lambda sd: sd.get("state_dict_ghiasi", sd),
    # the AITL predictor replaces MobileNetV2's classifier Sequential by a
    # bare Linear — re-nest it so the generic MobileNetV2 rewrites apply
    "aitl_predictor": lambda sd: {
        k.replace("backbone.classifier.", "backbone.classifier.1."): v
        for k, v in sd.items()},
    # the ANA checkpoint nests the net under 'alignment_state_dict'
    # (ana.py:27-28)
    "ana_alignment": lambda sd: sd.get("alignment_state_dict", sd),
}


def convert_aux(name: str, state_dict_path: str, out_dir: str = None) -> str:
    """Convert an auxiliary-network checkpoint (NRP purifier, DiffPure
    UNet, ATTA CNN, PAM predictor, STM StyleNet, AITL encoder/decoder/
    predictor) into its Flax npz."""
    import torch

    from ..models import save_npz_variables

    state = torch.load(state_dict_path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state and \
            name != "stm_stylenet":
        state = state["state_dict"]
    scrub = _AUX_PRESCRUB.get(name)
    if scrub is not None:
        state = scrub(state)
    net, ref_vars = _aux_module(name)
    converted = torch_state_dict_to_flax(state, prefix="")
    variables, report = reconcile_with_module(converted, ref_vars)
    if report["missing"] or report["mismatched"]:
        print(f"[convert] {name}: {len(report['missing'])} missing, "
              f"{len(report['mismatched'])} mismatched")
        for m in (report["missing"] + report["mismatched"])[:20]:
            print("  ", m)
    out_dir = out_dir or os.environ.get(
        "TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights")
    )
    path = os.path.join(out_dir, f"{name}.npz")
    save_npz_variables(path, variables)
    return path


def convert_stm_embeddings(state_dict_path: str, out_dir: str = None) -> str:
    """checkpoint_embeddings.pth → stm_embeddings.npz: keep the PBN mean
    and factor the covariance as A = U·diag(√s) (``stm.py:273-282``)."""
    import torch

    state = torch.load(state_dict_path, map_location="cpu", weights_only=True)
    mean = np.asarray(state["pbn_embedding_mean"], np.float32).reshape(1, 100)
    cov = np.asarray(state["pbn_embedding_covariance"], np.float64)
    u, s, _ = np.linalg.svd(cov)
    A = (u @ np.diag(np.sqrt(s))).astype(np.float32)
    out_dir = out_dir or os.environ.get(
        "TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights")
    )
    path = os.path.join(out_dir, "stm_embeddings.npz")
    np.savez(path, pbn_embedding_mean=mean, A=A)
    return path


def _generator_module(npz_name: str):
    import jax
    import jax.numpy as jnp

    from ..generation.generators import (
        ADAGenerator, AdvGANGenerator, GeneratorResnet,
    )

    if npz_name.startswith("ge_advgan"):
        mod = AdvGANGenerator()
        vars_ = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    elif npz_name.startswith("ada"):
        mod = ADAGenerator()
        vars_ = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 35, 35, 3)),
                         jnp.zeros((1, 16)))
    else:
        mod = GeneratorResnet()
        vars_ = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return mod, vars_


def convert_generator(npz_name: str, state_dict_path: str,
                      out_dir: str = None) -> str:
    """Convert an official generator checkpoint (TTP/M3D/CDTP/LTP/DSVA
    GeneratorResnet, GE-AdvGAN Generator, ADA AttackGenerator) into the
    matching Flax generator npz (parity: tests/test_generation_parity.py)."""
    import torch

    from ..models import save_npz_variables

    state = torch.load(state_dict_path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    converted = torch_state_dict_to_flax(state, prefix="")
    _, ref_vars = _generator_module(npz_name)
    variables, report = reconcile_with_module(converted, ref_vars)
    if report["missing"] or report["mismatched"]:
        print(f"[convert] {npz_name}: {len(report['missing'])} missing, "
              f"{len(report['mismatched'])} mismatched")
        for m in (report["missing"] + report["mismatched"])[:20]:
            print("  ", m)
    out_dir = out_dir or os.environ.get(
        "TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights")
    )
    path = os.path.join(out_dir, f"{npz_name}.npz")
    save_npz_variables(path, variables)
    return path


def _sd_module(kind: str):
    import jax
    import jax.numpy as jnp

    if kind == "unet":
        from ..generation.sd_unet import SDUNet

        mod = SDUNet()
        init = lambda k: mod.init(
            k, jnp.zeros((1, 64, 64, 4)), jnp.zeros((1,)),
            jnp.zeros((1, 77, 768)))
    elif kind == "vae":
        from ..generation.sd_vae import SDVAE

        mod = SDVAE()
        init = lambda k: mod.init(k, jnp.zeros((1, 64, 64, 3)))
    else:
        from ..generation.sd_text import CLIPTextEncoder

        mod = CLIPTextEncoder()
        init = lambda k: mod.init(k, jnp.zeros((1, 77), jnp.int32))
    return mod, init(jax.random.PRNGKey(0))


def convert_sd(name: str, state_dict_path: str, out_dir: str = None) -> str:
    """Convert a diffusers/HF Stable-Diffusion component state_dict
    (``sd_unet`` / ``sd_vae`` / ``sd_text``) and save the npz."""
    import torch

    from ..models import save_npz_variables

    state = torch.load(state_dict_path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    converted = torch_state_dict_to_flax(state, prefix="")
    _, ref_vars = _SD_MODULES[name]()
    variables, report = reconcile_with_module(converted, ref_vars)
    if report["missing"] or report["mismatched"]:
        print(f"[convert] {name}: {len(report['missing'])} missing, "
              f"{len(report['mismatched'])} mismatched")
        for m in (report["missing"] + report["mismatched"])[:20]:
            print("  ", m)
    out_dir = out_dir or os.environ.get(
        "TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights")
    )
    path = os.path.join(out_dir, f"{name}.npz")
    save_npz_variables(path, variables)
    return path


def convert_all(download_dir: str) -> None:
    """Scan a directory of downloaded originals, convert every recognizable
    file per the manifest, and print a per-family status table."""
    import glob

    from .weights_manifest import MANIFEST, print_inventory

    by_source = {}
    for art in MANIFEST:
        base = art.source.split(" ")[0].split("/")[-1]
        by_source[base] = art
    converted, skipped = [], []
    for path in sorted(glob.glob(os.path.join(download_dir, "**", "*"),
                                 recursive=True)):
        base = os.path.basename(path)
        art = by_source.get(base)
        if art is None or not os.path.isfile(path):
            continue
        try:
            if art.npz.startswith("hgd_"):
                from ..defense.at import convert_hgd

                model = art.npz[len("hgd_"):]
                out = convert_hgd(path, model)
            elif art.npz in _SD_MODULES:
                out = convert_sd(art.npz, path)
            elif art.npz == "stm_embeddings":
                out = convert_stm_embeddings(path)
            elif art.npz in _AUX_NAMES:
                out = convert_aux(art.npz, path)
            elif art.npz.startswith(_GENERATOR_PREFIXES):
                out = convert_generator(art.npz, path)
            else:
                out = convert_and_save(art.npz, path)
            converted.append((art.npz, out))
        except Exception as exc:  # keep going; report at the end
            skipped.append((art.npz, str(exc)))
    print(f"converted {len(converted)} artifacts:")
    for name, out in converted:
        print(f"  ✓ {name} → {out}")
    for name, err in skipped:
        print(f"  ✗ {name}: {err}")
    print_inventory()


if __name__ == "__main__":
    import sys

    if "--list" in sys.argv:
        from .weights_manifest import print_inventory

        print_inventory()
    elif "--all" in sys.argv:
        convert_all(sys.argv[sys.argv.index("--all") + 1])
    elif sys.argv[1] in _SD_MODULES:
        print(convert_sd(sys.argv[1], sys.argv[2]))
    elif sys.argv[1] == "stm_embeddings":
        print(convert_stm_embeddings(sys.argv[2]))
    elif sys.argv[1] in _AUX_NAMES:
        print(convert_aux(sys.argv[1], sys.argv[2]))
    elif sys.argv[1].startswith(_GENERATOR_PREFIXES):
        print(convert_generator(sys.argv[1], sys.argv[2]))
    else:
        print(convert_and_save(sys.argv[1], sys.argv[2]))
