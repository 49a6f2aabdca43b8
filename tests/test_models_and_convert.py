"""Surrogate-zoo smoke tests + weight-converter mechanics (SURVEY.md §4b)."""
import numpy as np
import pytest

import jax.numpy as jnp

from transferattack_tpu.models import make_model, list_models
from transferattack_tpu.utils.convert import torch_state_dict_to_flax


@pytest.mark.parametrize("name,size", [
    ("resnet18", 64),
    ("vgg16", 224),          # classifier flatten fixes the input size
    ("mobilenet_v2", 64),
    ("inception_v3", 299),   # 299-path (stem strides need the full size)
    ("densenet121", 64),
    ("vit_base_patch16_224", 224),
])
def test_model_forward_shapes(name, size):
    kwargs = {} if size in (224, 299) else {"input_size": size}
    m = make_model(name, pretrained=False, **kwargs)
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    logits = m.apply(m.variables, x)
    assert logits.shape == (1, 1000)
    assert np.isfinite(np.asarray(logits)).all()


def test_registry_covers_paper_models():
    from transferattack_tpu.utils import cnn_model_paper, vit_model_paper

    for name in cnn_model_paper + vit_model_paper:
        assert name in list_models(), name


def test_converter_conv_bn_linear_mapping():
    state = {
        "conv1.weight": np.zeros((64, 3, 7, 7), np.float32),
        "bn1.weight": np.ones((64,), np.float32),
        "bn1.bias": np.zeros((64,), np.float32),
        "bn1.running_mean": np.zeros((64,), np.float32),
        "bn1.running_var": np.ones((64,), np.float32),
        "bn1.num_batches_tracked": np.zeros((), np.int64),
        "layer1.0.conv1.weight": np.zeros((64, 64, 3, 3), np.float32),
        "layer1.0.downsample.0.weight": np.zeros((64, 64, 1, 1), np.float32),
        "fc.weight": np.zeros((1000, 512), np.float32),
        "fc.bias": np.zeros((1000,), np.float32),
    }
    out = torch_state_dict_to_flax(state)
    p = out["params"]["backbone"]
    assert p["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert p["bn1"]["scale"].shape == (64,)
    assert out["batch_stats"]["backbone"]["bn1"]["mean"].shape == (64,)
    assert "num_batches_tracked" not in str(out)
    assert p["layer1_0"]["conv1"]["kernel"].shape == (3, 3, 64, 64)
    assert p["fc"]["kernel"].shape == (512, 1000)


def test_converter_reconcile_detects_shape_mismatch():
    from transferattack_tpu.utils.convert import reconcile_with_module

    ref = {"params": {"fc": {"kernel": np.zeros((4, 2))}}}
    conv = {"params": {"fc": {"kernel": np.zeros((2, 4))}}}
    merged, report = reconcile_with_module(conv, ref)
    assert report["mismatched"]
    assert merged["params"]["fc"]["kernel"].shape == (4, 2)


def test_vit_surgery_hooks_change_gradients():
    """skip_attn_grad (PNA) must alter input gradients on the toy ViT path."""
    import jax
    from transferattack_tpu.models.vit import VisionTransformer, ViTSurgery

    m_plain = VisionTransformer(patch_size=8, dim=32, depth=2, num_heads=2,
                                num_classes=10)
    m_pna = VisionTransformer(patch_size=8, dim=32, depth=2, num_heads=2,
                              num_classes=10,
                              surgery=ViTSurgery(skip_attn_grad=True))
    x = jnp.ones((1, 32, 32, 3))
    variables = m_plain.init(jax.random.PRNGKey(0), x)

    def g(model):
        return jax.grad(lambda xx: model.apply(variables, xx).sum())(x)

    g1, g2 = np.asarray(g(m_plain)), np.asarray(g(m_pna))
    assert not np.allclose(g1, g2)
    assert np.isfinite(g2).all()


def test_converter_full_resnet18_roundtrip():
    """Invert our ResNet-18 variable tree into torchvision-style keys, run
    the converter, and require a complete, shape-exact reconcile."""
    import re

    from transferattack_tpu.models import make_model
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    m = make_model("resnet18", pretrained=False, input_size=32)

    state = {}

    def inv_path(parts):
        # backbone/layer1_0/conv1 → layer1.0.conv1 ; downsample_conv → downsample.0
        out = []
        for p in parts:
            if p == "backbone":
                continue
            p = p.replace("downsample_conv", "downsample.0")
            p = p.replace("downsample_bn", "downsample.1")
            p = re.sub(r"^(layer\d+)_(\d+)$", r"\1.\2", p)
            out.append(p)
        return ".".join(out)

    def walk(tree, parts, coll):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, parts + [k], coll)
            else:
                mod = inv_path(parts)
                import numpy as np

                arr = np.asarray(v)
                if k == "kernel" and arr.ndim == 4:
                    state[f"{mod}.weight"] = arr.transpose(3, 2, 0, 1)
                elif k == "kernel":
                    state[f"{mod}.weight"] = arr.T
                elif k == "scale":
                    state[f"{mod}.weight"] = arr
                elif k == "bias":
                    state[f"{mod}.bias"] = arr
                elif k == "mean":
                    state[f"{mod}.running_mean"] = arr
                elif k == "var":
                    state[f"{mod}.running_var"] = arr

    walk(m.variables["params"], [], "params")
    walk(m.variables["batch_stats"], [], "batch_stats")

    converted = torch_state_dict_to_flax(state)
    merged, report = reconcile_with_module(converted, m.variables)
    assert not report["missing"], report["missing"][:5]
    assert not report["mismatched"], report["mismatched"][:5]


def test_bn_folding_exact():
    """``fold_bn_variables`` + ``FoldedBN`` are an exact rewrite: logits and
    input gradients match the stock BatchNorm path (perf toggle, off by
    default — BASELINE.md structural experiments)."""
    import jax
    import jax.numpy as jnp

    import transferattack_tpu.models.resnet as rn
    from transferattack_tpu.models import make_model

    m = make_model("resnet18", input_size=32)
    x = jnp.asarray(
        np.random.RandomState(3).rand(2, 32, 32, 3).astype(np.float32))
    ref = m.apply(m.variables, x)
    gref = jax.grad(lambda xx: m.apply(m.variables, xx).sum())(x)

    folded = rn.fold_bn_variables(
        {"params": m.variables["params"]["backbone"],
         "batch_stats": m.variables["batch_stats"]["backbone"]})
    v2 = dict(m.variables)
    v2["params"] = {"backbone": folded["params"]}
    v2["batch_stats"] = {"backbone": folded["batch_stats"]}

    old = rn._BN_IMPL
    rn._BN_IMPL = "folded"
    try:
        m2 = make_model("resnet18", input_size=32)
        out = m2.module.apply(v2, x)
        g = jax.grad(lambda xx: m2.module.apply(v2, xx).sum())(x)
    finally:
        rn._BN_IMPL = old
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)
    corr = np.corrcoef(np.asarray(g).ravel(), np.asarray(gref).ravel())[0, 1]
    assert corr > 0.9999


def test_mask_relu_and_sep_maxpool_match_defaults():
    """The ``TA_TPU_RELU=mask`` and ``TA_TPU_MAXPOOL=sep`` perf toggles are
    mathematically identical to the default paths."""
    import jax
    import jax.numpy as jnp

    import transferattack_tpu.models.resnet as rn

    x = jnp.asarray(
        np.random.RandomState(5).randn(2, 8, 8, 4).astype(np.float32))
    np.testing.assert_allclose(np.asarray(rn.mask_relu(x)),
                               np.asarray(jax.nn.relu(x)))
    g1 = jax.grad(lambda v: (rn.mask_relu(v) ** 2).sum())(x)
    g2 = jax.grad(lambda v: (jax.nn.relu(v) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2))

    joint = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    rows = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 1, 1), (1, 2, 1, 1),
        [(0, 0), (1, 1), (0, 0), (0, 0)])
    sep = jax.lax.reduce_window(
        rows, -jnp.inf, jax.lax.max, (1, 1, 3, 1), (1, 1, 2, 1),
        [(0, 0), (0, 0), (1, 1), (0, 0)])
    np.testing.assert_allclose(np.asarray(sep), np.asarray(joint))
