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
