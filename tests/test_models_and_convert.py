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


def test_convert_cli_dispatch_ckpt_surrogates(tmp_path, monkeypatch):
    """The documented conversion path (CLAUDE.md / weights manifest) for
    fine-tuned-checkpoint surrogates: ``convert_and_save`` must infer the
    zoo architecture behind '<family>_<arch>' npz names (``dsm_resnet18``,
    ``lgv_resnet50_3``, ``at_resnet50_4px``) and strip DataParallel /
    robustness-lib wrappers (``dsm.py:66-77``)."""
    import torch

    from tests.test_torch_parity import TorchResNet18
    from transferattack_tpu.models import load_npz_variables
    from transferattack_tpu.utils.convert import _ckpt_arch, convert_and_save

    assert _ckpt_arch("dsm_resnet18") == "resnet18"
    assert _ckpt_arch("lgv_resnet50_3") == "resnet50"
    assert _ckpt_arch("at_resnet50_4px") == "resnet50"
    assert _ckpt_arch("ags_comics") == "resnet50"
    assert _ckpt_arch("resnet18") == "resnet18"
    assert _ckpt_arch("nonsense_name") is None

    monkeypatch.setenv("TA_TPU_WEIGHTS_DIR", str(tmp_path))
    torch.manual_seed(77)
    t = TorchResNet18().eval()
    sd = {"module." + k: v for k, v in t.state_dict().items()}
    p = tmp_path / "SD_resnet18_cutmix.pth.tar"
    torch.save(sd, p)
    out = convert_and_save("dsm_resnet18", str(p), out_dir=str(tmp_path))
    assert out.endswith("dsm_resnet18.npz")
    v = load_npz_variables(out)
    kern = v["params"]["backbone"]["conv1"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(kern),
        t.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0),
        atol=1e-6)


def test_convert_cli_dispatch_ags_trunk(tmp_path):
    """AGS checkpoints hold a Basic_SSL_Model: the trunk's ``f.N`` indices
    must land on the resnet module names and the projection head ``g`` be
    ignorable at reconcile (``ags.py:131-141``)."""
    import torch

    from tests.test_torch_parity import TorchResNet18
    from transferattack_tpu.utils.convert import torch_state_dict_to_flax

    torch.manual_seed(78)
    t = TorchResNet18().eval()
    remap = {"conv1": "f.0", "bn1": "f.1", "layer1": "f.4",
             "layer2": "f.5", "layer3": "f.6", "layer4": "f.7"}
    sd = {}
    for k, vv in t.state_dict().items():
        head = k.split(".", 1)[0]
        if head == "fc":
            continue  # Basic_SSL_Model drops the Linear
        rest = k.split(".", 1)[1]
        sd[f"{remap[head]}.{rest}"] = vv
    sd["g.0.weight"] = torch.zeros(512, 512)  # projection head (unused)
    conv = torch_state_dict_to_flax(sd, prefix="")
    params = conv["params"]
    assert "conv1" in params and "bn1" in params
    for i in (1, 2, 3, 4):
        assert f"layer{i}_0" in params, sorted(params)[:8]
    np.testing.assert_allclose(
        np.asarray(params["layer2_0"]["conv1"]["kernel"]),
        t.state_dict()["layer2.0.conv1.weight"].numpy().transpose(2, 3, 1, 0),
        atol=1e-6)


def test_convert_cli_dispatch_aux(tmp_path):
    """``convert_aux`` round-trips the ATTA CNN (official Sequential
    wrapper prefix '1.' stripped) and ``convert_stm_embeddings`` factors
    the PBN covariance (``stm.py:273-282``)."""
    import jax
    import jax.numpy as jnp
    import torch

    from tests.test_auxnet_parity import TATTAModel
    from transferattack_tpu.input_transformation.learned import ATTAModel
    from transferattack_tpu.models import load_npz_variables
    from transferattack_tpu.utils.convert import (
        convert_aux, convert_stm_embeddings,
    )

    torch.manual_seed(79)
    tm = TATTAModel().eval()
    sd = {"1." + k: v for k, v in tm.state_dict().items()}
    p = tmp_path / "atta_model_weight.pth"
    torch.save(sd, p)
    out = convert_aux("atta_model", str(p), out_dir=str(tmp_path))
    variables = load_npz_variables(out)
    x = np.random.RandomState(2).rand(1, 32, 32, 3).astype(np.float32)
    j = np.asarray(ATTAModel().apply(variables, jnp.asarray(x)))
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    with torch.no_grad():
        tout = tm(torch.from_numpy(((x - mean) / std).transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(j, tout.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)

    rng = np.random.RandomState(3)
    m = rng.rand(100, 100).astype(np.float32)
    cov = m @ m.T
    torch.save({"pbn_embedding_mean": torch.from_numpy(
                    rng.rand(1, 100).astype(np.float32)),
                "pbn_embedding_covariance": torch.from_numpy(cov)},
               tmp_path / "checkpoint_embeddings.pth")
    out2 = convert_stm_embeddings(str(tmp_path / "checkpoint_embeddings.pth"),
                                  out_dir=str(tmp_path))
    emb = np.load(out2)
    A = emb["A"]
    np.testing.assert_allclose(A @ A.T, cov, rtol=1e-3, atol=1e-3)
