"""PyTorch↔JAX golden parity (SURVEY.md §4 layer (b)).

A minimal torchvision-layout ResNet-18 implemented in raw torch (CPU; no
torchvision in this image) provides a real state_dict; the converter maps it
onto the Flax ResNet and logits + input-gradients must match within fp32
tolerance — the north-star check that converted pretrained weights will
reproduce reference ASR.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


class TorchBasicBlock(tnn.Module):
    def __init__(self, inp, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU()
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + identity)


class TorchResNet18(tnn.Module):
    """torchvision-naming ResNet-18."""

    def __init__(self, num_classes=1000):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        layers = []
        inp = 64
        for i, planes in enumerate((64, 128, 256, 512)):
            stride = 1 if i == 0 else 2
            down = stride != 1 or inp != planes
            blocks = tnn.Sequential(
                TorchBasicBlock(inp, planes, stride, down),
                TorchBasicBlock(planes, planes),
            )
            setattr(self, f"layer{i + 1}", blocks)
            inp = planes
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc = tnn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


@pytest.fixture(scope="module")
def parity_pair():
    import jax.numpy as jnp

    from transferattack_tpu.models import make_model
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    tmodel = TorchResNet18().eval()
    # randomize BN running stats so inference actually uses them
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.05)

    converted = torch_state_dict_to_flax(tmodel.state_dict())
    surrogate = make_model("resnet18", pretrained=False, input_size=64)
    variables, report = reconcile_with_module(converted, surrogate.variables)
    assert not report["missing"], report["missing"][:5]
    assert not report["mismatched"], report["mismatched"][:5]
    surrogate.variables = variables
    return tmodel, surrogate


def test_logits_parity(parity_pair):
    import jax.numpy as jnp

    tmodel, surrogate = parity_pair
    rng = np.random.RandomState(0)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    # our wrapped model normalizes with ImageNet stats; mirror it for torch
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    xn = (x - mean) / std
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(xn.transpose(0, 3, 1, 2))).numpy()
    j_logits = np.asarray(surrogate.apply(surrogate.variables, jnp.asarray(x)))
    np.testing.assert_allclose(j_logits, t_logits, atol=2e-4, rtol=1e-3)


def test_input_gradient_parity(parity_pair):
    import jax
    import jax.numpy as jnp

    tmodel, surrogate = parity_pair
    rng = np.random.RandomState(1)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    y = np.asarray([7])
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    xt = torch.from_numpy(((x - mean) / std).transpose(0, 3, 1, 2))
    xt.requires_grad_(True)
    loss = tnn.functional.cross_entropy(tmodel(xt), torch.from_numpy(y))
    loss.backward()
    # chain rule back through the normalization to raw pixel space
    t_grad = (xt.grad.numpy().transpose(0, 2, 3, 1) / std)

    def ce(img):
        logits = surrogate.apply(surrogate.variables, img)
        logp = jax.nn.log_softmax(logits)
        return -logp[jnp.arange(1), jnp.asarray(y)].mean()

    j_grad = np.asarray(jax.grad(ce)(jnp.asarray(x)))
    denom = np.abs(t_grad).max() + 1e-12
    np.testing.assert_allclose(j_grad / denom, t_grad / denom, atol=5e-4)
    # gradient signs must agree where the gradient is non-negligible
    mask = np.abs(t_grad) > 1e-3 * denom
    agree = (np.sign(j_grad[mask]) == np.sign(t_grad[mask])).mean()
    assert agree > 0.999


class TorchVGG16(tnn.Module):
    """torchvision-naming VGG-16 (features.N / classifier.N)."""

    CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]

    def __init__(self, num_classes=1000):
        super().__init__()
        layers = []
        inp = 3
        for v in self.CFG:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers.append(tnn.Conv2d(inp, v, 3, padding=1))
                layers.append(tnn.ReLU())
                inp = v
        self.features = tnn.Sequential(*layers)
        self.classifier = tnn.Sequential(
            tnn.Linear(512 * 7 * 7, 4096), tnn.ReLU(), tnn.Dropout(),
            tnn.Linear(4096, 4096), tnn.ReLU(), tnn.Dropout(),
            tnn.Linear(4096, num_classes),
        )

    def forward(self, x):
        x = self.features(x)
        return self.classifier(torch.flatten(x, 1))


def test_vgg16_logits_parity():
    import jax.numpy as jnp

    from transferattack_tpu.models import make_model
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    tmodel = TorchVGG16().eval()
    converted = torch_state_dict_to_flax(tmodel.state_dict())
    surrogate = make_model("vgg16", pretrained=False)
    variables, report = reconcile_with_module(converted, surrogate.variables)
    assert not report["missing"], report["missing"][:5]
    assert not report["mismatched"], report["mismatched"][:5]
    surrogate.variables = variables

    rng = np.random.RandomState(0)
    x = rng.rand(1, 224, 224, 3).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    with torch.no_grad():
        t_logits = tmodel(
            torch.from_numpy(((x - mean) / std).transpose(0, 3, 1, 2))
        ).numpy()
    j_logits = np.asarray(surrogate.apply(surrogate.variables, jnp.asarray(x)))
    np.testing.assert_allclose(j_logits, t_logits, atol=5e-3, rtol=1e-3)


class TorchViTBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(dim, dim * 3)
        self.attn.proj = tnn.Linear(dim, dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.fc2 = tnn.Linear(dim * 4, dim)
        self.heads = heads

    def forward(self, x):
        B, N, D = x.shape
        h = self.heads
        hn = self.norm1(x)
        qkv = self.attn.qkv(hn).reshape(B, N, 3, h, D // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = torch.softmax(q @ k.transpose(-2, -1) * (D // h) ** -0.5, dim=-1)
        out = (a @ v).transpose(1, 2).reshape(B, N, D)
        x = x + self.attn.proj(out)
        hn = self.norm2(x)
        x = x + self.mlp.fc2(tnn.functional.gelu(self.mlp.fc1(hn)))
        return x


class TorchViT(tnn.Module):
    """timm-naming tiny ViT matching models/vit.py (patch 16, dim 64)."""

    def __init__(self, dim=64, depth=2, heads=2, num_classes=1000, n_tokens=5):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, 16, 16)
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, dim).normal_(0, 0.5))
        self.pos_embed = tnn.Parameter(torch.zeros(1, n_tokens, dim).normal_(0, 0.02))
        self.blocks = tnn.Sequential(*[TorchViTBlock(dim, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.head = tnn.Linear(dim, num_classes)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        x = self.blocks(x)
        x = self.norm(x)
        return self.head(x[:, 0])


def test_vit_logits_parity():
    import jax.numpy as jnp

    from transferattack_tpu.models import make_model
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )
    from transferattack_tpu.models.vit import VisionTransformer
    from transferattack_tpu.models import Surrogate, WrappedModel

    tmodel = TorchViT().eval()
    converted = torch_state_dict_to_flax(tmodel.state_dict())

    import jax

    backbone = VisionTransformer(patch_size=16, dim=64, depth=2, num_heads=2)
    module = WrappedModel(backbone=backbone, size=32,
                          mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    surrogate = Surrogate(name="tiny_vit", module=module, variables=variables,
                          input_size=32)
    variables, report = reconcile_with_module(converted, surrogate.variables)
    assert not report["missing"], report["missing"][:8]
    assert not report["mismatched"], report["mismatched"][:8]
    surrogate.variables = variables

    rng = np.random.RandomState(0)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    with torch.no_grad():
        t_logits = tmodel(
            torch.from_numpy(((x - mean) / std).transpose(0, 3, 1, 2))
        ).numpy()
    j_logits = np.asarray(surrogate.apply(surrogate.variables, jnp.asarray(x)))
    np.testing.assert_allclose(j_logits, t_logits, atol=1e-4, rtol=1e-3)


class TorchConvBNReLU(tnn.Sequential):
    def __init__(self, inp, out, kernel=3, stride=1, groups=1):
        pad = (kernel - 1) // 2
        super().__init__(
            tnn.Conv2d(inp, out, kernel, stride, pad, groups=groups, bias=False),
            tnn.BatchNorm2d(out),
            tnn.ReLU6(),
        )


class TorchInvertedResidual(tnn.Module):
    def __init__(self, inp, oup, stride, expand):
        super().__init__()
        hidden = inp * expand
        layers = []
        if expand != 1:
            layers.append(TorchConvBNReLU(inp, hidden, 1))
        layers.extend([
            TorchConvBNReLU(hidden, hidden, 3, stride, groups=hidden),
            tnn.Conv2d(hidden, oup, 1, bias=False),
            tnn.BatchNorm2d(oup),
        ])
        self.conv = tnn.Sequential(*layers)
        self.use_res = stride == 1 and inp == oup

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


class TorchMobileNetV2(tnn.Module):
    CFG = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
           (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]

    def __init__(self, num_classes=1000):
        super().__init__()
        feats = [TorchConvBNReLU(3, 32, 3, 2)]
        inp = 32
        for t, c, n, s in self.CFG:
            for i in range(n):
                feats.append(TorchInvertedResidual(inp, c, s if i == 0 else 1, t))
                inp = c
        feats.append(TorchConvBNReLU(inp, 1280, 1))
        self.features = tnn.Sequential(*feats)
        self.classifier = tnn.Sequential(tnn.Dropout(), tnn.Linear(1280, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = x.mean([2, 3])
        return self.classifier(x)


def test_mobilenet_v2_logits_parity():
    import jax.numpy as jnp

    from transferattack_tpu.models import make_model
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    tmodel = TorchMobileNetV2().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)

    # torchvision keys are features.N.conv... but for intermediate blocks the
    # state_dict already carries the 'conv' segment, so rename is generic
    state = {k.replace("features.", "features."): v
             for k, v in tmodel.state_dict().items()}
    converted = torch_state_dict_to_flax(state)
    surrogate = make_model("mobilenet_v2", pretrained=False, input_size=64)
    variables, report = reconcile_with_module(converted, surrogate.variables)
    assert not report["missing"], report["missing"][:8]
    assert not report["mismatched"], report["mismatched"][:8]
    surrogate.variables = variables

    rng = np.random.RandomState(0)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    with torch.no_grad():
        t_logits = tmodel(
            torch.from_numpy(((x - mean) / std).transpose(0, 3, 1, 2))
        ).numpy()
    j_logits = np.asarray(surrogate.apply(surrogate.variables, jnp.asarray(x)))
    np.testing.assert_allclose(j_logits, t_logits, atol=1e-3, rtol=1e-3)


class TorchDenseLayer(tnn.Module):
    def __init__(self, inp, growth, bn_size=4):
        super().__init__()
        self.norm1 = tnn.BatchNorm2d(inp)
        self.conv1 = tnn.Conv2d(inp, bn_size * growth, 1, bias=False)
        self.norm2 = tnn.BatchNorm2d(bn_size * growth)
        self.conv2 = tnn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False)
        self.relu = tnn.ReLU()

    def forward(self, x):
        out = self.conv1(self.relu(self.norm1(x)))
        out = self.conv2(self.relu(self.norm2(out)))
        return torch.cat([x, out], 1)


class TorchDenseNetTiny(tnn.Module):
    """torchvision-naming DenseNet with tiny config (2, 2) for the converter
    tree-rule test."""

    def __init__(self, block_config=(2, 2), growth=32, init=64, num_classes=1000):
        super().__init__()
        features = tnn.Module()
        features.conv0 = tnn.Conv2d(3, init, 7, 2, 3, bias=False)
        features.norm0 = tnn.BatchNorm2d(init)
        feats = init
        for i, n in enumerate(block_config):
            block = tnn.Module()
            for j in range(n):
                setattr(block, f"denselayer{j + 1}", TorchDenseLayer(feats, growth))
                feats += growth
            setattr(features, f"denseblock{i + 1}", block)
            if i != len(block_config) - 1:
                trans = tnn.Module()
                trans.norm = tnn.BatchNorm2d(feats)
                trans.conv = tnn.Conv2d(feats, feats // 2, 1, bias=False)
                feats //= 2
                setattr(features, f"transition{i + 1}", trans)
        features.norm5 = tnn.BatchNorm2d(feats)
        self.features = features
        self.classifier = tnn.Linear(feats, num_classes)
        self.block_config = block_config

    def forward(self, x):
        f = self.features
        x = tnn.functional.max_pool2d(
            tnn.functional.relu(f.norm0(f.conv0(x))), 3, 2, 1
        )
        for i in range(len(self.block_config)):
            block = getattr(f, f"denseblock{i + 1}")
            for j in range(self.block_config[i]):
                x = getattr(block, f"denselayer{j + 1}")(x)
            if i != len(self.block_config) - 1:
                t = getattr(f, f"transition{i + 1}")
                x = tnn.functional.avg_pool2d(t.conv(tnn.functional.relu(t.norm(x))), 2)
        x = tnn.functional.relu(f.norm5(x))
        x = x.mean([2, 3])
        return self.classifier(x)


def test_densenet_logits_parity():
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.models import Surrogate, WrappedModel
    from transferattack_tpu.models.densenet import DenseNet
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    tmodel = TorchDenseNetTiny().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)

    backbone = DenseNet(block_config=(2, 2))
    module = WrappedModel(backbone=backbone, size=64,
                          mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    surrogate = Surrogate(name="densenet_tiny", module=module,
                          variables=variables, input_size=64)
    converted = torch_state_dict_to_flax(tmodel.state_dict())
    variables, report = reconcile_with_module(converted, surrogate.variables)
    assert not report["missing"], report["missing"][:8]
    assert not report["mismatched"], report["mismatched"][:8]
    surrogate.variables = variables

    rng = np.random.RandomState(0)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    with torch.no_grad():
        t_logits = tmodel(
            torch.from_numpy(((x - mean) / std).transpose(0, 3, 1, 2))
        ).numpy()
    j_logits = np.asarray(surrogate.apply(surrogate.variables, jnp.asarray(x)))
    np.testing.assert_allclose(j_logits, t_logits, atol=1e-3, rtol=1e-3)


class TBasicConv2d(tnn.Module):
    def __init__(self, inp, out, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(inp, out, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(out, eps=1e-3)

    def forward(self, x):
        return tnn.functional.relu(self.bn(self.conv(x)))


class TInceptionA(tnn.Module):
    def __init__(self, inp, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv2d(inp, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv2d(inp, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv2d(inp, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv2d(inp, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(
            tnn.functional.avg_pool2d(x, 3, 1, 1, count_include_pad=True)
        )
        return torch.cat([b1, b5, b3, bp], 1)


class TInceptionStem(tnn.Module):
    """Inception-v3 stem + one InceptionA — enough to pin the 299 path,
    asymmetric padding, eps=1e-3 BN, and branch concat ordering."""

    def __init__(self, num_classes=1000):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.fc = tnn.Linear(256, num_classes)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = tnn.functional.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = tnn.functional.max_pool2d(x, 3, 2)
        x = self.Mixed_5b(x)
        x = x.mean([2, 3])
        return self.fc(x)


def test_inception_stem_logits_parity():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from transferattack_tpu.models import Surrogate, WrappedModel
    from transferattack_tpu.models.inception import BasicConv2d, InceptionA
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    class JInceptionStem(nn.Module):
        @nn.compact
        def __call__(self, x, features_only=False):
            x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
            x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
            x = BasicConv2d(64, (3, 3), padding=((1, 1), (1, 1)),
                            name="Conv2d_2b_3x3")(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
            x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = InceptionA(32, name="Mixed_5b")(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(1000, name="fc")(x)

    tmodel = TInceptionStem().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)

    module = WrappedModel(backbone=JInceptionStem(), size=299,
                          mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    surrogate = Surrogate(name="inc_stem", module=module, variables=variables,
                          input_size=299)
    converted = torch_state_dict_to_flax(tmodel.state_dict())
    variables, report = reconcile_with_module(converted, surrogate.variables)
    assert not report["missing"], report["missing"][:8]
    assert not report["mismatched"], report["mismatched"][:8]
    surrogate.variables = variables

    rng = np.random.RandomState(0)
    x = rng.rand(1, 299, 299, 3).astype(np.float32)
    xn = (x - 0.5) / 0.5
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(xn.transpose(0, 3, 1, 2))).numpy()
    j_logits = np.asarray(surrogate.apply(surrogate.variables, jnp.asarray(x)))
    np.testing.assert_allclose(j_logits, t_logits, atol=1e-3, rtol=1e-3)
