"""PyTorch↔JAX golden parity for Inception-ResNet-v2 (SURVEY.md §4 layer (b)).

A raw-torch twin with timm's module naming (``inception_resnet_v2``: stem
conv2d_1a..conv2d_4a, mixed_5b, repeat/repeat_1/repeat_2 Sequentials,
block8, conv2d_7b, classif) provides a real state_dict; the converter must
map it onto our Flax model with logit parity — pinning the residual-scale
joins, asymmetric 1×7/7×1 pads, count_include_pad=False avg pool, and the
repeat.N → repeat_N name merging for the ghost/DHF surrogate path.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


class TConv(tnn.Module):
    def __init__(self, inp, out, k, stride=1, padding=0):
        super().__init__()
        self.conv = tnn.Conv2d(inp, out, k, stride, padding, bias=False)
        self.bn = tnn.BatchNorm2d(out, eps=1e-3)

    def forward(self, x):
        return tnn.functional.relu(self.bn(self.conv(x)))


class TMixed5b(tnn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = TConv(192, 96, 1)
        self.branch1 = tnn.Sequential(TConv(192, 48, 1), TConv(48, 64, 5, padding=2))
        self.branch2 = tnn.Sequential(
            TConv(192, 64, 1), TConv(64, 96, 3, padding=1), TConv(96, 96, 3, padding=1)
        )
        self.branch3 = tnn.Sequential(
            tnn.AvgPool2d(3, 1, 1, count_include_pad=False), TConv(192, 64, 1)
        )

    def forward(self, x):
        return torch.cat(
            [self.branch0(x), self.branch1(x), self.branch2(x), self.branch3(x)], 1
        )


class TBlock35(tnn.Module):
    def __init__(self, scale=0.17):
        super().__init__()
        self.scale = scale
        self.branch0 = TConv(320, 32, 1)
        self.branch1 = tnn.Sequential(TConv(320, 32, 1), TConv(32, 32, 3, padding=1))
        self.branch2 = tnn.Sequential(
            TConv(320, 32, 1), TConv(32, 48, 3, padding=1), TConv(48, 64, 3, padding=1)
        )
        self.conv2d = tnn.Conv2d(128, 320, 1)

    def forward(self, x):
        out = torch.cat([self.branch0(x), self.branch1(x), self.branch2(x)], 1)
        return tnn.functional.relu(self.conv2d(out) * self.scale + x)


class TMixed6a(tnn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = TConv(320, 384, 3, stride=2)
        self.branch1 = tnn.Sequential(
            TConv(320, 256, 1), TConv(256, 256, 3, padding=1), TConv(256, 384, 3, stride=2)
        )

    def forward(self, x):
        return torch.cat(
            [self.branch0(x), self.branch1(x), tnn.functional.max_pool2d(x, 3, 2)], 1
        )


class TBlock17(tnn.Module):
    def __init__(self, scale=0.10):
        super().__init__()
        self.scale = scale
        self.branch0 = TConv(1088, 192, 1)
        self.branch1 = tnn.Sequential(
            TConv(1088, 128, 1),
            TConv(128, 160, (1, 7), padding=(0, 3)),
            TConv(160, 192, (7, 1), padding=(3, 0)),
        )
        self.conv2d = tnn.Conv2d(384, 1088, 1)

    def forward(self, x):
        out = torch.cat([self.branch0(x), self.branch1(x)], 1)
        return tnn.functional.relu(self.conv2d(out) * self.scale + x)


class TMixed7a(tnn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = tnn.Sequential(TConv(1088, 256, 1), TConv(256, 384, 3, stride=2))
        self.branch1 = tnn.Sequential(TConv(1088, 256, 1), TConv(256, 288, 3, stride=2))
        self.branch2 = tnn.Sequential(
            TConv(1088, 256, 1), TConv(256, 288, 3, padding=1), TConv(288, 320, 3, stride=2)
        )

    def forward(self, x):
        return torch.cat(
            [self.branch0(x), self.branch1(x), self.branch2(x),
             tnn.functional.max_pool2d(x, 3, 2)], 1
        )


class TBlock8(tnn.Module):
    def __init__(self, scale=0.20, no_relu=False):
        super().__init__()
        self.scale = scale
        self.no_relu = no_relu
        self.branch0 = TConv(2080, 192, 1)
        self.branch1 = tnn.Sequential(
            TConv(2080, 192, 1),
            TConv(192, 224, (1, 3), padding=(0, 1)),
            TConv(224, 256, (3, 1), padding=(1, 0)),
        )
        self.conv2d = tnn.Conv2d(448, 2080, 1)

    def forward(self, x):
        out = torch.cat([self.branch0(x), self.branch1(x)], 1)
        out = self.conv2d(out) * self.scale + x
        return out if self.no_relu else tnn.functional.relu(out)


class TorchIncResV2(tnn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        self.conv2d_1a = TConv(3, 32, 3, stride=2)
        self.conv2d_2a = TConv(32, 32, 3)
        self.conv2d_2b = TConv(32, 64, 3, padding=1)
        self.conv2d_3b = TConv(64, 80, 1)
        self.conv2d_4a = TConv(80, 192, 3)
        self.mixed_5b = TMixed5b()
        self.repeat = tnn.Sequential(*[TBlock35() for _ in range(10)])
        self.mixed_6a = TMixed6a()
        self.repeat_1 = tnn.Sequential(*[TBlock17() for _ in range(20)])
        self.mixed_7a = TMixed7a()
        self.repeat_2 = tnn.Sequential(*[TBlock8() for _ in range(9)])
        self.block8 = TBlock8(scale=1.0, no_relu=True)
        self.conv2d_7b = TConv(2080, 1536, 1)
        self.classif = tnn.Linear(1536, num_classes)

    def forward(self, x):
        x = self.conv2d_2b(self.conv2d_2a(self.conv2d_1a(x)))
        x = tnn.functional.max_pool2d(x, 3, 2)
        x = self.conv2d_4a(self.conv2d_3b(x))
        x = tnn.functional.max_pool2d(x, 3, 2)
        x = self.repeat(self.mixed_5b(x))
        x = self.repeat_1(self.mixed_6a(x))
        x = self.repeat_2(self.mixed_7a(x))
        x = self.conv2d_7b(self.block8(x))
        return self.classif(x.mean([2, 3]))


def test_inception_resnet_v2_logits_parity():
    import jax.numpy as jnp

    from transferattack_tpu.models import make_model
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    tmodel = TorchIncResV2().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)

    surrogate = make_model("inception_resnet_v2", pretrained=False,
                           input_size=160)
    converted = torch_state_dict_to_flax(tmodel.state_dict())
    variables, report = reconcile_with_module(converted, surrogate.variables)
    assert not report["missing"], report["missing"][:8]
    assert not report["mismatched"], report["mismatched"][:8]
    surrogate.variables = variables

    rng = np.random.RandomState(0)
    x = rng.rand(1, 160, 160, 3).astype(np.float32)
    xn = (x - 0.5) / 0.5
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(xn.transpose(0, 3, 1, 2))).numpy()
    j_logits = np.asarray(surrogate.apply(surrogate.variables, jnp.asarray(x)))
    np.testing.assert_allclose(j_logits, t_logits, atol=2e-3, rtol=2e-3)
