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
