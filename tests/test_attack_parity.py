"""Cross-implementation attack parity (SURVEY.md §4 layer (b), attack level).

The reference attack loops are re-run here in raw PyTorch (the exact math of
``transferattack/attack.py:67-153`` / ``input_transformation/tim.py``) on the
torch twin of our ResNet-18; our jit-compiled engine with converted weights
must produce the same delta within fp32 tolerance for randomness-free
attacks.  This pins the whole pipeline: weight conversion, model parity,
loss/grad semantics, momentum normalization, sign steps, projections.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from tests.test_torch_parity import TorchResNet18  # noqa: E402

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


@pytest.fixture(scope="module")
def pair():
    import jax.numpy as jnp

    from transferattack_tpu.models import make_model
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    tmodel = TorchResNet18().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    converted = torch_state_dict_to_flax(tmodel.state_dict())
    surrogate = make_model("resnet18", pretrained=False, input_size=64)
    variables, report = reconcile_with_module(converted, surrogate.variables)
    assert not (report["missing"] or report["mismatched"])
    surrogate.variables = variables
    return tmodel, surrogate


def torch_forward(tmodel, x_raw):
    """Raw-[0,1]-pixel forward with the wrapped normalization."""
    xn = (x_raw - torch.from_numpy(MEAN)) / torch.from_numpy(STD)
    return tmodel(xn.permute(0, 3, 1, 2))


def torch_mifgsm(tmodel, x, y, epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, tim_kernel=None):
    """The reference loop (``attack.py:67-153``; TIM grad conv
    ``tim.py:69-75``), NHWC in raw pixel space."""
    x = torch.from_numpy(x)
    y = torch.from_numpy(y).long()
    delta = torch.zeros_like(x, requires_grad=True)
    momentum = torch.zeros_like(x)
    for _ in range(epoch):
        logits = torch_forward(tmodel, x + delta)
        loss = tnn.functional.cross_entropy(logits, y)
        grad = torch.autograd.grad(loss, delta)[0]
        if tim_kernel is not None:
            g = grad.permute(0, 3, 1, 2)
            k = torch.from_numpy(tim_kernel)[None, None].repeat(3, 1, 1, 1)
            g = tnn.functional.conv2d(g, k, padding="same", groups=3)
            grad = g.permute(0, 2, 3, 1)
        momentum = decay * momentum + grad / grad.abs().mean(
            dim=(1, 2, 3), keepdim=True
        )
        d = torch.clamp(delta.data + alpha * momentum.sign(), -eps, eps)
        delta = torch.clamp(x + d, 0, 1) - x
        delta.requires_grad_(True)
    return delta.detach().numpy()


def test_mifgsm_delta_parity(pair):
    tmodel, surrogate = pair
    import transferattack_tpu as ta

    rng = np.random.RandomState(0)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)

    ref = torch_mifgsm(tmodel, x, y)
    atk = ta.load_attack_class("mifgsm")(model_name="resnet18",
                                         pretrained=False, input_size=64)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    # sign-based updates amplify tiny fp divergence; demand near-total
    # agreement instead of elementwise closeness
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.99, f"delta sign agreement {agree:.4f}"
    assert np.abs(ref - ours).mean() < 2 * 1.6 / 255


def test_tim_delta_parity(pair):
    tmodel, surrogate = pair
    import transferattack_tpu as ta
    from transferattack_tpu.ops import gaussian_kernel

    rng = np.random.RandomState(1)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)

    kern = gaussian_kernel(5)
    ref = torch_mifgsm(tmodel, x, y, tim_kernel=kern)
    atk = ta.load_attack_class("tim")(model_name="resnet18", pretrained=False,
                                      input_size=64, kernel_size=5)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.99, f"delta sign agreement {agree:.4f}"


def test_nifgsm_delta_parity(pair):
    """Nesterov lookahead: grads taken at x+δ+α·decay·momentum."""
    tmodel, surrogate = pair
    import transferattack_tpu as ta

    rng = np.random.RandomState(2)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay = 16 / 255, 1.6 / 255, 1.0

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(10):
        look = xt + delta + alpha * decay * momentum
        loss = tnn.functional.cross_entropy(torch_forward(tmodel, look), yt)
        grad = torch.autograd.grad(loss, delta)[0]
        momentum = decay * momentum + grad / grad.abs().mean(
            dim=(1, 2, 3), keepdim=True
        )
        d = torch.clamp(delta.data + alpha * momentum.sign(), -eps, eps)
        delta = torch.clamp(xt + d, 0, 1) - xt
        delta.requires_grad_(True)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("nifgsm")(model_name="resnet18",
                                         pretrained=False, input_size=64)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.99, f"delta sign agreement {agree:.4f}"


def test_sim_delta_parity(pair):
    """Scale-invariant copies x/2^i concatenated: the copies-axis vmap must
    reproduce the reference's batch-concat math exactly."""
    tmodel, surrogate = pair
    import transferattack_tpu as ta

    rng = np.random.RandomState(3)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, num_scale = 16 / 255, 1.6 / 255, 1.0, 3

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(10):
        copies = torch.cat([(xt + delta) / (2 ** i) for i in range(num_scale)])
        loss = tnn.functional.cross_entropy(
            torch_forward(tmodel, copies), yt.repeat(num_scale)
        )
        grad = torch.autograd.grad(loss, delta)[0]
        momentum = decay * momentum + grad / grad.abs().mean(
            dim=(1, 2, 3), keepdim=True
        )
        d = torch.clamp(delta.data + alpha * momentum.sign(), -eps, eps)
        delta = torch.clamp(xt + d, 0, 1) - xt
        delta.requires_grad_(True)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("sim")(model_name="resnet18", pretrained=False,
                                      input_size=64, num_scale=num_scale)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.99, f"delta sign agreement {agree:.4f}"
