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


def _fresh_pair(seed=7):
    """A fresh torch/JAX twin pair (hook-registering tests must not touch the
    module-scoped ``pair`` fixture's torch model)."""
    from transferattack_tpu.models import make_model
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    torch.manual_seed(seed)
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
    return tmodel, converted, surrogate


def test_fia_feature_loop_parity():
    """FIA full 10-iter trajectory (``advanced_objective/fia.py:71-114``)
    at drop_rate=0 (deterministic masks): aggregate feature-grad weights,
    then descend the weighted feature loss with the raw gradient."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(11)
    rng = np.random.RandomState(4)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, epoch, num_ens = 16 / 255, 1.6 / 255, 10, 2

    captured = {}
    h = tmodel.layer2.register_forward_hook(
        lambda m, i, o: captured.__setitem__("feat", o))

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    # phase 1: aggregate d(sum softmax-prob[y])/d(feat) over num_ens
    # identical (drop_rate=0) passes, per-sample L2-normalized
    agg = None
    for _ in range(num_ens):
        xn = xt.clone().requires_grad_(True)
        logits = torch_forward(tmodel, xn)
        probs = tnn.functional.softmax(logits, dim=-1)
        loss = probs.gather(1, yt[:, None]).sum()
        feat = captured["feat"]
        g = torch.autograd.grad(loss, feat, retain_graph=False)[0]
        agg = g if agg is None else agg + g
    agg = agg / torch.sqrt((agg ** 2).sum(dim=(1, 2, 3), keepdim=True))
    agg = agg.detach()

    delta = torch.zeros_like(xt, requires_grad=True)
    for _ in range(epoch):
        _ = torch_forward(tmodel, xt + delta)
        floss = (captured["feat"] * agg).sum()
        grad = torch.autograd.grad(floss, delta)[0]
        d = torch.clamp(delta.data + alpha * torch.sign(-grad), -eps, eps)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    h.remove()
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("fia")(
        model_name="resnet18", pretrained=False, input_size=64,
        num_ens=num_ens, drop_rate=0.0, feature_layer="layer2", epoch=epoch)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.99, f"FIA delta sign agreement {agree:.4f}"


def test_sgm_surgery_loop_parity():
    """SGM full 10-iter MI-FGSM trajectory through the γ-hooked model
    (``model_related/sgm.py:47-97``) vs the SurgeryConfig custom-vjp — the
    surgery parity test pins one gradient; this pins the trajectory."""
    import transferattack_tpu as ta
    from tests.test_surgery_parity import _register_sgm_hooks
    from transferattack_tpu.models import make_model
    from transferattack_tpu.models.resnet import SurgeryConfig
    from transferattack_tpu.utils.convert import reconcile_with_module

    tmodel, converted, _ = _fresh_pair(12)
    surrogate = make_model("resnet18", pretrained=False, input_size=64,
                           surgery=SurgeryConfig(gamma=0.2))
    variables, report = reconcile_with_module(converted, surrogate.variables)
    assert not (report["missing"] or report["mismatched"])
    surrogate.variables = variables

    wrapped = tnn.Sequential(tnn.Identity(), tmodel).eval()
    _register_sgm_hooks(wrapped, gamma=0.2)

    rng = np.random.RandomState(5)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay = 16 / 255, 1.6 / 255, 1.0

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(10):
        xn = ((xt + delta) - torch.from_numpy(MEAN)) / torch.from_numpy(STD)
        logits = wrapped(xn.permute(0, 3, 1, 2))
        loss = tnn.functional.cross_entropy(logits, yt)
        grad = torch.autograd.grad(loss, delta)[0]
        momentum = decay * momentum + grad / grad.abs().mean(
            dim=(1, 2, 3), keepdim=True)
        d = torch.clamp(delta.data + alpha * momentum.sign(), -eps, eps)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("sgm")(
        model_name="resnet18", pretrained=False, input_size=64, gamma=0.2)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"SGM delta sign agreement {agree:.4f}"


def test_logit_targeted_loop_parity(pair):
    """Targeted logit protocol, 20-iter abbreviation of T=300
    (``advanced_objective/logit.py:31-89``): target-logit-sum ascent,
    TI-smoothed gradient, raw (un-normalized) momentum accumulation.
    DI disabled (diversity_prob=0) for determinism."""
    import transferattack_tpu as ta
    from transferattack_tpu.ops import gaussian_kernel

    tmodel, surrogate = pair
    rng = np.random.RandomState(6)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    tgt = rng.randint(0, 1000, (2,)).astype(np.int32)
    pairs = np.stack([y, tgt], axis=1)
    eps, alpha, decay, epoch = 16 / 255, 2 / 255, 1.0, 20

    kern = torch.from_numpy(gaussian_kernel(5))[None, None].repeat(3, 1, 1, 1)
    xt = torch.from_numpy(x)
    tt = torch.from_numpy(tgt).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        logits = torch_forward(tmodel, xt + delta)
        loss = logits.gather(1, tt[:, None]).sum()
        grad = torch.autograd.grad(loss, delta)[0]
        g = tnn.functional.conv2d(
            grad.permute(0, 3, 1, 2), kern, padding="same", groups=3)
        grad = g.permute(0, 2, 3, 1)
        momentum = grad + decay * momentum
        d = torch.clamp(delta.data + alpha * momentum.sign(), -eps, eps)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("logit")(
        model_name="resnet18", pretrained=False, input_size=64,
        epoch=epoch, diversity_prob=0.0, kernel_size=5, targeted=True)
    atk.model = surrogate
    ours = np.asarray(atk(x, pairs))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"logit delta sign agreement {agree:.4f}"


def test_cfm_mixup_loop_parity():
    """CFM tap-mixup trajectory (``advanced_objective/cfm.py:173-301``)
    made deterministic: batch of 1 (self-pairing), mix_prob=1, fixed ratio
    0.5, DI off — pins the clean-feature record + per-layer mixing taps +
    targeted logit loss + TI."""
    import transferattack_tpu as ta
    from transferattack_tpu.ops import gaussian_kernel

    tmodel, _, surrogate = _fresh_pair(13)
    rng = np.random.RandomState(7)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (1,)).astype(np.int32)
    tgt = rng.randint(0, 1000, (1,)).astype(np.int32)
    pairs = np.stack([y, tgt], axis=1)
    eps, alpha, decay, epoch, ratio = 16 / 255, 2 / 255, 1.0, 10, 0.5

    layers = ("layer2", "layer3")
    xt = torch.from_numpy(x)
    tt = torch.from_numpy(tgt).long()

    # record clean features once (B=1: the shuffle pairing is the identity)
    clean = {}
    handles = [getattr(tmodel, L).register_forward_hook(
        (lambda L: lambda m, i, o: clean.__setitem__(L, o.detach()))(L))
        for L in layers]
    with torch.no_grad():
        torch_forward(tmodel, xt)
    for h in handles:
        h.remove()

    # mixing hooks: feat <- (1-ratio)*feat + ratio*clean
    handles = [getattr(tmodel, L).register_forward_hook(
        (lambda L: lambda m, i, o: (1 - ratio) * o + ratio * clean[L])(L))
        for L in layers]

    kern = torch.from_numpy(gaussian_kernel(5))[None, None].repeat(3, 1, 1, 1)
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        logits = torch_forward(tmodel, xt + delta)
        loss = logits.gather(1, tt[:, None]).sum()
        grad = torch.autograd.grad(loss, delta)[0]
        g = tnn.functional.conv2d(
            grad.permute(0, 3, 1, 2), kern, padding="same", groups=3)
        grad = g.permute(0, 2, 3, 1)
        momentum = grad + decay * momentum
        d = torch.clamp(delta.data + alpha * momentum.sign(), -eps, eps)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    for h in handles:
        h.remove()
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("cfm")(
        model_name="resnet18", pretrained=False, input_size=64,
        epoch=epoch, mix_prob=1.0, mix_lower=ratio, mix_upper=ratio,
        layers=layers, diversity_prob=0.0, kernel_size=5, targeted=True)
    atk.model = surrogate
    ours = np.asarray(atk(x, pairs))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"CFM delta sign agreement {agree:.4f}"
