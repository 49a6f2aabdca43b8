"""Loop-level parity twins, stage 4: the deterministic multi-model ensembles
(CWA's SAM-like inner sweep, AdaEA's agreement weighting + disparity filter,
SMER's weight-learning inner chain pinned via a single member) and TAP's
multi-layer feature objective.

Stochastic elements are pinned the same way as stages 2-3: random_start off,
AdaEA's 0.001-noise init zeroed on both sides, SMER run with K=1 so the
shuffled member schedule is the constant [0,0,0,0].
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from tests.test_attack_parity import MEAN, STD, _fresh_pair, torch_forward  # noqa: E402


def _mi_normalize(g):
    return g / g.abs().mean(dim=(1, 2, 3), keepdim=True)


def _box_step(xt, delta, direction, alpha, eps):
    d = torch.clamp(delta.data + alpha * direction, -eps, eps)
    return (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)


def _pack_two(s1, s2):
    return {
        "params": {"members_0": s1.variables["params"],
                   "members_1": s2.variables["params"]},
        "batch_stats": {"members_0": s1.variables["batch_stats"],
                        "members_1": s2.variables["batch_stats"]},
    }


def test_tap_feature_loss_loop_parity():
    """TAP full trajectory (``advanced_objective/tap.py:53-124``): CE +
    lam*||powsign(orig)-powsign(new)||^2 over the tapped layer set + the
    yita*|avgpool_s(x-x_adv)| regularizer, raw sign steps (no momentum).
    The repo taps the four stage outputs (documented adaptation of the
    reference's every-submodule hook list), so the torch twin hooks
    layer1..layer4."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(51)
    rng = np.random.RandomState(51)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, epoch = 16 / 255, 1.6 / 255, 8
    lam, alpha_tap, s, yita = 0.005, 0.5, 3, 0.01

    feats = []
    hooks = [getattr(tmodel, f"layer{i}").register_forward_hook(
        lambda m, i_, o: feats.append(o)) for i in (1, 2, 3, 4)]

    def powsign(f):
        return torch.sign(f) * f.abs() ** alpha_tap

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    feats.clear()
    with torch.no_grad():
        _ = torch_forward(tmodel, xt)
    orig = [powsign(f).clone() for f in feats]

    delta = torch.zeros_like(xt, requires_grad=True)
    for _ in range(epoch):
        feats.clear()
        logits = torch_forward(tmodel, xt + delta)
        l1 = F.cross_entropy(logits, yt)
        l2 = sum(lam * (a - powsign(f)).pow(2).sum()
                 for a, f in zip(orig, feats))
        l3 = yita * tnn.AvgPool2d(s)(
            (-delta).permute(0, 3, 1, 2)).abs().sum()
        grad = torch.autograd.grad(l1 + l2 + l3, delta)[0]
        delta = _box_step(xt, delta, grad.sign(), alpha, eps)
    for h in hooks:
        h.remove()
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("tap")(
        model_name="resnet18", pretrained=False, input_size=64, epoch=epoch)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.97, f"TAP delta sign agreement {agree:.4f}"


def test_cwa_inner_sweep_loop_parity():
    """CWA full trajectory (``ensemble/cwa.py:41-90``): reverse r_size step
    from the ensemble gradient, ordered per-member inner updates at
    inner_step_size on the L2-per-image-normalized momentum (persisting
    ACROSS epochs), fake_grad = net inner displacement normalized by its
    global L1, outer sign steps.  random_start off for determinism."""
    import transferattack_tpu as ta

    tmodel, _, s1 = _fresh_pair(52)
    tmodel2, _, s2 = _fresh_pair(53)
    rng = np.random.RandomState(52)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, epoch = 16 / 255, 3.2 / 255, 1.0, 6
    r_size, inner_step = 16 / 255 / 15, 250.0
    models = [tmodel, tmodel2]

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    inner_momentum = torch.zeros_like(xt)
    outer_momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        original_delta = delta.detach().clone()
        logits = (torch_forward(tmodel, xt + delta)
                  + torch_forward(tmodel2, xt + delta)) / 2
        loss = F.cross_entropy(logits, yt)
        grad = torch.autograd.grad(loss, delta)[0]
        d = torch.clamp(delta.data - r_size * grad.sign(), -eps, eps)
        inner_delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
        for k in range(2):
            lk = F.cross_entropy(torch_forward(models[k], xt + inner_delta), yt)
            g = torch.autograd.grad(lk, inner_delta)[0]
            n2 = g.reshape(g.size(0), -1).norm(dim=1).view(-1, 1, 1, 1)
            inner_momentum = decay * inner_momentum + g / n2
            d = torch.clamp(
                inner_delta.data + inner_step * inner_momentum, -eps, eps)
            inner_delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
        fake_grad = inner_delta.detach() - original_delta
        outer_momentum = decay * outer_momentum \
            + fake_grad / fake_grad.abs().sum()
        delta = _box_step(xt, delta, outer_momentum.sign(), alpha, eps)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("cwa")(
        model_name=["resnet18", "resnet18"], pretrained=False,
        input_size=64, epoch=epoch, random_start=False)
    atk.model.variables = _pack_two(s1, s2)
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.95, f"CWA delta sign agreement {agree:.4f}"


def test_adaea_agm_drf_loop_parity():
    """AdaEA full trajectory (``ensemble/adaea.py:44-148``): per-member
    one-alpha-step examples, w[j] = sum_i CE_i(adv_j)/loss_self[i]*beta with
    loss_self[i] the CE of member i on ITS OWN example, softmax weights on
    the logit sum, and the disparity filter whose LAST row stays zero (the
    reference's stale-j guard).  The 0.001-noise init is zeroed on both
    sides to remove RNG mismatch."""
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, _, s1 = _fresh_pair(54)
    tmodel2, _, s2 = _fresh_pair(55)
    rng = np.random.RandomState(54)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, epoch = 16 / 255, 1.6 / 255, 1.0, 8
    beta, threshold = 10.0, -0.3
    models = [tmodel, tmodel2]

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        outputs = [torch_forward(m, xt + delta) for m in models]
        grads = [torch.autograd.grad(F.cross_entropy(o, yt), delta,
                                     retain_graph=True)[0] for o in outputs]
        adv = []
        for g in grads:
            d = torch.clamp(delta.data + alpha * g.sign(), -eps, eps)
            adv.append(torch.clamp(xt + d, 0, 1))
        with torch.no_grad():
            loss_self = [F.cross_entropy(torch_forward(models[i], adv[i]), yt)
                         for i in range(2)]
            w = torch.zeros(2)
            for j in range(2):
                for i in range(2):
                    if i == j:
                        continue
                    w[j] += F.cross_entropy(
                        torch_forward(models[i], adv[j]), yt) \
                        / loss_self[i] * beta
            alpha_w = torch.softmax(w, dim=0)
            # DRF with the reference's stale-j guard: row 1 stays zero
            g0 = F.normalize(grads[0], dim=3)
            g1 = F.normalize(grads[1], dim=3)
            cos = F.cosine_similarity(g0, g1, dim=3)
            cos_map = cos / 2.0  # mean of [cos, zero-row]
            mask = (cos_map >= threshold).float()[..., None]
        out = alpha_w[0] * outputs[0] + alpha_w[1] * outputs[1]
        grad = torch.autograd.grad(F.cross_entropy(out, yt), delta)[0]
        grad = grad * mask
        momentum = decay * momentum + _mi_normalize(grad)
        delta = _box_step(xt, delta, momentum.sign(), alpha, eps)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("adaea")(
        model_name=["resnet18", "resnet18"], pretrained=False,
        input_size=64, epoch=epoch)
    atk.model.variables = _pack_two(s1, s2)
    atk.init_delta = lambda xx, key: jnp.zeros_like(xx)
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.95, f"AdaEA delta sign agreement {agree:.4f}"


def test_smer_weight_chain_loop_parity():
    """SMER full trajectory (``ensemble/smer.py:64-131``) with K=1: the
    shuffled schedule is the constant [0]*4, leaving the weight-scaled
    member CE, the SGD(lr=2e-2, wd=2e-3) update of the selection weight from
    the -log(group CE) outer objective, the inner momentum chain, and the
    noise = last inner grad outer update as the system under test."""
    import transferattack_tpu as ta

    tmodel, _, s1 = _fresh_pair(56)
    rng = np.random.RandomState(56)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, epoch = 16 / 255, 1.6 / 255, 1.0, 6
    lr, wd, M = 2e-2, 2e-3, 4

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    w = torch.ones(1, requires_grad=True)
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        inner_delta = delta.detach().clone().requires_grad_(True)
        grad_inner = torch.zeros_like(xt)
        for _ in range(M):
            out = torch_forward(tmodel, xt + inner_delta) * w[0]
            loss = F.cross_entropy(out, yt)
            g = torch.autograd.grad(loss, inner_delta, retain_graph=False)[0]
            group = torch_forward(tmodel, xt + inner_delta.detach()) * w[0]
            outer_loss = -torch.log(F.cross_entropy(group, yt))
            gw = torch.autograd.grad(outer_loss, w)[0]
            with torch.no_grad():
                w = (w - lr * (gw + wd * w)).requires_grad_(True)
            grad_inner = decay * grad_inner + _mi_normalize(g)
            inner_delta = _box_step(
                xt, inner_delta, grad_inner.sign(), alpha, eps)
        momentum = decay * momentum + _mi_normalize(grad_inner)
        delta = _box_step(xt, delta, momentum.sign(), alpha, eps)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("smer")(
        model_name=["resnet18"], pretrained=False, input_size=64,
        epoch=epoch, random_start=False)
    atk.model.variables = {
        "params": {"members_0": s1.variables["params"]},
        "batch_stats": {"members_0": s1.variables["batch_stats"]},
    }
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.95, f"SMER delta sign agreement {agree:.4f}"


def test_fuzziness_tuned_loop_parity():
    """Fuzziness-tuned full trajectory (``advanced_objective/
    fuzziness_tuned.py:33-80``): the true-class logit scaled by K=0.8, all
    logits temperature-divided by T=2 before CE, MI momentum.
    Deterministic."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(57)
    rng = np.random.RandomState(57)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, epoch = 16 / 255, 1.6 / 255, 1.0, 10
    K, T = 0.8, 2.0

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        logits = torch_forward(tmodel, xt + delta).clone()
        idx = torch.arange(2)
        logits[idx, yt] = logits[idx, yt] * K
        logits = logits / T
        loss = F.cross_entropy(logits, yt)
        grad = torch.autograd.grad(loss, delta)[0]
        momentum = decay * momentum + _mi_normalize(grad)
        delta = _box_step(xt, delta, momentum.sign(), alpha, eps)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("fuzziness_tuned")(
        model_name="resnet18", pretrained=False, input_size=64, epoch=epoch)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"Fuzziness-tuned delta sign agreement {agree:.4f}"


def test_naa_attribution_loop_parity():
    """NAA full trajectory (``advanced_objective/naa.py:62-110``): feature
    cotangents aggregated over the straight path i/N from black (N probes,
    softmax-prob loss), baseline feature at the black image, attribution
    loss ((feat-base)*agg).sum(), raw NEGATED sign steps (no momentum).
    Deterministic."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(58)
    rng = np.random.RandomState(58)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, epoch, N = 16 / 255, 1.6 / 255, 8, 4

    captured = {}
    h = tmodel.layer1.register_forward_hook(
        lambda m, i, o: captured.__setitem__("feat", o))

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    agg = 0.0
    for i in range(N):
        xm = (xt * i / N).requires_grad_(True)
        probs = F.softmax(torch_forward(tmodel, xm), dim=1)
        loss = probs[torch.arange(2), yt].sum()
        g = torch.autograd.grad(loss, captured["feat"])[0]
        agg = agg + g
    agg = (agg / N).detach()

    with torch.no_grad():
        _ = torch_forward(tmodel, torch.zeros_like(xt))
        y_base = captured["feat"].clone()

    delta = torch.zeros_like(xt, requires_grad=True)
    for _ in range(epoch):
        _ = torch_forward(tmodel, xt + delta)
        loss = ((captured["feat"] - y_base) * agg).sum()
        grad = torch.autograd.grad(loss, delta)[0]
        delta = _box_step(xt, delta, (-grad).sign(), alpha, eps)
    h.remove()
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("naa")(
        model_name="resnet18", pretrained=False, input_size=64,
        epoch=epoch, N=N, feature_layer="layer1")
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.97, f"NAA delta sign agreement {agree:.4f}"


def test_danaa_adversarial_path_loop_parity():
    """DANAA full trajectory (``advanced_objective/danaa.py:83-150``) at
    scale=0 (noise-free path, leaving the lr-sign adversarial walk live):
    feature cotangents summed along the walked path, NEGATED + per-sample
    L2-normalized aggregate, baseline feature at the FINAL walked point,
    balanced attribution mean, +momentum sign steps.  Pins the r4 rewrite
    against the reference."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(59)
    rng = np.random.RandomState(59)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, epoch = 16 / 255, 1.6 / 255, 1.0, 8
    N, lr, gamma = 4, 0.0025, 1.0

    captured = {}
    h = tmodel.layer2.register_forward_hook(
        lambda m, i, o: captured.__setitem__("feat", o))

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    x_t = xt.clone()
    agg = 0.0
    for _ in range(N):
        xm = x_t.clone().requires_grad_(True)
        probs = F.softmax(torch_forward(tmodel, xm), dim=1)
        loss = probs[torch.arange(2), yt].sum()
        g_feat = torch.autograd.grad(loss, captured["feat"],
                                     retain_graph=True)[0]
        g_in = torch.autograd.grad(loss, xm)[0]
        x_t = x_t + lr * g_in.sign()
        agg = agg + g_feat
    agg = -(agg / agg.pow(2).sum(dim=(1, 2, 3), keepdim=True).sqrt()).detach()

    with torch.no_grad():
        _ = torch_forward(tmodel, x_t)
        y_base = captured["feat"].clone()

    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        _ = torch_forward(tmodel, xt + delta)
        attribution = (captured["feat"] - y_base) * agg
        balanced = torch.where(attribution >= 0, attribution,
                               gamma * attribution)
        grad = torch.autograd.grad(balanced.mean(), delta)[0]
        momentum = decay * momentum + _mi_normalize(grad)
        delta = _box_step(xt, delta, momentum.sign(), alpha, eps)
    h.remove()
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("danaa")(
        model_name="resnet18", pretrained=False, input_size=64,
        epoch=epoch, N=N, scale=0.0, feature_layer="layer2")
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.95, f"DANAA delta sign agreement {agree:.4f}"
