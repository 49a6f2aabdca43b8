"""Loop-level parity twins, stage 3 (VERDICT r3 item 8 completion): the
remaining deterministic stateful families — integrated-gradient paths (MIG,
TAIG), the patch-wise amplification/cut-noise state (PI-FGSM), global momentum
warmup (GI-FGSM), direction-tuning inner descent (DTA), the AdaMSI adaptive
moment schedule, two-phase intermediate-level projection (ILA), the Po+Trip
targeted objective, and SVRE's control-variate inner loop (single-member, so
the reference's np.random member pick is pinned to 0).

Each reference loop is transcribed in raw PyTorch from the cited file and run
on the converted torch twin of our ResNet-18 (64x64); our jit engine must
reproduce the delta sign pattern.
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


def test_mig_integrated_gradient_loop_parity():
    """MIG full trajectory (``gradient/mig.py:36-93``): s_factor straight-path
    points from the black baseline, mean softmax-prob loss (negated,
    untargeted), integrated gradient (x+delta)*grad/s, MI momentum with
    alpha=eps/epoch.  Fully deterministic."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(41)
    rng = np.random.RandomState(41)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, decay, epoch, s = 16 / 255, 1.0, 10, 5
    alpha = eps / epoch

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        pts = torch.cat([(i / s) * (xt + delta) for i in range(1, s + 1)])
        probs = F.softmax(torch_forward(tmodel, pts), dim=1)
        loss = -probs.gather(1, yt.repeat(s)[:, None]).mean()
        grad = torch.autograd.grad(loss, delta)[0]
        i_grad = (xt + delta.detach()) * grad / s
        momentum = decay * momentum + _mi_normalize(i_grad)
        delta = _box_step(xt, delta, momentum.sign(), alpha, eps)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("mig")(
        model_name="resnet18", pretrained=False, input_size=64,
        s_factor=s, epoch=epoch)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"MIG delta sign agreement {agree:.4f}"


def test_pifgsm_cut_noise_loop_parity():
    """PI-FGSM full trajectory (``gradient/pifgsm.py:46-112``): amplification
    accumulator, cut-noise overflow, uniform-ring projection kernel
    (1/(k^2-1), zero center), step beta*alpha plus projection.  decay=0 so
    momentum is the per-image L1-normalized gradient.  Deterministic."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(42)
    rng = np.random.RandomState(42)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, epoch = 16 / 255, 1.6 / 255, 10
    ksize, gamma, beta = 3, 16.0 / 255, 10.0

    kern = np.full((ksize, ksize), 1.0 / (ksize**2 - 1), np.float32)
    kern[ksize // 2, ksize // 2] = 0.0
    stack_kern = torch.from_numpy(np.tile(kern[None, None], (3, 1, 1, 1)))

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    amplification = torch.zeros_like(xt)
    for _ in range(epoch):
        loss = F.cross_entropy(torch_forward(tmodel, xt + delta), yt)
        grad = torch.autograd.grad(loss, delta)[0]
        momentum = _mi_normalize(grad)  # decay=0
        amplification = amplification + beta * alpha * momentum.sign()
        cut_noise = torch.clamp(amplification.abs() - eps, 0, 1e4) \
            * amplification.sign()
        proj = gamma * torch.sign(F.conv2d(
            cut_noise.permute(0, 3, 1, 2), stack_kern,
            padding=ksize // 2, groups=3)).permute(0, 2, 3, 1)
        amplification = amplification + proj
        d = torch.clamp(
            delta.data + beta * alpha * momentum.sign() + proj, -eps, eps)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("pifgsm")(
        model_name="resnet18", pretrained=False, input_size=64, epoch=epoch)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    # PI-FGSM's projection is sign(conv(cut_noise)) where the conv output is
    # often EXACTLY zero (cut_noise fields are sparse multiples of eps), so a
    # ±1e-10 cross-framework conv-order difference flips a tie into a full
    # ±gamma delta difference.  Measured: iteration 1 is bit-exact
    # (asserted below), 0.9955 at iter 2, ~0.93 at iter 10 — pure tie
    # amplification, no semantic gap.
    assert agree > 0.90, f"PI-FGSM delta sign agreement {agree:.4f}"

    atk1 = ta.load_attack_class("pifgsm")(
        model_name="resnet18", pretrained=False, input_size=64, epoch=1)
    atk1.model = surrogate
    ours1 = np.asarray(atk1(x, y))
    xt1 = torch.from_numpy(x)
    d1 = torch.zeros_like(xt1, requires_grad=True)
    loss = F.cross_entropy(torch_forward(tmodel, xt1 + d1), yt)
    g1 = torch.autograd.grad(loss, d1)[0]
    m1 = _mi_normalize(g1)
    a1 = beta * alpha * m1.sign()
    cut1 = torch.clamp(a1.abs() - eps, 0, 1e4) * a1.sign()
    proj1 = gamma * torch.sign(F.conv2d(
        cut1.permute(0, 3, 1, 2), stack_kern,
        padding=ksize // 2, groups=3)).permute(0, 2, 3, 1)
    ref1 = (torch.clamp(
        xt1 + torch.clamp(beta * alpha * m1.sign() + proj1, -eps, eps),
        0, 1) - xt1).detach().numpy()
    assert np.abs(ours1 - ref1).max() < 1e-6, "first PI-FGSM step not exact"


def test_gifgsm_warm_momentum_loop_parity():
    """GI-FGSM full trajectory (``gradient/gifgsm.py:42-80``): pre_epoch
    warmup iterations at step alpha*s, delta reset to zero keeping the warm
    momentum, then the normal MI loop.  Deterministic."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(43)
    rng = np.random.RandomState(43)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, epoch = 16 / 255, 1.6 / 255, 1.0, 10
    pre_epoch, s = 5, 10.0

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    momentum = torch.zeros_like(xt)
    delta = torch.zeros_like(xt, requires_grad=True)
    for _ in range(pre_epoch):
        loss = F.cross_entropy(torch_forward(tmodel, xt + delta), yt)
        grad = torch.autograd.grad(loss, delta)[0]
        momentum = decay * momentum + _mi_normalize(grad)
        delta = _box_step(xt, delta, momentum.sign(), alpha * s, eps)
    delta = torch.zeros_like(xt, requires_grad=True)
    for _ in range(epoch):
        loss = F.cross_entropy(torch_forward(tmodel, xt + delta), yt)
        grad = torch.autograd.grad(loss, delta)[0]
        momentum = decay * momentum + _mi_normalize(grad)
        delta = _box_step(xt, delta, momentum.sign(), alpha, eps)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("gifgsm")(
        model_name="resnet18", pretrained=False, input_size=64,
        epoch=epoch, pre_epoch=pre_epoch, s=s)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"GI-FGSM delta sign agreement {agree:.4f}"


def test_dta_inner_tuning_loop_parity():
    """DTA full trajectory (``gradient/dta.py:55-91``): K inner steps from
    the displaced point x+delta_tk+gt, the GLOBAL-L1-normalized lookahead gt
    (``torch.norm(grad, p=1)`` over the whole batch tensor), inner MI
    momentum, and the decay*t_grad + mean(inner grads) fusion.
    Deterministic."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(44)
    rng = np.random.RandomState(44)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, epoch = 16 / 255, 1.6 / 255, 1.0, 6
    K, u = 3, 0.8

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        loss = F.cross_entropy(torch_forward(tmodel, xt + delta), yt)
        t_grad = torch.autograd.grad(loss, delta)[0]
        gt = t_grad.clone()
        delta_tk = delta.detach().clone().requires_grad_(True)
        gtk = torch.zeros_like(xt)
        momentum_tk = torch.zeros_like(xt)
        for _ in range(K):
            loss = F.cross_entropy(
                torch_forward(tmodel, xt + delta_tk + gt.detach()), yt)
            g = torch.autograd.grad(loss, delta_tk)[0]
            gt = u * gt + g / g.abs().sum()
            gtk = gtk + g
            momentum_tk = decay * momentum_tk + _mi_normalize(g)
            delta_tk = _box_step(xt, delta_tk, momentum_tk.sign(), alpha, eps)
        grad = decay * t_grad + gtk / K
        momentum = decay * momentum + _mi_normalize(grad)
        delta = _box_step(xt, delta, momentum.sign(), alpha, eps)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("dta")(
        model_name="resnet18", pretrained=False, input_size=64,
        epoch=epoch, K=K, u=u)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.97, f"DTA delta sign agreement {agree:.4f}"


def test_taig_loop_parity():
    """TAIG full trajectory (``advanced_objective/taig.py:40-82``): per-image
    integrated gradients over steps+1 straight-path points (endpoint
    included), negated own-label score, decay=0 sign descent.
    Deterministic."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(45)
    rng = np.random.RandomState(45)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, epoch, steps = 16 / 255, 1.6 / 255, 8, 4

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    for _ in range(epoch):
        igs = []
        for i in range(xt.shape[0]):
            xadv = (xt[i] + delta[i]).detach()
            pts = torch.stack(
                [(float(j) / steps) * xadv for j in range(steps + 1)]
            ).requires_grad_(True)
            out = torch_forward(tmodel, pts)
            loss = -out[:, yt[i]].mean()
            g = torch.autograd.grad(loss, pts)[0]
            igs.append(xadv * g.mean(0))
        ig = torch.stack(igs)
        momentum = _mi_normalize(ig)  # decay=0
        delta = _box_step(xt, delta, momentum.sign(), alpha, eps)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("taig")(
        model_name="resnet18", pretrained=False, input_size=64,
        epoch=epoch, steps=steps)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    # measured drift profile: bit-exact at iter 1, 0.9998 at iter 2,
    # 0.978 at iter 8 — cross-framework fp divergence through sign steps
    assert agree > 0.97, f"TAIG delta sign agreement {agree:.4f}"


def test_adamsi_loop_parity():
    """AdaMSI-FGM full trajectory (``gradient/adamsi_fgm.py:40-82``): the
    beta1_t = s_prev/(s_t+1) schedule from per-sample gradient L1 norms, the
    time-varying beta2 second moment, the literal V_hat = sqrt(v) +
    1e-16/sqrt(t) expression, the (x0+delta-x_prev)==delta momentum term
    (x_prev is never updated in the reference), and the sign-free alpha*m
    step.  Deterministic."""
    import math

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(46)
    rng = np.random.RandomState(46)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, epoch, lam = 16 / 255, 1.6 / 255, 1.0, 10, 0.6

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    v = torch.zeros_like(xt)
    s_prev = torch.zeros(xt.shape[0])
    for t in range(1, epoch + 1):
        loss = F.cross_entropy(torch_forward(tmodel, xt + delta), yt)
        grad = torch.autograd.grad(loss, delta)[0]
        g_norm1 = grad.abs().reshape(grad.size(0), -1).sum(1)
        s_t = lam * (t**2) * g_norm1
        beta1_t = s_prev / (s_t + 1.0)
        beta2_t = 1.0 - 1.0 / t
        v = beta2_t * v + (1.0 - beta2_t) * grad * grad
        V_hat = v.sqrt() + 1e-16 / math.sqrt(t)
        momentum = momentum * decay \
            + beta1_t.view(-1, 1, 1, 1) * delta.detach()
        momentum = grad / V_hat + momentum
        s_prev = s_t
        delta = _box_step(xt, delta, momentum, alpha, eps)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("adamsi_fgm")(
        model_name="resnet18", pretrained=False, input_size=64, epoch=epoch)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.95, f"AdaMSI delta sign agreement {agree:.4f}"
    # the sign-free update must leave graded (non-staircase) magnitudes
    interior = (np.abs(ours) > 1e-6) & (np.abs(np.abs(ours) - eps) > 1e-4)
    assert interior.mean() > 0.1


def test_ila_two_phase_loop_parity():
    """ILA full two-phase trajectory (``advanced_objective/ila.py:65-135``):
    phase 1 is the plain MI-FGSM loop; phase 2 restarts delta at zero and
    ascends the projection y.(x/|x|)/|x| of the new mid-layer displacement
    onto the phase-1 displacement with raw sign steps (no momentum).  The
    reference's halfway module for ResNet-18 is layer2's last block, whose
    output equals layer2's."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(47)
    rng = np.random.RandomState(47)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, epoch = 16 / 255, 1.6 / 255, 1.0, 8

    captured = {}
    h = tmodel.layer2.register_forward_hook(
        lambda m, i, o: captured.__setitem__("feat", o))

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        loss = F.cross_entropy(torch_forward(tmodel, xt + delta), yt)
        grad = torch.autograd.grad(loss, delta)[0]
        momentum = decay * momentum + _mi_normalize(grad)
        delta = _box_step(xt, delta, momentum.sign(), alpha, eps)
    init_delta = delta.detach()

    with torch.no_grad():
        _ = torch_forward(tmodel, xt)
        mid_original = captured["feat"].clone()
        _ = torch_forward(tmodel, xt + init_delta)
        mid_attack = captured["feat"].clone()
    xdir = (mid_attack - mid_original).reshape(1, -1)
    xnorm = xdir.norm()

    delta = torch.zeros_like(xt, requires_grad=True)
    for _ in range(epoch):
        _ = torch_forward(tmodel, xt + delta)
        ydir = (captured["feat"] - mid_original).reshape(1, -1)
        proj = (ydir @ (xdir / xnorm).t()) / xnorm
        grad = torch.autograd.grad(proj.sum(), delta)[0]
        delta = _box_step(xt, delta, grad.sign(), alpha, eps)
    h.remove()
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("ila")(
        model_name="resnet18", pretrained=False, input_size=64,
        epoch=epoch, feature_layer="layer2")
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.95, f"ILA delta sign agreement {agree:.4f}"


def test_potrip_loop_parity():
    """Po+Trip full targeted trajectory (``advanced_objective/potrip.py:
    69-161``): Poincare-ball distance of the L1-normalized logits to the
    clipped target one-hot, the cosine triplet clamp, TI-smoothed gradient,
    raw momentum.  DI disabled (diversity_prob=0) for determinism."""
    import transferattack_tpu as ta
    from transferattack_tpu.ops import gaussian_kernel

    tmodel, _, surrogate = _fresh_pair(48)
    rng = np.random.RandomState(48)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    tgt = (y + 123) % 1000
    pairs = np.stack([y, tgt], axis=1)
    eps, alpha, decay, epoch = 16 / 255, 2 / 255, 1.0, 15
    lamb, gamma_m = 0.01, 0.007

    kern = torch.from_numpy(gaussian_kernel(5))[None, None].repeat(3, 1, 1, 1)
    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    tt = torch.from_numpy(tgt.astype(np.int64))

    def poincare(a, b):
        l2a = (a**2).sum(1)
        l2b = (b**2).sum(1)
        diff = ((a - b) ** 2).sum(1)
        theta = 2 * diff / ((1 - l2a) * (1 - l2b))
        return torch.acosh(1.0 + theta).mean()

    def cosd(a, b):
        ab = (a * b).sum(1).abs()
        return (ab / (((a**2).sum(1) * (b**2).sum(1)).sqrt() + 1e-8)).mean()

    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    onehot_t = F.one_hot(tt, 1000).float()
    onehot_s = F.one_hot(yt, 1000).float()
    for _ in range(epoch):
        logits = torch_forward(tmodel, xt + delta)
        u = logits / logits.abs().sum(1, keepdim=True)
        v = torch.clamp(onehot_t - 1e-5, 0.0, 1.0)
        loss_po = poincare(u, v)
        loss_trip = torch.clamp(
            cosd(onehot_s, logits) - cosd(onehot_t, logits) + gamma_m,
            min=0.0, max=2.1)
        loss = -(loss_po + lamb * loss_trip)
        grad = torch.autograd.grad(loss, delta)[0]
        g = F.conv2d(grad.permute(0, 3, 1, 2), kern, padding=2, groups=3)
        grad = g.permute(0, 2, 3, 1)
        momentum = grad + decay * momentum
        delta = _box_step(xt, delta, momentum.sign(), alpha, eps)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("potrip")(
        model_name="resnet18", pretrained=False, input_size=64,
        epoch=epoch, diversity_prob=0.0, targeted=True)
    atk.model = surrogate
    ours = np.asarray(atk(x, pairs))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.97, f"Po+Trip delta sign agreement {agree:.4f}"


def test_svre_single_member_loop_parity():
    """SVRE full trajectory (``ensemble/svre.py:42-95``) with a single-member
    ensemble: np.random.randint(1) is always 0, so the member pick is
    deterministic and the inner control-variate momentum chain (M=4K inner
    MI steps at beta=alpha, outer momentum fed by the final inner_G) is the
    system under test.  gm collapses to inner_k_grad since the one-member
    ensemble gradient equals the member gradient."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(49)
    rng = np.random.RandomState(49)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, epoch, M = 16 / 255, 1.6 / 255, 1.0, 6, 4

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        loss = F.cross_entropy(torch_forward(tmodel, xt + delta), yt)
        grad = torch.autograd.grad(loss, delta)[0]
        inner_delta = delta.detach().clone().requires_grad_(True)
        inner_G = torch.zeros_like(xt)
        for _ in range(M):
            l1 = F.cross_entropy(torch_forward(tmodel, xt + inner_delta), yt)
            inner_k_grad = torch.autograd.grad(l1, inner_delta)[0]
            l2 = F.cross_entropy(torch_forward(tmodel, xt + delta), yt)
            adv_k_grad = torch.autograd.grad(l2, delta)[0]
            gm = inner_k_grad - (adv_k_grad - grad)
            inner_G = decay * inner_G + _mi_normalize(gm)
            inner_delta = _box_step(
                xt, inner_delta, inner_G.sign(), alpha, eps)
        momentum = decay * momentum + _mi_normalize(inner_G)
        delta = _box_step(xt, delta, momentum.sign(), alpha, eps)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("svre")(
        model_name=["resnet18"], pretrained=False, input_size=64, epoch=epoch)
    atk.model.variables = {
        "params": {"members_0": surrogate.variables["params"]},
        "batch_stats": {"members_0": surrogate.variables["batch_stats"]},
    }
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.97, f"SVRE delta sign agreement {agree:.4f}"


def test_iefgsm_anticipatory_loop_parity():
    """IE-FGSM full trajectory (``gradient/iefgsm.py:36-91``): momentum
    accumulates the average of the L1-normalized present gradient and the
    gradient at the anticipatory point x+delta+alpha*g_p.  Deterministic."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(34)
    rng = np.random.RandomState(34)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, epoch = 16 / 255, 1.6 / 255, 1.0, 10

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        loss = tnn.functional.cross_entropy(torch_forward(tmodel, xt + delta), yt)
        g_p = _mi_normalize(torch.autograd.grad(loss, delta)[0])
        loss = tnn.functional.cross_entropy(
            torch_forward(tmodel, xt + delta + alpha * g_p.detach()), yt)
        g_a = _mi_normalize(torch.autograd.grad(loss, delta)[0])
        momentum = decay * momentum + (g_p + g_a) / 2
        d = torch.clamp(delta.data + alpha * momentum.sign(), -eps, eps)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("iefgsm")(
        model_name="resnet18", pretrained=False, input_size=64, epoch=epoch)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"IE-FGSM delta sign agreement {agree:.4f}"


def test_gnp_penalty_loop_parity():
    """GNP full trajectory (``gradient/gnp.py:42-93``): fused
    (1+beta)*g1 + beta*g2 with g2 at the r=0.01 lookahead point, MI
    momentum.  Deterministic."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(35)
    rng = np.random.RandomState(35)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, epoch = 16 / 255, 1.6 / 255, 1.0, 10
    r, beta = 0.01, 0.8

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        loss = tnn.functional.cross_entropy(torch_forward(tmodel, xt + delta), yt)
        g1 = torch.autograd.grad(loss, delta)[0]
        g_p = _mi_normalize(g1)
        loss = tnn.functional.cross_entropy(
            torch_forward(tmodel, xt + delta + r * g_p.detach()), yt)
        g2 = torch.autograd.grad(loss, delta)[0]
        gt = (1 + beta) * g1 + beta * g2
        momentum = decay * momentum + _mi_normalize(gt)
        d = torch.clamp(delta.data + alpha * momentum.sign(), -eps, eps)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("gnp")(
        model_name="resnet18", pretrained=False, input_size=64, epoch=epoch)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"GNP delta sign agreement {agree:.4f}"


def test_pcifgsm_corrector_loop_parity():
    """PC-I-FGSM full trajectory (``gradient/pcifgsm.py:30-86``): predictor
    gradient globally L1-normalized into g_pre, K=1 corrector at
    x+delta+delta_pre whose inner example steps a FULL eps, outer MI
    momentum on g_pre.  Deterministic."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(36)
    rng = np.random.RandomState(36)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, epoch, K = 16 / 255, 1.6 / 255, 1.0, 10, 1

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        delta_pre = torch.zeros_like(xt, requires_grad=True)
        loss = tnn.functional.cross_entropy(torch_forward(tmodel, xt + delta), yt)
        grad = torch.autograd.grad(loss, delta)[0]
        g_pre = grad / grad.abs().sum()
        for _ in range(K):
            loss = tnn.functional.cross_entropy(
                torch_forward(tmodel, xt + delta + delta_pre), yt)
            g = torch.autograd.grad(loss, delta_pre)[0]
            g_pre = decay * g_pre + g / (K * g.abs().sum())
            d = torch.clamp(delta_pre.data + eps * g.sign(), -eps, eps)
            delta_pre = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
        momentum = decay * momentum + _mi_normalize(g_pre)
        d = torch.clamp(delta.data + alpha * momentum.sign(), -eps, eps)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("pcifgsm")(
        model_name="resnet18", pretrained=False, input_size=64, epoch=epoch)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"PC-I-FGSM delta sign agreement {agree:.4f}"


def test_ifgssm_staircase_loop_parity():
    """I-FGS^2M full trajectory (``gradient/ifgssm.py:32-86``): the
    per-(image,channel) percentile staircase sign (64 bins at k=1.5625,
    'lower' quantiles) replacing sign(momentum), decay=0.  Deterministic;
    pins the vectorized bin search against the reference's threshold
    loop."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(37)
    rng = np.random.RandomState(37)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, epoch, k = 16 / 255, 1.6 / 255, 10, 1.5625

    def ssign(noise):
        N, H, W, C = noise.shape
        out = torch.zeros_like(noise)
        sign = torch.sign(noise)
        temp = noise.clone()
        abs_n = noise.abs()
        base = k / 100
        flat = abs_n.permute(0, 3, 1, 2).reshape(-1, H * W)
        medium = []
        for q in np.arange(k, 100.1, k):
            m = torch.quantile(flat, q=float(q / 100), dim=1, keepdim=True,
                               interpolation="lower")
            medium.append(m.reshape(N, C, 1, 1).permute(0, 2, 3, 1))
        for j, m in enumerate(medium):
            upd = sign * (temp.abs() <= m).float() * (base + 2 * base * j)
            out += upd
            temp = temp + upd * 1e5
        return out

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    for _ in range(epoch):
        loss = tnn.functional.cross_entropy(torch_forward(tmodel, xt + delta), yt)
        grad = torch.autograd.grad(loss, delta)[0]
        momentum = _mi_normalize(grad)  # decay=0
        d = torch.clamp(delta.data + alpha * ssign(momentum), -eps, eps)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("ifgssm")(
        model_name="resnet18", pretrained=False, input_size=64, epoch=epoch)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"I-FGSSM delta sign agreement {agree:.4f}"
    # the staircase must produce graded magnitudes, not a pure ±eps pattern
    interior = (np.abs(ours) > 1e-6) & (np.abs(np.abs(ours) - eps) > 1e-4)
    assert interior.mean() > 0.05
