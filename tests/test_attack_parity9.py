"""Loop-level parity twins, stage 9: the weight/feature-surgery tail.

MetaSSA's frequency-domain meta-train/meta-test loop (with the reference's
LL-dropping custom IDWT — the low-pass is a 2×2 Haar block average), AWT's
SAM weight tuning + PGN-style neighbor gradients, and FAUG's feature-noise
injection at the stem conv.

Stochastic draws are paired through seams with pre-drawn banks, so these
run at the deterministic sign-agreement bar.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tests.test_attack_parity import _fresh_pair  # noqa: E402

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def _mi_norm(g):
    return g / g.abs().mean(dim=(1, 2, 3), keepdim=True)


def _norm_nchw(x_raw):
    xn = (x_raw - torch.from_numpy(MEAN)) / torch.from_numpy(STD)
    return xn.permute(0, 3, 1, 2)


def _blockavg(t):
    """2x2 Haar LL reconstruction (NHWC) — what the reference's custom
    IDWT-without-LL machinery makes ``inputs_ll`` (``metassa.py:542-546``)."""
    B, H, W, C = t.shape
    a = t.reshape(B, H // 2, 2, W // 2, 2, C).mean(dim=(2, 4))
    return a.repeat_interleave(2, dim=1).repeat_interleave(2, dim=2)


def _upto_layer2(tmodel, x_raw):
    h = _norm_nchw(x_raw)
    h = tmodel.maxpool(tmodel.relu(tmodel.bn1(tmodel.conv1(h))))
    return tmodel.layer2(tmodel.layer1(h))


def _head_from_layer2(tmodel, feat):
    h = tmodel.layer4(tmodel.layer3(feat))
    return tmodel.fc(tmodel.avgpool(h).flatten(1))


def test_metassa_meta_train_test_loop_parity():
    """MetaSSA full trajectory (``model_related/metassa.py:55-127``):
    meta-train runs n_sample inner MI steps whose live path is the
    LOW-frequency component of x+delta+gauss (gradient through the
    block-average projection), mixing clean low/high features with weight
    (a, b, 1-a-b) at a chosen stage; meta-test takes l1-normalized
    gradients at each trajectory point on the FULL perturbed input; the
    outer step uses grad_pre_train + (mean test grad + accumulated
    grad_pre_test).  Stage pinned to stage2/layer2; gauss and (a,b) draws
    paired through seams."""
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(91)
    rng = np.random.RandomState(91)
    B, n = 2, 2
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)
    eps, alpha, decay, epoch = 16 / 255, 1.6 / 255, 1.0, 3
    gauss_bank = (rng.randn(epoch, 2, n, B, 64, 64, 3) * eps).astype(np.float32)
    a_bank = rng.uniform(0, 1, (epoch, 2, n)).astype(np.float32)
    b_bank = (rng.uniform(0, 1, (epoch, 2, n)) * (1 - a_bank)).astype(np.float32)

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    lo = _blockavg(xt)
    hi = xt - lo
    with torch.no_grad():
        f_lo = _upto_layer2(tmodel, lo)
        f_hi = _upto_layer2(tmodel, hi)

    def mixed_loss(point, a, b):
        feat = _upto_layer2(tmodel, point)
        mixed = a * f_lo + b * f_hi + (1 - a - b) * feat
        return F.cross_entropy(_head_from_layer2(tmodel, mixed), yt)

    delta = torch.zeros_like(xt)
    grad_pre_train = torch.zeros_like(xt)
    grad_pre_test = torch.zeros_like(xt)
    for e in range(epoch):
        adv_delta = delta.clone()
        traj = []
        for i in range(n):
            d = adv_delta.clone().requires_grad_(True)
            point = _blockavg(xt + d + torch.from_numpy(gauss_bank[e, 0, i]))
            loss = mixed_loss(point, float(a_bank[e, 0, i]),
                              float(b_bank[e, 0, i]))
            g = torch.autograd.grad(loss, d)[0]
            grad_pre_train = decay * grad_pre_train + _mi_norm(g)
            adv_delta = torch.clamp(
                adv_delta + alpha * grad_pre_train.sign(), -eps, eps)
            adv_delta = torch.clamp(xt + adv_delta, 0, 1) - xt
            traj.append(adv_delta.clone())
        test_total = torch.zeros_like(xt)
        for i in range(n):
            d = traj[i].clone().requires_grad_(True)
            point = xt + d + torch.from_numpy(gauss_bank[e, 1, i])
            loss = mixed_loss(point, float(a_bank[e, 1, i]),
                              float(b_bank[e, 1, i]))
            g = torch.autograd.grad(loss, d)[0]
            test_total = test_total + _mi_norm(g)
        grad_mu = test_total / n + grad_pre_test
        grad_pre_test = grad_mu
        delta = torch.clamp(
            delta + alpha * (grad_pre_train + grad_mu).sign(), -eps, eps)
        delta = torch.clamp(xt + delta, 0, 1) - xt
    ref = delta.numpy()

    MetaSSA = ta.load_attack_class("metassa")
    jg = jnp.asarray(gauss_bank)
    ja = jnp.asarray(a_bank)
    jb = jnp.asarray(b_bank)

    class _Fixed(MetaSSA):
        def gauss_draw(self, key, xx, step, i, phase):
            return jg[step, phase, i]

        def mix_coeffs(self, key, step, i, phase):
            # stages() on this zoo = (stage1..stage4); index 1 = stage2
            return ja[step, phase, i], jb[step, phase, i], jnp.asarray(1)

    atk = _Fixed(model_name="resnet18", pretrained=False, input_size=64,
                 epoch=epoch, n_sample=n)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"MetaSSA delta sign agreement {agree:.4f}"


def test_awt_sam_weight_tuning_loop_parity():
    """AWT full trajectory (``model_related/awt.py:67-109`` + ``SAM:111``):
    per iteration a SAM step on the surrogate weights — the ascent grad is
    the ACCUMULATED p.grad (previous iteration's perturbed-point grad is
    never zeroed, plus this closure's adv+clean CE grad), the descent an
    SGD(momentum=0.5) step from the original weights using the
    perturbed-point grad — then num_neighbor zeta-ball samples each taking
    g1 at x_near and g2 at the alpha-descended x_next, fused
    (1-gamma)g1 + gamma·g2 and averaged.

    The SAM loop mutates the torch model in place, and the converted flax
    variables can hold zero-copy views of the same tensors — the torch side
    therefore runs on a deep copy."""
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(92)
    rng = np.random.RandomState(92)
    B, n = 2, 2
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)
    eps, alpha, decay, epoch = 16 / 255, 1.6 / 255, 1.0, 4
    beta, gamma, sam_lr, sam_rho = 3.0, 0.5, 0.002, 0.005
    zeta = beta * eps
    bank = rng.uniform(-zeta, zeta,
                       size=(epoch, n, B, 64, 64, 3)).astype(np.float32)

    import copy

    from tests.test_attack_parity import torch_forward

    tmodel = copy.deepcopy(tmodel)  # SAM mutates weights in place
    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    params = [p for p in tmodel.parameters()]
    bufs = [torch.zeros_like(p) for p in params]
    delta = torch.zeros_like(xt)
    momentum = torch.zeros_like(xt)

    def closure_backward():
        for p in params:
            if p.grad is None:
                p.grad = torch.zeros_like(p)
        loss = (F.cross_entropy(torch_forward(tmodel, xt + delta), yt)
                + F.cross_entropy(torch_forward(tmodel, xt), yt))
        loss.backward()

    def input_grad(point):
        pt = point.clone().detach().requires_grad_(True)
        loss = F.cross_entropy(torch_forward(tmodel, pt), yt)
        return torch.autograd.grad(loss, pt)[0]

    refs = {}
    for it in range(epoch):
        # closure #1: accumulates onto the residue from last iteration
        closure_backward()
        gn = torch.norm(torch.stack([p.grad.norm(p=2) for p in params]), p=2)
        old_p = [p.data.clone() for p in params]
        with torch.no_grad():
            for p in params:
                p.add_(sam_rho * p.grad / (gn + 1e-12))
                p.grad.zero_()
        # closure #2 at the perturbed weights
        closure_backward()
        with torch.no_grad():
            for p, old, buf in zip(params, old_p, bufs):
                p.data = old
                buf.mul_(0.5).add_(p.grad)
                p.data = p.data - sam_lr * buf
        # p.grad left un-zeroed: the residue for the next iteration
        acc = torch.zeros_like(xt)
        for i in range(n):
            x_near = xt + delta + torch.from_numpy(bank[it, i])
            g1 = input_grad(x_near)
            x_next = x_near - alpha * _mi_norm(g1)
            g2 = input_grad(x_next)
            acc = acc + (1 - gamma) * g1 + gamma * g2
        avg = acc / n
        momentum = decay * momentum + _mi_norm(avg)
        delta = torch.clamp(delta + alpha * momentum.sign(), -eps, eps)
        delta = torch.clamp(xt + delta, 0, 1) - xt
        refs[it + 1] = delta.numpy().copy()

    AWT = ta.load_attack_class("awt")
    jbank = jnp.asarray(bank)

    class _Fixed(AWT):
        def neighbor_noise(self, key, xx, state, idx):
            return jbank[state.step, idx]

    def run_ours(n_epoch):
        atk = _Fixed(model_name="resnet18", pretrained=False, input_size=64,
                     epoch=n_epoch, num_neighbor=n, sample_chunk=1)
        atk.model = surrogate
        return np.asarray(atk(x, y))

    # iteration 1 must agree bit-for-sign — pins the SAM update, the
    # residue seeding, and the neighbor fusion exactly
    agree1 = (np.sign(refs[1]) == np.sign(run_ours(1))).mean()
    assert agree1 > 0.999, f"AWT iter-1 delta sign agreement {agree1:.4f}"
    # full horizon at the weight-space drift tolerance
    agree = (np.sign(refs[epoch]) == np.sign(run_ours(epoch))).mean()
    assert agree > 0.95, f"AWT delta sign agreement {agree:.4f}"


def test_faug_feature_noise_loop_parity():
    """FAUG full trajectory (``model_related/faug.py:82-156``): from
    iteration burn_in=1 on, N(0, (0.3·std(feat))²) noise added at the conv1
    output (pre-BN), std computed over the whole live feature tensor and
    detached; alpha=2/255.  Unit draws paired through the seam."""
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(93)
    rng = np.random.RandomState(93)
    B = 2
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)
    eps, alpha, decay, epoch, std1 = 16 / 255, 2 / 255, 1.0, 8, 0.3
    # conv1 output at 64^2 input: (B, 32, 32, 64) NHWC
    bank = rng.randn(epoch, B, 32, 32, 64).astype(np.float32)

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt)
    momentum = torch.zeros_like(xt)
    for it in range(epoch):
        d = delta.clone().requires_grad_(True)
        h = _norm_nchw(xt + d)
        feat = tmodel.conv1(h)
        if it >= 1:
            unit = torch.from_numpy(bank[it]).permute(0, 3, 1, 2)
            feat = feat + (std1 * feat.std().item()) * unit
        h = tmodel.maxpool(tmodel.relu(tmodel.bn1(feat)))
        for li in range(4):
            h = getattr(tmodel, f"layer{li + 1}")(h)
        logits = tmodel.fc(tmodel.avgpool(h).flatten(1))
        loss = F.cross_entropy(logits, yt)
        grad = torch.autograd.grad(loss, d)[0]
        momentum = decay * momentum + _mi_norm(grad)
        delta = torch.clamp(delta + alpha * momentum.sign(), -eps, eps)
        delta = torch.clamp(xt + delta, 0, 1) - xt
    ref = delta.numpy()

    FAUG = ta.load_attack_class("faug")
    jbank = jnp.asarray(bank)

    class _Fixed(FAUG):
        def unit_noise(self, key, shape, dtype, state):
            return jbank[state.step]

    atk = _Fixed(model_name="resnet18", pretrained=False, input_size=64,
                 epoch=epoch)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"FAUG delta sign agreement {agree:.4f}"
