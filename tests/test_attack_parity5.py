"""Loop-level parity twins, stage 5: ANDA's cross-iteration online gradient
statistics, RAP's late-start inner maximization, and Logit_Margin's
per-sample margin-downscaled cross-entropy.

Stochastic elements are pinned the same way as stages 2-4: ANDA's view grid
is deterministic (sample=False drops the covariance draw); RAP's inner
uniform init is zeroed on both sides (``inner_random_start=False`` mirrors
``init_n_rap(random_start=False)``); Logit_Margin runs with DI off
(diversity_prob=0).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tests.test_attack_parity import _fresh_pair, torch_forward  # noqa: E402


def test_anda_online_stats_loop_parity():
    """ANDA full trajectory (``gradient/anda.py:99-141``): per-iteration
    gradients of all n_ens translated views (affine_grid/grid_sample in the
    reference, ``translate_scalar`` here) folded into the running first
    moment mean*n/(n+bs) + Σgrad/(n+bs), stepping on sign(mean) with no
    momentum.  batchsize=1 as the reference requires."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(61)
    rng = np.random.RandomState(61)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (1,)).astype(np.int32)
    eps, alpha, epoch, n_ens, aug_max = 16 / 255, 1.6 / 255, 6, 9, 0.3

    n = int(np.sqrt(n_ens))
    r = torch.linspace(-aug_max, aug_max, n)
    thetas = torch.stack([
        torch.tensor([[1.0, 0.0, float(i)], [0.0, 1.0, float(j)]])
        for i in r for j in r
    ])  # (n_ens, 2, 3)

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    adv = xt.clone()
    mean = torch.zeros_like(xt)
    count = 0
    for _ in range(epoch):
        batch = adv.repeat(n_ens, 1, 1, 1).requires_grad_(True)
        nchw = batch.permute(0, 3, 1, 2)
        grids = F.affine_grid(thetas, nchw.size(), align_corners=False)
        aug = F.grid_sample(nchw, grids, align_corners=False)
        logits = torch_forward(tmodel, aug.permute(0, 2, 3, 1))
        loss = F.cross_entropy(logits, yt.repeat(n_ens), reduction="sum")
        grad = torch.autograd.grad(loss, batch)[0]  # (n_ens, H, W, C)
        mean = mean * count / (count + n_ens) \
            + grad.sum(dim=0, keepdim=True) / (count + n_ens)
        count += n_ens
        adv = torch.clamp(adv + alpha * mean.sign(), 0, 1)
        adv = torch.max(torch.min(adv, xt + eps), xt - eps)
    ref = (adv - xt).numpy()

    atk = ta.load_attack_class("anda")(
        model_name="resnet18", pretrained=False, input_size=64,
        epoch=epoch, n_ens=n_ens, aug_max=aug_max)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"ANDA delta sign agreement {agree:.4f}"


def test_rap_late_start_inner_loop_parity():
    """RAP full trajectory (``gradient/rap.py:107-140``): before transpoint a
    plain MI step; from transpoint each iteration first runs adv_steps inner
    sign-descent steps of the attack loss on a reverse perturbation n_rap
    (clamped to ±epsilon_n and the image box around x+delta), then takes the
    outer MI step at x+delta+n_rap.  Inner init zeroed on both sides."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(62)
    rng = np.random.RandomState(62)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, epoch = 16 / 255, 2 / 255, 1.0, 5
    eps_n, alpha_n, adv_steps, transpoint = 16 / 255, 2 / 255, 3, 2

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt)
    momentum = torch.zeros_like(xt)
    n_rap = torch.zeros_like(xt)
    for it in range(epoch):
        if it >= transpoint:
            point = xt + delta
            n_rap = torch.zeros_like(xt)
            for _ in range(adv_steps):
                n = n_rap.clone().requires_grad_(True)
                logits = torch_forward(tmodel, point + n)
                loss = -F.cross_entropy(logits, yt)
                g = torch.autograd.grad(loss, n)[0]
                n_rap = torch.clamp(n_rap + alpha_n * g.sign(), -eps_n, eps_n)
                n_rap = torch.clamp(point + n_rap, 0, 1) - point
        d = delta.clone().requires_grad_(True)
        logits = torch_forward(tmodel, xt + d + n_rap)
        loss = F.cross_entropy(logits, yt)
        grad = torch.autograd.grad(loss, d)[0]
        momentum = grad / grad.abs().mean(dim=(1, 2, 3), keepdim=True) \
            + decay * momentum
        delta = torch.clamp(delta + alpha * momentum.sign(), -eps, eps)
        delta = torch.clamp(xt + delta, 0, 1) - xt
    ref = delta.numpy()

    atk = ta.load_attack_class("rap")(
        model_name="resnet18", pretrained=False, input_size=64,
        epoch=epoch, transpoint=transpoint, adv_steps=adv_steps,
        epsilon_n=eps_n, alpha_n=alpha_n, inner_random_start=False)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"RAP delta sign agreement {agree:.4f}"


def test_admix_self_mix_loop_parity():
    """Admix full trajectory (``input_transformation/admix.py:33-43``) at
    batchsize=1, where the shuffled-batch mix partner is the image itself —
    the only stochastic element collapses and the num_scale×num_admix copy
    grid (mix detached, scales 1/2^i differentiable) is exactly pinned."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(66)
    rng = np.random.RandomState(66)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (1,)).astype(np.int32)
    eps, alpha, decay, epoch = 16 / 255, 1.6 / 255, 1.0, 8
    num_scale, num_admix, strength = 3, 2, 0.2

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        xadv = xt + delta
        admix = torch.cat(
            [xadv + strength * xadv.detach() for _ in range(num_admix)], 0)
        copies = torch.cat([admix / 2 ** i for i in range(num_scale)], 0)
        logits = torch_forward(tmodel, copies)
        loss = F.cross_entropy(logits, yt.repeat(num_scale * num_admix))
        grad = torch.autograd.grad(loss, delta)[0]
        momentum = grad / grad.abs().mean(dim=(1, 2, 3), keepdim=True) \
            + decay * momentum
        d = torch.clamp(delta.data + alpha * momentum.sign(), -eps, eps)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("admix")(
        model_name="resnet18", pretrained=False, input_size=64,
        epoch=epoch, num_scale=num_scale, num_admix=num_admix)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"Admix delta sign agreement {agree:.4f}"


def test_ilpd_tap_mix_loop_parity():
    """ILPD full trajectory (``advanced_objective/ilpd.py:34-76``): every
    iteration re-records the clean feature at the tapped block (σ=0 pins the
    reference's σ-noised clean pass), then the live feature is replaced by
    γ·f + (1−γ)·clean inside an MI-FGSM loop at alpha=1/255."""
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(64)
    rng = np.random.RandomState(64)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, epoch, coef = 16 / 255, 1 / 255, 1.0, 8, 0.1

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()

    captured = {}
    hk = tmodel.layer2[1].register_forward_hook(
        lambda m, i, o: captured.__setitem__("feat", o))
    with torch.no_grad():
        torch_forward(tmodel, xt)  # sigma=0: clean pass, no noise
        clean = captured["feat"].detach()
    hk.remove()

    mix = tmodel.layer2[1].register_forward_hook(
        lambda m, i, o: coef * o + (1 - coef) * clean)
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        logits = torch_forward(tmodel, xt + delta)
        loss = F.cross_entropy(logits, yt)
        grad = torch.autograd.grad(loss, delta)[0]
        momentum = grad / grad.abs().mean(dim=(1, 2, 3), keepdim=True) \
            + decay * momentum
        d = torch.clamp(delta.data + alpha * momentum.sign(), -eps, eps)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    mix.remove()
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("ilpd")(
        model_name="resnet18", pretrained=False, input_size=64,
        epoch=epoch, sigma=0.0, coef=coef, feature_layer="layer2.1")
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"ILPD delta sign agreement {agree:.4f}"


def test_aa_anchor_distance_loop_parity(tmp_path):
    """AA full targeted trajectory (``advanced_objective/aa.py:68-118``):
    record the layer-tap feature of the target-class anchor images once
    (no grad), then MI-ascend −mean‖f(anchor)−f(x+δ)‖₂ at alpha=2/255.
    Both sides consume the same anchor batch (the repo's host-side loader
    provides it)."""
    import transferattack_tpu as ta
    from tests.make_fake_data import make_fake_dataset

    tmodel, _, surrogate = _fresh_pair(65)
    rng = np.random.RandomState(65)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, epoch = 16 / 255, 2 / 255, 1.0, 10

    root = make_fake_dataset(str(tmp_path), n=6, size=64, num_classes=1000,
                             targeted=True, seed=65)
    import csv
    with open(f"{root}/labels.csv") as f:
        rows = list(csv.reader(f))[1:]
    tgt = np.asarray([int(r[1]) - 1 for r in rows[:2]], np.int32)
    pairs = np.stack([y, tgt], axis=1)

    atk = ta.load_attack_class("aa")(
        model_name="resnet18", pretrained=False, input_size=64,
        input_dir=root, layer_name="layer2", epoch=epoch, targeted=True)
    atk.model = surrogate
    anchors = atk._anchor_batch(tgt)  # identical anchor pixels on both sides

    captured = {}
    hk = tmodel.layer2.register_forward_hook(
        lambda m, i, o: captured.__setitem__("feat", o))
    with torch.no_grad():
        # the wrapped model's preprocess bilinear-resizes the 224 anchor
        # images to the 64 input resolution (models/__init__.py:72-78);
        # jax.image.resize antialiases on downscale where torch interpolate
        # does not, so hand torch the repo-resized pixels — the twin pins
        # the attack loop, not the resize kernel
        import jax
        a = np.asarray(jax.image.resize(
            anchors, (anchors.shape[0], 64, 64, 3), method="bilinear"))
        torch_forward(tmodel, torch.from_numpy(a))
        mid_t = captured["feat"].detach()

    xt = torch.from_numpy(x)
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        torch_forward(tmodel, xt + delta)
        diff = (mid_t - captured["feat"]).reshape(x.shape[0], -1)
        loss = -diff.norm(p=2, dim=1).mean()  # targeted: ascend −distance
        grad = torch.autograd.grad(loss, delta)[0]
        momentum = grad / grad.abs().mean(dim=(1, 2, 3), keepdim=True) \
            + decay * momentum
        d = torch.clamp(delta.data + alpha * momentum.sign(), -eps, eps)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    hk.remove()
    ref = delta.detach().numpy()

    ours = np.asarray(atk(x, pairs))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"AA delta sign agreement {agree:.4f}"


def test_mup_taylor_prune_loop_parity():
    """MUP trajectory + mask parity (``model_related/mup.py:38-130``): each
    iteration a weight-gradient pass scores every Conv2d kernel by |w·g|,
    masks the weights at or below the int(numel·p)-th order statistic, and
    the MI input gradient is taken on the pruned model (weights restored
    afterwards — the reference rebuilds ``nn.Parameter``s in both
    ``restore_weight`` and ``prune_from_mask``, ``mup.py:118-130``, so conv
    ``.grad``s are fresh each iteration, never accumulated).

    The 15%-order-statistic threshold is a hard discontinuity: past ~3
    iterations, f32 rounding differences between XLA's fused scan and torch
    flip near-threshold weights and the trajectories amplify chaotically
    (sign agreement decays 1.000 → 0.995 → 0.954 at iters 2/3/4 with
    iteration-1 masks still bit-identical across all 11.2M conv weights).
    So this twin pins (a) the iteration-1 pruning masks BIT-EXACTLY across
    all 20 convs — the strongest possible check of the Taylor-score/
    threshold machinery — and (b) the full trajectory at a 3-iteration
    horizon, inside the window where the dynamics are numerically stable."""
    import torch.nn as tnn
    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(67)
    rng = np.random.RandomState(67)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    eps, alpha, decay, epoch, ratio = 16 / 255, 2 / 255, 1.0, 3, 0.15

    convs = [m for m in tmodel.modules() if isinstance(m, tnn.Conv2d)]
    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    torch_masks = []
    for it in range(epoch):
        logits = torch_forward(tmodel, xt + delta)
        loss1 = F.cross_entropy(logits, yt)
        wgrads = torch.autograd.grad(loss1, [m.weight for m in convs])
        orig = [m.weight.data.clone() for m in convs]
        for m, g in zip(convs, wgrads):
            scores = (m.weight.data * g).abs()
            flat, _ = scores.view(-1).sort()
            thr = flat[int(flat.numel() * ratio)]
            mask = (scores > thr).float()
            if it == 0:
                torch_masks.append(mask.numpy())
            m.weight.data = m.weight.data * mask
        logits = torch_forward(tmodel, xt + delta)
        loss = F.cross_entropy(logits, yt)
        grad = torch.autograd.grad(loss, delta)[0]
        for m, w in zip(convs, orig):
            m.weight.data = w
        momentum = grad / grad.abs().mean(dim=(1, 2, 3), keepdim=True) \
            + decay * momentum
        d = torch.clamp(delta.data + alpha * momentum.sign(), -eps, eps)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("mup")(
        model_name="resnet18", pretrained=False, input_size=64,
        epoch=epoch, mask_ratio=ratio)
    atk.model = surrogate

    # (a) iteration-1 pruning masks bit-match torch across every conv
    import jax
    import jax.numpy as jnp
    from transferattack_tpu.attack import AttackState

    xj, yj = jnp.asarray(x), jnp.asarray(y)
    state0 = AttackState(delta=jnp.zeros_like(xj), momentum=jnp.zeros_like(xj),
                         key=jax.random.PRNGKey(0), step=jnp.asarray(0),
                         extra={})
    pruned = atk._pruned_variables(surrogate.variables, xj, yj, state0, None)

    def _kernels(params, out, path=()):
        for k in sorted(params):
            v = params[k]
            if isinstance(v, dict):
                _kernels(v, out, path + (k,))
            elif getattr(v, "ndim", 0) == 4 and k == "kernel":
                out.append((path + (k,), np.asarray(v)))
        return out

    jax_kernels = dict(_kernels(pruned["params"], []))
    orig_kernels = dict(_kernels(surrogate.variables["params"], []))
    # align by shape multiset: every torch conv mask must bit-match the
    # pruned/unpruned pattern of the Flax kernel with the same OIHW→HWIO shape
    jax_masks = {p: (k != 0).astype(np.float32) for p, k in jax_kernels.items()}
    used = set()
    for tm in torch_masks:
        tmx = np.transpose(tm, (2, 3, 1, 0))  # OIHW → HWIO
        hit = None
        for p, jm in jax_masks.items():
            if p not in used and jm.shape == tmx.shape and (jm == tmx).all():
                hit = p
                break
        assert hit is not None, f"no bit-matching Flax mask for conv {tm.shape}"
        used.add(hit)
    assert len(orig_kernels) == len(torch_masks) == 20

    # (b) 3-iteration trajectory inside the numerically stable window
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"MUP delta sign agreement {agree:.4f}"


def test_logit_margin_loop_parity():
    """Logit_Margin targeted trajectory (``advanced_objective/
    logit_margin.py:105-118,125-147``), 20-iter abbreviation of T=300:
    logits downscaled per-sample by the detached top1−top2 margin, CE toward
    the target, TI-smoothed gradient, raw momentum.  DI off for
    determinism."""
    import transferattack_tpu as ta
    from transferattack_tpu.ops import gaussian_kernel

    tmodel, _, surrogate = _fresh_pair(63)
    rng = np.random.RandomState(63)
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
        value, _ = torch.sort(logits, dim=1, descending=True)
        scaled = logits / (value[:, 0] - value[:, 1]).detach().unsqueeze(1)
        loss = -F.cross_entropy(scaled, tt)  # targeted: ascend −CE
        grad = torch.autograd.grad(loss, delta)[0]
        g = F.conv2d(grad.permute(0, 3, 1, 2), kern, padding="same", groups=3)
        grad = g.permute(0, 2, 3, 1)
        momentum = grad + decay * momentum
        d = torch.clamp(delta.data + alpha * momentum.sign(), -eps, eps)
        delta = (torch.clamp(xt + d, 0, 1) - xt).requires_grad_(True)
    ref = delta.detach().numpy()

    atk = ta.load_attack_class("logit_margin")(
        model_name="resnet18", pretrained=False, input_size=64,
        epoch=epoch, diversity_prob=0.0, kernel_size=5, targeted=True)
    atk.model = surrogate
    ours = np.asarray(atk(x, pairs))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"Logit_Margin delta sign agreement {agree:.4f}"
