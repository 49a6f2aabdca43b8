"""Loop-level parity twins, stage 12: the gradient-family tail.

Foolmix's dual-blending + direction update (``gradient/foolmix.py``): the
top-(k+1) misclassification correction built from class-vs-topk logit
gradients, the n pixel-block × m/z scale-level blended/lens gradients, the
p1-norm momentum, and the MI update.  Pixel blocks and random labels are
paired through the ``pixel_blocks``/``other_labels`` seams.  The reference's
chunked mean-CE gradients scale every per-sample gradient by a uniform
constant that the p1-momentum normalization cancels; the twin uses
per-sample gradients (chunk=1 semantics).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tests.test_attack_parity import _fresh_pair  # noqa: E402

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)

EPS, ALPHA = 16 / 255, 1.6 / 255
EPOCH = 6
M, N, Z, K = 3, 2, 1, 3
ZETA, BETA, GAMMA = 0.2, 1.0, 0.1


def _fwd(tmodel, x_raw):
    xn = (x_raw - torch.from_numpy(MEAN)) / torch.from_numpy(STD)
    return tmodel(xn.permute(0, 3, 1, 2))


def _per_sample_grads(tmodel, points, labels):
    """Per-sample CE input grads (= the reference's chunk-free
    ``calculate_gradient_batch``, ``foolmix.py:247-300``)."""
    p = points.clone().detach().requires_grad_(True)
    loss = F.cross_entropy(_fwd(tmodel, p), labels, reduction="sum")
    return torch.autograd.grad(loss, p)[0]


def torch_foolmix(tmodel, x, y, P_bank, L_bank):
    """The reference Foolmix loop (``foolmix.py:69-170``) with the
    direction update (``:302-350``) and dual gradients (``:170-245``)."""
    x = torch.from_numpy(x)
    y = torch.from_numpy(y).long()
    B = x.shape[0]
    delta = torch.zeros_like(x)
    momentum = torch.zeros_like(x)

    for t in range(EPOCH):
        with torch.no_grad():
            logits = _fwd(tmodel, x + delta)
        topk = torch.topk(logits, K + 1, dim=1)[1]
        mis = ~torch.any(topk == y.unsqueeze(1), dim=1)
        for i in range(B):
            if not mis[i]:
                continue
            xi = (x[i:i + 1] + delta[i:i + 1]).clone().detach()
            xi.requires_grad_(True)
            lg = _fwd(tmodel, xi)
            f_topk = lg.gather(1, topk[i:i + 1]).mean(dim=1, keepdim=True)
            omega_topk = torch.autograd.grad(f_topk.sum(), xi)[0]
            xi2 = (x[i:i + 1] + delta[i:i + 1]).clone().detach()
            xi2.requires_grad_(True)
            lg2 = _fwd(tmodel, xi2)
            omega_y = torch.autograd.grad(
                lg2.gather(1, y[i:i + 1].unsqueeze(1)).sum(), xi2)[0]
            xdir = omega_y - omega_topk
            with torch.no_grad():
                lg3 = _fwd(tmodel, x[i:i + 1] + delta[i:i + 1])
            f_y = lg3.gather(1, y[i:i + 1].unsqueeze(1))
            f_tk = lg3.gather(1, topk[i:i + 1]).mean(dim=1, keepdim=True)
            num = torch.abs(f_y - f_tk)
            den = xdir.abs().sum(dim=(1, 2, 3), keepdim=True)
            d_dir = (num.view(-1, 1, 1, 1) / (den + 1e-8)) * torch.sign(xdir)
            d_mean = d_dir.abs().mean()
            delta[i:i + 1] = delta[i:i + 1] - GAMMA * d_dir * (
                ALPHA / (d_mean + 1e-8))

        P = torch.from_numpy(P_bank[t])  # (N, B, H, W, C)
        L = torch.from_numpy(L_bank[t]).long()  # (N, Z, B)
        xadv = x + delta

        g_lens = torch.zeros_like(x)
        for j in range(N):
            for k in range(Z):
                point = (1.0 / 2 ** k) * (xadv + ZETA * P[j])
                g_lens = g_lens + _per_sample_grads(tmodel, point, L[j, k])
        g_lens = g_lens / (N * Z)

        g_mix = torch.zeros_like(x)
        for j in range(N):
            for k in range(M):
                point = (1.0 / 2 ** k) * (xadv + ZETA * P[j])
                g_mix = g_mix + _per_sample_grads(tmodel, point, y) \
                    - BETA * g_lens
        g_mix = g_mix / (N * M)

        g_norm = g_mix.abs().sum(dim=(1, 2, 3), keepdim=True)
        momentum = momentum + g_mix / (g_norm + 1e-8)
        delta = torch.clamp(delta + ALPHA * momentum.sign(), -EPS, EPS)
        delta = torch.clamp(x + delta, 0, 1) - x
    return delta.detach().numpy()


def test_foolmix_dual_blend_loop_parity():
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(seed=43)
    rng = np.random.RandomState(21)
    B = 2
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)
    P_bank = (rng.randn(EPOCH, N, B, 64, 64, 3) * 0.1).astype(np.float32)
    L_bank = rng.randint(0, 1000, (EPOCH, N, Z, B)).astype(np.int32)

    ref = torch_foolmix(tmodel, x, y, P_bank, L_bank)

    FM = ta.load_attack_class("foolmix")

    class PairedFoolmix(FM):
        def pixel_blocks(self, key, xx, step):
            return jnp.asarray(P_bank)[step]

        def other_labels(self, key, batch, step):
            return jnp.asarray(L_bank)[step]

    atk = PairedFoolmix(model_name="resnet18", pretrained=False,
                        input_size=64, epoch=EPOCH, m=M, n=N, z=Z, k=K)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"Foolmix delta sign agreement {agree:.4f}"


# ---------------------------------------------------------------------- L2T
def test_l2t_reinforce_loop_parity():
    """L2T's learning rule (``l2t.py:15-27,464-503``): per iteration,
    num_scale sampled 2-op chains; delta ascends the mean chain loss with MI
    momentum; θ ascends ∂(Σ tp_i·loss_i)/∂θ / num_scale at lr=0.01 with
    tp = Π softmax(θ)[id].  The repo's op vocabulary is a deliberate
    10-class TPU redesign of the reference's 100 batch-expanding ops, so
    the twin pins the REINFORCE/objective math on a paired 3-op bank
    (scale / admix / erosion — banked draws on both sides) and asserts
    both the delta trajectory and the final θ."""
    import jax
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(seed=47)
    rng = np.random.RandomState(23)
    B, EP, NS = 2, 6, 3
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)

    ids_bank = rng.choice([1, 4, 5], size=(EP, NS, 2)).astype(np.int32)
    sim_bank = rng.choice([1.0, 0.5], size=(EP, NS, 2)).astype(np.float32)
    perm_bank = np.stack([rng.permutation(B)
                          for _ in range(EP * NS * 2)]).reshape(
        EP, NS, 2, B).astype(np.int32)
    keep_bank = (rng.rand(EP, NS, 2, B, 64, 64, 3) < 0.9).astype(np.float32)

    # ---- torch side: the reference loop on the banked vocabulary ----
    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    theta = torch.zeros(10, requires_grad=True)
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)

    def apply_chain(pt, e, i):
        for j in range(2):
            op = ids_bank[e, i, j]
            if op == 1:
                pt = pt * float(sim_bank[e, i, j])
            elif op == 4:
                pt = pt + 0.2 * pt[torch.from_numpy(
                    perm_bank[e, i, j]).long()].detach()
            else:
                pt = pt * torch.from_numpy(keep_bank[e, i, j])
        return pt

    for e in range(EP):
        losses, tps = [], []
        for i in range(NS):
            pt = apply_chain(xt + delta, e, i)
            logits = torch_forward_local(tmodel, pt)
            losses.append(F.cross_entropy(logits, yt).reshape(1))
            probs = torch.softmax(theta, dim=0)
            tp = probs[ids_bank[e, i, 0]] * probs[ids_bank[e, i, 1]]
            tps.append(tp)
        loss = torch.sum(torch.cat(losses)) / NS
        grad = torch.autograd.grad(loss, delta, retain_graph=True)[0]
        aug_loss = torch.sum(torch.stack(
            [tps[i] * losses[i].reshape(()) for i in range(NS)])) / NS
        aug_grad = torch.autograd.grad(aug_loss, theta)[0]
        theta = (theta + 0.01 * aug_grad).detach().requires_grad_(True)
        momentum = momentum + grad / grad.abs().mean(dim=(1, 2, 3),
                                                     keepdim=True)
        d = torch.clamp(delta.data + ALPHA * momentum.sign(), -EPS, EPS)
        delta = torch.clamp(xt + d, 0, 1) - xt
        delta.requires_grad_(True)
    ref_delta = delta.detach().numpy()
    ref_theta = theta.detach().numpy()

    # ---- repo side with banked seams ----
    L2T = ta.load_attack_class("l2t")

    class PairedL2T(L2T):
        def sample_ids(self, key, aug_param, step, copy):
            return jnp.asarray(ids_bank)[step, copy]

        def apply_op(self, xx, op_idx, key, step, copy, slot):
            s = jnp.asarray(sim_bank)[step, copy, slot]
            perm = jnp.asarray(perm_bank)[step, copy, slot]
            keep = jnp.asarray(keep_bank)[step, copy, slot]
            sim_r = xx * s
            admix_r = xx + 0.2 * jax.lax.stop_gradient(xx[perm])
            ide_r = xx * keep
            return jnp.where(op_idx == 1, sim_r,
                             jnp.where(op_idx == 4, admix_r, ide_r))

        def finalize(self, state, xx, yy):
            self.final_aug_param = state.extra["aug_param"]
            return super().finalize(state, xx, yy)

    atk = PairedL2T(model_name="resnet18", pretrained=False, input_size=64,
                    epoch=EP, num_scale=NS)
    atk.model = surrogate
    ours = np.asarray(atk.run(surrogate.variables, jnp.asarray(x),
                              jnp.asarray(y), jax.random.PRNGKey(0)))
    agree = (np.sign(ref_delta) == np.sign(ours)).mean()
    assert agree > 0.98, f"L2T delta sign agreement {agree:.4f}"
    np.testing.assert_allclose(np.asarray(atk.final_aug_param), ref_theta,
                               atol=1e-5)


def torch_forward_local(tmodel, x_raw):
    xn = (x_raw - torch.from_numpy(MEAN)) / torch.from_numpy(STD)
    return tmodel(xn.permute(0, 3, 1, 2))
