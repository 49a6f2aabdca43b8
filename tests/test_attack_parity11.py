"""Loop-level parity twins, stage 11: feature-space surrogate diversity.

DHF's per-iteration benign-feature mixup gated by the previous iteration's
correctness indicator (``model_related/dhf.py:61-93`` +
``dhf_networks/utils.py:6-51``), SAPR's attention-input token permutation
(``sapr.py:36-68``), FDAP's ln_2-output feature-diversity objective
(``fdap.py:40-74``), and MFAA's layer-attention-guidance chain
(``mfaa.py:127-245``).  Random draws are paired through seams
(``mixup_uniform``/``keep_uniform``/``token_perm``/``drop_mask``) with
pre-drawn banks, so all run at the deterministic sign-agreement bar.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tests.test_attack_parity import _fresh_pair  # noqa: E402

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)

EPOCH = 10
EPS, ALPHA = 16 / 255, 1.6 / 255
WMAX, KEEP = 0.2, 0.9


def _norm_nchw(x_raw):
    xn = (x_raw - torch.from_numpy(MEAN)) / torch.from_numpy(STD)
    return xn.permute(0, 3, 1, 2)


def torch_dhf_mifgsm(tmodel, x, y, w_banks, k_banks):
    """The reference DHF_MIFGSM loop (``dhf.py:96-160``): benign forward
    stores per-block features (DHF units off, ``utils.py:24-29``); each
    iteration mixes the tapped features of currently-MISclassified images
    with the stored benign ones (elementwise weight ind·U(0,0.2)) and
    collapses random elements to the per-image mean with prob 0.1
    (``dhf_networks/utils.py:31-51``); the correctness indicator comes from
    the previous iteration's logits and starts all-correct."""
    x = torch.from_numpy(x)
    y = torch.from_numpy(y).long()
    B = x.shape[0]

    def forward(x_raw, mixes, ind, it):
        h = tmodel.maxpool(tmodel.relu(tmodel.bn1(tmodel.conv1(
            _norm_nchw(x_raw)))))
        h = tmodel.layer2(tmodel.layer1(h))
        feats = []
        idx = 0
        dhf_on = mixes is not None
        for layer in (tmodel.layer3, tmodel.layer4):
            for blk in layer:
                h = blk(h)
                if dhf_on:
                    iv = ind.view(-1, 1, 1, 1)
                    w = iv * torch.from_numpy(
                        w_banks[idx][it].transpose(0, 3, 1, 2))
                    h = w * mixes[idx] + (1.0 - w) * h
                    mean = h.mean(dim=(1, 2, 3), keepdim=True)
                    kd = torch.from_numpy(
                        k_banks[idx][it].transpose(0, 3, 1, 2))
                    h = torch.where((kd >= KEEP) & (iv > 0), mean, h)
                feats.append(h.detach().clone())
                idx += 1
        return tmodel.fc(tmodel.avgpool(h).flatten(1)), feats

    with torch.no_grad():
        _, mixes = forward(x, None, None, 0)

    delta = torch.zeros_like(x, requires_grad=True)
    momentum = torch.zeros_like(x)
    correct = torch.ones(B)
    for it in range(EPOCH):
        ind = 1.0 - correct
        logits, _ = forward(x + delta, mixes, ind, it)
        correct = (logits.detach().argmax(1) == y).float()
        loss = F.cross_entropy(logits, y)
        grad = torch.autograd.grad(loss, delta)[0]
        momentum = momentum + grad / grad.abs().mean(dim=(1, 2, 3),
                                                     keepdim=True)
        d = torch.clamp(delta.data + ALPHA * momentum.sign(), -EPS, EPS)
        delta = torch.clamp(x + d, 0, 1) - x
        delta.requires_grad_(True)
    return delta.detach().numpy()


def test_dhf_mifgsm_loop_parity():
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(seed=23)
    rng = np.random.RandomState(9)
    B = 2
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)

    # per-module NHWC banks matching resnet18@64 feature shapes; stage order
    # layer3_0, layer3_1, layer4_0, layer4_1 (= _default_dhf_blocks)
    shapes = [(B, 4, 4, 256), (B, 4, 4, 256), (B, 2, 2, 512), (B, 2, 2, 512)]
    w_banks = [rng.uniform(0, WMAX, (EPOCH,) + s).astype(np.float32)
               for s in shapes]
    k_banks = [rng.rand(EPOCH, *s).astype(np.float32) for s in shapes]

    ref = torch_dhf_mifgsm(tmodel, x, y, w_banks, k_banks)

    DHF = ta.load_attack_class("dhf")

    class PairedDHF(DHF):
        def mixup_uniform(self, key, shape, dtype, step, i):
            return jnp.asarray(w_banks[i])[step].astype(dtype)

        def keep_uniform(self, key, shape, step, i):
            return jnp.asarray(k_banks[i])[step]

    atk = PairedDHF(model_name="resnet18", pretrained=False, input_size=64,
                    epoch=EPOCH)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"DHF delta sign agreement {agree:.4f}"


# -------------------------------------------------------------- SAPR / FDAP
def _tiny_vit_pair(depth=4, seed=31):
    import jax
    import jax.numpy as jnp

    from tests.test_surgery_parity import TViT, _convert
    from transferattack_tpu.models import Surrogate, WrappedModel
    from transferattack_tpu.models.vit import VisionTransformer

    torch.manual_seed(seed)
    tmodel = TViT(dim=64, depth=depth, heads=2).eval()
    backbone = VisionTransformer(patch_size=16, dim=64, depth=depth,
                                 num_heads=2)
    module = WrappedModel(backbone=backbone, size=32,
                          mean=tuple(MEAN), std=tuple(STD))
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    surrogate = Surrogate(name="tiny_vit", module=module,
                          variables=variables, input_size=32)
    return tmodel, _convert(tmodel, surrogate)


def torch_sapr(tmodel, x, y, perms, epoch=EPOCH):
    """The reference SAPR loop (``sapr.py:36-68``): a forward *pre*-hook on
    every Attention permutes the non-cls tokens of its input (one shared
    permutation over the batch).  Paired draws: permutation fixed per block,
    always applied."""
    x = torch.from_numpy(x)
    y = torch.from_numpy(y).long()
    hooks = []
    for b, blk in enumerate(tmodel.blocks):
        def pre(module, inp, b=b):
            idx = torch.from_numpy(
                np.concatenate([[0], perms[b]]).astype(np.int64))
            return (inp[0][:, idx],)

        hooks.append(blk.attn.register_forward_pre_hook(pre))

    delta = torch.zeros_like(x, requires_grad=True)
    momentum = torch.zeros_like(x)
    for _ in range(epoch):
        loss = F.cross_entropy(tmodel(_norm_nchw(x + delta)), y)
        grad = torch.autograd.grad(loss, delta)[0]
        momentum = momentum + grad / grad.abs().mean(dim=(1, 2, 3),
                                                     keepdim=True)
        d = torch.clamp(delta.data + ALPHA * momentum.sign(), -EPS, EPS)
        delta = torch.clamp(x + d, 0, 1) - x
        delta.requires_grad_(True)
    for h in hooks:
        h.remove()
    return delta.detach().numpy()


def test_sapr_token_permutation_loop_parity():
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, surrogate = _tiny_vit_pair(seed=31)
    rng = np.random.RandomState(17)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    perms = [rng.permutation(4) + 1 for _ in range(4)]  # N=5 tokens

    ref = torch_sapr(tmodel, x, y, perms)

    SAPR = ta.load_attack_class("sapr")

    class PairedSAPR(SAPR):
        def token_perm(self, rng_, n_tokens, block):
            return jnp.asarray(perms[block]), jnp.asarray(True)

    atk = PairedSAPR(model_name=surrogate, epoch=EPOCH)
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"SAPR delta sign agreement {agree:.4f}"


def torch_fdap(tmodel, x, y, blocks=(1, 2), beta=2.0, gamma=0.1,
               epoch=EPOCH, alpha=3 / 255):
    """The reference FDAP loop (``fdap.py:40-74``): forward hooks record the
    ln_2 OUTPUTS of the tapped blocks; loss = CE − γ·Σ mean(log‖f−f̄‖_F^per-
    sample)^β, straight MI-FGSM updates at alpha=3/255."""
    x = torch.from_numpy(x)
    y = torch.from_numpy(y).long()
    feats = {}
    hooks = []
    for b in blocks:
        def hook(module, inp, out, b=b):
            feats[b] = out

        hooks.append(tmodel.blocks[b].norm2.register_forward_hook(hook))

    delta = torch.zeros_like(x, requires_grad=True)
    momentum = torch.zeros_like(x)
    for _ in range(epoch):
        feats.clear()
        logits = tmodel(_norm_nchw(x + delta))
        loss_div = 0.0
        for b in blocks:
            f = feats[b]
            res = f - f.mean(dim=1, keepdim=True)
            r = res.reshape(f.shape[0], -1).norm(p=2, dim=1) + 1e-8
            loss_div = loss_div + torch.log(r).pow(beta).mean()
        loss = F.cross_entropy(logits, y) - gamma * loss_div
        grad = torch.autograd.grad(loss, delta)[0]
        momentum = momentum + grad / grad.abs().mean(dim=(1, 2, 3),
                                                     keepdim=True)
        d = torch.clamp(delta.data + alpha * momentum.sign(), -EPS, EPS)
        delta = torch.clamp(x + d, 0, 1) - x
        delta.requires_grad_(True)
    for h in hooks:
        h.remove()
    return delta.detach().numpy()


def test_fdap_feature_diversity_loop_parity():
    import transferattack_tpu as ta

    tmodel, surrogate = _tiny_vit_pair(seed=37)
    rng = np.random.RandomState(19)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)

    ref = torch_fdap(tmodel, x, y)
    atk = ta.load_attack_class("fdap")(model_name=surrogate, epoch=EPOCH,
                                       blocks=(1, 2))
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"FDAP delta sign agreement {agree:.4f}"


# --------------------------------------------------------------------- MFAA
def torch_mfaa(tmodel, x, y, masks, num_ens, epoch=EPOCH, alpha=ALPHA):
    """The reference MFAA loop (``advanced_objective/mfaa.py:127-245``):
    guidance = −normalize(mean true-logit feature grads under shared input
    drop masks) at 5 taps; per iteration the LAG chain propagates normalized
    adv-half feature grads + guidance from layer4 down to layer2, forward on
    concat(clean, adv) (the clean half only feeds the numel divisor)."""
    x = torch.from_numpy(x)
    y = torch.from_numpy(y).long()
    B = x.shape[0]
    taps = [tmodel.layer4[-1], tmodel.layer3[-1], tmodel.layer3[-3],
            tmodel.layer3[-5], tmodel.layer2[-1]]
    names = ["L4", "L3a", "L3b", "L3c", "L2"]
    outs = {}

    def mk(n):
        def hook(m, i, o):
            outs[n] = o
        return hook

    hooks = [mod.register_forward_hook(mk(n)) for n, mod in zip(names, taps)]

    def norm_ps(t):
        v = t.reshape(t.shape[0], -1)
        n = torch.sqrt((v * v).sum(dim=1, keepdim=True) + 1e-12)
        return (v / n).reshape(t.shape)

    # ---- guidance on clean ----
    acc = {n: 0.0 for n in names}
    for e in range(num_ens):
        m = torch.from_numpy(masks[e].transpose(0, 3, 1, 2))
        x_in = (x.clone().permute(0, 3, 1, 2) * m).detach()
        x_in.requires_grad_(True)
        x_cat = torch.cat([x_in, x_in], dim=0)
        xn = (x_cat - torch.from_numpy(MEAN.reshape(1, 3, 1, 1))) / \
            torch.from_numpy(STD.reshape(1, 3, 1, 1))
        logits = tmodel(xn)
        y_cat = torch.cat([y, y], dim=0)
        oh = torch.zeros_like(logits)
        oh.scatter_(1, y_cat.view(-1, 1), 1)
        chosen = (logits * oh).sum()
        for n in names:
            g = torch.autograd.grad(chosen, outs[n], retain_graph=True)[0]
            acc[n] = acc[n] + g[B:].detach()
    guid = {n: -norm_ps(acc[n] / num_ens) for n in names}

    # ---- LAG chain loop ----
    delta = torch.zeros_like(x.permute(0, 3, 1, 2))
    momentum = torch.zeros_like(delta)
    x_nchw = x.permute(0, 3, 1, 2)
    for _ in range(epoch):
        x_adv = (x_nchw + delta).detach()
        x_adv.requires_grad_(True)
        x_cat = torch.cat([x_nchw.detach(), x_adv], dim=0)
        xn = (x_cat - torch.from_numpy(MEAN.reshape(1, 3, 1, 1))) / \
            torch.from_numpy(STD.reshape(1, 3, 1, 1))
        _ = tmodel(xn)
        f = {n: outs[n] for n in names}

        loss = (f["L4"][B:] * guid["L4"]).sum() / float(f["L4"].numel())
        for prev, nxt in zip(names[:-1], names[1:]):
            g = torch.autograd.grad(loss, f[nxt], retain_graph=True)[0]
            w = norm_ps(g[B:].detach()) + guid[nxt]
            loss = (f[nxt][B:] * w).sum() / float(f[nxt].numel())
        grad = torch.autograd.grad(loss, x_adv)[0]
        momentum = momentum + grad / grad.abs().mean(dim=(1, 2, 3),
                                                     keepdim=True)
        delta = torch.clamp(delta + alpha * momentum.sign(), -EPS, EPS)
        delta = torch.clamp(x_nchw + delta, 0, 1) - x_nchw
    for h in hooks:
        h.remove()
    return delta.detach().numpy().transpose(0, 2, 3, 1)


def test_mfaa_lag_chain_loop_parity():
    import jax
    import jax.numpy as jnp

    from tests.test_surgery_parity import (TorchBottleneckNet, _convert,
                                           _randomize_bn)
    from transferattack_tpu.models import Surrogate, WrappedModel
    from transferattack_tpu.models.resnet import Bottleneck, ResNet

    import transferattack_tpu as ta

    class TorchBN6(TorchBottleneckNet):
        STAGES = (1, 2, 6, 1)

    torch.manual_seed(41)
    tmodel = TorchBN6().eval()
    _randomize_bn(tmodel)
    backbone = ResNet(stage_sizes=[1, 2, 6, 1], block_cls=Bottleneck)
    module = WrappedModel(backbone=backbone, size=64,
                          mean=tuple(MEAN), std=tuple(STD))
    import jax.numpy as jnp2
    variables = module.init(jax.random.PRNGKey(0), jnp2.zeros((1, 64, 64, 3)))
    surrogate = Surrogate(name="bn6", module=module, variables=variables,
                          input_size=64)
    surrogate = _convert(tmodel, surrogate)

    rng = np.random.RandomState(29)
    B, NUM_ENS = 2, 4
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)
    masks = (rng.rand(NUM_ENS, B, 64, 64, 3) < 0.8).astype(np.float32)

    ref = torch_mfaa(tmodel, x, y, masks, NUM_ENS)

    MFAA = ta.load_attack_class("mfaa")

    class PairedMFAA(MFAA):
        def drop_mask(self, key, xx, i):
            return jnp.asarray(masks)[i]

    atk = PairedMFAA(model_name=surrogate, num_ens=NUM_ENS, epoch=EPOCH)
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"MFAA delta sign agreement {agree:.4f}"
