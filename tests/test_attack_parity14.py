"""Loop-level parity twins, stage 14: SETR's TRM head path (the reference
default ``trm=True`` — learned TransformerHeads between every non-final
block and the shared classifier, losses SUMMED), LPM's two device-side
stages (the candidate-scoring inner attack and the final mask-cycling
multi-gradient loop — the GA between them is host-side numpy on both
sides), and DSVA's generator → delta mapping.

References: ``model_related/setr.py`` + ``setr_networks/deit_ensemble.py``,
``input_transformation/lpm.py``, ``generation/dsva.py``.
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from tests.test_attack_parity import _fresh_pair, torch_forward  # noqa: E402
from tests.test_surgery_parity import TViT, _convert  # noqa: E402

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)
EPS, ALPHA = 16 / 255, 1.6 / 255


def _mi_norm(g):
    return g / g.abs().mean(dim=(1, 2, 3), keepdim=True)


def _sign_agree(a, b):
    return (np.sign(a) == np.sign(b)).mean()


# ------------------------------------------------------------------ SETR
class TTRMHead(tnn.Module):
    """``deit_ensemble.py:17-59`` with its double-assignment quirk (ONE
    conv/bn pair applied twice) transcribed literally; the hardcoded
    ``avg_pool2d(·, 14)`` over the 14×14 grid becomes the global patch
    mean (identical at 224; required at toy sizes)."""

    def __init__(self, dim):
        super().__init__()
        self.conv = tnn.Conv2d(dim, dim, 3, stride=1, padding=1, bias=False)
        self.bn = tnn.BatchNorm2d(dim)
        self.token_fc = tnn.Linear(dim, dim)

    def forward(self, x):
        cls_token, patches = x[:, 0], x[:, 1:]
        s = int(math.sqrt(patches.shape[1]))
        p = patches.transpose(1, 2).reshape(x.shape[0], -1, s, s)
        f = F.relu(self.bn(self.conv(p)))
        f = self.bn(self.conv(f))
        f = f + p
        f = F.relu(f)
        pooled = f.mean(dim=(2, 3))
        return pooled + self.token_fc(cls_token)


class THeads(tnn.Module):
    def __init__(self, dim, n):
        super().__init__()
        self.transformerheads = tnn.Sequential(
            *[TTRMHead(dim) for _ in range(n)])


def test_setr_trm_loop_parity():
    """The full SETR trajectory with TRM heads: per iteration, loss =
    CE(head(norm(x_final)[:, 0])) + Σ_{b<depth−1} CE(head(TRM_b(norm(x_b))))
    — summed, not averaged (``setr.py:62-73``, hierarchical forward
    ``deit_ensemble.py:75-101``)."""
    import jax
    import jax.numpy as jnp

    import transferattack_tpu as ta
    from transferattack_tpu.models import Surrogate, WrappedModel
    from transferattack_tpu.models.vit import VisionTransformer
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    DEPTH, B, epoch = 4, 2, 8
    torch.manual_seed(141)
    tmodel = TViT(dim=64, depth=DEPTH, heads=2).eval()
    theads = THeads(64, DEPTH - 1).eval()
    with torch.no_grad():
        for m in theads.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
            if isinstance(m, (tnn.Conv2d, tnn.Linear)):
                m.weight.normal_(0, 0.1)
                if m.bias is not None:
                    m.bias.normal_(0, 0.02)

    backbone = VisionTransformer(patch_size=16, dim=64, depth=DEPTH,
                                 num_heads=2)
    module = WrappedModel(backbone=backbone, size=32,
                          mean=tuple(MEAN), std=tuple(STD))
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    surrogate = Surrogate(name="tiny_vit", module=module,
                          variables=variables, input_size=32)
    surrogate = _convert(tmodel, surrogate)

    rng = np.random.RandomState(141)
    x = rng.rand(B, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)

    def t_fwd_blocks(x_raw):
        """Raw-[0,1] forward returning every block's residual stream."""
        xn = (x_raw - torch.from_numpy(MEAN)) / torch.from_numpy(STD)
        h = xn.permute(0, 3, 1, 2)
        h = tmodel.patch_embed.proj(h).flatten(2).transpose(1, 2)
        h = torch.cat([tmodel.cls_token.expand(h.shape[0], -1, -1), h], dim=1)
        h = h + tmodel.pos_embed
        outs = []
        for blk in tmodel.blocks:
            h = blk(h)
            outs.append(h)
        return outs

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt, requires_grad=True)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        outs = t_fwd_blocks(xt + delta)
        total = F.cross_entropy(
            tmodel.head(tmodel.norm(outs[-1])[:, 0]), yt)
        for b in range(DEPTH - 1):
            refined = theads.transformerheads[b](tmodel.norm(outs[b]))
            total = total + F.cross_entropy(tmodel.head(refined), yt)
        grad = torch.autograd.grad(total, delta)[0]
        momentum = momentum + _mi_norm(grad)
        d = torch.clamp(delta.data + ALPHA * momentum.sign(), -EPS, EPS)
        delta = torch.clamp(xt + d, 0, 1) - xt
        delta.requires_grad_(True)
    ref = delta.detach().numpy()

    SETR = ta.load_attack_class("setr")
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        atk = SETR(model_name=surrogate, epoch=epoch, trm=True)
    toks = [jnp.zeros((B, 5, 64), jnp.float32)] * (DEPTH - 1)
    init_vars = atk.trm.init(jax.random.PRNGKey(1), toks)
    converted = torch_state_dict_to_flax(theads.state_dict(), prefix="")
    trm_vars, report = reconcile_with_module(converted, init_vars)
    assert not (report["missing"] or report["mismatched"]), report
    atk.trm_vars = trm_vars
    ours = np.asarray(atk(x, y))
    agree = _sign_agree(ref, ours)
    assert agree > 0.98, f"SETR-TRM delta sign agreement {agree:.4f}"


# ------------------------------------------------------------------- LPM
def _lpm_masks(rng, pop, grid):
    return (rng.rand(pop, grid * grid) > 0.5).astype(np.float32)


def _t_full_mask(bits, grid, H, W):
    cell = torch.from_numpy(bits.reshape(grid, grid))
    m = cell.repeat_interleave(H // grid, 0).repeat_interleave(W // grid, 1)
    return m[None, None]  # (1,1,H,W), broadcast over B and C


def test_lpm_final_masked_loop_parity():
    """The final multi-mask attack (``lpm.py:115-163``): per iteration,
    M_num gradients of the FULLY-masked adversarial image ((x+δ)·mask,
    the mask cycling ``cnt % pop_size`` globally), SUMMED into one
    momentum step."""
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(142)
    rng = np.random.RandomState(142)
    grid, pop, m_num, epoch = 4, 5, 3, 6
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (1,)).astype(np.int32)
    masks = _lpm_masks(rng, pop, grid)

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    delta = torch.zeros_like(xt)
    momentum = torch.zeros_like(xt)
    cnt = 0
    for _ in range(epoch):
        g = torch.zeros_like(xt)
        for _ in range(m_num):
            m = _t_full_mask(masks[cnt % pop], grid, 64, 64)
            cnt += 1
            d = delta.clone().requires_grad_(True)
            xadv = (xt + d) * m.permute(0, 2, 3, 1)
            loss = F.cross_entropy(torch_forward(tmodel, xadv), yt)
            g = g + torch.autograd.grad(loss, d)[0]
        momentum = momentum + _mi_norm(g)
        delta = torch.clamp(delta + ALPHA * momentum.sign(), -EPS, EPS)
        delta = torch.clamp(xt + delta, 0, 1) - xt
    ref = delta.numpy()

    LPM = ta.load_attack_class("lpm")
    atk = LPM(model_name="resnet18", pretrained=False, input_size=64,
              gray_models=(), patch_grid=grid, pop_size=pop, m_num=m_num,
              epoch=epoch)
    atk.model = surrogate
    final = atk._build_final()
    ours = np.asarray(final(surrogate.variables, jnp.asarray(x),
                            jnp.asarray(y), jnp.asarray(masks)))
    agree = _sign_agree(ref, ours)
    assert agree > 0.98, f"LPM final-loop delta sign agreement {agree:.4f}"


def test_lpm_candidate_score_parity():
    """Candidate fitness (``lpm.py:168-235``): a full 10-iter masked attack
    per mask on the white model, the resulting UNmasked adversary scored on
    the gray models as var + mean of −CE."""
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodelA, _, surA = _fresh_pair(143)
    tmodelB, _, surB = _fresh_pair(144)
    rng = np.random.RandomState(143)
    grid, inner = 4, 5
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (1,)).astype(np.int32)
    masks = _lpm_masks(rng, 3, grid)

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    ref_scores = []
    for bits in masks:
        m = _t_full_mask(bits, grid, 64, 64).permute(0, 2, 3, 1)
        delta = torch.zeros_like(xt)
        momentum = torch.zeros_like(xt)
        for _ in range(inner):
            d = delta.clone().requires_grad_(True)
            loss = F.cross_entropy(
                torch_forward(tmodelA, (xt + d) * m), yt)
            g = torch.autograd.grad(loss, d)[0]
            momentum = momentum + _mi_norm(g)
            delta = torch.clamp(delta + ALPHA * momentum.sign(), -EPS, EPS)
            delta = torch.clamp(xt + delta, 0, 1) - xt
        xadv = xt + delta
        losses = np.array([
            -F.cross_entropy(torch_forward(tm, xadv), yt).item()
            for tm in (tmodelA, tmodelB)
        ])
        ref_scores.append(losses.var() + losses.mean())

    LPM = ta.load_attack_class("lpm")
    atk = LPM(model_name="resnet18", pretrained=False, input_size=64,
              gray_models=(), patch_grid=grid, inner_epoch=inner)
    atk.model = surA
    atk.gray = [surA, surB]
    score = atk._build_score()
    ours = np.asarray(score(
        surA.variables, (surA.variables, surB.variables),
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(masks)))
    np.testing.assert_allclose(ours, np.asarray(ref_scores), rtol=2e-2,
                               atol=2e-3)


# ------------------------------------------------------------------ DSVA
def test_dsva_generator_delta_mapping():
    """DSVA's forward (``dsva.py:166-173``): delta = clamp(G(x) − x, ±ε),
    no smoothing, no extra box clamp (x + clamped delta already lies
    between x and G(x) ∈ [0,1]).  The GeneratorResnet conversion itself is
    pinned in test_generation_parity; here the end-to-end attack output is
    pinned against the torch twin carrying the converted weights."""
    import jax.numpy as jnp

    import transferattack_tpu as ta
    from tests.test_generation_parity import TGeneratorResnet, _randomize_bn
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    torch.manual_seed(145)
    tG = TGeneratorResnet().eval()
    _randomize_bn(tG)
    rng = np.random.RandomState(145)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        atk = ta.load_attack_class("dsva")(model_name="resnet50")
    import jax

    init_vars = atk.generator.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 64, 3)))
    converted = torch_state_dict_to_flax(tG.state_dict(), prefix="")
    gvars, report = reconcile_with_module(converted, init_vars)
    assert not (report["missing"] or report["mismatched"])
    atk._var_cache[0] = gvars

    with torch.no_grad():
        adv = tG(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
    ref = np.clip(adv.numpy().transpose(0, 2, 3, 1) - x, -EPS, EPS)

    ours = np.asarray(atk(x, y))
    np.testing.assert_allclose(ours, ref, atol=6e-3)
    assert float(np.abs(ours - ref).mean()) < 1e-3


def test_ags_feature_dissimilarity_loop_parity():
    """AGS trajectory (``ags.py:77-128``): labels unused; loss = 1 −
    cos(layer2(x), layer2(x+δ)) against the CLEAN feature recorded once;
    RAW grad-sign steps (``update_delta(delta, data, grad, alpha)`` — no
    momentum), alpha=1/255.  The random start is PAIRED through a pre-drawn
    init (at δ=0 the cosine loss sits exactly at its maximum and the
    gradient is fp noise — the reference's random_start=True is
    load-bearing, not cosmetic)."""
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(146)
    rng = np.random.RandomState(146)
    B, epoch, alpha = 2, 8, 1.0 / 255
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)

    feats = {}
    h = tmodel.layer2.register_forward_hook(
        lambda m, i, o: feats.__setitem__("f", o))

    xt = torch.from_numpy(x)
    _ = torch_forward(tmodel, xt)
    mid0 = feats["f"].detach().reshape(B, -1)
    d0 = rng.uniform(-EPS, EPS, size=x.shape).astype(np.float32)
    d0 = np.clip(x + d0, 0, 1) - x  # init_delta's box projection
    delta = torch.from_numpy(d0)
    for _ in range(epoch):
        d = delta.clone().requires_grad_(True)
        _ = torch_forward(tmodel, xt + d)
        mid = feats["f"].reshape(B, -1)
        loss = (1.0 - F.cosine_similarity(mid0, mid)).mean()
        grad = torch.autograd.grad(loss, d)[0]
        delta = torch.clamp(delta + alpha * grad.sign(), -EPS, EPS)
        delta = torch.clamp(xt + delta, 0, 1) - xt
    h.remove()
    ref = delta.numpy()

    import warnings

    AGS = ta.load_attack_class("ags")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        atk = AGS(model_name="ags_twin", base_arch="resnet18",
                  pretrained=False, input_size=64, epoch=epoch, alpha=alpha,
                  random_start=False)

    import jax.numpy as jnp2
    jd0 = jnp2.asarray(d0)
    atk.init_delta = lambda xx, key: jd0
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = _sign_agree(ref, ours)
    assert agree > 0.98, f"AGS delta sign agreement {agree:.4f}"


def test_ana_alignment_three_grad_loop_parity():
    """ANA trajectory (``ana.py:126-174``): per iteration three gradients
    w.r.t. delta — CE of the unaligned branch, γ·MSE-sum of the unaligned
    pooled feature vs its clean reference, γ·MSE-sum of the ALIGNED pooled
    feature (AlignmentNet grafted after layer3) vs its clean reference —
    each L2-normalized per sample, summed, then MI momentum.  The twin
    starts from a pinned random delta on both sides: at δ=0 the MSE
    branches sit exactly at their minimum, so their per-sample-normalized
    gradients are unit-norm fp NOISE — the reference trajectory's first
    step is genuinely non-deterministic there."""
    import jax
    import jax.numpy as jnp

    import transferattack_tpu as ta
    from transferattack_tpu.model_related.checkpoint_surrogates import (
        AlignmentNet,
    )
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    tmodel, _, surrogate = _fresh_pair(147)
    torch.manual_seed(147)
    talign = tnn.Sequential(
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU()).eval()
    with torch.no_grad():
        for m in talign.modules():
            if isinstance(m, tnn.Conv2d):
                m.weight.normal_(0, 0.05)
                m.bias.normal_(0, 0.01)

    rng = np.random.RandomState(147)
    B, epoch, gamma = 2, 6, 2.0
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)

    def t_branches(x_raw):
        xn = (x_raw - torch.from_numpy(MEAN)) / torch.from_numpy(STD)
        h = xn.permute(0, 3, 1, 2)
        h = tmodel.maxpool(tmodel.relu(tmodel.bn1(tmodel.conv1(h))))
        for i in (1, 2, 3):
            h = getattr(tmodel, f"layer{i}")(h)
        feat3 = h
        a = tmodel.layer4(feat3)
        pre = tmodel.avgpool(a).flatten(1)
        logits = tmodel.fc(pre)
        b = tmodel.layer4(talign(feat3))
        post = tmodel.avgpool(b).flatten(1)
        return logits, pre, post

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    with torch.no_grad():
        _, ref_pre, ref_post = t_branches(xt)

    def norm_grad(g):
        flat = g.reshape(g.shape[0], -1)
        return g / (flat.norm(dim=1).view(-1, 1, 1, 1) + 1e-10)

    d0 = rng.uniform(-EPS, EPS, size=x.shape).astype(np.float32)
    d0 = np.clip(x + d0, 0, 1) - x
    delta = torch.from_numpy(d0)
    momentum = torch.zeros_like(xt)
    for _ in range(epoch):
        grads = []
        for which in range(3):
            d = delta.clone().requires_grad_(True)
            logits, pre, post = t_branches(xt + d)
            if which == 0:
                loss = F.cross_entropy(logits, yt)
            elif which == 1:
                loss = gamma * F.mse_loss(pre, ref_pre, reduction="sum")
            else:
                loss = gamma * F.mse_loss(post, ref_post, reduction="sum")
            grads.append(torch.autograd.grad(loss, d)[0])
        g = norm_grad(grads[0]) + norm_grad(grads[1]) + norm_grad(grads[2])
        momentum = momentum + _mi_norm(g)
        delta = torch.clamp(delta + ALPHA * momentum.sign(), -EPS, EPS)
        delta = torch.clamp(xt + delta, 0, 1) - xt
    ref = delta.numpy()

    import warnings

    ANA = ta.load_attack_class("ana")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        atk = ANA(model_name="resnet18", pretrained=False, input_size=64,
                  epoch=epoch, gamma=gamma)
    jd0 = jnp.asarray(d0)
    atk.init_delta = lambda xx, key: jd0
    atk.model = surrogate
    init_vars = atk.align.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 8, 8, 256)))
    # the official AlignmentNetCNN holds the Sequential as ``self.net``
    sd = {"net." + k: v for k, v in talign.state_dict().items()}
    converted = torch_state_dict_to_flax(sd, prefix="")
    avars, report = reconcile_with_module(converted, init_vars)
    assert not (report["missing"] or report["mismatched"]), report
    atk.align_vars = avars
    ours = np.asarray(atk(x, y))
    agree = _sign_agree(ref, ours)
    assert agree > 0.98, f"ANA delta sign agreement {agree:.4f}"
