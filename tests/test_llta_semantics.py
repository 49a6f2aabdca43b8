"""Mechanism-level tests for the paper-faithful LLTA / LL2S / ATA-ViT
(VERDICT r1 item 9): γ actually changes the per-block backward scale (torch
DecayReLU twin parity), the LL2S strategy pool matches the paper's op_list
and its REINFORCE distribution moves, and ATA-ViT's budget mask is sparse.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from test_torch_parity import TorchResNet18  # noqa: E402

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def test_decay_relu_gradient_parity():
    """Per-block γ on the inner ReLUs of non-first blocks
    (``decayresnet.py:85-117``): the torch twin applies the reference's
    DecayReLU (``x·γ − sg(x·γ) + sg(x)``) at the same positions; input
    gradients must match."""
    import jax
    import jax.numpy as jnp

    from test_surgery_parity import _convert, _randomize_bn
    from transferattack_tpu.models import make_model

    torch.manual_seed(51)
    tmodel = TorchResNet18().eval()
    _randomize_bn(tmodel)
    surrogate = _convert(
        tmodel, make_model("resnet18", pretrained=False, input_size=64))

    gammas = np.array([[0.2, 0.9, 0.55, 0.05]], np.float32)  # (B=1, G=4)

    # torch twin: DecayReLU on the inner relu of layer{1..4}[1]
    def patch(blk, g):
        def fwd(x):
            identity = x if blk.downsample is None else blk.downsample(x)
            out = blk.bn1(blk.conv1(x))
            r = F.relu(out)
            out = r * g - (r * g).detach() + r.detach()
            out = blk.bn2(blk.conv2(out))
            return F.relu(out + identity)

        blk.forward = fwd

    for stage in range(1, 5):
        patch(getattr(tmodel, f"layer{stage}")[1],
              float(gammas[0, stage - 1]))

    rng = np.random.RandomState(0)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    y = np.asarray([7])
    xt = torch.from_numpy(((x - MEAN) / STD).transpose(0, 3, 1, 2)).clone()
    xt.requires_grad_(True)
    F.cross_entropy(tmodel(xt), torch.from_numpy(y).long()).backward()
    t_grad = xt.grad.numpy().transpose(0, 2, 3, 1) / STD

    def ce(img):
        logits = surrogate.apply(surrogate.variables, img,
                                 gammas=jnp.asarray(gammas))
        logp = jax.nn.log_softmax(logits)
        return -logp[jnp.arange(1), jnp.asarray(y)].mean()

    j_grad = np.asarray(jax.grad(ce)(jnp.asarray(x)))
    denom = np.abs(t_grad).max() + 1e-12
    np.testing.assert_allclose(j_grad / denom, t_grad / denom, atol=5e-4)


def test_llta_inner_search_reduces_l2grad():
    """The importance-weighted γ search minimizes the input-gradient L2 norm
    (``optimize_parameter``, prob_p = exp(−Δ)·1[Δ<0])."""
    import jax
    import jax.numpy as jnp

    import transferattack_tpu as ta

    atk = ta.load_attack_class("llta")(
        model_name="resnet18", pretrained=False, input_size=32,
        inner_iters=3, nsample=4, sigma=0.2)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 1000, size=(2,)))
    v = atk.model.variables
    g0 = jnp.full((2, atk.gamma_num), 0.5)
    before = atk._l2grad(v, x, y, g0)
    g_opt = atk._optimize_gammas(v, x, y, jax.random.PRNGKey(0))
    after = atk._l2grad(v, x, y, g_opt)
    assert float((after <= before + 1e-6).mean()) >= 0.5, (before, after)


def test_ll2s_strategy_pool_and_reinforce():
    """The op pool is the paper's op_list (REST, sparse, shuffle, MoE —
    ``ll2s.py:387-392``) and the REINFORCE distribution moves."""
    import jax
    import jax.numpy as jnp

    import transferattack_tpu as ta

    atk = ta.load_attack_class("ll2s")(
        model_name="vit_small_patch16_224", pretrained=False, input_size=32,
        num_scale=2, ops_num=1, num_robust_tokens=2)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 1000, size=(2,)))
    state = atk.init_state(x, y, jax.random.PRNGKey(0))
    assert state.extra["aug_param"].shape == (atk.num_layers, 4)
    assert state.extra["rest_kv"].shape[0] == 2  # (k, v) streams
    grad, updates = atk.get_grad(atk.model.variables, x, y, state,
                                 jax.random.PRNGKey(1))
    assert float(jnp.abs(grad).sum()) > 0
    assert float(jnp.abs(updates["aug_param"]).sum()) > 0
    assert "robust_tokens" in updates  # dynamic token step happened
    assert float(jnp.abs(updates["robust_tokens"]
                         - state.extra["robust_tokens"]).max()) > 0


def test_ll2s_rest_gate_disables_extra_slots():
    """Regression (ADVICE r2 high): non-REST layers must fully disable the
    extra kv slots.  The old poisoned-key gate (k_ext = -1e9) gave attention
    logits q·k = -1e9·sum(q) — *positive* huge for negative-sum queries, so
    softmax collapsed onto the disabled slot.  With score-level gating, the
    surgered forward with every op != REST equals the plain forward."""
    import jax
    import jax.numpy as jnp

    import transferattack_tpu as ta

    atk = ta.load_attack_class("ll2s")(
        model_name="vit_small_patch16_224", pretrained=False, input_size=32,
        num_scale=2, ops_num=1, num_robust_tokens=2)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 1000, size=(2,)))
    state = atk.init_state(x, y, jax.random.PRNGKey(0))
    rest_kv = state.extra["rest_kv"]
    # op id 7 matches none of (REST=0, sparse=1, shuffle=2, MoE=3): the only
    # active surgery path is kv_extra with use=0
    ops = jnp.full((atk.num_layers,), 7)
    mod = atk._op_module(ops, rest_kv, jax.random.PRNGKey(3))
    surgered = mod.apply(atk.model.variables, x)
    plain = atk.model.module.apply(atk.model.variables, x)
    np.testing.assert_allclose(np.asarray(surgered), np.asarray(plain),
                               rtol=2e-4, atol=2e-4)


def test_transformer_attribution_matches_torch_twin():
    """ATA-ViT's relevance is the reference's transformer attribution
    (``ViT_LRP.py:357-369``): cam_l = E_h[(∇A⊙A)⁺], rollout ∏(cam+I).
    Pinned against a raw-torch replay of the same math on the converted
    tiny ViT, and quantified against the plain-rollout stand-in it
    replaced (they must and do diverge)."""
    import pytest
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    import jax
    import jax.numpy as jnp

    from tests.test_torch_parity import TorchViT
    from transferattack_tpu.models import Surrogate, WrappedModel
    from transferattack_tpu.models.vit import VisionTransformer
    from transferattack_tpu.model_related.llta import transformer_attribution
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    torch.manual_seed(5)
    tmodel = TorchViT().eval()
    converted = torch_state_dict_to_flax(tmodel.state_dict())
    backbone = VisionTransformer(patch_size=16, dim=64, depth=2, num_heads=2)
    module = WrappedModel(backbone=backbone, size=32,
                          mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    surrogate = Surrogate(name="tiny_vit", module=module, variables=variables,
                          input_size=32)
    variables, report = reconcile_with_module(converted, surrogate.variables)
    assert not (report["missing"] or report["mismatched"])
    surrogate.variables = variables

    rng = np.random.RandomState(3)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)

    # torch replay with captured attention maps
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    xt = torch.from_numpy(((x - mean) / std).transpose(0, 3, 1, 2))
    B = xt.shape[0]
    h0 = tmodel.patch_embed.proj(xt).flatten(2).transpose(1, 2)
    h0 = torch.cat([tmodel.cls_token.expand(B, -1, -1), h0], dim=1)
    h0 = h0 + tmodel.pos_embed
    attns = []
    hcur = h0
    for blk in tmodel.blocks:
        Bn, N, D = hcur.shape
        nh = blk.heads
        hn = blk.norm1(hcur)
        qkv = blk.attn.qkv(hn).reshape(Bn, N, 3, nh, D // nh).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = torch.softmax(q @ k.transpose(-2, -1) * (D // nh) ** -0.5, dim=-1)
        a.retain_grad()
        attns.append(a)
        out = (a @ v).transpose(1, 2).reshape(Bn, N, D)
        hcur = hcur + blk.attn.proj(out)
        hn = blk.norm2(hcur)
        hcur = hcur + blk.mlp.fc2(tnn.functional.gelu(blk.mlp.fc1(hn)))
    logits = tmodel.head(tmodel.norm(hcur)[:, 0])
    score = logits.gather(1, torch.from_numpy(y).long()[:, None]).sum()
    grads = torch.autograd.grad(score, attns)
    eye = torch.eye(attns[0].shape[-1])[None]
    joint = None
    for a, g in zip(attns, grads):
        cam = (g * a).clamp(min=0).mean(dim=1) + eye
        joint = cam if joint is None else cam @ joint
    ref = joint.detach().numpy()

    ours = np.asarray(transformer_attribution(
        surrogate, surrogate.variables, jnp.asarray(x), jnp.asarray(y),
        depth=2))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

    # divergence from the plain-rollout stand-in it replaced: build the
    # rollout from the same attn maps (head-mean, +I, row-normalized)
    rollout = None
    for a in attns:
        am = a.detach().mean(dim=1) + eye
        am = am / am.sum(-1, keepdim=True)
        rollout = am if rollout is None else am @ rollout
    r_cls = rollout[:, 0, 1:].numpy().ravel()
    a_cls = ref[:, 0, 1:].ravel()
    corr = np.corrcoef(r_cls, a_cls)[0, 1]
    # they are correlated but NOT the same saliency — the class-conditional
    # gradient term changes the per-patch ranking
    assert abs(corr) < 0.999
