"""Gradient-level golden parity for the gradient-surgery families.

Each test builds a raw-PyTorch twin that registers the REFERENCE's actual
hooks / module swaps (SGM ``model_related/sgm.py:47-97``, LinBP
``linbp.py:78-177``, BPA ``bpa.py:44-136``, ghost
``ghost_networks/resnet.py:64-177``, IAA ``iaa.py:48-123``, TGR
``tgr.py:49-244``, PNA ``pna_patchout.py:120-157``), converts its weights
into the corresponding SurgeryConfig / ViTSurgery surrogate, and asserts the
*input gradient* — the quantity every attack consumes — agrees in sign at
>99% of non-negligible pixels.  This is the mechanism-level insurance that
ASR parity holds once pretrained checkpoints are converted.

PyTorch legacy-module-hook quirks are part of the reference's observable
behavior and are reproduced deliberately (see ``models/resnet.py``
``std_norm_relu`` and ``models/vit.py`` ``ViTSurgery.scores_bwd`` notes).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from test_torch_parity import TorchResNet18  # noqa: E402

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def _randomize_bn(model):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.05)


def _convert(tmodel, surrogate):
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    converted = torch_state_dict_to_flax(tmodel.state_dict())
    variables, report = reconcile_with_module(converted, surrogate.variables)
    assert not report["missing"], report["missing"][:6]
    assert not report["mismatched"], report["mismatched"][:6]
    surrogate.variables = variables
    return surrogate


def _torch_input_grad(forward_fn, x, y):
    """Input-space CE gradient, chain-ruled back through the normalization."""
    xt = torch.from_numpy(((x - MEAN) / STD).transpose(0, 3, 1, 2)).clone()
    xt.requires_grad_(True)
    loss = F.cross_entropy(forward_fn(xt), torch.from_numpy(y))
    loss.backward()
    return xt.grad.numpy().transpose(0, 2, 3, 1) / STD


def _jax_input_grad(surrogate, x, y, rngs=None):
    import jax
    import jax.numpy as jnp

    def ce(img):
        kwargs = {"rngs": rngs} if rngs else {}
        logits = surrogate.apply(surrogate.variables, img, **kwargs)
        logp = jax.nn.log_softmax(logits)
        return -logp[jnp.arange(img.shape[0]), jnp.asarray(y)].mean()

    return np.asarray(jax.grad(ce)(jnp.asarray(x)))


def _assert_sign_parity(j_grad, t_grad, min_agree=0.99, rel_floor=1e-3):
    denom = np.abs(t_grad).max() + 1e-20
    mask = np.abs(t_grad) > rel_floor * denom
    assert mask.sum() > 100, "degenerate gradient"
    agree = (np.sign(j_grad[mask]) == np.sign(t_grad[mask])).mean()
    assert agree > min_agree, f"sign agreement {agree:.4f}"
    # magnitude: ≥99.5% of elements within tolerance — maxpool backward
    # routes ties (exact zeros after ReLU) by scan order, and XLA/torch may
    # disagree on isolated tied windows, rerouting a few pixels' gradient
    close = np.abs(j_grad - t_grad) <= 5e-3 * denom
    assert close.mean() > 0.995, f"close fraction {close.mean():.4f}"


def _data(batch=2, size=64, seed=3):
    rng = np.random.RandomState(seed)
    x = rng.rand(batch, size, size, 3).astype(np.float32)
    y = rng.randint(0, 1000, size=(batch,)).astype(np.int64)
    return x, y


# ---------------------------------------------------------------------------
# SGM — γ backward hooks on ReLUs (except '0.relu') + std-norm block hooks
# ---------------------------------------------------------------------------


def _register_sgm_hooks(wrapped, gamma):
    """Mirror of ``register_hook_for_resnet`` (``sgm.py:67-84``) incl. the
    legacy-hook name rules: γ on modules named *relu* unless the name
    contains '0.relu'; std-normalization on every residual block."""

    def gamma_hook(module, grad_in, grad_out):
        if isinstance(module, tnn.ReLU):
            return (gamma * grad_in[0],)

    def norm_hook(module, grad_in, grad_out):
        return (grad_in[0] / torch.std(grad_in[0]),)

    for name, module in wrapped.named_modules():
        if "relu" in name and "0.relu" not in name:
            module.register_backward_hook(gamma_hook)
        if len(name.split(".")) >= 2 and "layer" in name.split(".")[-2]:
            module.register_backward_hook(norm_hook)


def test_sgm_input_gradient_parity():
    torch.manual_seed(41)
    from transferattack_tpu.models import make_model
    from transferattack_tpu.models.resnet import SurgeryConfig

    tmodel = TorchResNet18().eval()
    _randomize_bn(tmodel)
    # reference registers hooks on the wrap_model'd Sequential — names '1.*'
    wrapped = tnn.Sequential(tnn.Identity(), tmodel).eval()
    _register_sgm_hooks(wrapped, gamma=0.2)  # BasicBlock arch: γ un-sqrt'd

    surrogate = _convert(
        tmodel,
        make_model("resnet18", pretrained=False, input_size=64,
                   surgery=SurgeryConfig(gamma=0.2)),
    )
    x, y = _data()
    t_grad = _torch_input_grad(wrapped, x, y)
    j_grad = _jax_input_grad(surrogate, x, y)
    _assert_sign_parity(j_grad, t_grad)


# ---------------------------------------------------------------------------
# BPA — softmax-backward maxpool + SiLU-derivative ReLUs from layer 3_1
# ---------------------------------------------------------------------------


class _SoftmaxPoolFn(torch.autograd.Function):
    """Reference BPA maxpool (``bpa.py:67-106``): max forward; backward
    distributes the output grad over each 3×3 window by a temperature-10
    softmax (zero-padded unfold, so out-of-bounds slots contribute exp(0))."""

    T = 10.0

    @staticmethod
    def forward(ctx, x):
        ctx.save_for_backward(x)
        return F.max_pool2d(x, 3, 2, 1)

    @staticmethod
    def backward(ctx, g):
        (x,) = ctx.saved_tensors
        B, C, H, W = x.shape
        Ho = (H + 1) // 2
        cols = F.unfold(x, 3, padding=1, stride=2)  # (B, C*9, Ho*Wo)
        cols = cols.reshape(B, C, 9, -1)
        w = torch.exp(_SoftmaxPoolFn.T * cols)
        w = w / w.sum(dim=2, keepdim=True)
        gi = (w * g.reshape(B, C, 1, -1)).reshape(B, C * 9, -1)
        return F.fold(gi, (H, W), 3, padding=1, stride=2)


class _ReLUSiLUFn(torch.autograd.Function):
    """ReLU forward, SiLU-derivative backward (``bpa.py:109-136``)."""

    @staticmethod
    def forward(ctx, x):
        ctx.save_for_backward(x)
        return torch.relu(x)

    @staticmethod
    def backward(ctx, g):
        (x,) = ctx.saved_tensors
        s = torch.sigmoid(x)
        return g * (x * s * (1 - s) + s)


class _FnModule(tnn.Module):
    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def forward(self, x):
        return self.fn.apply(x)


def test_bpa_input_gradient_parity():
    torch.manual_seed(42)
    from transferattack_tpu.models import make_model
    from transferattack_tpu.models.resnet import SurgeryConfig
    from transferattack_tpu.model_related.sgm import _block_index

    tmodel = TorchResNet18().eval()
    _randomize_bn(tmodel)
    surrogate = _convert(
        tmodel,
        make_model("resnet18", pretrained=False, input_size=64,
                   surgery=SurgeryConfig(
                       bpa_start=_block_index("3_1", "resnet18"),
                       bpa_maxpool=True)),
    )
    # reference swaps model.maxpool and block.relu for layer3[1:], layer4[:]
    tmodel.maxpool = _FnModule(_SoftmaxPoolFn)
    for i, blk in enumerate(tmodel.layer3):
        if i >= 1:
            blk.relu = _FnModule(_ReLUSiLUFn)
    for blk in tmodel.layer4:
        blk.relu = _FnModule(_ReLUSiLUFn)

    x, y = _data(seed=5)
    t_grad = _torch_input_grad(tmodel, x, y)
    j_grad = _jax_input_grad(surrogate, x, y)
    _assert_sign_parity(j_grad, t_grad)


# ---------------------------------------------------------------------------
# Ghost — per-block per-channel U(1±0.16) skip scaling, scales injected from
# the JAX draw into the torch twin
# ---------------------------------------------------------------------------


def test_ghost_input_gradient_parity():
    torch.manual_seed(43)
    import jax
    import jax.numpy as jnp
    from transferattack_tpu.models import make_model, find_feature
    from transferattack_tpu.models.resnet import SurgeryConfig

    tmodel = TorchResNet18().eval()
    _randomize_bn(tmodel)
    surrogate = _convert(
        tmodel,
        make_model("resnet18", pretrained=False, input_size=64,
                   surgery=SurgeryConfig(ghost_range=0.16)),
    )
    x, y = _data(seed=7)
    rngs = {"ghost": jax.random.PRNGKey(11)}

    # capture the scales the JAX forward drew, block by block
    _, state = surrogate.module.apply(
        surrogate.variables, jnp.asarray(x), rngs=rngs,
        capture_intermediates=lambda m, _n: False, mutable=["intermediates"],
    )
    inter = state["intermediates"]
    scales = {}
    for stage, n_blocks in ((1, 2), (2, 2), (3, 2), (4, 2)):
        for j in range(n_blocks):
            blk = find_feature(inter, f"layer{stage}_{j}")
            sc = find_feature({"d": blk}, "ghost_scale")
            assert sc is not None, f"no ghost_scale for layer{stage}_{j}"
            scales[f"layer{stage}.{j}"] = np.asarray(sc).reshape(-1)

    # torch twin: identity * scale inside every residual add
    def patch(blk, sc):
        orig_forward = blk.forward
        s = torch.from_numpy(sc.astype(np.float32)).reshape(1, -1, 1, 1)

        def fwd(x):
            identity = x if blk.downsample is None else blk.downsample(x)
            out = blk.relu(blk.bn1(blk.conv1(x)))
            out = blk.bn2(blk.conv2(out))
            return blk.relu(out + identity * s)

        blk.forward = fwd

    for stage in range(1, 5):
        for j, blk in enumerate(getattr(tmodel, f"layer{stage}")):
            patch(blk, scales[f"layer{stage}.{j}"])

    t_grad = _torch_input_grad(tmodel, x, y)
    j_grad = _jax_input_grad(surrogate, x, y, rngs=rngs)
    _assert_sign_parity(j_grad, t_grad)


# ---------------------------------------------------------------------------
# IAA — ReLU→Softplus(β=20) + per-stage residual downweighting
# ---------------------------------------------------------------------------


def test_iaa_input_gradient_parity():
    torch.manual_seed(44)
    from transferattack_tpu.models import make_model
    from transferattack_tpu.models.resnet import SurgeryConfig

    lambdas = (0.98, 0.87, 0.73, 0.19)
    beta = 20.0
    tmodel = TorchResNet18().eval()
    _randomize_bn(tmodel)
    surrogate = _convert(
        tmodel,
        make_model("resnet18", pretrained=False, input_size=64,
                   surgery=SurgeryConfig(softplus_beta=beta,
                                         residual_scale=lambdas)),
    )
    # reference: replace every nn.ReLU with Softplus(β) (``iaa.py:57-59``)
    # and scale bn2 outputs by the stage λ via forward hooks (``iaa.py:62-67``)
    def replace(mod):
        for n, child in mod.named_children():
            if isinstance(child, tnn.ReLU):
                setattr(mod, n, tnn.Softplus(beta=beta))
            else:
                replace(child)

    replace(tmodel)
    for stage in range(1, 5):
        lam = lambdas[stage - 1]
        for blk in getattr(tmodel, f"layer{stage}"):
            blk.bn2.register_forward_hook(
                lambda m, i, o, lam=lam: o * lam
            )

    x, y = _data(seed=9)
    t_grad = _torch_input_grad(tmodel, x, y)
    j_grad = _jax_input_grad(surrogate, x, y)
    _assert_sign_parity(j_grad, t_grad)


# ---------------------------------------------------------------------------
# LinBP — linear inner-ReLU backward + per-block main-branch renorm, on a
# small Bottleneck net (the reference algorithm is ResNet-50-specific)
# ---------------------------------------------------------------------------


class TorchBottleneck(tnn.Module):
    def __init__(self, inp, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + identity)


class TorchBottleneckNet(tnn.Module):
    """torchvision-naming Bottleneck ResNet, stage sizes (1, 1, 2, 1)."""

    STAGES = (1, 1, 2, 1)

    def __init__(self, num_classes=1000):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        inp = 64
        for i, n in enumerate(self.STAGES):
            planes = 64 * (2 ** i)
            blocks = []
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                down = j == 0
                blocks.append(TorchBottleneck(inp, planes, stride, down))
                inp = planes * 4
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))
        self.fc = tnn.Linear(inp, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        return self.fc(x.mean([2, 3]))


def _linbp_torch_grad(tmodel, x, y, linbp_from=("3", "1")):
    """The reference's replay backward (``linbp.py:78-177``): inner ReLUs
    linear, final ReLU masked, main-branch gradient renormed per block to the
    norm of the fully-masked gradient."""
    jj, kk = int(linbp_from[0]), int(linbp_from[1])
    xt = torch.from_numpy(((x - MEAN) / STD).transpose(0, 3, 1, 2)).clone()
    xt.requires_grad_(True)

    def lin_relu(t):
        return t + F.relu(-t).detach()

    h = tmodel.maxpool(tmodel.relu(tmodel.bn1(tmodel.conv1(xt))))
    records = []  # per linbp block: dict of saved tensors
    for i in range(4):
        for j, blk in enumerate(getattr(tmodel, f"layer{i + 1}")):
            active = (i + 1 > jj) or (i + 1 == jj and j >= kk)
            if not active:
                h = blk(h)
                continue
            conv_in = h + 0
            identity = conv_in if blk.downsample is None else blk.downsample(conv_in)
            id_out = identity + 0
            o0 = blk.bn1(blk.conv1(conv_in)) + 0
            r0 = lin_relu(o0)
            o1 = blk.bn2(blk.conv2(r0)) + 0
            r1 = lin_relu(o1)
            x_out = blk.bn3(blk.conv3(r1)) + 0
            h = blk.relu(x_out + id_out)
            records.append(dict(
                conv_in=conv_in, id_out=id_out, x_out=x_out, o0=o0, o1=o1,
                m0=(o0 > 0).float(), m1=(o1 > 0).float(),
            ))
    logits = tmodel.fc(h.mean([2, 3]))
    loss = F.cross_entropy(logits, torch.from_numpy(y))

    g_id, g_x = torch.autograd.grad(
        loss, [records[-1]["id_out"], records[-1]["x_out"]], retain_graph=True
    )
    for i in range(len(records) - 1, -1, -1):
        r = records[i]
        # fully-masked main-branch input grad
        g2 = torch.autograd.grad(r["x_out"], r["o1"], g_x, retain_graph=True)[0]
        g1 = torch.autograd.grad(r["o1"], r["o0"], g2 * r["m1"], retain_graph=True)[0]
        g_masked = torch.autograd.grad(
            r["o0"], r["conv_in"], g1 * r["m0"], retain_graph=True
        )[0]
        # linear main-branch input grad
        g_lin = torch.autograd.grad(
            r["x_out"], r["conv_in"], g_x, retain_graph=True
        )[0]
        alpha = g_masked.norm(p=2, dim=(1, 2, 3), keepdim=True) / \
            g_lin.norm(p=2, dim=(1, 2, 3), keepdim=True)
        main = alpha * g_lin
        if i > 0:
            prev = records[i - 1]
            g_id, g_x = torch.autograd.grad(
                [r["id_out"], r["conv_in"]],
                [prev["id_out"], prev["x_out"]],
                grad_outputs=[g_id, main], retain_graph=True,
            )
        else:
            (g_input,) = torch.autograd.grad(
                [r["id_out"], r["conv_in"]], [xt],
                grad_outputs=[g_id, main],
            )
    return g_input.numpy().transpose(0, 2, 3, 1) / STD


def test_linbp_input_gradient_parity():
    torch.manual_seed(45)
    import jax
    import jax.numpy as jnp
    from transferattack_tpu.models import Surrogate, WrappedModel
    from transferattack_tpu.models.resnet import (
        Bottleneck, ResNet, SurgeryConfig,
    )

    tmodel = TorchBottleneckNet().eval()
    _randomize_bn(tmodel)

    # '3_1' on stages (1,1,2,1): global block index 0+1+1+1 = 3
    backbone = ResNet(stage_sizes=list(TorchBottleneckNet.STAGES),
                      block_cls=Bottleneck,
                      surgery=SurgeryConfig(linbp_start=3))
    module = WrappedModel(backbone=backbone, size=64,
                          mean=tuple(MEAN), std=tuple(STD))
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    surrogate = Surrogate(name="bottleneck_tiny", module=module,
                          variables=variables, input_size=64)
    surrogate = _convert(tmodel, surrogate)

    x, y = _data(seed=13)
    t_grad = _linbp_torch_grad(tmodel, x, y)
    j_grad = _jax_input_grad(surrogate, x, y)
    _assert_sign_parity(j_grad, t_grad)


# ---------------------------------------------------------------------------
# TGR / PNA — ViT twins with the reference's backward hooks (which, under
# legacy module-hook semantics, land on the softmax-INPUT node for attn_drop
# and the OUTPUT node for qkv/mlp)
# ---------------------------------------------------------------------------


class TMlp(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.fc1 = tnn.Linear(dim, dim * 4)
        self.fc2 = tnn.Linear(dim * 4, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TAttention(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)
        self.attn_drop = tnn.Dropout(0.0)
        self.heads = heads

    def forward(self, x):
        B, N, D = x.shape
        h = self.heads
        qkv = self.qkv(x).reshape(B, N, 3, h, D // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = torch.softmax(q @ k.transpose(-2, -1) * (D // h) ** -0.5, dim=-1)
        a = self.attn_drop(a)
        out = (a @ v).transpose(1, 2).reshape(B, N, D)
        return self.proj(out)


class TViTBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = TAttention(dim, heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = TMlp(dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TViT(tnn.Module):
    """timm-naming tiny ViT (patch 16, dim 64, depth 2) with module
    boundaries (attn_drop, mlp) where the reference registers its hooks."""

    def __init__(self, dim=64, depth=2, heads=2, num_classes=1000, n_tokens=5):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, 16, 16)
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, dim).normal_(0, 0.5))
        self.pos_embed = tnn.Parameter(torch.zeros(1, n_tokens, dim).normal_(0, 0.02))
        self.blocks = tnn.Sequential(*[TViTBlock(dim, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.head = tnn.Linear(dim, num_classes)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        x = self.blocks(x)
        return self.head(self.norm(x)[:, 0])


def _tiny_vit_surrogate(tmodel, surgery):
    import jax
    import jax.numpy as jnp
    from transferattack_tpu.models import Surrogate, WrappedModel
    from transferattack_tpu.models.vit import VisionTransformer

    backbone = VisionTransformer(patch_size=16, dim=64, depth=2, num_heads=2,
                                 surgery=surgery)
    module = WrappedModel(backbone=backbone, size=32,
                          mean=tuple(MEAN), std=tuple(STD))
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    surrogate = Surrogate(name="tiny_vit", module=module, variables=variables,
                          input_size=32)
    return _convert(tmodel, surrogate)


def _register_tgr_hooks(tmodel):
    """The reference's vit-branch TGR hooks (``tgr.py:53-208``), with the
    extreme indices computed from batch element 0 as published."""

    def attn_hook(module, grad_in, grad_out, gamma=0.25):
        g = gamma * grad_in[0]
        B, C, H, W = g.shape
        flat = g[0].detach().numpy().reshape(C, H * W)
        mx, mn = flat.argmax(1), flat.argmin(1)
        g[:, range(C), mx // H, :] = 0.0
        g[:, range(C), :, mx % H] = 0.0
        g[:, range(C), mn // H, :] = 0.0
        g[:, range(C), :, mn % H] = 0.0
        return (g,)

    def token_hook_factory(gamma):
        def token_hook(module, grad_in, grad_out):
            grad_in = list(grad_in)
            squeeze = grad_in[0].dim() == 2
            g = grad_in[0].unsqueeze(0) if squeeze else grad_in[0]
            g = gamma * g
            c = g.shape[2]
            flat = g[0].detach().numpy()
            mx, mn = flat.argmax(0), flat.argmin(0)
            g[:, mx, range(c)] = 0.0
            g[:, mn, range(c)] = 0.0
            g = g.squeeze(0) if squeeze else g
            return (g,) + tuple(grad_in[1:])

        return token_hook

    for blk in tmodel.blocks:
        blk.attn.attn_drop.register_backward_hook(attn_hook)
        blk.attn.qkv.register_backward_hook(token_hook_factory(0.75))
        blk.mlp.register_backward_hook(token_hook_factory(0.5))


def test_tgr_input_gradient_parity():
    torch.manual_seed(46)
    from transferattack_tpu.model_related.vit_attacks import TGR_SURGERY

    tmodel = TViT().eval()
    _register_tgr_hooks(tmodel)
    surrogate = _tiny_vit_surrogate(tmodel, TGR_SURGERY)

    x, y = _data(batch=1, size=32, seed=17)  # reference TGR is batchsize=1
    t_grad = _torch_input_grad(tmodel, x, y)
    j_grad = _jax_input_grad(surrogate, x, y)
    _assert_sign_parity(j_grad, t_grad)


def test_pna_input_gradient_parity():
    torch.manual_seed(47)
    from transferattack_tpu.models.vit import ViTSurgery

    tmodel = TViT().eval()

    def zero_hook(module, grad_in, grad_out):
        return (0.0 * grad_in[0],)

    for blk in tmodel.blocks:
        blk.attn.attn_drop.register_backward_hook(zero_hook)

    surrogate = _tiny_vit_surrogate(tmodel, ViTSurgery(skip_attn_grad=True))
    x, y = _data(batch=2, size=32, seed=19)
    t_grad = _torch_input_grad(tmodel, x, y)
    j_grad = _jax_input_grad(surrogate, x, y)
    _assert_sign_parity(j_grad, t_grad)
