"""Golden parity for the windowed/staged ViT family (Swin, PiT) — the most
structurally intricate eval models (shifted-window masks, relative position
bias, conv head pooling)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------- Swin twin
def t_window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def t_window_reverse(w, ws, H, W):
    B = w.shape[0] // ((H // ws) * (W // ws))
    x = w.view(B, H // ws, W // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


class TorchSwinBlock(tnn.Module):
    def __init__(self, dim, heads, ws, shift):
        super().__init__()
        self.dim, self.heads, self.ws, self.shift = dim, heads, ws, shift
        self.norm1 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(dim, dim * 3)
        self.attn.proj = tnn.Linear(dim, dim)
        self.attn.relative_position_bias_table = tnn.Parameter(
            torch.zeros((2 * ws - 1) ** 2, heads).normal_(0, 0.5)
        )
        self.norm2 = tnn.LayerNorm(dim, eps=1e-5)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.fc2 = tnn.Linear(dim * 4, dim)

    def rel_bias(self, N):
        ws = self.ws
        coords = torch.stack(torch.meshgrid(
            torch.arange(ws), torch.arange(ws), indexing="ij"))
        flat = coords.flatten(1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0) + (ws - 1)
        idx = rel[..., 0] * (2 * ws - 1) + rel[..., 1]
        return self.attn.relative_position_bias_table[idx.reshape(-1)].reshape(
            N, N, self.heads).permute(2, 0, 1)

    def forward(self, x):
        B, H, W, C = x.shape
        ws, shift = self.ws, self.shift
        if ws >= min(H, W):  # timm clamps: no shift when one window covers all
            shift = 0
        shortcut = x
        h = self.norm1(x)
        if shift > 0:
            h = torch.roll(h, (-shift, -shift), dims=(1, 2))
        wins = t_window_partition(h, ws)
        Bw, N, _ = wins.shape
        qkv = self.attn.qkv(wins).reshape(Bw, N, 3, self.heads, C // self.heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1) * (C // self.heads) ** -0.5
        attn = attn + self.rel_bias(N)[None]
        if shift > 0:
            img = torch.zeros(1, H, W, 1)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                    img[:, hs, wsl, :] = cnt
                    cnt += 1
            mwins = t_window_partition(img, ws).squeeze(-1)
            mask = mwins[:, None, :] - mwins[:, :, None]
            mask = torch.where(mask != 0, torch.tensor(-100.0), torch.tensor(0.0))
            nw = mask.shape[0]
            attn = attn.view(Bw // nw, nw, self.heads, N, N) + mask[None, :, None]
            attn = attn.view(Bw, self.heads, N, N)
        attn = torch.softmax(attn, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(Bw, N, C)
        out = self.attn.proj(out)
        h = t_window_reverse(out, ws, H, W)
        if shift > 0:
            h = torch.roll(h, (shift, shift), dims=(1, 2))
        x = shortcut + h
        h = self.norm2(x)
        return x + self.mlp.fc2(tnn.functional.gelu(self.mlp.fc1(h)))


class TorchSwinTiny(tnn.Module):
    """timm-naming 2-stage tiny Swin (dims 32→64, depths (2,2), window 4)."""

    def __init__(self, dim=32, depths=(2, 2), heads=(2, 4), ws=4,
                 num_classes=1000):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, 4, 4)
        self.patch_embed.norm = tnn.LayerNorm(dim, eps=1e-5)
        self.layers = tnn.ModuleList()
        d = dim
        for i, (dep, h) in enumerate(zip(depths, heads)):
            stage = tnn.Module()
            stage.blocks = tnn.ModuleList([
                TorchSwinBlock(d, h, ws, 0 if j % 2 == 0 else ws // 2)
                for j in range(dep)
            ])
            if i < len(depths) - 1:
                stage.downsample = tnn.Module()
                stage.downsample.norm = tnn.LayerNorm(4 * d, eps=1e-5)
                stage.downsample.reduction = tnn.Linear(4 * d, 2 * d, bias=False)
            self.layers.append(stage)
            if i < len(depths) - 1:
                d *= 2
        self.norm = tnn.LayerNorm(d, eps=1e-5)
        self.head = tnn.Linear(d, num_classes)
        self.depths = depths

    def forward(self, x):
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        x = self.patch_embed.norm(x)
        for i, stage in enumerate(self.layers):
            for blk in stage.blocks:
                x = blk(x)
            if hasattr(stage, "downsample"):
                B, H, W, C = x.shape
                x = x.view(B, H // 2, 2, W // 2, 2, C)
                x = torch.cat([x[:, :, 0, :, 0], x[:, :, 1, :, 0],
                               x[:, :, 0, :, 1], x[:, :, 1, :, 1]], dim=-1)
                x = stage.downsample.reduction(stage.downsample.norm(x))
        x = self.norm(x)
        x = x.mean(dim=(1, 2))
        return self.head(x)


def test_swin_logits_parity():
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.models import Surrogate, WrappedModel
    from transferattack_tpu.models.swin import SwinTransformer
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    tmodel = TorchSwinTiny().eval()
    converted = torch_state_dict_to_flax(tmodel.state_dict())

    backbone = SwinTransformer(patch_size=4, embed_dim=32, depths=(2, 2),
                               num_heads=(2, 4), window_size=4)
    module = WrappedModel(backbone=backbone, size=32,
                          mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    surrogate = Surrogate(name="swin_tiny2", module=module,
                          variables=variables, input_size=32)
    variables, report = reconcile_with_module(converted, surrogate.variables)
    assert not report["missing"], report["missing"][:8]
    assert not report["mismatched"], report["mismatched"][:8]
    surrogate.variables = variables

    rng = np.random.RandomState(0)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(
            torch.from_numpy(((x - MEAN) / STD).transpose(0, 3, 1, 2))
        ).numpy()
    j_logits = np.asarray(surrogate.apply(surrogate.variables, jnp.asarray(x)))
    np.testing.assert_allclose(j_logits, t_logits, atol=2e-4, rtol=1e-3)


# ----------------------------------------------------------------- PiT twin
class TorchPiTBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(dim, dim * 3)
        self.attn.proj = tnn.Linear(dim, dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.fc2 = tnn.Linear(dim * 4, dim)
        self.heads = heads

    def forward(self, x):
        B, N, D = x.shape
        h = self.heads
        hn = self.norm1(x)
        qkv = self.attn.qkv(hn).reshape(B, N, 3, h, D // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = torch.softmax(q @ k.transpose(-2, -1) * (D // h) ** -0.5, dim=-1)
        x = x + self.attn.proj((a @ v).transpose(1, 2).reshape(B, N, D))
        return x + self.mlp.fc2(tnn.functional.gelu(self.mlp.fc1(self.norm2(x))))


class TorchPiTTiny(tnn.Module):
    """timm-naming 2-stage PiT (base_dims (8,8), heads (2,4), patch 4/str 2)."""

    def __init__(self, num_classes=1000):
        super().__init__()
        dims = (16, 32)
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dims[0], 4, 2)
        # 32² input → (32-4)/2+1 = 15² tokens
        self.pos_embed = tnn.Parameter(torch.zeros(1, dims[0], 15, 15).normal_(0, 0.5))
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, dims[0]).normal_(0, 0.5))
        self.transformers = tnn.ModuleList()
        for i, (d, dep, h) in enumerate(zip(dims, (2, 2), (2, 4))):
            t = tnn.Module()
            t.blocks = tnn.ModuleList([TorchPiTBlock(d, h) for _ in range(dep)])
            if i < len(dims) - 1:
                t.pool = tnn.Module()
                t.pool.conv = tnn.Conv2d(d, dims[i + 1], 3, 2, 1, groups=d)
                t.pool.fc = tnn.Linear(d, dims[i + 1])
            self.transformers.append(t)
        self.norm = tnn.LayerNorm(dims[-1], eps=1e-6)
        self.head = tnn.Linear(dims[-1], num_classes)

    def forward(self, x):
        x = self.patch_embed.proj(x)
        x = x + self.pos_embed
        B, C, H, W = x.shape
        tokens = x.flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(B, -1, -1)
        for i, t in enumerate(self.transformers):
            seq = torch.cat([cls, tokens], dim=1)
            for blk in t.blocks:
                seq = blk(seq)
            cls, tokens = seq[:, :1], seq[:, 1:]
            if hasattr(t, "pool"):
                sp = tokens.transpose(1, 2).reshape(B, -1, H, W)
                sp = t.pool.conv(sp)
                H, W = sp.shape[2], sp.shape[3]
                tokens = sp.flatten(2).transpose(1, 2)
                cls = t.pool.fc(cls)
        cls = self.norm(cls)
        return self.head(cls[:, 0])


def test_pit_logits_parity():
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.models import Surrogate, WrappedModel
    from transferattack_tpu.models.pit import PiT
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    tmodel = TorchPiTTiny().eval()
    converted = torch_state_dict_to_flax(tmodel.state_dict())

    backbone = PiT(patch_size=4, stride=2, base_dims=(8, 8), depth=(2, 2),
                   heads=(2, 4))
    module = WrappedModel(backbone=backbone, size=32,
                          mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    surrogate = Surrogate(name="pit_tiny", module=module, variables=variables,
                          input_size=32)
    variables, report = reconcile_with_module(converted, surrogate.variables)
    assert not report["missing"], report["missing"][:8]
    assert not report["mismatched"], report["mismatched"][:8]
    surrogate.variables = variables

    rng = np.random.RandomState(0)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(
            torch.from_numpy(((x - MEAN) / STD).transpose(0, 3, 1, 2))
        ).numpy()
    j_logits = np.asarray(surrogate.apply(surrogate.variables, jnp.asarray(x)))
    np.testing.assert_allclose(j_logits, t_logits, atol=2e-4, rtol=1e-3)


# ------------------------------------------------------- full Inception twin
from tests.test_torch_parity import TBasicConv2d, TInceptionA  # noqa: E402


class TInceptionB(tnn.Module):
    def __init__(self, inp):
        super().__init__()
        self.branch3x3 = TBasicConv2d(inp, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv2d(inp, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            tnn.functional.max_pool2d(x, 3, 2),
        ], 1)


class TInceptionC(tnn.Module):
    def __init__(self, inp, c7):
        super().__init__()
        self.branch1x1 = TBasicConv2d(inp, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv2d(inp, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TBasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv2d(inp, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TBasicConv2d(inp, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(
            tnn.functional.avg_pool2d(x, 3, 1, 1, count_include_pad=True))
        return torch.cat([self.branch1x1(x), b7, bd, bp], 1)


class TInceptionD(tnn.Module):
    def __init__(self, inp):
        super().__init__()
        self.branch3x3_1 = TBasicConv2d(inp, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv2d(inp, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(
                self.branch7x7x3_2(self.branch7x7x3_1(x)))),
            tnn.functional.max_pool2d(x, 3, 2),
        ], 1)


class TInceptionE(tnn.Module):
    def __init__(self, inp):
        super().__init__()
        self.branch1x1 = TBasicConv2d(inp, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv2d(inp, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TBasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv2d(inp, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TBasicConv2d(inp, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(
            tnn.functional.avg_pool2d(x, 3, 1, 1, count_include_pad=True))
        return torch.cat([self.branch1x1(x), b3, bd, bp], 1)


class TorchInceptionV3(tnn.Module):
    """Full torchvision-naming Inception-v3 (no aux head)."""

    def __init__(self, num_classes=1000):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280)
        self.Mixed_7c = TInceptionE(2048)
        self.fc = tnn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = tnn.functional.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = tnn.functional.max_pool2d(x, 3, 2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                     "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                     "Mixed_7c"):
            x = getattr(self, name)(x)
        x = x.mean([2, 3])
        return self.fc(x)


def test_inception_v3_full_logits_parity():
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.models import make_model
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    tmodel = TorchInceptionV3().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.8, 1.2)

    converted = torch_state_dict_to_flax(tmodel.state_dict())
    surrogate = make_model("inception_v3", pretrained=False)
    variables, report = reconcile_with_module(converted, surrogate.variables)
    assert not report["missing"], report["missing"][:8]
    assert not report["mismatched"], report["mismatched"][:8]
    surrogate.variables = variables

    rng = np.random.RandomState(0)
    x = rng.rand(1, 299, 299, 3).astype(np.float32)
    xn = (x - 0.5) / 0.5
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(xn.transpose(0, 3, 1, 2))).numpy()
    j_logits = np.asarray(surrogate.apply(surrogate.variables, jnp.asarray(x)))
    np.testing.assert_allclose(j_logits, t_logits, atol=5e-3, rtol=1e-3)
