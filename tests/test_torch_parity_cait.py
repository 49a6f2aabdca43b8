"""PyTorch↔JAX golden parity for CaiT-S24 (SURVEY.md §4 layer (b)).

A raw-torch twin with timm's ``cait_s24_224`` naming pins the talking-heads
attention (pre/post-softmax head mixing), LayerScale residuals, and the
class-attention stage — the internals TGR's cait branch hooks
(``model_related/tgr.py:223-230``).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


class TTalkingHeadAttn(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj_l = tnn.Linear(heads, heads)
        self.proj_w = tnn.Linear(heads, heads)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, N, D = x.shape
        h = self.heads
        qkv = self.qkv(x).reshape(B, N, 3, h, D // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        attn = self.proj_l(attn.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        attn = attn.softmax(dim=-1)
        attn = self.proj_w(attn.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        out = (attn @ v).transpose(1, 2).reshape(B, N, D)
        return self.proj(out)


class TClassAttn(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.q = tnn.Linear(dim, dim)
        self.k = tnn.Linear(dim, dim)
        self.v = tnn.Linear(dim, dim)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, N, D = x.shape
        h = self.heads
        q = self.q(x[:, 0:1]).reshape(B, 1, h, D // h).permute(0, 2, 1, 3)
        k = self.k(x).reshape(B, N, h, D // h).permute(0, 2, 1, 3)
        v = self.v(x).reshape(B, N, h, D // h).permute(0, 2, 1, 3)
        attn = ((q * self.scale) @ k.transpose(-2, -1)).softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, 1, D)
        return self.proj(out)


class TMlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(tnn.functional.gelu(self.fc1(x)))


class TLayerScaleBlock(tnn.Module):
    def __init__(self, dim, heads, cls_attn=False):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = TClassAttn(dim, heads) if cls_attn else TTalkingHeadAttn(dim, heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = TMlp(dim, dim * 4)
        self.gamma_1 = tnn.Parameter(1e-5 * torch.ones(dim))
        self.gamma_2 = tnn.Parameter(1e-5 * torch.ones(dim))
        self.cls_attn = cls_attn

    def forward(self, x, cls=None):
        if self.cls_attn:
            u = torch.cat([cls, x], dim=1)
            cls = cls + self.gamma_1 * self.attn(self.norm1(u))
            return cls + self.gamma_2 * self.mlp(self.norm2(cls))
        x = x + self.gamma_1 * self.attn(self.norm1(x))
        return x + self.gamma_2 * self.mlp(self.norm2(x))


class TorchCait(tnn.Module):
    """timm-naming CaiT (tiny config for the parity test)."""

    def __init__(self, dim=64, depth=3, depth_token_only=2, heads=4,
                 patch=16, img=32, num_classes=1000):
        super().__init__()
        self.patch_embed = tnn.Conv2d(3, dim, patch, patch)
        n = (img // patch) ** 2
        self.pos_embed = tnn.Parameter(torch.randn(1, n, dim) * 0.02)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.blocks = tnn.ModuleList(
            [TLayerScaleBlock(dim, heads) for _ in range(depth)]
        )
        self.blocks_token_only = tnn.ModuleList(
            [TLayerScaleBlock(dim, heads, cls_attn=True)
             for _ in range(depth_token_only)]
        )
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.head = tnn.Linear(dim, num_classes)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed(x).flatten(2).transpose(1, 2)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        cls = self.cls_token.expand(B, -1, -1)
        for blk in self.blocks_token_only:
            cls = blk(x, cls)
        x = self.norm(torch.cat([cls, x], dim=1))
        return self.head(x[:, 0])


def test_cait_logits_parity():
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.models import Surrogate, WrappedModel
    from transferattack_tpu.models.cait import Cait
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    tmodel = TorchCait().eval()
    module = WrappedModel(
        backbone=Cait(dim=64, depth=3, depth_token_only=2, num_heads=4),
        size=32, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
    )
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    surrogate = Surrogate(name="cait_tiny", module=module,
                          variables=variables, input_size=32)
    converted = torch_state_dict_to_flax(tmodel.state_dict())
    variables, report = reconcile_with_module(converted, surrogate.variables)
    assert not report["missing"], report["missing"][:8]
    assert not report["mismatched"], report["mismatched"][:8]
    surrogate.variables = variables

    rng = np.random.RandomState(0)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    xn = (x - 0.5) / 0.5
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(xn.transpose(0, 3, 1, 2))).numpy()
    j_logits = np.asarray(surrogate.apply(surrogate.variables, jnp.asarray(x)))
    np.testing.assert_allclose(j_logits, t_logits, atol=1e-4, rtol=1e-4)
