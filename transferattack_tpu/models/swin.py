"""Swin-T (timm ``swin_tiny_patch4_window7_224`` layout, NHWC) — eval-paper
ViT (``transferattack/utils.py:16``).

Windowed attention with cyclic shifts, relative position bias, and patch
merging.  Window partitioning is pure reshaping; shifts are ``jnp.roll`` —
all static shapes, MXU-friendly (49-token windows batch into one big matmul).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import LN, register_model
from .vit import PatchEmbed


def window_partition(x, ws: int):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(wins, ws: int, H: int, W: int):
    B = wins.shape[0] // ((H // ws) * (W // ws))
    x = wins.reshape(B, H // ws, W // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def shift_attn_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """Additive mask (-100 off-group) for shifted windows (per window index)."""
    img = np.zeros((1, H, W, 1))
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, h, w, :] = cnt
            cnt += 1
    wins = img.reshape(1, H // ws, ws, W // ws, ws, 1)
    wins = wins.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    mask = wins[:, None, :] - wins[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self, x, mask=None):
        Bw, N, C = x.shape
        h = self.num_heads
        hd = C // h
        qkv = nn.Dense(C * 3, name="qkv")(x)
        qkv = qkv.reshape(Bw, N, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(0, 1, 3, 2)) * hd**-0.5

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.window_size - 1) ** 2, h),
        )
        idx = relative_position_index(self.window_size)
        bias = table[idx.reshape(-1)].reshape(N, N, h).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(Bw // nw, nw, h, N, N) + mask[None, :, None]
            attn = attn.reshape(Bw, h, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(Bw, N, C)
        return nn.Dense(C, name="proj")(out)


class SwinMlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, name="fc2")(x)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        ws = min(self.window_size, H, W)
        shift = self.shift if ws < min(H, W) else 0
        shortcut = x
        h = LN(epsilon=1e-5, name="norm1")(x)
        if shift > 0:
            h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
        wins = window_partition(h, ws)
        mask = (
            jnp.asarray(shift_attn_mask(H, W, ws, shift)) if shift > 0 else None
        )
        wins = WindowAttention(self.dim, self.num_heads, ws, name="attn")(wins, mask)
        h = window_reverse(wins, ws, H, W)
        if shift > 0:
            h = jnp.roll(h, (shift, shift), axis=(1, 2))
        x = shortcut + h
        h = LN(epsilon=1e-5, name="norm2")(x)
        h = SwinMlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(h)
        return x + h


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        # timm order: (0::2, 0::2), (1::2, 0::2), (0::2, 1::2), (1::2, 1::2)
        x = jnp.concatenate(
            [x[:, :, 0, :, 0], x[:, :, 1, :, 0], x[:, :, 0, :, 1], x[:, :, 1, :, 1]],
            axis=-1,
        )
        x = LN(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


class SwinTransformer(nn.Module):
    patch_size: int = 4
    embed_dim: int = 96
    depths: tuple = (2, 2, 6, 2)
    num_heads: tuple = (3, 6, 12, 24)
    window_size: int = 7
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        B, H, W, _ = x.shape
        # space-to-depth + matmul patch projection (see vit.PatchEmbed —
        # bit-exact, MXU-friendly in both directions)
        x = PatchEmbed(self.embed_dim, self.patch_size, name="patch_embed")(x)
        x = x.reshape(B, H // self.patch_size, W // self.patch_size,
                      self.embed_dim)
        x = LN(epsilon=1e-5, name="patch_norm")(x)
        dim = self.embed_dim
        for i, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for j in range(depth):
                x = SwinBlock(
                    dim, heads, self.window_size,
                    shift=0 if j % 2 == 0 else self.window_size // 2,
                    name=f"layers_{i}_blocks_{j}",
                )(x)
            self.sow("intermediates", f"stage{i}", x)
            if i < len(self.depths) - 1:
                x = PatchMerging(dim, name=f"layers_{i}_downsample")(x)
                dim *= 2
        x = LN(epsilon=1e-5, name="norm")(x)
        x = jnp.mean(x, axis=(1, 2))
        if features_only:
            return x
        return nn.Dense(self.num_classes, name="head")(x)


register_model("swin_tiny_patch4_window7_224")(SwinTransformer)
register_model("swin_small_patch4_window7_224")(
    lambda **kw: SwinTransformer(depths=(2, 2, 18, 2), **kw)
)
