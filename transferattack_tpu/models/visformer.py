"""Visformer-S (timm ``visformer_small`` layout, NHWC) — eval-paper ViT
(``transferattack/utils.py:16``).

Hybrid conv/attention: a conv stem, one stage of spatial group-conv MLP
blocks, two stages of attention blocks — all with BatchNorm (the Visformer
design choice), global-pool head.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import register_model
from .vit import DEFAULT_VIT_SURGERY, ViTSurgery, apply_bwd_hook


def _bn(name):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5, name=name)


class SpatialMlp(nn.Module):
    hidden: int
    out: int
    group: int = 8
    spatial_conv: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.hidden, (1, 1), name="conv1")(x)
        x = nn.gelu(x, approximate=False)
        if self.spatial_conv:
            x = nn.Conv(
                self.hidden, (3, 3), padding=[(1, 1), (1, 1)],
                feature_group_count=self.group, name="conv2",
            )(x)
            x = nn.gelu(x, approximate=False)
        return nn.Conv(self.out, (1, 1), name="conv3")(x)


class ConvAttention(nn.Module):
    dim: int
    num_heads: int
    surgery: ViTSurgery = DEFAULT_VIT_SURGERY
    block_index: int = 0

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = self.num_heads
        hd = C // h
        s = self.surgery
        meta = {"block": self.block_index, "num_heads": h, "tokens": H * W}
        qkv = nn.Conv(C * 3, (1, 1), name="qkv")(x)
        qkv = apply_bwd_hook(
            qkv.reshape(B, H * W, C * 3), s.qkv_bwd, meta
        ).reshape(B, H, W, C * 3)
        qkv = qkv.reshape(B, H * W, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jax.nn.softmax((q @ k.transpose(0, 1, 3, 2)) * hd**-0.5, axis=-1)
        if s.attn_post is not None:
            attn = s.attn_post(attn, meta)
        if s.skip_attn_grad:
            attn = jax.lax.stop_gradient(attn)
        else:
            attn = apply_bwd_hook(attn, s.attn_bwd, meta)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, H, W, C)
        return nn.Conv(C, (1, 1), name="proj")(out)


class VisformerBlock(nn.Module):
    dim: int
    num_heads: int = 6
    mlp_ratio: float = 4.0
    group: int = 8
    use_attn: bool = True
    spatial_conv: bool = False
    surgery: ViTSurgery = DEFAULT_VIT_SURGERY
    block_index: int = 0

    @nn.compact
    def __call__(self, x):
        if self.use_attn:
            x = x + ConvAttention(
                self.dim, self.num_heads, self.surgery, self.block_index,
                name="attn",
            )(_bn("norm1")(x))
        h = _bn("norm2")(x)
        B, H, W, C = h.shape
        h = apply_bwd_hook(
            h.reshape(B, H * W, C), self.surgery.mlp_in_bwd,
            {"block": self.block_index},
        ).reshape(B, H, W, C)
        x = x + SpatialMlp(
            int(self.dim * self.mlp_ratio), self.dim, self.group,
            self.spatial_conv, name="mlp",
        )(h)
        return x


class Visformer(nn.Module):
    init_channels: int = 32
    embed_dim: int = 384
    depths: tuple = (7, 4, 4)
    num_heads: int = 6
    group: int = 8
    num_classes: int = 1000
    surgery: ViTSurgery = DEFAULT_VIT_SURGERY

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        # stem: 7×7/2 conv + BN + ReLU
        x = nn.Conv(self.init_channels, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False, name="stem_conv")(x)
        x = _bn("stem_norm")(x)
        x = nn.relu(x)
        # stage 1 at dim/2 with spatial-conv blocks (no attention)
        x = nn.Conv(self.embed_dim // 2, (4, 4), strides=(4, 4), name="patch_embed1")(x)
        x = _bn("embed_norm1")(x)
        pos1 = self.param(
            "pos_embed1", nn.initializers.normal(0.02),
            (1, x.shape[1], x.shape[2], self.embed_dim // 2),
        )
        x = x + pos1
        for j in range(self.depths[0]):
            x = VisformerBlock(
                self.embed_dim // 2, self.num_heads, group=self.group,
                use_attn=False, spatial_conv=True, surgery=self.surgery,
                block_index=j, name=f"stage1_{j}",
            )(x)
        self.sow("intermediates", "stage1", x)
        # stage 2 at dim with attention
        x = nn.Conv(self.embed_dim, (2, 2), strides=(2, 2), name="patch_embed2")(x)
        x = _bn("embed_norm2")(x)
        pos2 = self.param(
            "pos_embed2", nn.initializers.normal(0.02),
            (1, x.shape[1], x.shape[2], self.embed_dim),
        )
        x = x + pos2
        for j in range(self.depths[1]):
            x = VisformerBlock(
                self.embed_dim, self.num_heads, surgery=self.surgery,
                block_index=self.depths[0] + j, name=f"stage2_{j}",
            )(x)
        self.sow("intermediates", "stage2", x)
        # stage 3 at dim*2 with attention
        x = nn.Conv(self.embed_dim * 2, (2, 2), strides=(2, 2), name="patch_embed3")(x)
        x = _bn("embed_norm3")(x)
        pos3 = self.param(
            "pos_embed3", nn.initializers.normal(0.02),
            (1, x.shape[1], x.shape[2], self.embed_dim * 2),
        )
        x = x + pos3
        for j in range(self.depths[2]):
            x = VisformerBlock(
                self.embed_dim * 2, self.num_heads, surgery=self.surgery,
                block_index=self.depths[0] + self.depths[1] + j,
                name=f"stage3_{j}",
            )(x)
        self.sow("intermediates", "stage3", x)
        x = _bn("norm")(x)
        x = jnp.mean(x, axis=(1, 2))
        if features_only:
            return x
        return nn.Dense(self.num_classes, name="head")(x)


register_model("visformer_small")(Visformer)
