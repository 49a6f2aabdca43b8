"""PiT-B (pooling-based ViT, timm ``pit_b_224`` layout) — eval-paper ViT
(``transferattack/utils.py:16``).

Stages of standard ViT blocks at dims 256/512/1024 with depthwise-conv
head pooling between stages; cls token pooled by a Linear.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from . import LN, register_model
from .vit import Block, DEFAULT_VIT_SURGERY, ViTSurgery


class ConvHeadPooling(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, tokens, cls, hw):
        H, W = hw
        B, N, C = tokens.shape
        x = tokens.reshape(B, H, W, C)
        x = nn.Conv(
            self.out_dim, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
            feature_group_count=C, name="conv",
        )(x)
        nh, nw = x.shape[1], x.shape[2]
        cls = nn.Dense(self.out_dim, name="fc")(cls)
        return x.reshape(B, nh * nw, self.out_dim), cls, (nh, nw)


class PiT(nn.Module):
    patch_size: int = 14
    stride: int = 7
    base_dims: tuple = (64, 64, 64)
    depth: tuple = (3, 6, 4)
    heads: tuple = (4, 8, 16)
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    surgery: ViTSurgery = DEFAULT_VIT_SURGERY

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        B = x.shape[0]
        dim0 = self.base_dims[0] * self.heads[0]
        # timm uses an unpadded (VALID) conv: 224² → 31² tokens for pit_b
        x = nn.Conv(
            dim0, (self.patch_size, self.patch_size),
            strides=(self.stride, self.stride), padding="VALID",
            name="patch_embed",
        )(x)
        H, W = x.shape[1], x.shape[2]
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, H, W, dim0))
        x = x + pos
        tokens = x.reshape(B, H * W, dim0)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, dim0))
        cls = jnp.broadcast_to(cls, (B, 1, dim0))

        hw = (H, W)
        block_counter = 0
        for stage, (bd, dp, nh) in enumerate(
            zip(self.base_dims, self.depth, self.heads)
        ):
            dim = bd * nh
            seq = jnp.concatenate([cls, tokens], axis=1)
            for j in range(dp):
                seq = Block(
                    dim, nh, self.mlp_ratio, self.surgery, block_counter,
                    name=f"transformers_{stage}_blocks_{j}",
                )(seq)
                block_counter += 1
            cls, tokens = seq[:, :1], seq[:, 1:]
            self.sow("intermediates", f"stage{stage}", seq)
            if stage < len(self.base_dims) - 1:
                tokens, cls, hw = ConvHeadPooling(
                    self.base_dims[stage + 1] * self.heads[stage + 1],
                    name=f"transformers_{stage}_pool",
                )(tokens, cls, hw)

        cls = LN(epsilon=1e-6, name="norm")(cls)
        feats = cls[:, 0]
        if features_only:
            return feats
        return nn.Dense(self.num_classes, name="head")(feats)


register_model("pit_b_224")(PiT)
register_model("pit_s_224")(
    lambda **kw: PiT(base_dims=(48, 48, 48), depth=(2, 6, 4), heads=(3, 6, 12), **kw)
)
