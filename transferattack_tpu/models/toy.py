"""Tiny surrogates for fast CPU tests.

The reference has no test models (SURVEY.md §4); these provide a fake backend
so attack-loop semantics (copies, label repeat, clamp, momentum) are testable
without pretrained weights, at 32×32 resolution.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from . import register_model


class ToyCNN(nn.Module):
    num_classes: int = 10
    width: int = 16

    @nn.compact
    def __call__(self, x, features_only: bool = False, tap_fns=None):
        taps = tap_fns or {}
        x = nn.Conv(self.width, (3, 3), strides=(2, 2), name="conv1")(x)
        x = nn.relu(x)
        if "stage1" in taps:
            x = taps["stage1"](x)
        self.sow("intermediates", "stage1", x)
        x = nn.Conv(self.width * 2, (3, 3), strides=(2, 2), name="conv2")(x)
        x = nn.relu(x)
        if "stage2" in taps:
            x = taps["stage2"](x)
        self.sow("intermediates", "stage2", x)
        x = jnp.mean(x, axis=(1, 2))
        if features_only:
            return x
        return nn.Dense(self.num_classes, name="fc")(x)


class ToyViT(nn.Module):
    """Minimal ViT (patch embed + 2 blocks) for ViT-family attack tests."""

    num_classes: int = 10
    dim: int = 32
    depth: int = 2
    heads: int = 2

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        B = x.shape[0]
        x = nn.Conv(self.dim, (8, 8), strides=(8, 8), name="patch_embed")(x)
        x = x.reshape(B, -1, self.dim)
        cls = self.param("cls", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)), x], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, x.shape[1], self.dim)
        )
        x = x + pos
        for i in range(self.depth):
            h = nn.LayerNorm(name=f"norm1_{i}")(x)
            h = nn.SelfAttention(num_heads=self.heads, name=f"attn_{i}")(h)
            x = x + h
            h = nn.LayerNorm(name=f"norm2_{i}")(x)
            h = nn.Dense(self.dim * 2, name=f"mlp1_{i}")(h)
            h = nn.gelu(h)
            h = nn.Dense(self.dim, name=f"mlp2_{i}")(h)
            x = x + h
            self.sow("intermediates", f"block{i}", x)
        x = nn.LayerNorm(name="norm")(x)
        feats = x[:, 0]
        if features_only:
            return feats
        return nn.Dense(self.num_classes, name="head")(feats)


register_model("toy_cnn", input_size=32, mean=(0.5,) * 3, std=(0.5,) * 3)(ToyCNN)
register_model("toy_cnn2", input_size=32, mean=(0.5,) * 3, std=(0.5,) * 3)(
    lambda **kw: ToyCNN(width=24, **kw)
)
register_model("toy_vit", input_size=32, mean=(0.5,) * 3, std=(0.5,) * 3)(ToyViT)
