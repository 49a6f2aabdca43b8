"""CaiT-S24 (timm layout, NHWC) with gradient-surgery hook points.

CaiT is in the reference's eval/surrogate lists (``utils.py:21-25``) and has
a dedicated TGR branch (``model_related/tgr.py:223-230``, hooks on the 24
talking-heads blocks and the 2 class-attention blocks).  Architecture: 24
LayerScale blocks with talking-heads attention over patch tokens only, then
2 class-attention blocks where a class token cross-attends to the patches
(Touvron et al., "Going deeper with image transformers").

Surgery: ``surgery`` hooks the 24 main blocks exactly like the ViT; the
class-attention stage uses a separate ``cls_surgery`` whose ``attn_bwd``
sees the (B, h, 1, N) class-attention map, ``q_bwd`` the class-token query
projection, and ``qkv_bwd`` the separate k/v projections.

Naming tracks timm's ``cait_s24_224`` for weight conversion:
``blocks.i.attn.{qkv,proj_l,proj_w,proj}``, ``blocks.i.gamma_{1,2}``,
``blocks_token_only.i.attn.{q,k,v,proj}``, ``cls_token``, ``pos_embed``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import LN, register_model
from .vit import (DEFAULT_VIT_SURGERY, Mlp, PatchEmbed, ViTSurgery,
                  apply_bwd_hook)


class TalkingHeadAttn(nn.Module):
    """Attention with pre/post-softmax head mixing (``proj_l``/``proj_w``)."""

    dim: int
    num_heads: int
    surgery: ViTSurgery = DEFAULT_VIT_SURGERY
    block_index: int = 0

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        h = self.num_heads
        head_dim = D // h
        s = self.surgery
        meta = {"block": self.block_index, "num_heads": h, "tokens": N}

        qkv = nn.Dense(D * 3, name="qkv")(x)
        if s.qkv_post is not None:
            qkv = s.qkv_post(qkv, meta)
        qkv = apply_bwd_hook(qkv, s.qkv_bwd, meta)
        qkv = qkv.reshape(B, N, 3, h, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * head_dim**-0.5, qkv[1], qkv[2]

        attn = q @ k.transpose(0, 1, 3, 2)  # (B, h, N, N)
        # talking heads: mix the head axis before and after softmax
        attn = nn.Dense(h, name="proj_l")(attn.transpose(0, 2, 3, 1))
        attn = attn.transpose(0, 3, 1, 2)
        # the reference's attn_drop hook lands on the softmax-input cotangent
        attn = apply_bwd_hook(attn, s.scores_bwd, meta)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dense(h, name="proj_w")(attn.transpose(0, 2, 3, 1))
        attn = attn.transpose(0, 3, 1, 2)
        if s.attn_post is not None:
            attn = s.attn_post(attn, meta)
        if s.skip_attn_grad:
            attn = jax.lax.stop_gradient(attn)
        else:
            attn = apply_bwd_hook(attn, s.attn_bwd, meta)

        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, D)
        self.sow("intermediates", "attn", attn)
        return nn.Dense(D, name="proj")(out)


class ClassAttn(nn.Module):
    """Class token cross-attends to [cls, patches] (separate q/k/v)."""

    dim: int
    num_heads: int
    surgery: ViTSurgery = DEFAULT_VIT_SURGERY
    block_index: int = 0

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        h = self.num_heads
        head_dim = D // h
        s = self.surgery
        meta = {"block": self.block_index, "num_heads": h, "tokens": N}

        q = nn.Dense(D, name="q")(x[:, 0:1])
        q = apply_bwd_hook(q, s.q_bwd, meta)
        k = nn.Dense(D, name="k")(x)
        k = apply_bwd_hook(k, s.qkv_bwd, meta)
        v = nn.Dense(D, name="v")(x)
        v = apply_bwd_hook(v, s.qkv_bwd, meta)
        q = q.reshape(B, 1, h, head_dim).transpose(0, 2, 1, 3) * head_dim**-0.5
        k = k.reshape(B, N, h, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, h, head_dim).transpose(0, 2, 1, 3)

        scores = q @ k.transpose(0, 1, 3, 2)  # (B, h, 1, N)
        scores = apply_bwd_hook(scores, s.scores_bwd, meta)
        attn = jax.nn.softmax(scores, axis=-1)
        if s.skip_attn_grad:
            attn = jax.lax.stop_gradient(attn)
        else:
            attn = apply_bwd_hook(attn, s.attn_bwd, meta)

        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, 1, D)
        return nn.Dense(D, name="proj")(out)


class LayerScaleBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    init_values: float = 1e-5
    surgery: ViTSurgery = DEFAULT_VIT_SURGERY
    block_index: int = 0

    @nn.compact
    def __call__(self, x):
        g1 = self.param("gamma_1", nn.initializers.constant(self.init_values),
                        (self.dim,))
        g2 = self.param("gamma_2", nn.initializers.constant(self.init_values),
                        (self.dim,))
        x = x + g1 * TalkingHeadAttn(
            self.dim, self.num_heads, self.surgery, self.block_index,
            name="attn",
        )(LN(epsilon=1e-6, name="norm1")(x))
        h = LN(epsilon=1e-6, name="norm2")(x)
        h = apply_bwd_hook(
            h, self.surgery.mlp_in_bwd, {"block": self.block_index}
        )
        x = x + g2 * Mlp(
            int(self.dim * self.mlp_ratio), self.dim, self.surgery,
            self.block_index, name="mlp",
        )(h)
        self.sow("intermediates", "block_out", x)
        return x


class LayerScaleBlockClassAttn(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    init_values: float = 1e-5
    surgery: ViTSurgery = DEFAULT_VIT_SURGERY
    block_index: int = 0

    @nn.compact
    def __call__(self, x, cls):
        g1 = self.param("gamma_1", nn.initializers.constant(self.init_values),
                        (self.dim,))
        g2 = self.param("gamma_2", nn.initializers.constant(self.init_values),
                        (self.dim,))
        u = jnp.concatenate([cls, x], axis=1)
        cls = cls + g1 * ClassAttn(
            self.dim, self.num_heads, self.surgery, self.block_index,
            name="attn",
        )(LN(epsilon=1e-6, name="norm1")(u))
        h = LN(epsilon=1e-6, name="norm2")(cls)
        h = apply_bwd_hook(
            h, self.surgery.mlp_in_bwd, {"block": self.block_index}
        )
        cls = cls + g2 * Mlp(
            int(self.dim * self.mlp_ratio), self.dim, self.surgery,
            self.block_index, name="mlp",
        )(h)
        return cls


class Cait(nn.Module):
    patch_size: int = 16
    dim: int = 384
    depth: int = 24
    depth_token_only: int = 2
    num_heads: int = 8
    mlp_ratio: float = 4.0
    init_values: float = 1e-5
    num_classes: int = 1000
    surgery: ViTSurgery = DEFAULT_VIT_SURGERY       # 24 main blocks
    cls_surgery: ViTSurgery = DEFAULT_VIT_SURGERY   # class-attention blocks

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        B = x.shape[0]
        # space-to-depth + matmul patch projection (see vit.PatchEmbed —
        # bit-exact, MXU-friendly in both directions)
        x = PatchEmbed(self.dim, self.patch_size, name="patch_embed")(x)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, x.shape[1], self.dim)
        )
        x = x + pos
        for i in range(self.depth):
            x = LayerScaleBlock(
                self.dim, self.num_heads, self.mlp_ratio, self.init_values,
                self.surgery, i, name=f"blocks_{i}",
            )(x)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        cls = jnp.broadcast_to(cls, (B, 1, self.dim))
        for i in range(self.depth_token_only):
            cls = LayerScaleBlockClassAttn(
                self.dim, self.num_heads, self.mlp_ratio, self.init_values,
                self.cls_surgery, i, name=f"blocks_token_only_{i}",
            )(x, cls)
        x = jnp.concatenate([cls, x], axis=1)
        x = LN(epsilon=1e-6, name="norm")(x)
        feats = x[:, 0]
        if features_only:
            return feats
        return nn.Dense(self.num_classes, name="head")(feats)


register_model("cait_s24_224")(Cait)
