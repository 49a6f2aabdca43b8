"""Stable-Diffusion-1.5 conditional UNet in Flax (for DiffAttack).

The reference drives SD through diffusers' ``UNet2DConditionModel``
(``transferattack/generation/diffattack.py:27-32``); this is a faithful
re-implementation of that architecture (the ``runwayml/stable-diffusion-v1-5``
config: sample 64×64×4, block_out_channels (320,640,1280,1280),
layers_per_block 2, 8 attention heads, cross_attention_dim 768,
CrossAttnDownBlock2D ×3 + DownBlock2D down path, UNetMidBlock2DCrossAttn,
UpBlock2D + CrossAttnUpBlock2D ×3 up path) in NHWC layout.

Module nesting mirrors the diffusers state_dict so the generic converter
(``utils/convert.py`` — dots→slashes, numeric merges) maps it 1:1:

    down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight
        → down_blocks_0/attentions_0/transformer_blocks_0/attn1/to_q/kernel
    time_embedding.linear_1.weight → time_embedding/linear_1/kernel
    mid_block.resnets.0.norm1.weight → mid_block/resnets_0/norm1/scale

Both attention maps sow into ``intermediates`` — ``attn`` (self, attn1) and
``cross_attn`` (text, attn2) — which is DiffAttack's AttentionStore
(``diffattack.py:689-720``): the self maps feed the preservation loss, the
cross maps the true-label cross-attention variance term.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def sd_timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """diffusers ``Timesteps`` with flip_sin_to_cos=True, shift=0:
    cat[cos, sin] over exp(-ln(P)·i/half) frequencies."""
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _gn(name: str, groups: int = 32):
    return nn.GroupNorm(num_groups=groups, epsilon=1e-5,
                        dtype=jnp.float32, name=name)


def _conv(features: int, kernel: int, name: str, stride: int = 1):
    pad = kernel // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(pad, pad), (pad, pad)], name=name)


class SDTimeEmbedding(nn.Module):
    """diffusers ``TimestepEmbedding``: linear_1 → silu → linear_2."""

    dim: int

    @nn.compact
    def __call__(self, emb):
        emb = nn.Dense(self.dim, name="linear_1")(emb)
        return nn.Dense(self.dim, name="linear_2")(nn.silu(emb))


class SDResnetBlock(nn.Module):
    """diffusers ``ResnetBlock2D`` (norm-silu-conv ×2, additive time emb,
    1×1 shortcut on channel change)."""

    out_channels: int
    groups: int = 32
    time_emb: bool = True

    @nn.compact
    def __call__(self, x, temb=None):
        h = nn.silu(_gn("norm1", self.groups)(x))
        h = _conv(self.out_channels, 3, "conv1")(h)
        if self.time_emb and temb is not None:
            e = nn.Dense(self.out_channels, name="time_emb_proj")(nn.silu(temb))
            h = h + e[:, None, None, :].astype(h.dtype)
        h = nn.silu(_gn("norm2", self.groups)(h))
        h = _conv(self.out_channels, 3, "conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut")(x)
        return x + h


class SDCrossAttention(nn.Module):
    """diffusers ``Attention``: to_q/to_k/to_v without bias, to_out.0 with.
    Self-attention when ``context`` is None.  Sows the attention probs."""

    heads: int
    sow_name: str = "attn"

    @nn.compact
    def __call__(self, x, context=None):
        B, N, C = x.shape
        ctx = x if context is None else context
        dh = C // self.heads
        q = nn.Dense(C, use_bias=False, name="to_q")(x)
        k = nn.Dense(C, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(C, use_bias=False, name="to_v")(ctx)
        M = ctx.shape[1]
        q = q.reshape(B, N, self.heads, dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, M, self.heads, dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, M, self.heads, dh).transpose(0, 2, 1, 3)
        w = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (dh ** -0.5)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(q.dtype)
        self.sow("intermediates", self.sow_name, w)
        a = jnp.einsum("bhnm,bhmd->bhnd", w, v)
        a = a.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, name="to_out_0")(a)


class SDFeedForward(nn.Module):
    """GEGLU feed-forward: net.0.proj → chunk → x·gelu(gate); net.2 out."""

    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * 8, name="net_0_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, name="net_2")(h)


class SDTransformerBlock(nn.Module):
    """diffusers ``BasicTransformerBlock``: self-attn, text cross-attn, FF."""

    heads: int

    @nn.compact
    def __call__(self, x, context):
        x = x + SDCrossAttention(self.heads, "attn", name="attn1")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x))
        x = x + SDCrossAttention(self.heads, "cross_attn", name="attn2")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context)
        x = x + SDFeedForward(x.shape[-1], name="ff")(
            nn.LayerNorm(epsilon=1e-5, name="norm3")(x))
        return x


class SDTransformer2D(nn.Module):
    """diffusers ``Transformer2DModel`` (use_linear_projection=False: 1×1
    conv proj_in/out), depth 1."""

    heads: int
    groups: int = 32

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        res = x
        h = _gn("norm", self.groups)(x)
        h = nn.Conv(C, (1, 1), name="proj_in")(h)
        h = h.reshape(B, H * W, C)
        h = SDTransformerBlock(self.heads, name="transformer_blocks_0")(
            h, context)
        h = h.reshape(B, H, W, C)
        h = nn.Conv(C, (1, 1), name="proj_out")(h)
        return h + res


class SDDownBlock(nn.Module):
    """CrossAttnDownBlock2D (``with_attn``) / DownBlock2D. Returns the
    running feature and the per-layer skip states."""

    out_channels: int
    layers: int
    heads: int
    groups: int
    with_attn: bool
    downsample: bool

    @nn.compact
    def __call__(self, h, temb, context):
        skips = []
        for li in range(self.layers):
            h = SDResnetBlock(self.out_channels, self.groups,
                              name=f"resnets_{li}")(h, temb)
            if self.with_attn:
                h = SDTransformer2D(self.heads, self.groups,
                                    name=f"attentions_{li}")(h, context)
            skips.append(h)
        if self.downsample:
            h = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)],
                        name="downsamplers_0_conv")(h)
            skips.append(h)
        return h, skips


class SDMidBlock(nn.Module):
    """UNetMidBlock2DCrossAttn: resnet, transformer, resnet."""

    out_channels: int
    heads: int
    groups: int

    @nn.compact
    def __call__(self, h, temb, context):
        h = SDResnetBlock(self.out_channels, self.groups,
                          name="resnets_0")(h, temb)
        h = SDTransformer2D(self.heads, self.groups,
                            name="attentions_0")(h, context)
        return SDResnetBlock(self.out_channels, self.groups,
                             name="resnets_1")(h, temb)


class SDUpBlock(nn.Module):
    """CrossAttnUpBlock2D (``with_attn``) / UpBlock2D; consumes skips."""

    out_channels: int
    layers: int
    heads: int
    groups: int
    with_attn: bool
    upsample: bool

    @nn.compact
    def __call__(self, h, skips, temb, context):
        for li in range(self.layers):
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = SDResnetBlock(self.out_channels, self.groups,
                              name=f"resnets_{li}")(h, temb)
            if self.with_attn:
                h = SDTransformer2D(self.heads, self.groups,
                                    name=f"attentions_{li}")(h, context)
        if self.upsample:
            B, H, W, C = h.shape
            h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
            h = _conv(C, 3, "upsamplers_0_conv")(h)
        return h


class SDUNet(nn.Module):
    """``UNet2DConditionModel`` at the SD-1.5 config (NHWC).

    ``__call__(latent (B,h,w,4), t (B,), context (B,77,768)) → eps``.
    """

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    heads: int = 8
    cross_attention_dim: int = 768
    norm_groups: int = 32

    @nn.compact
    def __call__(self, x, timesteps, context):
        ch0 = self.block_out_channels[0]
        temb = sd_timestep_embedding(timesteps, ch0)
        temb = SDTimeEmbedding(ch0 * 4, name="time_embedding")(temb)

        h = _conv(ch0, 3, "conv_in")(x)
        skips = [h]
        n = len(self.block_out_channels)
        for bi, ch in enumerate(self.block_out_channels):
            h, s = SDDownBlock(
                ch, self.layers_per_block, self.heads, self.norm_groups,
                with_attn=bi < n - 1, downsample=bi < n - 1,
                name=f"down_blocks_{bi}")(h, temb, context)
            skips.extend(s)

        h = SDMidBlock(self.block_out_channels[-1], self.heads,
                       self.norm_groups, name="mid_block")(h, temb, context)

        for bi, ch in enumerate(reversed(self.block_out_channels)):
            h = SDUpBlock(
                ch, self.layers_per_block + 1, self.heads, self.norm_groups,
                with_attn=bi > 0, upsample=bi < n - 1,
                name=f"up_blocks_{bi}")(h, skips, temb, context)

        h = nn.silu(_gn("conv_norm_out", self.norm_groups)(h))
        return _conv(self.out_channels, 3, "conv_out")(h)
