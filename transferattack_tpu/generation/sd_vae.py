"""Stable-Diffusion VAE (diffusers ``AutoencoderKL``) in Flax, NHWC.

DiffAttack encodes the image to the 4-channel latent and decodes the
optimized latent back to pixels through this model
(``transferattack/generation/diffattack.py:27-32`` loads it as part of the
SD pipeline; encode/decode calls at ``diffattack.py:211-214,249-256``).

SD-1.5 config: block_out_channels (128,256,512,512), 2 layers/block,
mid-block single-head attention, latent scaling factor 0.18215.

Module nesting matches the diffusers state_dict under the generic
converter:

    encoder.down_blocks.0.resnets.0.norm1.weight
        → encoder/down_blocks_0/resnets_0/norm1/scale
    decoder.mid_block.attentions.0.to_q.weight
        → decoder/mid_block/attentions_0/to_q/kernel
    quant_conv.weight → quant_conv/kernel
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .sd_unet import SDResnetBlock, _conv, _gn

SD_VAE_SCALE = 0.18215


class VAEAttention(nn.Module):
    """diffusers VAE mid-block ``Attention``: group_norm then single-head
    to_q/to_k/to_v/to_out.0 (all with bias), residual add."""

    groups: int = 32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = _gn("group_norm", self.groups)(x).reshape(B, H * W, C)
        q = nn.Dense(C, name="to_q")(h)
        k = nn.Dense(C, name="to_k")(h)
        v = nn.Dense(C, name="to_v")(h)
        w = jnp.einsum("bnc,bmc->bnm", q, k) * (C ** -0.5)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(q.dtype)
        a = jnp.einsum("bnm,bmc->bnc", w, v)
        a = nn.Dense(C, name="to_out_0")(a)
        return x + a.reshape(B, H, W, C)


class VAEMidBlock(nn.Module):
    out_channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, h):
        h = SDResnetBlock(self.out_channels, self.groups, time_emb=False,
                          name="resnets_0")(h)
        h = VAEAttention(self.groups, name="attentions_0")(h)
        return SDResnetBlock(self.out_channels, self.groups, time_emb=False,
                             name="resnets_1")(h)


class VAEDownBlock(nn.Module):
    """``DownEncoderBlock2D``: resnets then an asymmetric-pad stride-2
    conv downsampler (diffusers pads (0,1,0,1) with padding=0)."""

    out_channels: int
    layers: int
    groups: int
    downsample: bool

    @nn.compact
    def __call__(self, h):
        for li in range(self.layers):
            h = SDResnetBlock(self.out_channels, self.groups, time_emb=False,
                              name=f"resnets_{li}")(h)
        if self.downsample:
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding="VALID", name="downsamplers_0_conv")(h)
        return h


class VAEUpBlock(nn.Module):
    """``UpDecoderBlock2D``: resnets then nearest-×2 + conv upsampler."""

    out_channels: int
    layers: int
    groups: int
    upsample: bool

    @nn.compact
    def __call__(self, h):
        for li in range(self.layers):
            h = SDResnetBlock(self.out_channels, self.groups, time_emb=False,
                              name=f"resnets_{li}")(h)
        if self.upsample:
            B, H, W, C = h.shape
            h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
            h = _conv(C, 3, "upsamplers_0_conv")(h)
        return h


class VAEEncoder(nn.Module):
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        n = len(self.block_out_channels)
        h = _conv(self.block_out_channels[0], 3, "conv_in")(x)
        for bi, ch in enumerate(self.block_out_channels):
            h = VAEDownBlock(ch, self.layers_per_block, self.groups,
                             downsample=bi < n - 1,
                             name=f"down_blocks_{bi}")(h)
        h = VAEMidBlock(self.block_out_channels[-1], self.groups,
                        name="mid_block")(h)
        h = nn.silu(_gn("conv_norm_out", self.groups)(h))
        return _conv(2 * self.latent_channels, 3, "conv_out")(h)


class VAEDecoder(nn.Module):
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    out_channels: int = 3
    groups: int = 32

    @nn.compact
    def __call__(self, z):
        n = len(self.block_out_channels)
        rev = list(reversed(self.block_out_channels))
        h = _conv(rev[0], 3, "conv_in")(z)
        h = VAEMidBlock(rev[0], self.groups, name="mid_block")(h)
        for bi, ch in enumerate(rev):
            h = VAEUpBlock(ch, self.layers_per_block + 1, self.groups,
                           upsample=bi < n - 1, name=f"up_blocks_{bi}")(h)
        h = nn.silu(_gn("conv_norm_out", self.groups)(h))
        return _conv(self.out_channels, 3, "conv_out")(h)


class SDVAE(nn.Module):
    """``AutoencoderKL``: encode → (mean, logvar); decode(z) → image in
    [-1, 1] space.  ``encode`` returns the distribution mean (DiffAttack
    uses the deterministic latent, ``diffattack.py:211-214``)."""

    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    groups: int = 32

    def setup(self):
        self.encoder = VAEEncoder(self.block_out_channels,
                                  self.layers_per_block,
                                  self.latent_channels, self.groups)
        self.decoder = VAEDecoder(self.block_out_channels,
                                  self.layers_per_block, 3, self.groups)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1))
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1))

    def encode(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, _logvar = jnp.split(moments, 2, axis=-1)
        return mean

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x):
        return self.decode(self.encode(x))
