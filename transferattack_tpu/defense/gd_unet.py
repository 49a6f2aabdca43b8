"""Guided-diffusion UNet (faithful Flax port of the reference's vendored
``defense/diffpure/guided_diffusion/unet.py:404-672`` — the 256×256
unconditional ImageNet model whose official checkpoint
(``256x256_diffusion_uncond.pt``) DiffPure loads).

Architecture parameters follow ``defense/diffpure/configs/imagenet.yml``:
model_channels=256, num_res_blocks=2, attention at downsample rates 8/16/32,
channel_mult=(1,1,2,2,4,4), num_head_channels=64, scale-shift GroupNorm,
resblock up/downsampling, learn_sigma (6 output channels).

Layout is NHWC; module names are chosen so the generic converter
(``utils/convert.py`` — dots→slashes, numeric segments merged) maps the
official state_dict keys 1:1:

    input_blocks.4.0.in_layers.0.weight  → input_blocks_4_0/in_layers_0/scale
    input_blocks.7.1.qkv.weight (O,I,1)  → input_blocks_7_1/qkv/kernel (I,O)
    middle_block.1.proj_out.weight       → middle_block_1/proj_out/kernel
    time_embed.0.weight                  → time_embed_0/kernel
    out.2.weight                         → out_2/kernel
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """Sinusoidal embedding (``guided_diffusion/nn.py`` timestep_embedding):
    cos/sin halves over exp(-ln(P)·i/half) frequencies."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def _gn32(name: str):
    """GroupNorm(32) computed in fp32 (the reference's GroupNorm32)."""
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32, name=name)


def _conv(features: int, kernel: int, name: str):
    pad = kernel // 2
    return nn.Conv(features, (kernel, kernel),
                   padding=[(pad, pad), (pad, pad)], name=name)


def _upsample2(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")


def _downsample2(x):
    # Downsample(use_conv=False) = AvgPool stride 2 (``unet.py:140-144``)
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class GDResBlock(nn.Module):
    """``unet.py:151-264`` ResBlock with scale-shift norm and optional
    in-block up/downsampling (h and skip resampled separately)."""

    out_channels: int
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False

    @nn.compact
    def __call__(self, x, emb):
        h = nn.silu(_gn32("in_layers_0")(x))
        if self.up:
            h, x = _upsample2(h), _upsample2(x)
        elif self.down:
            h, x = _downsample2(h), _downsample2(x)
        h = _conv(self.out_channels, 3, "in_layers_2")(h)

        e_dim = 2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
        e = nn.Dense(e_dim, name="emb_layers_1")(nn.silu(emb))
        e = e[:, None, None, :].astype(h.dtype)
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(e, 2, axis=-1)
            h = _gn32("out_layers_0")(h) * (1 + scale) + shift
        else:
            h = _gn32("out_layers_0")(h + e)
        h = nn.silu(h)
        # out_layers.3 is zero-initialized in the reference (zero_module)
        h = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=nn.initializers.zeros, name="out_layers_3")(h)

        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="skip_connection")(x)
        return x + h


class GDAttention(nn.Module):
    """``unet.py:267-334`` spatial self-attention with QKVAttentionLegacy
    channel layout (head-major, [q|k|v] within each head) and fp32 softmax."""

    num_head_channels: int = 64

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        heads = C // self.num_head_channels
        ch = self.num_head_channels
        h = _gn32("norm")(x).reshape(B, H * W, C)
        # torch conv_nd(1, C, 3C, 1) ≡ Dense over the channel axis
        qkv = nn.Dense(3 * C, name="qkv")(h)          # (B, T, heads*3*ch)
        qkv = qkv.reshape(B, H * W, heads, 3, ch)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        scale = 1.0 / jnp.sqrt(jnp.sqrt(float(ch)))
        w = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(qkv.dtype)
        # DiffAttack's AttentionStore taps every UNet attention map
        # (``diffattack.py:689-707``); captured via mutable=['intermediates']
        self.sow("intermediates", "attn", w)
        a = jnp.einsum("bhts,bshc->bthc", w, v).reshape(B, H * W, C)
        # proj_out is zero-initialized (zero_module)
        a = nn.Dense(C, kernel_init=nn.initializers.zeros, name="proj_out")(a)
        return x + a.reshape(B, H, W, C)


class GuidedDiffusionUNet(nn.Module):
    """``unet.py:404-672`` UNetModel, ImageNet-256 uncond defaults."""

    image_size: int = 256
    in_channels: int = 3
    model_channels: int = 256
    out_channels: int = 6          # learn_sigma
    num_res_blocks: int = 2
    attention_ds: Tuple[int, ...] = (8, 16, 32)
    channel_mult: Tuple[int, ...] = (1, 1, 2, 2, 4, 4)
    num_head_channels: int = 64
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True

    @nn.compact
    def __call__(self, x, timesteps):
        mc = self.model_channels
        emb = timestep_embedding(timesteps, mc)
        emb = nn.Dense(mc * 4, name="time_embed_0")(emb)
        emb = nn.Dense(mc * 4, name="time_embed_2")(nn.silu(emb))

        ch = int(self.channel_mult[0] * mc)
        h = _conv(ch, 3, "input_blocks_0_0")(x)
        hs = [h]
        n = 1  # input_blocks index (the torch ModuleList counter)
        ds = 1
        input_chans = [ch]
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                ch = int(mult * mc)
                h = GDResBlock(ch, self.use_scale_shift_norm,
                               name=f"input_blocks_{n}_0")(h, emb)
                if ds in self.attention_ds:
                    h = GDAttention(self.num_head_channels,
                                    name=f"input_blocks_{n}_1")(h)
                hs.append(h)
                input_chans.append(ch)
                n += 1
            if level != len(self.channel_mult) - 1:
                # resblock_updown: a down ResBlock (same out channels)
                h = GDResBlock(ch, self.use_scale_shift_norm, down=True,
                               name=f"input_blocks_{n}_0")(h, emb)
                hs.append(h)
                input_chans.append(ch)
                n += 1
                ds *= 2

        h = GDResBlock(ch, self.use_scale_shift_norm, name="middle_block_0")(h, emb)
        h = GDAttention(self.num_head_channels, name="middle_block_1")(h)
        h = GDResBlock(ch, self.use_scale_shift_norm, name="middle_block_2")(h, emb)

        n = 0
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                hs_pop = hs.pop()
                input_chans.pop()
                h = jnp.concatenate([h, hs_pop], axis=-1)
                ch = int(mult * mc)
                h = GDResBlock(ch, self.use_scale_shift_norm,
                               name=f"output_blocks_{n}_0")(h, emb)
                m = 1
                if ds in self.attention_ds:
                    h = GDAttention(self.num_head_channels,
                                    name=f"output_blocks_{n}_{m}")(h)
                    m += 1
                if level and i == self.num_res_blocks:
                    h = GDResBlock(ch, self.use_scale_shift_norm, up=True,
                                   name=f"output_blocks_{n}_{m}")(h, emb)
                    ds //= 2
                n += 1

        h = nn.silu(_gn32("out_0")(h))
        return nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                       kernel_init=nn.initializers.zeros, name="out_2")(h)
