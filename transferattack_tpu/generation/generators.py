"""Generator architectures for generation-based attacks (reference:
``transferattack/generation/{cdtp,ttp,m3d,ltp,ge_advgan}.py`` GeneratorResnet,
``ada.py`` U-Net AttackGenerator, ``aim.py`` ResNetGenerator).

Flax/NHWC re-implementations with torch-layout-compatible naming for weight
conversion; BatchNorm runs in inference mode.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

NGF = 64


def reflect_pad(x, p: int):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


def _bn(name):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5, name=name)


class ResidualBlock(nn.Module):
    filters: int

    @nn.compact
    def __call__(self, x):
        h = reflect_pad(x, 1)
        h = nn.Conv(self.filters, (3, 3), padding="VALID", use_bias=False,
                    name="conv1")(h)
        h = _bn("bn1")(h)
        h = nn.relu(h)
        # dropout is inference-off (reference uses eval mode)
        h = reflect_pad(h, 1)
        h = nn.Conv(self.filters, (3, 3), padding="VALID", use_bias=False,
                    name="conv2")(h)
        h = _bn("bn2")(h)
        return x + h


class GeneratorResnet(nn.Module):
    """The TTP/M3D/CDTP/LTP generator (``cdtp.py:14-80``): 2 downsamples,
    6 resblocks, 2 transposed-conv upsamples, tanh → [0, 1]."""

    inception: bool = False
    data_dim: str = "high"

    @nn.compact
    def __call__(self, x):
        h = reflect_pad(x, 3)
        h = nn.Conv(NGF, (7, 7), padding="VALID", use_bias=False, name="block1_conv")(h)
        h = _bn("block1_bn")(h)
        h = nn.relu(h)
        h = nn.Conv(NGF * 2, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="block2_conv")(h)
        h = _bn("block2_bn")(h)
        h = nn.relu(h)
        h = nn.Conv(NGF * 4, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="block3_conv")(h)
        h = _bn("block3_bn")(h)
        h = nn.relu(h)
        n_blocks = 6 if self.data_dim == "high" else 2
        for i in range(n_blocks):
            h = ResidualBlock(NGF * 4, name=f"resblock{i + 1}")(h)
        # torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1) ≡ flax
        # ConvTranspose with transpose_kernel=True (kernel (kh,kw,out,in),
        # spatially flipped — the converted torch layout) and padding
        # (k−1−p, k−1−p+op) = (1, 2); verified elementwise vs torch
        # (tests/test_generation_parity.py)
        h = nn.ConvTranspose(NGF * 2, (3, 3), strides=(2, 2),
                             padding=[(1, 2), (1, 2)], transpose_kernel=True,
                             use_bias=False, name="upsampl1_conv")(h)
        h = _bn("upsampl1_bn")(h)
        h = nn.relu(h)
        h = nn.ConvTranspose(NGF, (3, 3), strides=(2, 2),
                             padding=[(1, 2), (1, 2)], transpose_kernel=True,
                             use_bias=False, name="upsampl2_conv")(h)
        h = _bn("upsampl2_bn")(h)
        h = nn.relu(h)
        h = reflect_pad(h, 3)
        h = nn.Conv(3, (7, 7), padding="VALID", name="blockf_conv")(h)
        if self.inception:
            h = h[:, 1:, :-1, :]
        return (jnp.tanh(h) + 1) / 2


def instance_norm(x, eps=1e-5):
    """torch ``nn.InstanceNorm2d`` defaults (affine=False,
    track_running_stats=False): per-sample per-channel normalization with
    no learned parameters."""
    mu = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps)


class _AdvGANResnetBlock(nn.Module):
    """``ge_advgan.py`` ResnetBlock(dim, padding_type='reflect',
    norm_layer=BatchNorm2d, use_dropout=False, use_bias=False).  Flax
    submodule names equal the torch merged state_dict paths
    (``conv_block.1`` → ``conv_block_1``) so conversion needs no rewrites."""

    dim: int

    @nn.compact
    def __call__(self, x):
        h = reflect_pad(x, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=False,
                    name="conv_block_1")(h)
        h = _bn("conv_block_2")(h)
        h = nn.relu(h)
        h = reflect_pad(h, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=False,
                    name="conv_block_5")(h)
        h = _bn("conv_block_6")(h)
        return x + h


class AdvGANGenerator(nn.Module):
    """GE-AdvGAN's Generator (``ge_advgan.py:55-106``): 3-conv encoder with
    InstanceNorm (VALID padding), 4 BatchNorm resnet blocks, 3
    transposed-conv decoder, final tanh — the output IS the signed
    perturbation in [−1, 1] (clamped to ±ε by the attack,
    ``ge_advgan.py:169-176``).  Valid-size inputs: even H/W ≥ ~16
    reproduce torch's shape arithmetic exactly at even sizes (the
    reference crops a row/column at odd sizes — handled by the attack)."""

    channels: int = 3

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(8, (3, 3), padding="VALID", name="encoder_0")(x)
        h = nn.relu(instance_norm(h))
        h = nn.Conv(16, (3, 3), strides=(2, 2), padding="VALID",
                    name="encoder_3")(h)
        h = nn.relu(instance_norm(h))
        h = nn.Conv(32, (3, 3), strides=(2, 2), padding="VALID",
                    name="encoder_6")(h)
        h = nn.relu(instance_norm(h))
        for i in range(4):
            h = _AdvGANResnetBlock(32, name=f"bottle_neck_{i}")(h)
        # torch ConvTranspose2d(k3, s2, p0) ≡ flax VALID + transpose_kernel
        h = nn.ConvTranspose(16, (3, 3), strides=(2, 2), padding="VALID",
                             transpose_kernel=True, use_bias=False,
                             name="decoder_0")(h)
        h = nn.relu(instance_norm(h))
        h = nn.ConvTranspose(8, (3, 3), strides=(2, 2), padding="VALID",
                             transpose_kernel=True, use_bias=False,
                             name="decoder_3")(h)
        h = nn.relu(instance_norm(h))
        h = nn.ConvTranspose(self.channels, (6, 6), strides=(1, 1),
                             padding="VALID", transpose_kernel=True,
                             use_bias=False, name="decoder_6")(h)
        return jnp.tanh(h)


class _ADADown(nn.Module):
    """``UNetDown`` (``ada.py:99-128``): k3 s2 p1 conv (bias-free),
    optional BatchNorm (eps 1e-10), LeakyReLU(0.2).  The z tiling happens
    in the caller (it changes the conv's input channels)."""

    feats: int
    norm: bool

    @nn.compact
    def __call__(self, h):
        h = nn.Conv(self.feats, (3, 3), strides=(2, 2),
                    padding=[(1, 1), (1, 1)], use_bias=False, name="conv")(h)
        if self.norm:
            h = nn.BatchNorm(use_running_average=True, epsilon=1e-10,
                             name="norm")(h)
        return nn.leaky_relu(h, 0.2)


class _ADAUp(nn.Module):
    """``UNetUp`` (``ada.py:130-152``): ConvTranspose2d(k3, s2, p1, op) →
    flax padding (1, 1+op) with transpose_kernel, BatchNorm eps 1e-10, ReLU."""

    feats: int
    out_pad: int

    @nn.compact
    def __call__(self, h):
        h = nn.ConvTranspose(
            self.feats, (3, 3), strides=(2, 2),
            padding=[(1, 1 + self.out_pad), (1, 1 + self.out_pad)],
            transpose_kernel=True, use_bias=True, name="upconv")(h)
        h = nn.BatchNorm(use_running_average=True, epsilon=1e-10,
                         name="norm")(h)
        return nn.relu(h)


class ADAGenerator(nn.Module):
    """ADA's AttackGenerator (``ada.py:154-203``, base 64, z_channel 16,
    deeper_layer=False, last_dim 3): a U-Net whose *every* down block
    consumes the MLP-encoded latent tiled as channel maps
    (``UNetDown.forward``, ``ada.py:114-119``); BatchNorm eps 1e-10.
    Designed for odd input sides (inception 299: 299→150→75→38→75→150→299);
    the output is the perturbation in [−1, 1] (``ada.py:70-73``)."""

    base: int = 64
    z_dim: int = 16

    def _tile(self, h, z):
        zmap = jnp.broadcast_to(z[:, None, None, :],
                                h.shape[:3] + (z.shape[-1],))
        return jnp.concatenate([h, zmap], axis=-1)

    @nn.compact
    def __call__(self, x, z):
        ze = nn.relu(nn.Dense(self.z_dim, name="z_encoder_0")(z))
        ze = nn.relu(nn.Dense(self.z_dim, name="z_encoder_2")(ze))
        d0 = _ADADown(self.base, norm=False, name="down0")(self._tile(x, ze))
        d1 = _ADADown(self.base, norm=True, name="down1")(self._tile(d0, ze))
        d2 = _ADADown(self.base * 2, norm=False,  # deeper_layer=False
                      name="down2")(self._tile(d1, ze))
        u2 = jnp.concatenate(
            [_ADAUp(self.base, out_pad=0, name="up2")(d2), d1], axis=-1)
        u1 = jnp.concatenate(
            [_ADAUp(self.base, out_pad=1, name="up1")(u2), d0], axis=-1)
        u0 = _ADAUp(self.base, out_pad=0, name="up0")(u1)
        h = nn.Conv(3, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    name="final_0")(u0)
        return jnp.tanh(h)
