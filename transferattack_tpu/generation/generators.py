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
        h = nn.ConvTranspose(NGF * 2, (3, 3), strides=(2, 2),
                             padding="SAME", use_bias=False,
                             name="upsampl1_conv")(h)
        h = _bn("upsampl1_bn")(h)
        h = nn.relu(h)
        h = nn.ConvTranspose(NGF, (3, 3), strides=(2, 2),
                             padding="SAME", use_bias=False,
                             name="upsampl2_conv")(h)
        h = _bn("upsampl2_bn")(h)
        h = nn.relu(h)
        h = reflect_pad(h, 3)
        h = nn.Conv(3, (7, 7), padding="VALID", name="blockf_conv")(h)
        if self.inception:
            h = h[:, 1:, :-1, :]
        return (jnp.tanh(h) + 1) / 2


class UNetGenerator(nn.Module):
    """ADA's U-Net AttackGenerator (``ada.py:154``) with a stochastic latent
    concatenated at the bottleneck."""

    base: int = 32
    latent_dim: int = 16

    @nn.compact
    def __call__(self, x, z=None):
        skips = []
        h = x
        for i, mult in enumerate((1, 2, 4)):
            h = nn.Conv(self.base * mult, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], name=f"down{i}")(h)
            h = nn.relu(h)
            skips.append(h)
        if z is not None:
            zmap = jnp.broadcast_to(
                z[:, None, None, :], h.shape[:3] + (z.shape[-1],)
            )
            h = jnp.concatenate([h, zmap], axis=-1)
        h = nn.Conv(self.base * 4, (3, 3), padding=[(1, 1), (1, 1)],
                    name="bottleneck")(h)
        h = nn.relu(h)
        for i, mult in enumerate((4, 2, 1)):
            h = jax.image.resize(
                h, (h.shape[0], h.shape[1] * 2, h.shape[2] * 2, h.shape[3]),
                method="nearest",
            )
            h = nn.Conv(self.base * mult, (3, 3), padding=[(1, 1), (1, 1)],
                        name=f"up{i}")(h)
            h = nn.relu(h)
        h = nn.Conv(3, (3, 3), padding=[(1, 1), (1, 1)], name="out")(h)
        return jnp.tanh(h)
