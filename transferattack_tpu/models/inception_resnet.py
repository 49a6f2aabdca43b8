"""Inception-ResNet-v2 (timm layout, NHWC, 299² input, 0.5/0.5 normalize).

The reference uses this architecture for the ghost-networks and DHF model
surgeries (``model_related/ghost_networks/inc_res_v2.py:251-330``,
``model_related/dhf_networks/inc_res_v2.py:158-163``).  TPU-native design:

- **ghost**: the vendored ghost variant scales each residual skip by a
  per-channel U(1±range) sample every forward
  (``ghost_networks/inc_res_v2.py:133,184,244``).  Here that is a
  ``ghost_range`` field driven by the ``'ghost'`` rng collection — one
  module, no vendored copy.
- **DHF**: feature mixing is a ``tap_fns`` dict keyed by block names
  (``repeat_1_0`` … ``conv2d_7b``), the functional replacement for the
  reference's in-place module conversion
  (``dhf_networks/utils.py:6-45``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import INCEPTION_MEAN, INCEPTION_STD, register_model
from .inception import BasicConv2d


def avgpool3_nip(x):
    """3×3/1 avg pool, pad 1, count_include_pad=False (timm Mixed_5b)."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)],
                       count_include_pad=False)


class Mixed5b(nn.Module):
    @nn.compact
    def __call__(self, x):
        b0 = BasicConv2d(96, (1, 1), name="branch0")(x)
        b1 = BasicConv2d(48, (1, 1), name="branch1_0")(x)
        b1 = BasicConv2d(64, (5, 5), padding=((2, 2), (2, 2)), name="branch1_1")(b1)
        b2 = BasicConv2d(64, (1, 1), name="branch2_0")(x)
        b2 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch2_1")(b2)
        b2 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch2_2")(b2)
        b3 = BasicConv2d(64, (1, 1), name="branch3_1")(avgpool3_nip(x))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class _ResidualMixin:
    """Residual join shared by Block35/17/8: ``out*scale + skip`` with the
    optional per-channel ghost scaling of the skip."""

    def _join(self, out, x):
        skip = x
        if self.ghost_range > 0.0:
            rng = self.make_rng("ghost")
            c = x.shape[-1]
            s = jax.random.uniform(
                rng, (1, 1, 1, c), x.dtype,
                minval=1.0 - self.ghost_range, maxval=1.0 + self.ghost_range,
            )
            skip = x * s
        return out * self.scale + skip


class Block35(nn.Module, _ResidualMixin):
    scale: float = 0.17
    ghost_range: float = 0.0

    @nn.compact
    def __call__(self, x):
        b0 = BasicConv2d(32, (1, 1), name="branch0")(x)
        b1 = BasicConv2d(32, (1, 1), name="branch1_0")(x)
        b1 = BasicConv2d(32, (3, 3), padding=((1, 1), (1, 1)), name="branch1_1")(b1)
        b2 = BasicConv2d(32, (1, 1), name="branch2_0")(x)
        b2 = BasicConv2d(48, (3, 3), padding=((1, 1), (1, 1)), name="branch2_1")(b2)
        b2 = BasicConv2d(64, (3, 3), padding=((1, 1), (1, 1)), name="branch2_2")(b2)
        out = jnp.concatenate([b0, b1, b2], axis=-1)
        out = nn.Conv(320, (1, 1), name="conv2d")(out)
        return nn.relu(self._join(out, x))


class Mixed6a(nn.Module):
    @nn.compact
    def __call__(self, x):
        b0 = BasicConv2d(384, (3, 3), stride=2, name="branch0")(x)
        b1 = BasicConv2d(256, (1, 1), name="branch1_0")(x)
        b1 = BasicConv2d(256, (3, 3), padding=((1, 1), (1, 1)), name="branch1_1")(b1)
        b1 = BasicConv2d(384, (3, 3), stride=2, name="branch1_2")(b1)
        b2 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b0, b1, b2], axis=-1)


class Block17(nn.Module, _ResidualMixin):
    scale: float = 0.10
    ghost_range: float = 0.0

    @nn.compact
    def __call__(self, x):
        b0 = BasicConv2d(192, (1, 1), name="branch0")(x)
        b1 = BasicConv2d(128, (1, 1), name="branch1_0")(x)
        b1 = BasicConv2d(160, (1, 7), padding=((0, 0), (3, 3)), name="branch1_1")(b1)
        b1 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch1_2")(b1)
        out = jnp.concatenate([b0, b1], axis=-1)
        out = nn.Conv(1088, (1, 1), name="conv2d")(out)
        return nn.relu(self._join(out, x))


class Mixed7a(nn.Module):
    @nn.compact
    def __call__(self, x):
        b0 = BasicConv2d(256, (1, 1), name="branch0_0")(x)
        b0 = BasicConv2d(384, (3, 3), stride=2, name="branch0_1")(b0)
        b1 = BasicConv2d(256, (1, 1), name="branch1_0")(x)
        b1 = BasicConv2d(288, (3, 3), stride=2, name="branch1_1")(b1)
        b2 = BasicConv2d(256, (1, 1), name="branch2_0")(x)
        b2 = BasicConv2d(288, (3, 3), padding=((1, 1), (1, 1)), name="branch2_1")(b2)
        b2 = BasicConv2d(320, (3, 3), stride=2, name="branch2_2")(b2)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class Block8(nn.Module, _ResidualMixin):
    scale: float = 0.20
    no_relu: bool = False
    ghost_range: float = 0.0

    @nn.compact
    def __call__(self, x):
        b0 = BasicConv2d(192, (1, 1), name="branch0")(x)
        b1 = BasicConv2d(192, (1, 1), name="branch1_0")(x)
        b1 = BasicConv2d(224, (1, 3), padding=((0, 0), (1, 1)), name="branch1_1")(b1)
        b1 = BasicConv2d(256, (3, 1), padding=((1, 1), (0, 0)), name="branch1_2")(b1)
        out = jnp.concatenate([b0, b1], axis=-1)
        out = nn.Conv(2080, (1, 1), name="conv2d")(out)
        out = self._join(out, x)
        return out if self.no_relu else nn.relu(out)


class InceptionResNetV2(nn.Module):
    num_classes: int = 1000
    # ghost networks: per-channel skip scaling U(1±range) in every residual
    # block (``ghost_networks/inc_res_v2.py:133,184,244``; default 0.08)
    ghost_range: float = 0.0

    @nn.compact
    def __call__(self, x, features_only: bool = False, tap_fns=None):
        taps = tap_fns or {}

        def tap(name, v):
            return taps[name](v) if name in taps else v

        g = self.ghost_range
        x = BasicConv2d(32, (3, 3), stride=2, name="conv2d_1a")(x)
        x = BasicConv2d(32, (3, 3), name="conv2d_2a")(x)
        x = BasicConv2d(64, (3, 3), padding=((1, 1), (1, 1)), name="conv2d_2b")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), name="conv2d_3b")(x)
        x = BasicConv2d(192, (3, 3), name="conv2d_4a")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = Mixed5b(name="mixed_5b")(x)
        for i in range(10):
            x = tap(f"repeat_{i}", Block35(ghost_range=g, name=f"repeat_{i}")(x))
        self.sow("intermediates", "stage35", x)
        x = Mixed6a(name="mixed_6a")(x)
        for i in range(20):
            x = tap(f"repeat_1_{i}", Block17(ghost_range=g, name=f"repeat_1_{i}")(x))
        self.sow("intermediates", "stage17", x)
        x = Mixed7a(name="mixed_7a")(x)
        for i in range(9):
            x = tap(f"repeat_2_{i}", Block8(ghost_range=g, name=f"repeat_2_{i}")(x))
        x = tap("block8", Block8(scale=1.0, no_relu=True, ghost_range=g,
                                 name="block8")(x))
        x = tap("conv2d_7b", BasicConv2d(1536, (1, 1), name="conv2d_7b")(x))
        self.sow("intermediates", "stage8", x)
        x = jnp.mean(x, axis=(1, 2))
        if features_only:
            return x
        return nn.Dense(self.num_classes, name="classif")(x)


register_model("inception_resnet_v2", input_size=299, mean=INCEPTION_MEAN,
               std=INCEPTION_STD)(InceptionResNetV2)
