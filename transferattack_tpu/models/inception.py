"""Inception-v3 (torchvision layout, NHWC, 299² input, 0.5/0.5 normalize) —
eval-paper CNN (``transferattack/utils.py:15``; wrapped at 299 via
``transferattack/utils.py:42-57``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import INCEPTION_MEAN, INCEPTION_STD, register_model


class BasicConv2d(nn.Module):
    features: int
    kernel: tuple = (3, 3)
    stride: int = 1
    padding: tuple = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel, strides=(self.stride, self.stride),
            padding=list(self.padding), use_bias=False, name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, name="bn")(x)
        return nn.relu(x)


def pool3(x, stride=1, pad=1):
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), constant_values=-jnp.inf)
    return nn.max_pool(x, (3, 3), strides=(stride, stride))


def avgpool3(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)],
                       count_include_pad=True)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=((2, 2), (2, 2)), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(avgpool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(avgpool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(avgpool3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    num_classes: int = 1000
    # ghost networks (``ghost_networks/inc_v3.py:38-100``): per-forward
    # dropout after every stem conv / Mixed block, ACTIVE at inference
    # (the reference uses functional dropout which ignores eval mode)
    ghost_keep_prob: float = 1.0

    def _ghost(self, x):
        if self.ghost_keep_prob >= 1.0:
            return x
        rng = self.make_rng("ghost")
        keep = jax.random.bernoulli(rng, self.ghost_keep_prob, x.shape)
        return x * keep.astype(x.dtype) / self.ghost_keep_prob

    @nn.compact
    def __call__(self, x, features_only: bool = False, tap_fns=None):
        """``tap_fns``: optional dict of pure functions applied to the named
        block outputs (``Mixed_5b`` … ``Mixed_7c``) in the forward graph —
        the functional form of the reference's DHF module conversion
        (``dhf_networks/inception.py:8-38``, at block granularity)."""
        taps = tap_fns or {}

        def g(name, v):
            v = self._ghost(v)
            return taps[name](v) if name in taps else v

        x = g("Conv2d_1a_3x3", BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x))
        x = g("Conv2d_2a_3x3", BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x))
        x = g("Conv2d_2b_3x3", BasicConv2d(64, (3, 3), padding=((1, 1), (1, 1)), name="Conv2d_2b_3x3")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = g("Conv2d_3b_1x1", BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x))
        x = g("Conv2d_4a_3x3", BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = g("Mixed_5b", InceptionA(32, name="Mixed_5b")(x))
        x = g("Mixed_5c", InceptionA(64, name="Mixed_5c")(x))
        x = g("Mixed_5d", InceptionA(64, name="Mixed_5d")(x))
        self.sow("intermediates", "mixed5", x)
        x = g("Mixed_6a", InceptionB(name="Mixed_6a")(x))
        x = g("Mixed_6b", InceptionC(128, name="Mixed_6b")(x))
        x = g("Mixed_6c", InceptionC(160, name="Mixed_6c")(x))
        x = g("Mixed_6d", InceptionC(160, name="Mixed_6d")(x))
        x = g("Mixed_6e", InceptionC(192, name="Mixed_6e")(x))
        self.sow("intermediates", "mixed6", x)
        x = g("Mixed_7a", InceptionD(name="Mixed_7a")(x))
        x = g("Mixed_7b", InceptionE(name="Mixed_7b")(x))
        x = g("Mixed_7c", InceptionE(name="Mixed_7c")(x))
        self.sow("intermediates", "mixed7", x)
        x = jnp.mean(x, axis=(1, 2))
        if features_only:
            return x
        return nn.Dense(self.num_classes, name="fc")(x)


register_model("inception_v3", input_size=299, mean=INCEPTION_MEAN, std=INCEPTION_STD)(
    InceptionV3
)
