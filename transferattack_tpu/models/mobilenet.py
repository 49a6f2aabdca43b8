"""MobileNet-v2 (torchvision layout, NHWC) — eval-paper CNN
(``transferattack/utils.py:15``).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from . import register_model


def _bn(name):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5, name=name)


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups, use_bias=False, name="conv",
        )(x)
        x = _bn("bn")(x)
        return nn.relu6(x)


class InvertedResidual(nn.Module):
    inp: int
    oup: int
    stride: int
    expand_ratio: int

    @nn.compact
    def __call__(self, x):
        hidden = self.inp * self.expand_ratio
        identity = x
        out = x
        idx = 0
        if self.expand_ratio != 1:
            out = ConvBNReLU(hidden, kernel=1, name=f"conv_{idx}")(out)
            idx += 1
        out = ConvBNReLU(
            hidden, kernel=3, stride=self.stride, groups=hidden, name=f"conv_{idx}"
        )(out)
        idx += 1
        out = nn.Conv(self.oup, (1, 1), use_bias=False, name=f"conv_{idx}")(out)
        out = _bn(f"bn_{idx}")(out)
        if self.stride == 1 and self.inp == self.oup:
            return identity + out
        return out


# (expand_ratio, channels, num_blocks, stride) — torchvision mobilenet_v2
MBV2_CFG = [
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
]


class MobileNetV2(nn.Module):
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        x = ConvBNReLU(32, kernel=3, stride=2, name="features_0")(x)
        inp = 32
        block_idx = 1
        for t, c, n, s in MBV2_CFG:
            for i in range(n):
                stride = s if i == 0 else 1
                x = InvertedResidual(
                    inp=inp, oup=c, stride=stride, expand_ratio=t,
                    name=f"features_{block_idx}",
                )(x)
                inp = c
                block_idx += 1
        x = ConvBNReLU(1280, kernel=1, name=f"features_{block_idx}")(x)
        self.sow("intermediates", "features", x)
        x = jnp.mean(x, axis=(1, 2))
        if features_only:
            return x
        return nn.Dense(self.num_classes, name="classifier_1")(x)


register_model("mobilenet_v2")(MobileNetV2)
