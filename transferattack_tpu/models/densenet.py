"""DenseNet-121/201 (torchvision layout, NHWC) — used by SGM/LLTA-family
surrogate variants (``model_related/sgm.py:47-97`` scales DenseNet grads too).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from . import register_model


def _bn(name):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5, name=name)


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4

    @nn.compact
    def __call__(self, x):
        out = _bn("norm1")(x)
        out = nn.relu(out)
        out = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False,
                      name="conv1")(out)
        out = _bn("norm2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.growth_rate, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False, name="conv2")(out)
        return jnp.concatenate([x, out], axis=-1)


class Transition(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = _bn("norm")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    block_config: tuple = (6, 12, 24, 16)
    growth_rate: int = 32
    num_init_features: int = 64
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        x = nn.Conv(self.num_init_features, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False, name="conv0")(x)
        x = _bn("norm0")(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        feats = self.num_init_features
        for i, n_layers in enumerate(self.block_config):
            for j in range(n_layers):
                x = DenseLayer(self.growth_rate, name=f"denseblock{i+1}_denselayer{j+1}")(x)
                feats += self.growth_rate
            if i != len(self.block_config) - 1:
                feats = feats // 2
                x = Transition(feats, name=f"transition{i+1}")(x)
            self.sow("intermediates", f"block{i+1}", x)
        x = _bn("norm5")(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        if features_only:
            return x
        return nn.Dense(self.num_classes, name="classifier")(x)


register_model("densenet121")(lambda **kw: DenseNet(block_config=(6, 12, 24, 16), **kw))
register_model("densenet201")(lambda **kw: DenseNet(block_config=(6, 12, 48, 32), **kw))
