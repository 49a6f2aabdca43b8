"""VGG-16/19 (torchvision layout, NHWC) — eval-matrix surrogate
(reference surrogate loader ``transferattack/attack.py:51-60``; VGG-16 is an
eval-paper model, ``transferattack/utils.py:15``).

Module names track torchvision indices (``features_0`` …) so a PyTorch
state_dict converts mechanically.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from . import register_model

CFG16 = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
         512, 512, 512, "M", 512, 512, 512, "M"]
CFG19 = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
         512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


class VGG(nn.Module):
    cfg: Sequence
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        layer_idx = 0
        for v in self.cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                layer_idx += 1
            else:
                x = nn.Conv(
                    v, (3, 3), padding=[(1, 1), (1, 1)], name=f"features_{layer_idx}"
                )(x)
                x = nn.relu(x)
                layer_idx += 2
        self.sow("intermediates", "features", x)
        # adaptive avg pool to 7x7 is identity at 224 input
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)  # NCHW flatten order
        if features_only:
            return x
        x = nn.Dense(4096, name="classifier_0")(x)
        x = nn.relu(x)
        x = nn.Dense(4096, name="classifier_3")(x)
        x = nn.relu(x)
        return nn.Dense(self.num_classes, name="classifier_6")(x)


register_model("vgg16")(lambda **kw: VGG(cfg=CFG16, **kw))
register_model("vgg19")(lambda **kw: VGG(cfg=CFG19, **kw))
