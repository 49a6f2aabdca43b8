"""SU — self-universality (reference:
``transferattack/input_transformation/su.py``, targeted).

Concatenates the global adversary with a random-resized-crop local view,
applies DI, and adds a feature-similarity loss between the two views at a
mid layer (cosine similarity of layer3 activations) — logit loss, TI kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState
from ..ops import gaussian_kernel, smooth_conv
from .dim import random_resize_pad


def random_resized_crop(x, key, scale=(0.1, 0.1)):
    """Sample a random crop of area fraction in [scale0, scale0+scale1],
    resized back to full resolution (torchvision RandomResizedCrop-lite)."""
    B, H, W, C = x.shape
    k1, k2, k3 = jax.random.split(key, 3)
    area = jax.random.uniform(k1, (), minval=scale[0],
                              maxval=scale[0] + scale[1] + 1e-6)
    side = jnp.sqrt(area)
    ty = jax.random.uniform(k2, ()) * (1 - side)
    tx = jax.random.uniform(k3, ()) * (1 - side)
    # sample the crop via scale_and_translate: output = crop resized to full
    scale_f = 1.0 / side
    return jax.image.scale_and_translate(
        x, x.shape, (1, 2),
        jnp.stack([scale_f, scale_f]),
        jnp.stack([-ty * H * scale_f, -tx * W * scale_f]),
        method="linear",
    )


class SU(Attack):
    """Official args (``su.py:44``): alpha=2/255, epoch=300, coef=0.001,
    scale=(0.1, 0.0), depth=3 (layer3), DI prob 0.7, TI kernel 5."""

    def __init__(self, model_name="resnet50", epoch=300, eps=16 / 255, alpha=2 / 255,
                 decay=1.0, coef=0.001, scale=(0.1, 0.0), feature_layer="layer3",
                 resize_rate=1.1, diversity_prob=0.7, kernel_size=5,
                 targeted=True, random_start=False, norm="linfty",
                 loss="crossentropy", attack="SU", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.coef = float(coef)
        self.scale = tuple(scale)
        self.feature_layer = feature_layer
        self.resize_rate = float(resize_rate)
        self.diversity_prob = float(diversity_prob)
        self.kernel = gaussian_kernel(int(kernel_size))

    def class_loss(self, logits, yy):
        """The classifier part of the SU loss (logit loss, ``su.py:165``).
        FFT overrides this with its loss_base options (``fft.py:143-152``)."""
        picked = jnp.take_along_axis(logits, yy[:, None], axis=1)[:, 0]
        return -picked.mean()

    def get_grad(self, variables, x, y, state: AttackState, key):
        k1, k2 = jax.random.split(key)
        B = x.shape[0]
        used_coef = -1.0 if self.targeted else 1.0

        def loss_fn(delta):
            local = random_resized_crop(x, k1, self.scale) + delta
            both = jnp.concatenate([x + delta, local], axis=0)
            both = random_resize_pad(both, k2, self.resize_rate,
                                     self.diversity_prob)
            logits, feat = self.model.feature(variables, both, self.feature_layer)
            yy = jnp.concatenate([y, y])
            logit_loss = self.class_loss(logits, yy)
            fg = feat[:B].reshape(B, -1)
            fl = feat[B:].reshape(B, -1)
            cos = jnp.sum(fg * fl, axis=1) / (
                jnp.linalg.norm(fg, axis=1) * jnp.linalg.norm(fl, axis=1) + 1e-12
            )
            # reference: loss = -(classifier_loss + coef·±cos); grad ascends
            return -(logit_loss + self.coef * used_coef * cos.mean())

        grad = jax.grad(loss_fn)(state.delta)
        return smooth_conv(grad, self.kernel), {}
