"""MIG — momentum integrated gradients (reference:
``transferattack/gradient/mig.py``).

'Transferable Adversarial Attack for Both Vision Transformers and CNNs via
Momentum Integrated Gradients' (ICCV 2023): the copies axis holds the
``s_factor`` straight-path interpolations from a black baseline; the loss is
the mean softmax probability of the label; momentum accumulates the
path-weighted integrated gradient.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import AttackState
from .mifgsm import MIFGSM


class MIG(MIFGSM):
    """Official args (``mig.py:35``): s_factor=20, alpha=eps/epoch."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, decay=1.0,
                 s_factor=20, targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="MIG", **kwargs):
        kwargs.pop("alpha", None)
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=eps / epoch,
                         decay=decay, targeted=targeted, random_start=random_start,
                         norm=norm, loss=loss, attack=attack, **kwargs)
        self.s_factor = int(s_factor)

    def num_copies(self):
        return self.s_factor

    def transform(self, x, state: AttackState, key):
        # straight path from the zero (black) baseline (``mig.py:41-43``)
        fracs = jnp.arange(1, self.s_factor + 1, dtype=x.dtype) / self.s_factor
        return fracs.reshape(-1, 1, 1, 1, 1) * x[None]

    def get_loss(self, logits, y):
        probs = jax.nn.softmax(logits, axis=-1)
        picked = jnp.take_along_axis(
            probs, jnp.broadcast_to(y[None, :, None], probs.shape[:2] + (1,)), axis=-1
        )
        loss = jnp.mean(picked)
        return loss if self.targeted else -loss

    def get_grad(self, variables, x, y, state: AttackState, key):
        grad = self.input_grad(variables, x + state.delta, y, state, key)
        # integrated gradient along the path (``mig.py:84``)
        return (x + state.delta) * grad / self.s_factor, {}
