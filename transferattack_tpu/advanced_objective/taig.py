"""TAIG — transferable attack on integrated gradients (reference:
``transferattack/advanced_objective/taig.py``).

Integrated gradients along the straight path (steps+1 points) as the
momentum-free update direction; the reference's per-image Python loop
(``taig.py:44-46``) is a vmapped copies axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState


class TAIG(Attack):
    """Official args (``taig.py:27``): steps=20, decay=0."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 steps=20, targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="TAIG", **kwargs):
        kwargs.pop("decay", None)
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=0.0,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.steps = int(steps)

    def get_grad(self, variables, x, y, state: AttackState, key):
        fracs = jnp.arange(0, self.steps + 1, dtype=x.dtype) / self.steps
        xadv = jax.lax.stop_gradient(x + state.delta)

        def score_loss(points):
            # points: (S+1, B, H, W, C); score of own label, negated mean
            logits = self.model.apply(
                variables, points.reshape((-1,) + x.shape[1:])
            ).reshape(self.steps + 1, x.shape[0], -1)
            picked = jnp.take_along_axis(
                logits, jnp.broadcast_to(y[None, :, None], logits.shape[:2] + (1,)),
                axis=-1,
            )
            return -jnp.mean(picked)

        points = fracs.reshape(-1, 1, 1, 1, 1) * xadv[None]
        grads = jax.grad(score_loss)(points)
        avg = grads.mean(0)
        ig = xadv * avg
        # the reference DESCENDS the mean score via loss=-mean (``taig.py:40``)
        return ig, {}
