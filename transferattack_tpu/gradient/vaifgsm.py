"""VA-I-FGSM — virtual auxiliary labels (reference:
``transferattack/gradient/vaifgsm.py``).

Each iteration steps on the true-label CE gradient, then on the *negated*
gradients of ``aux_num`` random non-true classes (``vaifgsm.py:77-122``); the
eps-ball clip happens only once at the very end.  One forward + (1+aux_num)
analytic vjp pullbacks replaces the reference's retained-graph backwards.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState
from ..utils import img_max, img_min


class VAIFGSM(Attack):
    """Official args (``vaifgsm.py:30``): alpha=0.007, epoch=20, aux_num=3."""

    def __init__(self, model_name="resnet50", epoch=20, eps=16 / 255, alpha=0.007,
                 aux_num=3, targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="VA-I-FGSM", **kwargs):
        kwargs.pop("decay", None)
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=0.0,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.aux_num = int(aux_num)

    def sample_aux_labels(self, key, y, num_classes):
        """(aux_num, B) distinct random labels excluding the true class —
        equivalent to the reference's per-image randperm prefix."""
        scores = jax.random.uniform(key, (y.shape[0], num_classes))
        scores = scores.at[jnp.arange(y.shape[0]), y].set(jnp.inf)
        _, aux = jax.lax.top_k(-scores, self.aux_num)  # smallest scores
        return aux.T  # (aux_num, B)

    def ce_logit_grad(self, logits, labels):
        """d(mean CE)/d logits = (softmax - onehot)/B — analytic pullback seed."""
        p = jax.nn.softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
        return (p - onehot) / logits.shape[0]

    def step(self, variables, x, y, state: AttackState):
        key, sub = jax.random.split(state.key)

        def forward(point):
            return self.model.apply(variables, point)

        logits, vjp_fn = jax.vjp(forward, x + state.delta)
        num_classes = logits.shape[-1]
        aux_labels = self.sample_aux_labels(sub, y, num_classes)

        sign = -1.0 if self.targeted else 1.0
        delta = state.delta
        # true-label CE ascent step (no eps clip until finalize)
        (g,) = vjp_fn(sign * self.ce_logit_grad(logits, y))
        delta = jnp.clip(x + delta + self.alpha * jnp.sign(g), img_min, img_max) - x
        # auxiliary-label CE descent steps
        for i in range(self.aux_num):
            (g,) = vjp_fn(-sign * self.ce_logit_grad(logits, aux_labels[i]))
            delta = jnp.clip(x + delta + self.alpha * jnp.sign(g), img_min, img_max) - x

        return state.replace(delta=delta, key=key, step=state.step + 1)

    def finalize(self, state, x, y):
        # single eps clip at the end (``vaifgsm.py:121``)
        return jnp.clip(state.delta, -self.eps, self.eps)
