"""EMI-FGSM — enhanced momentum (reference: ``transferattack/gradient/emifgsm.py``).

'Boosting Adversarial Transferability through Enhanced Momentum' (BMVC 2021).
Samples ``num_sample=11`` points along the previous-gradient direction; the
reference batch-concats them (``emifgsm.py:57-60``), here they form a vmapped
copies axis.  (The reference's ``get_factors`` sampling methods are dead code —
its ``transform`` always uses the linear spacing; we reproduce the behavior.)
"""
from __future__ import annotations

import jax.numpy as jnp

from ..attack import AttackState, l1_normalize
from .mifgsm import MIFGSM


class EMIFGSM(MIFGSM):
    """Official args (``emifgsm.py:27``): num_sample=11, radius=7, linear."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, num_sample=11, radius=7, sample_method="linear",
                 targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="EMI-FGSM", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.num_sample = int(num_sample)
        self.radius = float(radius)
        self.sample_method = sample_method

    def num_copies(self):
        return self.num_sample

    def init_extra(self, x, y):
        return {"bar_grad": jnp.zeros_like(x)}

    def transform(self, x, state: AttackState, key):
        factors = jnp.linspace(-self.radius, self.radius, self.num_sample)
        return x[None] + factors.reshape(-1, 1, 1, 1, 1) * self.alpha * state.extra["bar_grad"][None]

    def get_grad(self, variables, x, y, state: AttackState, key):
        grad, _ = super().get_grad(variables, x, y, state, key)
        return grad, {"bar_grad": l1_normalize(grad)}
