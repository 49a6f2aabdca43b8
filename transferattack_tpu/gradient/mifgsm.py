"""FGSM / I-FGSM / MI-FGSM / NI-FGSM (reference: ``transferattack/gradient/
{fgsm,ifgsm,mifgsm,nifgsm}.py``).

These are pure hyperparameter/hook specializations of the base engine; the
whole 10-iteration loop compiles to one ``lax.scan``.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..attack import Attack, AttackState


class MIFGSM(Attack):
    """Momentum I-FGSM (``gradient/mifgsm.py:6-36``): decay=1, the base loop."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="MI-FGSM", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)


class FGSM(MIFGSM):
    """Single-step FGSM (``gradient/fgsm.py:6``): epoch=1, alpha=eps."""

    def __init__(self, model_name="resnet50", eps=16 / 255, targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 attack="FGSM", **kwargs):
        kwargs.pop("epoch", None), kwargs.pop("alpha", None), kwargs.pop("decay", None)
        super().__init__(model_name, epoch=1, eps=eps, alpha=eps, decay=0.0,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)


class IFGSM(MIFGSM):
    """Iterative FGSM (``gradient/ifgsm.py:6``): decay=0."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="I-FGSM", **kwargs):
        kwargs.pop("decay", None)
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=0.0,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)


class NIFGSM(MIFGSM):
    """Nesterov I-FGSM (``gradient/nifgsm.py:6``): lookahead transform
    ``x + alpha * decay * momentum``."""

    def __init__(self, *args, attack="NI-FGSM", **kwargs):
        kwargs["attack"] = attack
        super().__init__(*args, **kwargs)

    def transform(self, x, state: AttackState, key):
        return (x + self.alpha * self.decay * state.momentum)[None]
