"""IE-FGSM / GNP / PC-I-FGSM — lookahead-gradient family (reference:
``transferattack/gradient/{iefgsm,gnp,pcifgsm}.py``).

All three take a second gradient at a point displaced along the first
gradient and fuse the pair into the momentum update.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState, global_l1_normalize, l1_normalize


class IEFGSM(Attack):
    """Anticipatory-point averaging (``iefgsm.py:36-91``): momentum
    accumulates (g_present + g_anticipated)/2, both L1-normalized."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="IE-FGSM", **kwargs):
        kwargs.pop("decay", None)
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=1.0,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)

    def get_grad(self, variables, x, y, state: AttackState, key):
        k1, k2 = jax.random.split(key)
        g = self.input_grad(variables, x + state.delta, y, state, k1)
        g_p = l1_normalize(g)
        g2 = self.input_grad(variables, x + state.delta + self.alpha * g_p, y, state, k2)
        g_a = l1_normalize(g2)
        return (g_p + g_a) / 2, {}

    def get_momentum(self, grad, momentum):
        # grads are pre-normalized; plain decayed accumulation (``iefgsm.py:85``)
        return momentum * self.decay + grad


class GNP(Attack):
    """Gradient-norm-penalty lookahead (``gnp.py:42-93``):
    g_t = (1+beta)·g1 + beta·g2 with g2 taken at x + r·ĝ1."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, r=0.01, beta=0.8, targeted=False, random_start=False,
                 norm="linfty", loss="crossentropy", attack="GNP", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.r = float(r)
        self.beta = float(beta)

    def get_grad(self, variables, x, y, state: AttackState, key):
        k1, k2 = jax.random.split(key)
        g1 = self.input_grad(variables, x + state.delta, y, state, k1)
        g_p = l1_normalize(g1)
        g2 = self.input_grad(variables, x + state.delta + self.r * g_p, y, state, k2)
        return (1 + self.beta) * g1 + self.beta * g2, {}


class PCIFGSM(Attack):
    """Prediction-correction (``pcifgsm.py:30-86``): a K=1 inner corrector
    whose gradient g_pre (globally L1-normalized terms) feeds the outer
    momentum; the inner example steps a full eps."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, K=1, targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="PC-I-FGSM", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.K = int(K)

    def get_grad(self, variables, x, y, state: AttackState, key):
        from ..utils import img_max, img_min

        keys = jax.random.split(key, self.K + 1)
        grad = self.input_grad(variables, x + state.delta, y, state, keys[0])
        g_pre = self.decay * jnp.zeros_like(grad) + global_l1_normalize(grad)
        delta_pre = jnp.zeros_like(x)  # init_delta without random start
        for k in range(self.K):
            g = self.input_grad(
                variables, x + state.delta + delta_pre, y, state, keys[k + 1]
            )
            g_pre = self.decay * g_pre + global_l1_normalize(g) / self.K
            # inner update with step=eps on the raw inner gradient
            delta_pre = jnp.clip(
                delta_pre + self.eps * jnp.sign(g), -self.eps, self.eps
            )
            delta_pre = jnp.clip(x + delta_pre, img_min, img_max) - x
        return g_pre, {}
