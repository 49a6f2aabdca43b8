"""PI-FGSM — patch-wise attack (reference: ``transferattack/gradient/pifgsm.py``).

'Patch-wise Attack for Fooling Deep Neural Network' (ECCV 2020): amplified
step plus a 'cut noise' projection that redistributes budget overflowing the
eps-ball to neighboring pixels through a uniform ring kernel
(``pifgsm.py:46-70,90-115``).  The 3×3 depthwise conv maps to
``lax.conv_general_dilated`` with channel feature groups (NHWC).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState
from ..utils import img_max, img_min


class PIFGSM(Attack):
    """Official args (``pifgsm.py:27``): decay=0, kern_size=3, gamma=16, beta=10."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=0.0, kern_size=3, gamma=16.0, beta=10.0, targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 attack="PI-FGSM", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.kern_size = int(kern_size)
        self.gamma = gamma / 255.0
        self.beta = float(beta)

    def project_noise(self, x):
        """Depthwise conv with the uniform ring kernel (``pifgsm.py:46-58``)."""
        k = self.kern_size
        kern = jnp.full((k, k), 1.0 / (k * k - 1), x.dtype)
        kern = kern.at[k // 2, k // 2].set(0.0)
        # depthwise: HWIO with feature_group_count = C, I=1
        kernel = jnp.tile(kern[:, :, None, None], (1, 1, 1, x.shape[-1]))
        pad = k // 2
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=x.shape[-1],
        )

    def init_extra(self, x, y):
        return {"amplification": jnp.zeros_like(x)}

    def step(self, variables, x, y, state: AttackState):
        key, sub = jax.random.split(state.key)
        grad = self.input_grad(variables, x + state.delta, y, state, sub)
        momentum = self.get_momentum(grad, state.momentum)

        amp = state.extra["amplification"] + self.beta * self.alpha * jnp.sign(momentum)
        cut_noise = jnp.clip(jnp.abs(amp) - self.eps, 0.0, 1e4) * jnp.sign(amp)
        projection = self.gamma * jnp.sign(self.project_noise(cut_noise))
        amp = amp + projection

        delta = jnp.clip(
            state.delta + self.beta * self.alpha * jnp.sign(momentum) + projection,
            -self.eps, self.eps,
        )
        delta = jnp.clip(x + delta, img_min, img_max) - x
        return state.replace(
            delta=delta, momentum=momentum, key=key, step=state.step + 1,
            extra={"amplification": amp},
        )
