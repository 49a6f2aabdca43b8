"""VMI-FGSM / VNI-FGSM — variance tuning (reference:
``transferattack/gradient/vmifgsm.py``, ``vnifgsm.py``).

'Enhancing the transferability of adversarial attacks through variance tuning'
(CVPR 2021).  The reference's ``get_variance`` Python loop over
``num_neighbor=20`` sampled points (``vmifgsm.py:42-58``) becomes a
``mean_over_keys`` scan/vmap hybrid inside one jit program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState, mean_over_keys


class VMIFGSM(Attack):
    """Official args (``vmifgsm.py:26``): beta=1.5, num_neighbor=20, decay=1."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 beta=1.5, num_neighbor=20, decay=1.0, targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 sample_chunk=4, attack="VMI-FGSM", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.radius = beta * self.eps
        self.num_neighbor = int(num_neighbor)
        self.sample_chunk = int(sample_chunk)

    def init_extra(self, x, y):
        return {"variance": jnp.zeros_like(x)}

    def neighbor_noise(self, key, x, state):
        """Uniform neighborhood draw (``vmifgsm.py:50``) — an overridable
        seam so parity twins can inject identical draws on both frameworks."""
        return jax.random.uniform(
            key, x.shape, x.dtype, minval=-self.radius, maxval=self.radius
        )

    def step(self, variables, x, y, state: AttackState):
        """Reference ordering (``vmifgsm.py:80-96``): main gradient at the
        OLD momentum's lookahead, momentum updated from grad + previous
        variance, and only THEN the neighbor sweep for the new variance —
        so VNI's Nesterov transform sees the freshly updated momentum."""
        key, sub = jax.random.split(state.key)
        gkey, nkey = jax.random.split(sub)
        grad = self.input_grad(variables, x + state.delta, y, state, gkey)
        momentum = self.get_momentum(grad + state.extra["variance"], state.momentum)
        lookahead = state.replace(momentum=momentum)

        def neighbor_grad(k):
            k1, k2 = jax.random.split(k)
            noise = self.neighbor_noise(k1, x, state)
            return self.input_grad(
                variables, x + state.delta + noise, y, lookahead, k2)

        avg = mean_over_keys(neighbor_grad, nkey, self.num_neighbor, self.sample_chunk)
        delta = self.update_delta(state.delta, x, momentum)
        return state.replace(
            delta=delta, momentum=momentum, key=key, step=state.step + 1,
            extra={"variance": avg - grad},
        )


class VNIFGSM(VMIFGSM):
    """VNI-FGSM (``gradient/vnifgsm.py``): VMI + Nesterov lookahead transform."""

    def __init__(self, *args, attack="VNI-FGSM", **kwargs):
        kwargs["attack"] = attack
        super().__init__(*args, **kwargs)

    def transform(self, x, state: AttackState, key):
        return (x + self.alpha * self.decay * state.momentum)[None]
