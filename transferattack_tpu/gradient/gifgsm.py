"""GI-FGSM — global momentum initialization (reference:
``transferattack/gradient/gifgsm.py``).

Warms the momentum with ``pre_epoch=5`` large-step (alpha·s) iterations, then
resets delta and runs the normal loop with the warm momentum.  Two scans in
one jit program.
"""
from __future__ import annotations

import jax

from .mifgsm import MIFGSM


class GIFGSM(MIFGSM):
    """Official args (``gifgsm.py:33``): pre_epoch=5, s=10."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, pre_epoch=5, s=10, targeted=False, random_start=False,
                 norm="linfty", loss="crossentropy", attack="GI-FGSM", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.pre_epoch = int(pre_epoch)
        self.s = float(s)

    def run(self, variables, x, y, key):
        state = self.init_state(x, y, key)

        base_alpha = self.alpha

        def make_body(alpha):
            def body(st, _):
                self.alpha = alpha
                return self.step(variables, x, y, st), None
            return body

        # warmup phase at alpha*s (``gifgsm.py:56-69``)
        state, _ = jax.lax.scan(
            make_body(base_alpha * self.s), state, None, length=self.pre_epoch
        )
        self.alpha = base_alpha
        # reset delta, keep momentum (``gifgsm.py:71``)
        state = state.replace(delta=self.init_delta(x, state.key))
        state, _ = jax.lax.scan(make_body(base_alpha), state, None, length=self.epoch)
        return self.finalize(state, x, y)
