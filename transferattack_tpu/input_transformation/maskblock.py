"""MaskBlock (reference: ``transferattack/input_transformation/maskblock.py``).

The copies axis holds one copy per 56×56 grid cell with that cell zeroed
(``maskblock.py:42-57``) — 16 copies at 224², built with a static mask stack.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..attack import AttackState
from ..gradient.mifgsm import MIFGSM


class MaskBlock(MIFGSM):
    """Official args (``maskblock.py:34``): patch_size=56, alpha=2/255."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=2 / 255,
                 decay=1.0, patch_size=56, targeted=False, random_start=False,
                 norm="linfty", loss="crossentropy", attack="MaskBlock", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.patch_size = int(patch_size)
        self._masks = None

    def _get_masks(self, H, W, dtype):
        ps = self.patch_size
        masks = []
        for i in range(0, H - ps + 1, ps):
            for j in range(0, W - ps + 1, ps):
                m = np.ones((H, W, 1), np.float32)
                m[i : i + ps, j : j + ps] = 0.0
                masks.append(m)
        return jnp.asarray(np.stack(masks), dtype)

    def num_copies(self):
        from ..utils import img_height, img_width

        n = (img_height // self.patch_size) * (img_width // self.patch_size)
        return max(n, 1)

    def transform(self, x, state: AttackState, key):
        masks = self._get_masks(x.shape[1], x.shape[2], x.dtype)
        return x[None] * masks[:, None]
