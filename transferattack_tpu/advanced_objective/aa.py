"""AA — activation attack (reference:
``transferattack/advanced_objective/aa.py``).

Targeted: minimize the mid-layer feature distance to an anchor image of the
target class (pulled from the benchmark directory's labels.csv mapping,
``aa.py:38-52``).  Anchor images load host-side in ``__call__``.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..attack import Attack, AttackState


class AA(Attack):
    """Official args (``aa.py:29-31``): layer_name='layer2', targeted
    protocol at alpha=2/255, epoch=300, decay=1."""

    host_state = True  # __call__ does host-side label/anchor prep

    def __init__(self, model_name="resnet50", epoch=300, eps=16 / 255, alpha=2 / 255,
                 decay=1.0, layer_name="layer2", input_dir="./data", targeted=True,
                 random_start=False, norm="linfty", loss="crossentropy",
                 attack="AA", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.feature_layer = layer_name
        self.input_dir = input_dir
        self._l2f = None

    def _label_to_file(self):
        if self._l2f is None:
            import csv

            path = os.path.join(self.input_dir, "labels.csv")
            self._l2f = {}
            with open(path, newline="") as f:
                reader = csv.reader(f)
                next(reader)
                for row in reader:
                    if row:
                        # CSV labels are 1-indexed (``utils.py:142-153``)
                        self._l2f[int(row[1]) - 1] = row[0]
        return self._l2f

    def _anchor_batch(self, tar_label):
        from ..utils.data import load_image
        from ..utils import img_height, img_width

        l2f = self._label_to_file()
        imgs = [
            load_image(
                os.path.join(self.input_dir, "images", l2f[int(t)]),
                (img_height, img_width),
            )
            for t in tar_label
        ]
        return np.stack(imgs)

    def __call__(self, data, label, key=None, idx: int = 0):
        label = np.asarray(label)
        assert label.ndim == 2, "AA needs (label, target) pairs (targeted run)"
        tar_label = label[:, 1]
        # handed to run via host_inputs() → a jit ARGUMENT, so each batch's
        # anchors reach the compiled trace (never baked in as constants)
        self._tar_data = jnp.asarray(self._anchor_batch(tar_label))
        return super().__call__(data, label, key=key, idx=idx)

    def host_inputs(self):
        return self._tar_data

    def run(self, variables, x, y, key, tar_data):
        _, mid_t = self.model.feature(variables, tar_data, self.feature_layer)
        mid_t = jax.lax.stop_gradient(mid_t)
        state = self.init_state(x, y, key)

        def dist_loss(delta):
            _, mid_s = self.model.feature(variables, x + delta, self.feature_layer)
            d = (mid_t - mid_s).reshape(x.shape[0], -1)
            loss = jnp.linalg.norm(d, axis=1).mean()
            return -loss if self.targeted else loss

        def body(st, _):
            k, _ = jax.random.split(st.key)
            grad = jax.grad(dist_loss)(st.delta)
            momentum = self.get_momentum(grad, st.momentum)
            delta = self.update_delta(st.delta, x, momentum)
            return st.replace(delta=delta, momentum=momentum, key=k,
                              step=st.step + 1), None

        state, _ = jax.lax.scan(body, state, None, length=self.epoch)
        return self.finalize(state, x, y)
