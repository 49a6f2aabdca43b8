"""SIM / Admix / US-MM — scale-copy mixing family (reference:
``transferattack/input_transformation/{sim,admix,usmm}.py``).

The reference concatenates augmented copies on the batch axis; here each
attack declares a copies axis via ``transform`` → (n, B, H, W, C), which the
engine flattens for the model and means over in the loss — identical math,
but shardable and XLA-fusable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import AttackState
from ..gradient.mifgsm import MIFGSM


class SIM(MIFGSM):
    """Scale-invariant copies x/2^i (``sim.py:36-45``), num_scale=5."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, num_scale=5, targeted=False, random_start=False,
                 norm="linfty", loss="crossentropy", attack="SIM", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.num_scale = int(num_scale)

    def num_copies(self):
        return self.num_scale

    def transform(self, x, state: AttackState, key):
        scales = 1.0 / 2 ** jnp.arange(self.num_scale, dtype=x.dtype)
        return scales.reshape(-1, 1, 1, 1, 1) * x[None]


class Admix(MIFGSM):
    """Admix (``admix.py:36-50``): mix admix_strength·(shuffled batch) into x,
    num_admix=3 mixes × num_scale=5 scales = 15 copies."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, num_scale=5, num_admix=3, admix_strength=0.2,
                 targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="Admix", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.num_scale = int(num_scale)
        self.num_admix = int(num_admix)
        self.admix_strength = float(admix_strength)

    def num_copies(self):
        return self.num_scale * self.num_admix

    def transform(self, x, state: AttackState, key):
        B = x.shape[0]
        keys = jax.random.split(key, self.num_admix)
        mixes = []
        for k in keys:
            perm = jax.random.permutation(k, B)
            mixes.append(x + self.admix_strength * jax.lax.stop_gradient(x[perm]))
        admixed = jnp.stack(mixes)  # (num_admix, B, ...)
        scales = 1.0 / 2 ** jnp.arange(self.num_scale, dtype=x.dtype)
        out = scales.reshape(-1, 1, 1, 1, 1, 1) * admixed[None]
        return out.reshape((-1,) + x.shape)


class USMM(MIFGSM):
    """US-MM (``usmm.py:46-56``): uniform scales in [scale_low, scale_high]
    × mix masks built from shuffled-batch images; gradients taken at the
    transformed points (the reference differentiates w.r.t. x_trans and sums
    over copies, ``usmm.py:85-90``)."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, scale_low=0.1, scale_high=0.75, num_scale=5, num_mix=3,
                 mix_range=0.5, targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="USMM", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.scale_low = float(scale_low)
        self.scale_high = float(scale_high)
        self.num_scale = int(num_scale)
        self.num_mix = int(num_mix)
        self.mix_range = float(mix_range)

    def num_copies(self):
        return self.num_scale * self.num_mix

    def mix_perms(self, key, B, state):
        """One shuffled-batch permutation per (mix, scale) copy — the
        reference's comprehension draws a FRESH ``randperm`` for every
        ``x_scale`` term (``usmm.py:52``).  Overridable seam for paired-RNG
        parity twins."""
        keys = jax.random.split(key, self.num_mix * self.num_scale)
        return jnp.stack([jax.random.permutation(k, B) for k in keys]).reshape(
            self.num_mix, self.num_scale, B
        )

    def get_grad(self, variables, x, y, state: AttackState, key):
        xadv = x + state.delta
        B = x.shape[0]
        scales = jnp.asarray(
            [
                self.scale_low
                + (self.scale_high - self.scale_low) * i / (self.num_scale - 1)
                for i in range(self.num_scale)
            ],
            x.dtype,
        )
        perms = self.mix_perms(key, B, state)  # (num_mix, num_scale, B)
        masks = (1 - self.mix_range) + 2 * self.mix_range * jax.lax.stop_gradient(
            xadv[perms]
        )  # (num_mix, num_scale, B, ...)

        # the reference differentiates w.r.t. the transformed points
        # themselves (x_trans is a detached leaf, ``usmm.py:83-90``) — the
        # scale/mask chain is intentionally NOT back-propagated; copy order is
        # mix-major, scale-minor (``usmm.py:52``)
        pts = scales.reshape(1, -1, 1, 1, 1, 1) * (xadv[None, None] * masks)
        pts = jnp.clip(pts.reshape((-1,) + x.shape), 0.0, 1.0)
        pts = jax.lax.stop_gradient(pts)

        def loss_fn(p):
            logits = self.model.apply(variables, p.reshape((-1,) + x.shape[1:]))
            logits = logits.reshape(self.num_copies(), B, -1)
            # mean CE over all copies; ×copies = per-copy mean sum (``:88-89``)
            return self.get_loss(logits, y) * self.num_copies()

        g = jax.grad(loss_fn)(pts)
        return g.reshape((self.num_copies(),) + x.shape).sum(0) / self.num_copies(), {}
