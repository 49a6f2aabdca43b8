"""L2T — learning to transform (reference:
``transferattack/input_transformation/l2t.py``, CVPR 2024).

Keeps a learnable categorical distribution over 10 transformation classes;
each iteration samples ``num_scale=3`` chains of 2 ops, attacks with their
mean loss, and REINFORCE-updates the distribution with ∂(Σ p_chain·loss)/∂θ
(``l2t.py:21-27,464-503``).  Ops reuse the shared ``ops`` library; chain
selection is a ``lax.switch``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState
from ..ops import rotate_shear, translate_sep
from .dim import random_resize_pad
from ..ops.blocks import block_id, bsr_lengths, permute_strips
from ..ops.dct import dct_2d, idct_2d

NUM_OPS = 10  # rotate, sim, dim, blockshuffle, admix, ide, masked, ssm, crop, affine


def _apply_op(x, op_idx, key, eps):
    H, W = x.shape[1], x.shape[2]
    B = x.shape[0]

    def op_rotate(k):
        # rotate_shear, not the grid_sample-parity rot_op: under the vmapped
        # op switch every branch executes, and the 2-D warp's scatter-add
        # backward alone cost ~1012 ms per step (vs ~32 ms for every other
        # op) — it WAS the 0.95 img/s L2T row.  The reference rotates via
        # torchvision (l2t.py:60-85), a different resampler anyway.
        ang = jax.random.uniform(k, (B,), minval=-0.2, maxval=0.2)
        return rotate_shear(x, ang, max_angle=0.2)

    def op_sim(k):
        s = 2.0 ** -jax.random.randint(k, (), 0, 5).astype(x.dtype)
        return x * s

    def op_dim(k):
        return random_resize_pad(x, k, 1.1, 1.0)

    def op_blockshuffle(k):
        k1, k2 = jax.random.split(k)
        edges = bsr_lengths(k1, H, 3)
        perm = jax.random.permutation(k2, 3)
        rowmap = permute_strips(edges, perm, H)
        return x[:, rowmap]

    def op_admix(k):
        perm = jax.random.permutation(k, B)
        return x + 0.2 * jax.lax.stop_gradient(x[perm])

    def op_ide(k):
        # dropout-style input erosion
        keep = jax.random.bernoulli(k, 0.9, x.shape).astype(x.dtype)
        return x * keep

    def op_masked(k):
        k1, k2 = jax.random.split(k)
        gh = gw = 4
        cell = jax.random.bernoulli(k1, 0.75, (gh, gw)).astype(x.dtype)
        mask = jnp.repeat(jnp.repeat(cell, H // gh, 0), W // gw, 1)
        return x * mask[None, :, :, None]

    def op_ssm(k):
        k1, k2 = jax.random.split(k)
        gauss = jax.random.normal(k1, x.shape, x.dtype) * eps
        mask = jax.random.uniform(k2, x.shape, x.dtype, minval=0.5, maxval=1.5)
        return idct_2d(dct_2d(x + gauss) * mask)

    def op_crop(k):
        k1, k2, k3 = jax.random.split(k, 3)
        side = jax.random.uniform(k1, (), minval=0.8, maxval=1.0)
        ty = jax.random.uniform(k2, ()) * (1 - side) * H
        tx = jax.random.uniform(k3, ()) * (1 - side) * W
        s = 1.0 / side
        return jax.image.scale_and_translate(
            x, x.shape, (1, 2), jnp.stack([s, s]),
            jnp.stack([-ty * s, -tx * s]), method="linear",
        )

    def op_affine(k):
        # translate_sep is bit-equal to the gather translate but its
        # backward is pads+multiplies, not a scatter (same 1012 ms→ms story
        # as op_rotate above); ±0.1 normalized → ≤11.2 px, bound 12
        k1, k2 = jax.random.split(k)
        tx = jax.random.uniform(k1, (B,), minval=-0.1, maxval=0.1)
        ty = jax.random.uniform(k2, (B,), minval=-0.1, maxval=0.1)
        return translate_sep(x, tx, ty, max_shift=12)

    return jax.lax.switch(
        op_idx,
        [op_rotate, op_sim, op_dim, op_blockshuffle, op_admix, op_ide,
         op_masked, op_ssm, op_crop, op_affine],
        key,
    )


class L2T(Attack):
    """Official args (``l2t.py:413``): num_scale=3, ops_num=2, lr=0.01."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, num_scale=3, ops_num=2, aug_lr=0.01, targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 attack="L2T", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.num_scale = int(num_scale)
        self.ops_num = int(ops_num)
        self.aug_lr = float(aug_lr)

    def init_extra(self, x, y):
        return {"aug_param": jnp.zeros((NUM_OPS,), x.dtype)}

    def apply_op(self, x, op_idx, key, step, copy, slot):
        """One augmentation dispatch — overridable seam for parity twins
        (``step``/``copy``/``slot`` index the draw)."""
        return _apply_op(x, op_idx, key, self.eps)

    def sample_ids(self, key, aug_param, step, copy):
        """``select_op`` (``l2t.py:16-19``): ops_num categorical draws from
        softmax(θ), with replacement — seam."""
        return jax.random.categorical(key, aug_param, shape=(self.ops_num,))

    def get_grad(self, variables, x, y, state: AttackState, key):
        aug_param = state.extra["aug_param"]
        keys = jax.random.split(key, self.num_scale)

        def chain_loss(delta, ids, k, copy):
            pt = x + delta
            ks = jax.random.split(k, self.ops_num)
            for j in range(self.ops_num):
                pt = self.apply_op(pt, ids[j], ks[j], state.step, copy, j)
            logits = self.model.apply(variables, pt)
            return self.get_loss(logits[None], y)

        # vmap, not a Python loop: unrolling repeats the model fwd+bwd and
        # every lax.switch branch per copy in the HLO, which blew the TPU
        # compile up (and a lax.map variant crashed the server-side
        # compiler); under vmap the op switch lowers to compute-and-select
        # over the 10 cheap augmentations while the model runs one batched
        # pass over the copies
        def one_copy(k, copy):
            k1, k2 = jax.random.split(k)
            ids = self.sample_ids(k1, aug_param, state.step, copy)
            loss_i, g_i = jax.value_and_grad(chain_loss)(
                state.delta, ids, k2, copy
            )

            # REINFORCE: ∂(p_chain·loss)/∂θ with loss treated as constant
            def log_prob(theta):
                p = jax.nn.softmax(theta)
                tp = 1.0
                for j in range(self.ops_num):
                    tp = tp * p[ids[j]]
                return tp

            ag_i = jax.lax.stop_gradient(loss_i) * jax.grad(log_prob)(aug_param)
            return g_i, ag_i

        g, ag = jax.vmap(one_copy)(keys, jnp.arange(self.num_scale))
        new_param = aug_param + self.aug_lr * ag.mean(0)
        return g.mean(0), {"aug_param": new_param}
