"""OPS — operator + perturbation sampling (reference:
``transferattack/input_transformation/ops.py``).

Per iteration: the base gradient plus gradients at ``num_sample_neighbor``
pooled noise offsets, each viewed through ``num_sample_operator`` random
chains (length 2-4) of 31 basic ops (flips/shifts/rotations/scalings/DIM
variants).  Op chains are ``lax.switch`` compositions; each noise group runs
its operator copies on a batched copies axis with one backward pass, so the
reference's 900 sequential autograd calls become ~30 batched ones.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..attack import Attack, AttackState
from ..ops import rotate_mm
from .dim import random_resize_pad

ROT_ANGLES = [5, -5, 15, -15, 45, -45, 90, -90, 180]
SCALES = [2, 3, 4, 5, 6, 7, 8]
DIM_RATES = [1.1, 1.3, 1.5, 1.7, 1.9, 2.1, 2.3, 2.5, 2.7, 2.9]
NUM_BASIC_OPS = 5 + len(ROT_ANGLES) + len(SCALES) + len(DIM_RATES)  # 31


def apply_basic_op(x, op_idx, key):
    """Apply basic op ``op_idx`` (0..30) to an NHWC batch (``ops.py:129-220``)."""
    H, W = x.shape[1], x.shape[2]
    branches = []
    branches.append(lambda k: x)  # identity
    branches.append(lambda k: x[:, ::-1, :, :])  # vertical flip
    branches.append(lambda k: x[:, :, ::-1, :])  # horizontal flip
    branches.append(lambda k: jnp.roll(x, jax.random.randint(k, (), 0, H), axis=1))
    branches.append(lambda k: jnp.roll(x, jax.random.randint(k, (), 0, W), axis=2))
    for ang in ROT_ANGLES:
        # static shared angles: dense three-shear einsums (rot90-exact at
        # ±90/180) — the gather warp's fwd/bwd both fault the v5e worker
        branches.append(lambda k, a=ang: rotate_mm(x, a))
    for s in SCALES:
        branches.append(lambda k, s=s: x / s)
    for r in DIM_RATES:
        branches.append(lambda k, r=r: random_resize_pad(x, k, r, 0.5))
    return jax.lax.switch(op_idx, branches, key)


class OPS(Attack):
    """Official args (``ops.py:29``): beta=2, num_sample_neighbor=30,
    num_sample_operator=30, levels 2-4, ratios 0.25..1.5, alpha=eps/epoch."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, beta=2.0,
                 num_sample_neighbor=30, num_sample_operator=30,
                 sample_levels=(2, 3, 4), decay=1.0, targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 op_chunk=10, attack="OPS", **kwargs):
        kwargs.pop("alpha", None)
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=eps / epoch,
                         decay=decay, targeted=targeted, random_start=random_start,
                         norm=norm, loss=loss, attack=attack, **kwargs)
        self.beta = float(beta)
        self.num_sample_neighbor = int(num_sample_neighbor)
        self.num_sample_operator = int(num_sample_operator)
        self.sample_levels = tuple(sample_levels)
        self.max_level = max(self.sample_levels) if sample_levels else 0
        self.sample_ratios = np.arange(0.0, 1.5, 0.25) + 0.25
        self.op_chunk = int(op_chunk)
        self.using_sampling = self.num_sample_neighbor * self.num_sample_operator > 0

    def init_extra(self, x, y):
        if not self.using_sampling:
            return {}
        # pooled per-image-shaped noises across the 6 radii (``ops.py:75-81``)
        key = jax.random.PRNGKey(self.seed + 1)
        pools = []
        for r in self.sample_ratios:
            key, sub = jax.random.split(key)
            pools.append(
                jax.random.uniform(
                    sub, (self.num_sample_neighbor,) + x.shape[1:], x.dtype,
                    minval=-self.beta * self.eps * r, maxval=self.beta * self.eps * r,
                )
            )
        return {"eps_pool": jnp.concatenate(pools, axis=0)}

    def _chain(self, x, ops_row, key):
        """Apply a length-``max_level`` op chain (identity-padded)."""
        keys = jax.random.split(key, self.max_level)
        for i in range(self.max_level):
            x = apply_basic_op(x, ops_row[i], keys[i])
        return x

    def get_grad(self, variables, x, y, state: AttackState, key):
        grad = self.input_grad(variables, x + state.delta, y, state, key)
        if not self.using_sampling:
            return grad, {}

        pool = state.extra["eps_pool"]
        k_sel, k_chain = jax.random.split(key)
        sel = jax.random.choice(
            k_sel, pool.shape[0], (self.num_sample_neighbor,), replace=False
        )

        def sample_chains(k):
            """Fresh op chains per noise sample — the reference re-inits its
            op list for every eps (``ops.py:88-92``)."""
            k_ops, k_lvl, k_ck = jax.random.split(k, 3)
            ops_idx = jax.random.randint(
                k_ops, (self.num_sample_operator, self.max_level), 0,
                NUM_BASIC_OPS,
            )
            levels = jnp.asarray(self.sample_levels)[
                jax.random.randint(
                    k_lvl, (self.num_sample_operator,), 0, len(self.sample_levels)
                )
            ]
            pad_mask = jnp.arange(self.max_level)[None, :] < levels[:, None]
            return jnp.where(pad_mask, ops_idx, 0), jax.random.split(
                k_ck, self.num_sample_operator
            )

        def eps_body(acc, carry):
            e_idx, ek = carry
            eps_noise = pool[e_idx]
            ops_idx, chain_keys = sample_chains(ek)

            def loss_fn(delta):
                x_near = x + delta + eps_noise[None]

                def one_chain(args):
                    row, ck = args
                    pts = self._chain(x_near, row, ck)
                    logits = self.model.apply(variables, pts)
                    return self.get_loss(logits[None], y)

                losses = jax.lax.map(
                    one_chain, (ops_idx, chain_keys)
                )
                return losses.sum()

            g = jax.grad(loss_fn)(state.delta)
            return acc + g, None

        total, _ = jax.lax.scan(
            eps_body, jnp.zeros_like(x),
            (sel, jax.random.split(k_chain, self.num_sample_neighbor)),
        )
        return (grad + total) / (
            self.num_sample_neighbor * self.num_sample_operator + 1
        ), {}
