"""Ensemble members on their own mesh axis (SURVEY.md §2.10 items 3-4).

The reference runs K surrogate models serially on one GPU
(``transferattack/utils.py:94-101`` EnsembleModel) — on a TPU slice that
leaves (K-1)/K of the chips' HBM holding weights that never matter and, for
small eval batches, most compute idle.  Two TPU-native placements:

- ``ShardMapEnsemble`` — K *heterogeneous* members over a ``model`` mesh
  axis via ``shard_map``: every model-shard computes only its own members'
  logits (a ``lax.switch`` on ``axis_index`` picks the branch at runtime,
  so each device executes one member's program per forward), and the
  logit mean is a literal ``psum`` over ICI.  The batch can simultaneously
  ride a ``data`` axis.  Gradients flow through ``shard_map`` + ``psum``
  (its transpose is ``psum``), so the whole attack scan jits unchanged.

- ``StackedEnsemble`` — K *homogeneous* members (LGV's cSGD ResNet-50
  collection is the canonical case) as one stacked pytree with a leading
  member axis, forward ``vmap``-ed over that axis.  Sharding the stacked
  leaves on the ``model`` axis makes XLA compute K/S members per device
  and turn the member-mean into an all-reduce — no shard_map needed.

Both produce the same packed variables layout as ``make_ensemble``
(``params/members_{i}``) so converted checkpoints work for either path.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "ShardMapEnsemble",
    "StackedEnsemble",
    "mesh_ensemble_surrogate",
    "stack_param_sets",
    "stacked_sharding",
    "data_model_mesh",
]


def data_model_mesh(n_model: int, devices: Optional[Sequence] = None,
                    data_axis: str = "data", model_axis: str = "model") -> Mesh:
    """A 2-D (data, model) mesh: ``n_model`` devices on the member axis,
    the rest of the slice on the batch axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % n_model != 0:
        raise ValueError(f"{n} devices not divisible by model axis {n_model}")
    grid = np.asarray(devices).reshape(n // n_model, n_model)
    return Mesh(grid, (data_axis, model_axis))


class ShardMapEnsemble:
    """Heterogeneous K-member logit-mean ensemble over a ``model`` mesh axis.

    Duck-types the ``module`` slot of a :class:`~..models.Surrogate` (only
    ``.apply`` is consumed by the attack engine's ``_logits_flat``).
    Variables use the ``make_ensemble`` packing and are passed replicated;
    placement of *compute* is what the model axis buys — each device runs
    one member forward instead of K.  ``mode='mean'`` psum-averages the
    logits (reference ``utils.py:94-101``); ``mode='ind'`` all-gathers the
    per-member logits to (K, B, C).
    """

    def __init__(self, members, mesh: Mesh, model_axis: str = "model",
                 data_axis: Optional[str] = "data", mode: str = "mean"):
        self.members = list(members)
        self.K = len(self.members)
        self.mesh = mesh
        self.model_axis = model_axis
        self.data_axis = data_axis if (data_axis in mesh.axis_names) else None
        self.mode = mode
        S = mesh.shape[model_axis]
        if self.K % S != 0:
            raise ValueError(
                f"K={self.K} members must divide over model axis size {S}")
        self.per_shard = self.K // S

    def _member_vars(self, variables, i: int):
        v = {"params": variables["params"][f"members_{i}"]}
        bs = variables.get("batch_stats", {}).get(f"members_{i}")
        if bs is not None:
            v["batch_stats"] = bs
        return v

    def apply(self, variables, x, **kwargs):
        shard_map = jax.shard_map

        mesh, maxis = self.mesh, self.model_axis
        if self.mode == "ind" and self.per_shard != 1:
            raise ValueError("mode='ind' needs model axis size == K")
        x_spec = P(self.data_axis) if self.data_axis else P()
        out_first = (maxis,) if self.mode == "ind" else ()
        out_spec = P(*(out_first + (self.data_axis,))) \
            if self.data_axis else P(*out_first)

        members = self.members
        K, per = self.K, self.per_shard

        def branch(i):
            def f(vars_, xs):
                return members[i].apply(self._member_vars(vars_, i), xs,
                                        **kwargs)
            return f

        branches = [branch(i) for i in range(K)]

        def shard_fn(vars_, xs):
            s = jax.lax.axis_index(maxis)
            local = None
            for j in range(per):
                idx = s * per + j
                li = jax.lax.switch(idx, branches, vars_, xs)
                local = li if local is None else local + li
            if self.mode == "ind":
                return local[None]
            return jax.lax.psum(local, maxis) / K

        fn = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), x_spec), out_specs=out_spec,
            check_vma=False,
        )
        return fn(variables, x)


class StackedEnsemble:
    """Homogeneous members as one stacked pytree, ``vmap``-ed forward.

    ``variables`` carries a leading member axis on every leaf
    (``stack_param_sets``).  Annotate that axis with ``P(model_axis)`` via
    :func:`stacked_sharding` and jit partitions members across devices,
    lowering the member mean to an all-reduce.
    """

    def __init__(self, member_surrogate, K: int, mode: str = "mean"):
        self.member = member_surrogate
        self.K = K
        self.mode = mode

    def apply(self, variables, x, **kwargs):
        def one(v):
            return self.member.module.apply(v, x, **kwargs)

        logits = jax.vmap(one)(variables)  # (K, B, C)
        if self.mode == "ind":
            return logits
        return jnp.mean(logits, axis=0)


def stack_param_sets(variable_sets):
    """Stack K per-member variable pytrees along a new leading axis."""
    return jax.tree.map(lambda *ls: jnp.stack(ls), *variable_sets)


def stacked_sharding(mesh: Mesh, stacked_variables,
                     model_axis: str = "model"):
    """Sharding pytree placing the stacked member axis over ``model_axis``."""
    def leaf(l):
        spec = [model_axis] + [None] * (l.ndim - 1)
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(leaf, stacked_variables)


def mesh_ensemble_surrogate(ensemble, mesh: Mesh, model_axis: str = "model",
                            data_axis: str = "data", mode: str = "mean"):
    """Re-house a ``make_ensemble`` Surrogate's members on a mesh model axis.

    Returns a new Surrogate sharing the ensemble's packed variables whose
    forward runs through :class:`ShardMapEnsemble`.
    """
    from ..models import Surrogate

    adapter = ShardMapEnsemble(
        list(ensemble.members), mesh,
        model_axis=model_axis, data_axis=data_axis, mode=mode)
    surro = Surrogate(
        name=ensemble.name + "@mesh",
        module=adapter,  # duck-typed: only .apply is consumed
        variables=ensemble.variables,
        input_size=ensemble.input_size,
        num_classes=ensemble.num_classes,
    )
    surro.members = getattr(ensemble, "members", None)  # type: ignore
    return surro
