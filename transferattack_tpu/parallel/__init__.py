"""Mesh / sharding layer — the framework's parallelism story.

The reference is single-GPU (`main.py:31` pins one CUDA device; SURVEY.md
§2.10): its only implicit parallelism is the DataLoader batch axis.  Here the
1000-image sweep is data-parallel over a ``jax.sharding.Mesh``: images are
sharded on a ``data`` axis, the whole attack (a ``lax.scan`` of fwd+bwd steps)
is one pjit-compiled program per batch, and XLA inserts any collectives over
ICI.  Attacks whose math is per-image (all of them — transfer attacks never
couple images across the batch except via shuffled-batch mixing like Admix,
which we handle with in-shard rolls) need zero communication in steady state,
so scaling is embarrassingly linear until the host input pipeline binds.

Ensemble surrogates (K models on one input) can either stay co-resident per
shard and run back-to-back inside the jit program (compute-optimal when the
batch is large enough to fill the slice) or ride their own ``model`` mesh
axis with a ``psum`` logit-mean (``ensemble_mesh.py`` — shard_map placement
for heterogeneous members, stacked-pytree vmap for homogeneous sets).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .ensemble_mesh import (  # noqa: F401
    ShardMapEnsemble,
    StackedEnsemble,
    data_model_mesh,
    mesh_ensemble_surrogate,
    stack_param_sets,
    stacked_sharding,
)


def make_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    """A 1-D mesh over all (or the given) devices, batch axis sharded."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard axis 0 (batch) over the mesh; everything else replicated."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int):
    """Pad axis 0 to a multiple (static shapes for pjit); returns (padded, n)."""
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = np.concatenate([x, np.repeat(x[-1:], rem, axis=0)], axis=0)
    return pad, n


class ShardedAttackRunner:
    """Run an attack data-parallel over a device mesh.

    One jit compile per batch shape; inputs sharded on ``data``, model
    variables replicated, the returned delta sharded like the input.
    """

    def __init__(self, attack, mesh: Optional[Mesh] = None):
        self.attack = attack
        self.mesh = mesh if mesh is not None else make_mesh()
        self._fn = None

    def _build(self):
        mesh = self.mesh
        data = batch_sharding(mesh)
        repl = replicated(mesh)

        run = jax.jit(
            self.attack.run,
            in_shardings=(repl, data, data, repl),
            out_shardings=data,
        )
        return run

    def dispatch(self, x: np.ndarray, y: np.ndarray, key=None, idx: int = 0):
        """Asynchronously dispatch the attack; returns a lazy handle whose
        ``materialize()`` blocks and yields the numpy delta.  Lets the CLI
        overlap PNG encode/decode with the next batch's device compute."""
        import jax.numpy as jnp

        if getattr(self.attack, "host_state", False):
            # attacks with host-side __call__ preprocessing (anchor images,
            # source-label bookkeeping) run through their own entry point
            value = np.asarray(self.attack(x, y, key=key, idx=idx))
            return lambda: value
        if key is None:
            key = jax.random.PRNGKey(self.attack.seed + idx)
        if self._fn is None:
            self._fn = self._build()
        n_dev = self.mesh.devices.size
        xp, n = pad_to_multiple(np.asarray(x), n_dev)
        yp = np.asarray(self.attack.prepare_labels(y))
        yp, _ = pad_to_multiple(yp, n_dev)
        delta = self._fn(self.attack.model.variables, jnp.asarray(xp), jnp.asarray(yp), key)
        return lambda: np.asarray(delta)[:n]

    def __call__(self, x: np.ndarray, y: np.ndarray, key=None, idx: int = 0):
        return self.dispatch(x, y, key=key, idx=idx)()
