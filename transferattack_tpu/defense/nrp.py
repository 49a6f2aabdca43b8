"""NRP — neural representation purifier (reference:
``defense/nrp/{networks.py,purify.py}``).

RRDB purifier in Flax (NRP(3,3,64,23)); optional ``dynamic`` mode adds noise
then projects to ±16/255 before purifying (``purify.py:26-63``).  Purified
images are written as PNGs, then scored with the standard ``--eval`` pass.
"""
from __future__ import annotations

import os
import warnings

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models import load_npz_variables
from ..utils.weights_manifest import record_fallback


def _conv(ch, name):
    return nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)], name=name)


class ResidualDenseBlock5C(nn.Module):
    nf: int = 64
    gc: int = 32

    @nn.compact
    def __call__(self, x):
        act = lambda v: nn.leaky_relu(v, 0.2)
        x1 = act(_conv(self.gc, "conv1")(x))
        x2 = act(_conv(self.gc, "conv2")(jnp.concatenate([x, x1], -1)))
        x3 = act(_conv(self.gc, "conv3")(jnp.concatenate([x, x1, x2], -1)))
        x4 = act(_conv(self.gc, "conv4")(jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = _conv(self.nf, "conv5")(jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    nf: int = 64
    gc: int = 32

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock5C(self.nf, self.gc, name="RDB1")(x)
        out = ResidualDenseBlock5C(self.nf, self.gc, name="RDB2")(out)
        out = ResidualDenseBlock5C(self.nf, self.gc, name="RDB3")(out)
        return out * 0.2 + x


class NRPNet(nn.Module):
    """NRP(in=3, out=3, nf=64, nb=23) (``networks.py:46-61``)."""

    nf: int = 64
    nb: int = 23
    gc: int = 32

    @nn.compact
    def __call__(self, x):
        fea = _conv(self.nf, "conv_first")(x)
        h = fea
        for i in range(self.nb):
            h = RRDB(self.nf, self.gc, name=f"RRDB_trunk_{i}")(h)
        return _conv(3, "trunk_conv")(h)


def load_purifier(nb: int = 23, ckpt: str = "nrp"):
    net = NRPNet(nb=nb)
    root = os.environ.get("TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights"))
    path = os.path.join(root, f"{ckpt}.npz")
    if os.path.exists(path):
        variables = load_npz_variables(path)
    else:
        record_fallback("nrp")
        warnings.warn(f"NRP: purifier checkpoint {path} missing; random init.")
        variables = net.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)))
    return net, variables


def run_nrp(input_dir: str, output_dir: str, purified_dir: str,
            batchsize: int = 8, dynamic: bool = False, seed: int = 0,
            nb: int = 23) -> str:
    """Purify adversarial PNGs → ``purified_dir`` (``purify.py:26-63``)."""
    import numpy as np

    from ..utils.data import AdvDataset, save_images

    net, variables = load_purifier(nb=nb)
    apply = jax.jit(net.apply)
    ds = AdvDataset(input_dir=input_dir, output_dir=output_dir, eval_mode=True)
    key = jax.random.PRNGKey(seed)
    for xs, ys, names in ds.as_batches(batchsize):
        x = jnp.asarray(xs)
        if dynamic:
            key, sub = jax.random.split(key)
            eps = 16 / 255
            x_m = x + 0.05 * jax.random.normal(sub, x.shape, x.dtype)
            x = jnp.clip(x_m, x - eps, x + eps)
        purified = jnp.clip(apply(variables, x), 0.0, 1.0)
        save_images(purified_dir, np.asarray(purified), names)
    return purified_dir
