"""Orthonormal 2-D DCT-II / DCT-III as MXU matmuls.

The reference implements FFT-based DCTs three times over
(``input_transformation/ssm.py``, ``gradient/fgsra.py``,
``generation/fap.py``).  On TPU a dense DCT matrix multiply is faster for
image-sized transforms (224×224 fits trivially in VMEM and rides the MXU) and
trivially differentiable/vmappable.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix D such that ``y = D @ x``."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    mat = np.cos(np.pi / n * (i + 0.5) * k)
    mat[0] *= 1.0 / np.sqrt(2.0)
    return (mat * np.sqrt(2.0 / n)).astype(np.float32)


def dct_2d(x, axes=(1, 2)):
    """2-D orthonormal DCT-II over ``axes`` (default NHWC spatial dims)."""
    h_ax, w_ax = axes
    Dh = jnp.asarray(_dct_matrix(x.shape[h_ax]), x.dtype)
    Dw = jnp.asarray(_dct_matrix(x.shape[w_ax]), x.dtype)
    x = jnp.tensordot(Dh, x, axes=[[1], [h_ax]])  # new axis 0 = transformed h
    x = jnp.moveaxis(x, 0, h_ax)
    x = jnp.tensordot(Dw, x, axes=[[1], [w_ax]])
    return jnp.moveaxis(x, 0, w_ax)


def idct_2d(x, axes=(1, 2)):
    """Inverse (DCT-III) of :func:`dct_2d`."""
    h_ax, w_ax = axes
    Dh = jnp.asarray(_dct_matrix(x.shape[h_ax]), x.dtype)
    Dw = jnp.asarray(_dct_matrix(x.shape[w_ax]), x.dtype)
    x = jnp.tensordot(Dh.T, x, axes=[[1], [h_ax]])
    x = jnp.moveaxis(x, 0, h_ax)
    x = jnp.tensordot(Dw.T, x, axes=[[1], [w_ax]])
    return jnp.moveaxis(x, 0, w_ax)
