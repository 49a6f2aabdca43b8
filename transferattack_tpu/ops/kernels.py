"""Smoothing kernels + depthwise convolution (TIM / TTP gaussian smoothing).

Kernel recipes match the reference's scipy-based generator
(``input_transformation/tim.py:42-66``) without the scipy dependency — the
normal pdf on a linspace is computed directly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def gaussian_kernel(kernel_size: int, nsig: float = 3.0) -> np.ndarray:
    """Normalized 2-D gaussian kernel (TIM's 'gaussian', ``tim.py:51-54``)."""
    x = np.linspace(-nsig, nsig, kernel_size)
    kern1d = np.exp(-0.5 * x**2) / np.sqrt(2 * np.pi)
    kern = np.outer(kern1d, kern1d)
    return (kern / kern.sum()).astype(np.float32)


# alias used by several reference attacks (``gkern`` in ttp.py/logit.py/fft.py)
gkern = gaussian_kernel


@functools.lru_cache(maxsize=16)
def uniform_kernel(kernel_size: int) -> np.ndarray:
    return (np.ones((kernel_size, kernel_size)) / kernel_size**2).astype(np.float32)


@functools.lru_cache(maxsize=16)
def linear_kernel(kernel_size: int) -> np.ndarray:
    kern1d = 1 - np.abs(
        np.linspace((-kernel_size + 1) // 2, (kernel_size - 1) // 2, kernel_size)
        / (kernel_size**2)
    )
    kern = np.outer(kern1d, kern1d)
    return (kern / kern.sum()).astype(np.float32)


def make_kernel(kernel_type: str, kernel_size: int) -> np.ndarray:
    if kernel_type.lower() == "gaussian":
        return gaussian_kernel(kernel_size)
    if kernel_type.lower() == "uniform":
        return uniform_kernel(kernel_size)
    if kernel_type.lower() == "linear":
        return linear_kernel(kernel_size)
    raise ValueError(f"Unsupported kernel type {kernel_type}")


def smooth_conv(x, kernel) -> jax.Array:
    """Depthwise 'same' conv of an NHWC batch with a 2-D kernel."""
    kernel = jnp.asarray(kernel, x.dtype)
    k = kernel.shape[0]
    weights = jnp.tile(kernel[:, :, None, None], (1, 1, 1, x.shape[-1]))
    pad = k // 2
    return jax.lax.conv_general_dilated(
        x, weights, window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )
