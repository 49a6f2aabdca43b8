"""TPU-native equivalents of the reference's only CUDA kernels
(``defense/diffpure/score_sde/op/{upfirdn2d,fused_bias_act}`` — SURVEY.md
§2.9): upsample-FIR-downsample resampling and fused bias+LeakyReLU.

On TPU these compile to one fused XLA program (pad → depthwise conv →
stride), so no custom-call is needed; the functions are differentiable and
vmap-safe, serving NCSN++-style resampling blocks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def upfirdn2d(x, kernel, up: int = 1, down: int = 1, pad=(0, 0)):
    """NHWC upfirdn: zero-stuff by ``up``, pad, FIR filter, stride ``down``.

    Matches the CUDA kernel's semantics (``upfirdn2d_kernel.cu``): the filter
    is applied per channel (depthwise), flipped (true convolution).
    """
    B, H, W, C = x.shape
    kernel = jnp.asarray(kernel, x.dtype)
    kh, kw = kernel.shape
    pad0, pad1 = pad

    if up > 1:
        z = jnp.zeros((B, H, up, W, up, C), x.dtype)
        z = z.at[:, :, 0, :, 0, :].set(x)
        x = z.reshape(B, H * up, W * up, C)
    x = jnp.pad(
        x,
        ((0, 0), (max(pad0, 0), max(pad1, 0)), (max(pad0, 0), max(pad1, 0)), (0, 0)),
    )
    if pad0 < 0 or pad1 < 0:
        x = x[:, max(-pad0, 0): x.shape[1] - max(-pad1, 0),
              max(-pad0, 0): x.shape[2] - max(-pad1, 0)]
    # true convolution: flip the kernel
    k = jnp.flip(kernel)[:, :, None, None]
    weights = jnp.tile(k, (1, 1, 1, C))
    out = jax.lax.conv_general_dilated(
        x, weights, window_strides=(down, down), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )
    return out


def setup_blur_kernel(k=(1, 3, 3, 1)):
    k = jnp.asarray(k, jnp.float32)
    kern = jnp.outer(k, k)
    return kern / kern.sum()


def upsample_2d(x, kernel=None, factor: int = 2):
    kernel = setup_blur_kernel() if kernel is None else kernel
    kernel = kernel * (factor**2)
    p = kernel.shape[0] - factor
    return upfirdn2d(x, kernel, up=factor,
                     pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample_2d(x, kernel=None, factor: int = 2):
    kernel = setup_blur_kernel() if kernel is None else kernel
    p = kernel.shape[0] - factor
    return upfirdn2d(x, kernel, down=factor,
                     pad=((p + 1) // 2, p // 2))


def fused_leaky_relu(x, bias=None, negative_slope: float = 0.2,
                     scale: float = 2**0.5):
    """Fused bias + LeakyReLU (``fused_bias_act_kernel.cu``): XLA fuses this
    chain into one kernel on TPU."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jax.nn.leaky_relu(x, negative_slope) * scale
