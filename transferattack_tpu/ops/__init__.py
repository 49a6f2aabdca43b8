"""On-device image/signal ops shared by the attack zoo.

These replace the reference's scattered per-attack helpers (its three separate
DCT implementations in ``ssm.py``/``fgsra.py``/``fap.py``, torch
``affine_grid``/``grid_sample`` calls, scipy-generated TIM kernels) with one
TPU-friendly library: DCTs are MXU matmuls, warps are vectorized gathers, and
everything is differentiable and jit/vmap-safe.
"""
from .image import (  # noqa: F401
    affine_grid,
    affine_warp,
    affine_warp_fast,
    affine_warp_sep,
    grid_sample,
    resize_bilinear,
    rotate,
    rotate_fast,
    rotate_mm,
    rotate_shear,
    scale_around_center,
    shift_interp,
    translate,
    translate_scalar,
    translate_sep,
)
from .dct import dct_2d, idct_2d  # noqa: F401
from .kernels import (  # noqa: F401
    gaussian_kernel,
    gkern,
    linear_kernel,
    make_kernel,
    smooth_conv,
    uniform_kernel,
)
