"""SSM — spectrum simulation attack (reference:
``transferattack/input_transformation/ssm.py``, ECCV 2022).

Each of ``num_spectrum=20`` samples adds gaussian noise, applies a random
spectral mask in DCT space, and takes the input-gradient at the resulting
point (``ssm.py:40-96``).  Pointwise spectral masks commute with DCT
normalization, so the orthonormal matmul DCT is exactly equivalent to the
reference's FFT-based pair.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import AttackState, mean_over_keys
from ..gradient.mifgsm import MIFGSM
from ..ops import dct_2d, idct_2d


class SSM(MIFGSM):
    """Official args (``ssm.py:28``): num_spectrum=20, rho=0.5."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, num_spectrum=20, rho=0.5, targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 sample_chunk=4, attack="SSM", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.num_spectrum = int(num_spectrum)
        self.rho = float(rho)
        self.sample_chunk = int(sample_chunk)

    def spectral_draws(self, key, x, step):
        """(gaussian eps-noise, U(1−ρ, 1+ρ) DCT mask) per sample
        (``ssm.py:60-75``) — overridable seam for paired-RNG parity twins."""
        k1, k2 = jax.random.split(key)
        gauss = jax.random.normal(k1, x.shape, x.dtype) * self.eps
        mask = jax.random.uniform(
            k2, x.shape, x.dtype, minval=1 - self.rho, maxval=1 + self.rho
        )
        return gauss, mask

    def spectrum_point(self, x, key, step=None):
        gauss, mask = self.spectral_draws(key, x, step)
        return idct_2d(dct_2d(x + gauss) * mask)

    def get_grad(self, variables, x, y, state: AttackState, key):
        # gradient w.r.t. the spectrum-transformed point (x_idct is the
        # differentiation leaf in the reference, ``ssm.py:77-91``)
        def one(k):
            point = jax.lax.stop_gradient(
                self.spectrum_point(x + state.delta, k, state.step)
            )

            def loss_fn(p):
                logits = self.model.apply(variables, p)
                return self.get_loss(logits[None], y)

            return jax.grad(loss_fn)(point)

        avg = mean_over_keys(one, key, self.num_spectrum, self.sample_chunk)
        return avg, {}
