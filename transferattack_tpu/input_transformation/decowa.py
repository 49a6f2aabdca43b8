"""DeCowA — deformation-constrained warping attack (reference:
``transferattack/input_transformation/decowa.py``, AAAI 2024).

Thin-plate-spline warps from a 3×3 control grid whose interior point is
first tuned by one adversarial gradient step (``update_noise_map``), then the
live adversary is warped and attacked — ``num_warping=20`` warps averaged per
iteration.  The TPS solve is a 12×12 ``jnp.linalg.solve``; sampling uses the
shared bilinear ``grid_sample``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState
from ..ops.image import grid_sample, warp_field_sep


def _k_matrix(X, Y):
    D2 = jnp.sum((X[:, None, :] - Y[None, :, :]) ** 2, axis=-1)
    return D2 * jnp.log(D2 + 1e-9)


def _p_matrix(X):
    return jnp.concatenate([jnp.ones((X.shape[0], 1), X.dtype), X], axis=1)


def tps_grid(ctrl_src, ctrl_dst, H: int, W: int):
    """Dense (H, W, 2) sampling grid for a TPS mapping ctrl_src → ctrl_dst
    (reference ``TPS``/``TPS_coeffs``, ``decowa.py:84-150``)."""
    k = ctrl_src.shape[0]
    K = _k_matrix(ctrl_src, ctrl_src)
    P = _p_matrix(ctrl_src)
    L = jnp.zeros((k + 3, k + 3), ctrl_src.dtype)
    L = L.at[:k, :k].set(K)
    L = L.at[:k, k:].set(P)
    L = L.at[k:, :k].set(P.T)
    Z = jnp.zeros((k + 3, 2), ctrl_src.dtype)
    Z = Z.at[:k].set(ctrl_dst)
    Q = jnp.linalg.solve(L, Z)
    Wc, A = Q[:k], Q[k:]

    xs = jnp.linspace(-1.0, 1.0, W)
    ys = jnp.linspace(-1.0, 1.0, H)
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    pts = jnp.stack([gx.ravel(), gy.ravel()], axis=1)  # (HW, 2)
    U = _k_matrix(pts, ctrl_src)
    Pg = _p_matrix(pts)
    grid = Pg @ A + U @ Wc
    return grid.reshape(H, W, 2)


def base_control_points(width: int, height: int, dtype=jnp.float32):
    xs = jnp.linspace(-1.0, 1.0, width, dtype=dtype)
    ys = jnp.linspace(-1.0, 1.0, height, dtype=dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx.ravel(), gy.ravel()], axis=1)  # (h·w, 2) as (x, y)


class DeCowA(Attack):
    """Official args (``decowa.py:28``): mesh 3×3, rho=0.01, num_warping=20,
    noise_scale=2."""

    # the TPS-warp double-grad graph faults the v5e TPU runtime at bfloat16
    # with batch 32 (kernel fault in a fused backward); 8 and 16 run clean,
    # so the CLI driver caps the batch here
    requires_batchsize = 16

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, mesh_width=3, mesh_height=3, rho=0.01, num_warping=20,
                 noise_scale=2.0, targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="DeCowA", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.mesh_width = int(mesh_width)
        self.mesh_height = int(mesh_height)
        self.rho = float(rho)
        self.num_warping = int(num_warping)
        self.noise_scale = float(noise_scale)

    def _tps_operator(self, H: int, W: int):
        """(H·W, k+3) operator M with ``grid = M @ [dst; 0]``.

        The TPS system matrix depends only on the *static* 3×3 control grid,
        so the 12×12 solve happens once on the host in numpy — the traced
        graph sees a single small matmul instead of ``jnp.linalg.solve``
        (TPU linalg in a grad-inside-``lax.map`` context also crashed the
        TPU worker in round-2 testing)."""
        key = (H, W)
        if getattr(self, "_tps_cache", None) is None:
            self._tps_cache = {}
        if key not in self._tps_cache:
            import numpy as np

            # pure numpy (the jnp helper would trace under jit)
            gx, gy = np.meshgrid(
                np.linspace(-1.0, 1.0, self.mesh_width, dtype=np.float32),
                np.linspace(-1.0, 1.0, self.mesh_height, dtype=np.float32))
            src = np.stack([gx.ravel(), gy.ravel()], axis=1)
            k = src.shape[0]
            D2 = ((src[:, None, :] - src[None, :, :]) ** 2).sum(-1)
            K = D2 * np.log(D2 + 1e-9)
            P = np.concatenate([np.ones((k, 1), np.float32), src], axis=1)
            L = np.zeros((k + 3, k + 3), np.float64)
            L[:k, :k] = K
            L[:k, k:] = P
            L[k:, :k] = P.T
            L_inv = np.linalg.inv(L)
            xs = np.linspace(-1.0, 1.0, W, dtype=np.float32)
            ys = np.linspace(-1.0, 1.0, H, dtype=np.float32)
            gx, gy = np.meshgrid(xs, ys)
            pts = np.stack([gx.ravel(), gy.ravel()], axis=1)
            D2g = ((pts[:, None, :] - src[None, :, :]) ** 2).sum(-1)
            U = D2g * np.log(D2g + 1e-9)
            Pg = np.concatenate([np.ones((pts.shape[0], 1), np.float32), pts],
                                axis=1)
            # grid = [U, Pg] @ L_inv @ [dst; 0]: only the first k columns of
            # L_inv see nonzero rows of the RHS
            M = np.concatenate([U, Pg], axis=1) @ L_inv[:, :k]
            self._tps_cache[key] = jnp.asarray(M.astype(np.float32))
        return self._tps_cache[key]

    def _warp(self, x, noise_map):
        """Warp with interior control points displaced by ``noise_map``.

        Default path: the TPS grid becomes a per-pixel displacement field
        applied by :func:`warp_field_sep` — forward and backward are pads,
        slices and multiply-adds.  The exact bilinear ``grid_sample`` whose
        scatter-add backward this replaces measured 0.39 img/s on the v5e
        (19× below DeCowA's 40× pass-count bound, r4 bench) because every
        one of the 400 warp backwards per batch hit the TPU's scalar
        scatter path; the separable form is first-order exact in the smooth
        3×3-control TPS field (``TA_TPU_DECOWA_WARP=bilinear`` restores
        it for A/B)."""
        import os

        H, W = x.shape[1], x.shape[2]
        src = base_control_points(self.mesh_width, self.mesh_height, x.dtype)
        mod = jnp.zeros((self.mesh_height, self.mesh_width, 2), x.dtype)
        mod = mod.at[1 : self.mesh_height - 1, 1 : self.mesh_width - 1].set(noise_map)
        dst = src + mod.reshape(-1, 2)
        grid = (self._tps_operator(H, W) @ dst).reshape(H, W, 2)
        if os.environ.get("TA_TPU_DECOWA_WARP", "sep") == "bilinear":
            return grid_sample(
                x, jnp.broadcast_to(grid[None], (x.shape[0],) + grid.shape)
            )
        # normalized absolute coords -> pixel displacements (src - dest),
        # align_corners=False pixel centers: px = (norm+1)*S/2 - 0.5
        base_x = (2.0 * jnp.arange(W, dtype=x.dtype) + 1.0) / W - 1.0
        base_y = (2.0 * jnp.arange(H, dtype=x.dtype) + 1.0) / H - 1.0
        dx = (grid[..., 0] - base_x[None, :]) * (W / 2.0)  # (H, W)
        dy = (grid[..., 1] - base_y[:, None]) * (H / 2.0)
        B = x.shape[0]
        dx = jnp.broadcast_to(dx[None], (B, H, W))
        dy = jnp.broadcast_to(dy[None], (B, H, W))
        # control points move at most noise_scale/2 in normalized units;
        # clamp window sized to that bound (static for the 2-hot slices)
        max_x = max(2, int(self.noise_scale * W / 4) + 2)
        max_y = max(2, int(self.noise_scale * H / 4) + 2)
        return warp_field_sep(x, dx, dy, max_x, max_y)

    def _model_loss(self, variables, pts, y):
        logits = self.model.apply(variables, pts)
        return self.get_loss(logits[None], y)

    def get_grad(self, variables, x, y, state: AttackState, key):
        xadv = x + state.delta

        def one_warp(k):
            nm0 = (
                jax.random.uniform(
                    k, (self.mesh_height - 2, self.mesh_width - 2, 2), x.dtype
                )
                - 0.5
            ) * self.noise_scale
            adv = jax.lax.stop_gradient(xadv)
            # one inner step maximizing attack difficulty w.r.t. the map
            g_nm = jax.grad(
                lambda nm: self._model_loss(variables, self._warp(adv, nm), y)
            )(nm0)
            nm = jax.lax.stop_gradient(nm0 - self.rho * g_nm)
            return jax.grad(
                lambda d: self._model_loss(variables, self._warp(x + d, nm), y)
            )(state.delta)

        keys = jax.random.split(key, self.num_warping)
        grads = jax.lax.map(one_warp, keys)
        return grads.mean(0), {}
