"""DiffPure — diffusion purification (reference:
``defense/diffpure/diffpure.py:35-175`` + vendored guided_diffusion, 9,898
LoC).

``SDE_Adv_Model.forward``: upsample 224→256, diffuse to t* with the DDPM
forward process, reverse-denoise with the guided-diffusion 256² UNet
(``gd_unet.GuidedDiffusionUNet`` — the faithful port whose parameter tree
matches the official ``256x256_diffusion_uncond.pt`` checkpoint), downsample
back, then classify (``diffpure.py:70-95``).

Two reverse samplers, selected by ``diffusion_type`` exactly as the
reference driver does (``diffpure.py:45-49``):

* ``'sde'`` — the sampler the shipped defense driver actually invokes
  (``defense/diffpure_defense.sh:11-13`` passes ``--diffusion_type sde``):
  ``RevVPSDE`` (``runners/diffpure_sde.py:51-148``), the reverse VP-SDE
  integrated by Euler–Maruyama from τ₀ = 1 − t*/1000 to τ₁ = 1 − 1e-5 with
  torchsde's default fixed step dt = 1e-3 (``sdeint_adjoint(...,
  method='euler')``, ``diffpure_sde.py:236-238``), the guided UNet's ε
  output converted to a score via the continuous ᾱ(t).
* ``'ddpm'`` — the guided-DDPM posterior (``runners/diffpure_guided.py``):
  ``p_sample`` with learned-range variance and clipped x₀ (learn_sigma →
  6 output channels).

The NCSN++ CUDA kernels are the ``ops/upfirdn.py`` XLA equivalents.
"""
from __future__ import annotations

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from ..models import load_npz_variables, make_model
from .gd_unet import GuidedDiffusionUNet
from .scoring import write_label_csv
from ..utils.weights_manifest import record_fallback

# tiny same-architecture config for the weightless fallback and fast tests
_TINY_UNET = dict(image_size=32, model_channels=32, num_res_blocks=1,
                  attention_ds=(2,), channel_mult=(1, 2), num_head_channels=16)


class DiffPure:
    """Diffusion purification: diffuse to ``t_star`` (``--t 150`` per
    ``defense/diffpure_defense.sh:12``) then reverse with the sampler chosen
    by ``diffusion_type`` — ``'sde'`` (RevVPSDE Euler–Maruyama, the runner
    the reference driver invokes) or ``'ddpm'`` (guided posterior);
    T=1000 linear betas (= discrete βₖ of the continuous VP-SDE with
    β_min=0.1, β_max=20, ``diffpure_sde.py:67-71``)."""

    # continuous VP-SDE endpoints (RevVPSDE defaults, diffpure_sde.py:52)
    BETA_MIN, BETA_MAX = 0.1, 20.0

    def __init__(self, t_star: int = 150, T: int = 1000, image_size: int = 256,
                 ckpt: str = "diffpure_unet", unet_config: dict = None,
                 diffusion_type: str = "sde"):
        if diffusion_type not in ("sde", "ddpm"):
            raise ValueError(f"unknown diffusion_type {diffusion_type!r}")
        self.diffusion_type = diffusion_type
        self.t_star = int(t_star)
        self.T = int(T)
        self.image_size = int(image_size)
        betas = np.linspace(1e-4, 0.02, self.T, dtype=np.float64)
        alphas = 1.0 - betas
        acum = np.cumprod(alphas)
        acum_prev = np.append(1.0, acum[:-1])
        # guided-diffusion posterior quantities (gaussian_diffusion.py)
        post_var = betas * (1.0 - acum_prev) / (1.0 - acum)
        post_var_clipped = np.append(post_var[1], post_var[1:])
        self.betas = jnp.asarray(betas, jnp.float32)
        self.alphas_cum = jnp.asarray(acum, jnp.float32)
        self.sqrt_recip_acum = jnp.asarray(np.sqrt(1.0 / acum), jnp.float32)
        self.sqrt_recipm1_acum = jnp.asarray(np.sqrt(1.0 / acum - 1.0), jnp.float32)
        self.post_mean_c1 = jnp.asarray(
            betas * np.sqrt(acum_prev) / (1.0 - acum), jnp.float32)
        self.post_mean_c2 = jnp.asarray(
            (1.0 - acum_prev) * np.sqrt(alphas) / (1.0 - acum), jnp.float32)
        self.log_post_var_clipped = jnp.asarray(
            np.log(post_var_clipped), jnp.float32)
        self.log_betas = jnp.asarray(np.log(betas), jnp.float32)

        root = os.environ.get("TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights"))
        path = os.path.join(root, f"{ckpt}.npz")
        if unet_config is not None:
            self.unet = GuidedDiffusionUNet(**unet_config)
        elif os.path.exists(path):
            self.unet = GuidedDiffusionUNet()  # full ImageNet-256 config
        else:
            self.unet = GuidedDiffusionUNet(**_TINY_UNET)
        if os.path.exists(path):
            self.unet_vars = load_npz_variables(path)
        else:
            record_fallback("diffpure_unet")
            warnings.warn(f"DiffPure: UNet checkpoint {path} missing; "
                          "random-init tiny UNet (purification is a no-op "
                          "filter) — results carry fallback_weights_used.")
            side = min(self.image_size, 64)
            self.unet_vars = self.unet.init(
                jax.random.PRNGKey(9),
                jnp.zeros((1, side, side, 3)), jnp.zeros((1,)),
            )
        self.fallback_weights = not os.path.exists(path)
        self._jitted = None

    def p_sample(self, xt, t, key, variables=None):
        """One reverse step: learned-range variance + clipped x₀ prediction
        (guided_diffusion ``p_mean_variance``/``p_sample`` with
        clip_denoised=True, as the runner calls it)."""
        tt = jnp.full((xt.shape[0],), t, jnp.float32)
        out = self.unet.apply(
            self.unet_vars if variables is None else variables, xt, tt)
        eps, var_frac = jnp.split(out, 2, axis=-1)
        # LEARNED_RANGE: interpolate log-variance between posterior and beta
        frac = (var_frac + 1.0) / 2.0
        log_var = (frac * self.log_betas[t]
                   + (1 - frac) * self.log_post_var_clipped[t])
        x0 = self.sqrt_recip_acum[t] * xt - self.sqrt_recipm1_acum[t] * eps
        x0 = jnp.clip(x0, -1.0, 1.0)
        mean = self.post_mean_c1[t] * x0 + self.post_mean_c2[t] * xt
        z = jax.random.normal(key, xt.shape, xt.dtype)
        nonzero = jnp.where(t > 0, 1.0, 0.0)
        return mean + nonzero * jnp.exp(0.5 * log_var) * z

    def _sde_drift_diffusion(self, x, s, variables=None):
        """Reverse VP-SDE drift/diffusion at continuous time ``s`` ∈ (0, 1)
        (``RevVPSDE.rvpsde_fn``, ``diffpure_sde.py:94-129``): the guided
        UNet's ε output becomes a score via the continuous
        ᾱ(s) = exp(−½(β₁−β₀)s² − β₀s)."""
        beta_s = self.BETA_MIN + s * (self.BETA_MAX - self.BETA_MIN)
        acum_cont = jnp.exp(
            -0.5 * (self.BETA_MAX - self.BETA_MIN) * s * s - self.BETA_MIN * s)
        # _scale_timesteps: (s * N).long() (diffpure_sde.py:84-86)
        tt = jnp.full((x.shape[0],), jnp.floor(s * self.T), jnp.float32)
        out = self.unet.apply(
            self.unet_vars if variables is None else variables, x, tt)
        eps, _ = jnp.split(out, 2, axis=-1)
        score = -eps / jnp.sqrt(1.0 - acum_cont)
        drift = -0.5 * beta_s * x - beta_s * score
        return drift, jnp.sqrt(beta_s)

    def purify_sde(self, x, key, variables=None):
        """Euler–Maruyama integration of the reverse VP-SDE
        (``image_editing_sample``, ``diffpure_sde.py:199-239``): diffuse to
        t* with the discrete ᾱ, then integrate x' = −f(1−τ) dτ + g(1−τ) dW
        from τ₀ = 1 − t*/T to τ₁ = 1 − 1e-5 in fixed steps dt = 1e-3
        (torchsde euler default)."""
        x2 = x * 2.0 - 1.0
        a_star = self.alphas_cum[self.t_star - 1]
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x2.shape, x2.dtype)
        xt = jnp.sqrt(a_star) * x2 + jnp.sqrt(1 - a_star) * noise

        t0 = 1.0 - self.t_star / self.T
        t1 = 1.0 - 1e-5
        n_steps = max(int(np.ceil((t1 - t0) / 1e-3)), 1)
        dt = (t1 - t0) / n_steps  # uniform grid hitting t1 exactly

        def body(carry, i):
            xt, key = carry
            key, sub = jax.random.split(key)
            tau = t0 + i * dt
            drift, diff = self._sde_drift_diffusion(xt, 1.0 - tau, variables)
            z = jax.random.normal(sub, xt.shape, xt.dtype)
            xt = xt + (-drift) * dt + diff * jnp.sqrt(dt) * z
            return (xt, key), None

        (x0, _), _ = jax.lax.scan(
            body, (xt, key), jnp.arange(n_steps, dtype=jnp.float32))
        return jnp.clip((x0 + 1.0) / 2.0, 0.0, 1.0)

    def purify_ddpm(self, x, key, variables=None):
        """x in [0,1] → diffused to t*, reverse-denoised, back to [0,1]."""
        x2 = x * 2.0 - 1.0
        a_star = self.alphas_cum[self.t_star - 1]
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x2.shape, x2.dtype)
        xt = jnp.sqrt(a_star) * x2 + jnp.sqrt(1 - a_star) * noise

        def body(carry, t):
            xt, key = carry
            key, sub = jax.random.split(key)
            return (self.p_sample(xt, t, sub, variables), key), None

        (x0, _), _ = jax.lax.scan(
            body, (xt, key), jnp.arange(self.t_star - 1, -1, -1)
        )
        return jnp.clip((x0 + 1.0) / 2.0, 0.0, 1.0)

    def purify(self, x, key, variables=None):
        if self.diffusion_type == "sde":
            return self.purify_sde(x, key, variables)
        return self.purify_ddpm(x, key, variables)

    def __call__(self, x, key):
        # the UNet variables ride as a jit ARGUMENT: closing over them
        # would inline ~2.2 GB of weight constants into the program, which
        # the axon tunnel's remote-compile helper cannot ship
        if self._jitted is None:
            self._jitted = jax.jit(
                lambda v, xx, kk: self.purify(xx, kk, v))
        return self._jitted(self.unet_vars, x, key)


def run_diffpure(input_dir: str, output_dir: str, batchsize: int = 4,
                 t_star: int = 150, model_name: str = "resnet101",
                 out_csv: str = "diffpure_predictions.csv", seed: int = 0,
                 purify_size: int = None, diffusion_type: str = "sde") -> str:
    """Purify → classify → prediction CSV.  Mirrors ``diffpure.py:76-86``:
    bilinear upsample to 256², purify at the diffusion model's native
    resolution, bilinear downsample back, classify in [0, 1] space.
    Defaults follow the shipped driver (``diffpure_defense.sh:11-13``):
    ``--diffusion_type sde --classifier_name resnet101 --t 150``."""
    from ..utils.data import AdvDataset

    dp = DiffPure(t_star=t_star, diffusion_type=diffusion_type)
    surrogate = make_model(model_name)
    classify = jax.jit(
        lambda v, x: surrogate.apply(v, x).argmax(-1)
    )

    def _resize(imgs, size):
        return jax.image.resize(
            imgs, (imgs.shape[0], size, size, imgs.shape[3]), method="bilinear"
        )

    # With real weights: purify at the diffusion model's native 256².  In the
    # random-init fallback, purify at 64² instead — the tiny stand-in UNet
    # attends at ds=2, and at the dataset's 224² that is 112²=12.5k tokens
    # (a ~15 GB attention matrix per layer on the CPU test path).
    native = purify_size or (dp.image_size if not dp.fallback_weights else 64)
    ds = AdvDataset(input_dir=input_dir, output_dir=output_dir, eval_mode=True)
    preds = {}
    key = jax.random.PRNGKey(seed)
    for xs, ys, names in ds.as_batches(batchsize):
        key, sub = jax.random.split(key)
        xs = jnp.asarray(xs)
        orig = xs.shape[1]
        if native and orig != native:
            xs = _resize(xs, native)
        purified = dp(xs, sub)
        if native and orig != native:
            purified = _resize(purified, orig)
        p = np.asarray(classify(surrogate.variables, purified))
        for nm, pi in zip(names, p):
            preds[nm] = int(pi)
    out = os.path.join(output_dir, out_csv)
    write_label_csv(out, preds)
    return out
