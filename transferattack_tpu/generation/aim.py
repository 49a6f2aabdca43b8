"""AIM / DiffAttack (reference: ``transferattack/generation/
{aim,diffattack}.py``).

AIM: semantic-injection generator — a GeneratorResnet variant conditioned on
a per-target-class guide image (the reference ships
``generation/aim_related/<cls>.JPEG`` guides and supports train/save/load,
``aim.py:11-60``).  Guides load from ``$TA_TPU_WEIGHTS_DIR/aim_guide_<cls>.png``
or fall back to a flat gray guide.

DiffAttack drives a full Stable-Diffusion latent-optimization stack
(1,766 LoC, diffusers ≥0.30.3); this environment has no SD weights or
diffusers, so the class raises with instructions — the explicit descope
SURVEY.md §7 flags.
"""
from __future__ import annotations

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..models import load_npz_variables, save_npz_variables
from ..utils import generation_target_classes
from .generators import GeneratorResnet, reflect_pad, _bn
from .ttp import GenerativeAttack


class AIMGenerator(nn.Module):
    """Guide-conditioned generator: concat(x, guide) → GeneratorResnet body
    (the reference's ResNetGenerator + EnhancedBN semantic injection,
    ``aim.py:61-234``, redesigned as channel conditioning)."""

    @nn.compact
    def __call__(self, x, guide):
        h = jnp.concatenate([x, jnp.broadcast_to(guide, x.shape)], axis=-1)
        return GeneratorResnet(name="body")(h)


class AIM(GenerativeAttack):
    """Targeted semantic injection (``aim.py:235-286``)."""

    ckpt_prefix = "aim"
    targeted_generators = True
    generator_cls = AIMGenerator

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("targeted", True)
        super().__init__(*args, **kwargs)

    def _guide(self, idx, x_shape):
        cls = generation_target_classes[idx]
        root = os.environ.get("TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights"))
        path = os.path.join(root, f"aim_guide_{cls}.png")
        if os.path.exists(path):
            from PIL import Image

            img = Image.open(path).convert("RGB").resize((x_shape[2], x_shape[1]))
            return jnp.asarray(np.asarray(img, np.float32) / 255.0)[None]
        warnings.warn(f"AIM: guide image {path} missing; flat guide used.")
        return jnp.full((1,) + x_shape[1:], 0.5, jnp.float32)

    def _generator_variables(self, idx, x_shape):
        key = idx
        if key in self._var_cache:
            return self._var_cache[key]
        root = os.environ.get("TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights"))
        cls = generation_target_classes[idx]
        path = os.path.join(root, f"{self.ckpt_prefix}_{cls}.npz")
        if os.path.exists(path):
            variables = load_npz_variables(path)
        else:
            warnings.warn(f"AIM: generator {path} missing; random init.")
            rng = jax.random.PRNGKey(self.seed + 151 + idx)
            dummy = jnp.zeros((1,) + x_shape[1:])
            variables = self.generator.init(rng, dummy, dummy)
        self._var_cache[key] = variables
        return variables

    def save_ckpt(self, idx, path=None):
        cls = generation_target_classes[idx]
        root = os.environ.get("TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights"))
        path = path or os.path.join(root, f"{self.ckpt_prefix}_{cls}.npz")
        save_npz_variables(path, self._var_cache[idx])
        return path

    def __call__(self, data, label, key=None, idx: int = 0):
        x = jnp.asarray(data)
        variables = self._generator_variables(idx, x.shape)
        guide = self._guide(idx, x.shape)
        adv = self.generator.apply(variables, x, guide)
        adv = jnp.clip(adv, x - self.eps, x + self.eps)
        adv = jnp.clip(adv, 0.0, 1.0)
        return adv - x


class DiffAttack:
    """Unrestricted diffusion-latent attack (``diffattack.py:38-1766``).

    The reference drives Stable Diffusion 1.5 through diffusers: DDIM-invert
    the image to a latent at ``start_step``, optimize the latent with Adam
    against the surrogate's CE (plus attention-preservation terms), decode.
    Here the same loop runs over the repo's own DDPM UNet (the DiffPure
    stack): deterministic DDIM inversion → latent Adam optimization with a
    CE-plus-reconstruction objective → deterministic DDIM decode.  Converted
    diffusion weights (``diffpure_unet.npz``) give a meaningful image prior;
    the SD text-conditioning/attention-control machinery has no offline
    equivalent and is documented as descoped (SURVEY.md §7 cut-line).
    """

    def __init__(self, model_name="resnet50", eps=None, diffusion_steps=20,
                 start_step=15, iterations=30, lr=0.01, recon_weight=0.1,
                 targeted=False, seed=0, attack="DiffAttack", **kwargs):
        import optax

        from ..defense.diffpure import DiffPure
        from ..models import make_model

        self.surrogate = make_model(
            model_name, pretrained=kwargs.pop("pretrained", True),
            input_size=kwargs.pop("input_size", None),
        )
        self.dp = DiffPure(t_star=diffusion_steps)
        self.diffusion_steps = int(diffusion_steps)
        self.start_step = int(start_step)
        self.iterations = int(iterations)
        self.lr = float(lr)
        self.recon_weight = float(recon_weight)
        self.targeted = targeted
        self.seed = int(seed)
        self.attack = attack
        self.requires_batchsize = None
        self._jitted = None

    def _ddim_invert(self, x2):
        """Deterministic DDIM inversion to step ``start_step``."""
        unet, uvars = self.dp.unet, self.dp.unet_vars
        acum = self.dp.alphas_cum
        stride = max(self.dp.T // self.diffusion_steps, 1)

        def body(xt, i):
            t = i * stride
            tt = jnp.full((x2.shape[0],), t, jnp.float32)
            eps = unet.apply(uvars, xt, tt)
            a_t = acum[t]
            a_next = acum[jnp.minimum(t + stride, self.dp.T - 1)]
            x0 = (xt - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
            xt = jnp.sqrt(a_next) * x0 + jnp.sqrt(1 - a_next) * eps
            return xt, None

        xt, _ = jax.lax.scan(body, x2, jnp.arange(self.start_step))
        return xt

    def _ddim_decode(self, latent):
        unet, uvars = self.dp.unet, self.dp.unet_vars
        acum = self.dp.alphas_cum
        stride = max(self.dp.T // self.diffusion_steps, 1)

        def body(xt, i):
            t = i * stride
            tt = jnp.full((latent.shape[0],), t, jnp.float32)
            eps = unet.apply(uvars, xt, tt)
            a_t = acum[t]
            a_prev = acum[jnp.maximum(t - stride, 0)]
            x0 = (xt - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
            xt = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps
            return xt, None

        xt, _ = jax.lax.scan(
            body, latent, jnp.arange(self.start_step - 1, -1, -1)
        )
        return jnp.clip((xt + 1.0) / 2.0, 0.0, 1.0)

    def _attack(self, svars, x, y):
        import optax

        from ..attack import softmax_cross_entropy

        x2 = x * 2.0 - 1.0
        latent0 = self._ddim_invert(x2)
        opt = optax.adam(self.lr)
        opt_state = opt.init(latent0)

        def loss_fn(latent):
            img = self._ddim_decode(latent)
            logits = self.surrogate.apply(svars, img)
            ce = softmax_cross_entropy(logits, y).mean()
            adv = -ce if not self.targeted else ce
            recon = jnp.mean((img - x) ** 2)
            return adv + self.recon_weight * recon

        def body(carry, _):
            latent, s = carry
            g = jax.grad(loss_fn)(latent)
            updates, s = opt.update(g, s, latent)
            return (optax.apply_updates(latent, updates), s), None

        (latent, _), _ = jax.lax.scan(
            body, (latent0, opt_state), None, length=self.iterations
        )
        return self._ddim_decode(latent) - x

    def __call__(self, data, label, key=None, idx: int = 0):
        x = jnp.asarray(data)
        label = np.asarray(label)
        y = jnp.asarray(label[:, 1] if (self.targeted and label.ndim == 2)
                        else label)
        if self._jitted is None:
            self._jitted = jax.jit(self._attack)
        return self._jitted(self.surrogate.variables, x, y)
