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
    """Stable-Diffusion latent attack (``diffattack.py:38-1766``) — requires
    a JAX SD stack + SD1.5 weights, neither available in this offline image.
    """

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "DiffAttack needs a Stable-Diffusion checkpoint and a JAX "
            "diffusion stack; convert the SD1.5 weights and install a "
            "flax-diffusers equivalent, then see generation/diffattack "
            "notes in SURVEY.md §7 (explicit descope for offline builds)."
        )
