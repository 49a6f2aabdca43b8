"""Generation-based attacks (reference: ``transferattack/generation/
{ttp,m3d,cdtp,ltp,ge_advgan,dsva,ada}.py``).

Inference-only: a pre-trained GeneratorResnet maps images to adversaries;
TTP/M3D additionally gaussian-smooth and are targeted (one generator per
target class, driven by ``main.py``'s per-class loop).  Converted generator
weights load from ``$TA_TPU_WEIGHTS_DIR/<prefix>[_<class>].npz``; absent
checkpoints fall back to a fixed-seed random generator with a warning so
pipelines stay runnable (ASR parity requires converting the official
HuggingFace checkpoints).
"""
from __future__ import annotations

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from ..models import load_npz_variables
from ..utils.weights_manifest import record_fallback
from ..ops import smooth_conv
from ..utils import generation_target_classes
from .generators import ADAGenerator, AdvGANGenerator, GeneratorResnet


def _ttp_gaussian_kernel(kernel_size=3, sigma=1):
    """TTP's smoothing kernel (``ttp.py:get_gaussian_kernel``)."""
    coords = np.arange(kernel_size)
    grid = np.stack(np.meshgrid(coords, coords, indexing="ij"), -1).astype(np.float32)
    mean = (kernel_size - 1) / 2.0
    k = np.exp(-((grid - mean) ** 2).sum(-1) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


class GenerativeAttack:
    """Base: delta = clamp(G(x) − x, ±eps); per-target-class checkpoints."""

    ckpt_prefix = ""
    targeted_generators = False   # one generator per generation target class
    smooth = False
    generator_cls = GeneratorResnet

    def __init__(self, model_name="resnet50", eps=16 / 255, targeted=False,
                 seed=0, attack=None, **kwargs):
        self.model_name = model_name
        self.eps = float(eps)
        self.seed = int(seed)
        self.attack = attack or type(self).__name__
        self.targeted = targeted
        self.requires_batchsize = None
        self.generator = self.generator_cls()
        self._var_cache = {}
        self._jitted = None

    def _generator_variables(self, idx: int, x_shape):
        key = idx if self.targeted_generators else 0
        if key in self._var_cache:
            return self._var_cache[key]
        root = os.environ.get("TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights"))
        if self.targeted_generators:
            cls = generation_target_classes[idx]
            path = os.path.join(root, f"{self.ckpt_prefix}_{cls}.npz")
        else:
            path = os.path.join(root, f"{self.ckpt_prefix}.npz")
        if os.path.exists(path):
            variables = load_npz_variables(path)
        else:
            record_fallback(self.ckpt_prefix)
            warnings.warn(
                f"{self.attack}: generator checkpoint {path} not found; "
                "random-init generator used (convert the official weights "
                "for ASR parity)."
            )
            rng = jax.random.PRNGKey(self.seed + 101 + key)
            variables = self.generator.init(rng, jnp.zeros((1,) + x_shape[1:]))
        self._var_cache[key] = variables
        return variables

    def generate(self, variables, x):
        adv = self.generator.apply(variables, x)
        if self.smooth:
            adv = smooth_conv(adv, _ttp_gaussian_kernel())
        return jnp.clip(adv - x, -self.eps, self.eps)

    def __call__(self, data, label, key=None, idx: int = 0):
        x = jnp.asarray(data)
        variables = self._generator_variables(idx, x.shape)
        if self._jitted is None:
            self._jitted = jax.jit(self.generate)
        return self._jitted(variables, x)


class TTP(GenerativeAttack):
    """Targeted transferable perturbations (``ttp.py:11-61``)."""

    ckpt_prefix = "ttp_resnet50"
    targeted_generators = True
    smooth = True

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("targeted", True)
        super().__init__(*args, **kwargs)


class M3D(GenerativeAttack):
    """Min-max model discrepancy generators (``m3d.py:11-177``)."""

    ckpt_prefix = "m3d_resnet50"
    targeted_generators = True
    smooth = True

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("targeted", True)
        super().__init__(*args, **kwargs)


class CDTP(GenerativeAttack):
    """Cross-domain transferable perturbation (``cdtp.py:136-170``):
    domain-invariant generator, untargeted, no smoothing.

    The shipped reference loads a single ``/netG.pth`` (``cdtp.py:149-151``);
    the upstream CDA release trains one generator per source domain
    (paintings / comics / ImageNet / chestX).  ``domain=`` selects a
    converted per-domain checkpoint ``cdtp_<domain>.npz``, falling back to
    the flat ``cdtp.npz``."""

    ckpt_prefix = "cdtp"

    def __init__(self, *args, domain: str = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.domain = domain

    def _generator_variables(self, idx, x_shape):
        if self.domain:
            root = os.environ.get("TA_TPU_WEIGHTS_DIR",
                                  os.path.join(os.getcwd(), "weights"))
            path = os.path.join(root, f"cdtp_{self.domain}.npz")
            if os.path.exists(path):
                if "domain" not in self._var_cache:
                    self._var_cache["domain"] = load_npz_variables(path)
                return self._var_cache["domain"]
        return super()._generator_variables(idx, x_shape)


class LTP(GenerativeAttack):
    """Learned transferable perturbation via mid-level feature loss
    (``ltp.py:7-236``)."""

    ckpt_prefix = "ltp"


class GE_ADVGAN(GenerativeAttack):
    """Gradient-editing AdvGAN (``ge_advgan.py:108-180``): the AdvGAN
    generator's tanh output IS the signed perturbation — clamped to ±ε and
    re-clipped into the image box (``forward``, ``ge_advgan.py:165-180``);
    at odd input sizes torch's shape arithmetic loses a row/column, which
    the reference restores by cropping the perturbation (``crop``)."""

    ckpt_prefix = "ge_advgan"
    generator_cls = AdvGANGenerator

    def generate(self, variables, x):
        pert = self.generator.apply(variables, x)
        H, W = x.shape[1], x.shape[2]
        if pert.shape[1] != H or pert.shape[2] != W:
            pert = pert[:, :H, :W, :]
        delta = jnp.clip(pert, -self.eps, self.eps)
        return jnp.clip(x + delta, 0.0, 1.0) - x


class DSVA(GenerativeAttack):
    """Generator trained against DINO+MAE ViT features (``dsva.py:124-175``)."""

    ckpt_prefix = "dsva"


class ADA(GenerativeAttack):
    """Adversarial-distribution U-Net with stochastic latent
    (``ada.py:10-203``): the faithful AttackGenerator (z tiled into every
    down block); the tanh output is the perturbation, clamped to ±ε and
    the image box (``ada.py:67-73``).  The reference duplicates the batch
    and keeps the first half — a fresh-z-per-image draw, reproduced here
    with one z per image.  The U-Net closes only at sides ≡ 3 (mod 4)
    (inception 299); other sizes are edge-padded up and cropped back."""

    ckpt_prefix = "ada"
    generator_cls = ADAGenerator
    latent_dim = 16

    def _generator_variables(self, idx, x_shape):
        if 0 in self._var_cache:
            return self._var_cache[0]
        root = os.environ.get("TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights"))
        path = os.path.join(root, f"{self.ckpt_prefix}.npz")
        if os.path.exists(path):
            variables = load_npz_variables(path)
        else:
            record_fallback(self.ckpt_prefix)
            warnings.warn(f"{self.attack}: {path} not found; random generator.")
            rng = jax.random.PRNGKey(self.seed + 131)
            z = jnp.zeros((1, self.latent_dim))
            variables = self.generator.init(rng, jnp.zeros((1,) + x_shape[1:]), z)
        self._var_cache[0] = variables
        return variables

    def __call__(self, data, label, key=None, idx: int = 0):
        x = jnp.asarray(data)
        H, W = x.shape[1], x.shape[2]
        # the U-Net's skip shapes only close at sides ≡ 3 (mod 4) — 299 in
        # the reference; edge-pad other sizes up and crop the output back
        ph, pw = (3 - H % 4) % 4, (3 - W % 4) % 4
        xg = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        variables = self._generator_variables(idx, xg.shape)
        if key is None:
            key = jax.random.PRNGKey(self.seed + idx)
        z = jax.random.normal(key, (x.shape[0], self.latent_dim))
        pert = self.generator.apply(variables, xg, z)[:, :H, :W, :]
        delta = jnp.clip(pert, -self.eps, self.eps)
        return jnp.clip(x + delta, 0.0, 1.0) - x
