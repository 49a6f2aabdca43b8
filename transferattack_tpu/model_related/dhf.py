"""DHF — diversifying high-level features (reference:
``transferattack/model_related/dhf.py`` + ``dhf_networks/``).

A benign forward stores per-block features; during the attack, images the
surrogate already misclassifies get their high-level block features mixed
with the stored benign features (weight U(0, mixup_weight_max)) and randomly
collapsed to the per-image mean with prob 1−random_keep_prob
(``dhf_networks/utils.py:6-45``).  The vendored 2,158-LoC torch module
surgery becomes tap functions on the stock ResNet; combos with
I/MI/NI-FGSM/DIM/TIM/SIM/Admix are mixin subclasses.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import AttackState
from ..gradient.mifgsm import MIFGSM, NIFGSM
from ..input_transformation.dim import DIM
from ..input_transformation.sim import Admix, SIM
from ..input_transformation.tim import TIM

def _default_dhf_blocks(model) -> tuple:
    """High-level blocks to diversify, derived from the surrogate itself.

    ResNets: every block of the last two stages (the reference's per-depth
    lists, ``dhf_networks/resnet.py``).  Inception-v3: the Mixed_6*/7*
    blocks (block-granular form of ``dhf_networks/inception.py:8-38``).
    IncRes-v2: the Block17/Block8 repeats (``dhf_networks/inc_res_v2.py``).
    """
    backbone = model.module.backbone
    kind = type(backbone).__name__
    if kind == "InceptionV3":
        return ("Mixed_6a", "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                "Mixed_7a", "Mixed_7b", "Mixed_7c")
    if kind == "InceptionResNetV2":
        return tuple(f"repeat_1_{i}" for i in range(20)) + tuple(
            f"repeat_2_{i}" for i in range(9)
        ) + ("block8", "conv2d_7b")
    sizes = getattr(backbone, "stage_sizes", None)
    if sizes is None:
        return ("stage2",)  # other surrogates tap the sown stages
    out = []
    for stage in (3, 4):
        for j in range(sizes[stage - 1]):
            out.append(f"layer{stage}_{j}")
    return tuple(out)


class DHFMixin:
    """Attack-agnostic DHF machinery; compose with any transform-based base."""

    def _dhf_init(self, dhf_modules, mixup_weight_max, random_keep_prob):
        self.dhf_modules = (
            tuple(dhf_modules) if dhf_modules else _default_dhf_blocks(self.model)
        )
        self.mixup_weight_max = float(mixup_weight_max)
        self.random_keep_prob = float(random_keep_prob)

    def init_extra(self, x, y):
        n = self.num_copies() * x.shape[0]
        return {"correct": jnp.ones((n,), x.dtype)}

    def _benign_feats(self, variables, x):
        feats = {}
        for name in self.dhf_modules:
            _, f = self.model.feature(variables, x, name)
            feats[name] = jax.lax.stop_gradient(f)
        return feats

    def mixup_uniform(self, key, shape, dtype, step, i):
        """Elementwise U(0, mixup_weight_max) mix weight
        (``dhf_networks/utils.py:41-46``) — overridable seam for paired-RNG
        parity twins (``i`` indexes ``dhf_modules``)."""
        return jax.random.uniform(key, shape, dtype,
                                  maxval=self.mixup_weight_max)

    def keep_uniform(self, key, shape, step, i):
        """Elementwise U(0,1) compared against random_keep_prob
        (``dhf_networks/utils.py:48-50``) — seam."""
        return jax.random.uniform(key, shape)

    def _make_taps(self, mix_feats, indicator, key, step):
        taps = {}
        for i, name in enumerate(self.dhf_modules):
            mix = mix_feats[name]
            kname = jax.random.fold_in(key, i)

            def tap(feat, mix=mix, kname=kname, i=i):
                reps = feat.shape[0] // mix.shape[0]
                mixb = jnp.tile(mix, (reps,) + (1,) * (mix.ndim - 1))
                ind = indicator.reshape((-1,) + (1,) * (feat.ndim - 1))
                k1, k2 = jax.random.split(kname)
                w = ind * self.mixup_uniform(k1, feat.shape, feat.dtype,
                                             step, i)
                feat = w * mixb + (1.0 - w) * feat
                mean = jnp.mean(feat, axis=tuple(range(1, feat.ndim)), keepdims=True)
                replace = (
                    self.keep_uniform(k2, feat.shape, step, i)
                    >= self.random_keep_prob
                ) & (ind > 0)
                return jnp.where(replace, mean, feat)

            taps[name] = tap
        return taps

    def run(self, variables, x, y, key):
        self._mix_feats = self._benign_feats(variables, x)
        return super().run(variables, x, y, key)

    def get_grad(self, variables, x, y, state: AttackState, key):
        tkey, dkey = jax.random.split(key)
        # DHF applies to images the surrogate currently MISclassifies
        # (indicator = 1 − correct, ``dhf.py:60-72``)
        taps = self._make_taps(
            self._mix_feats, 1.0 - state.extra["correct"], dkey, state.step
        )

        def loss_fn(delta):
            xs = self.transform(x + delta, state, tkey)
            n, b = xs.shape[0], xs.shape[1]
            flat = xs.reshape((n * b,) + xs.shape[2:])
            logits = self.model.apply(variables, flat, tap_fns=taps)
            logits = logits.reshape((n, b) + logits.shape[1:])
            return self.get_loss(logits, y), logits

        (_, logits), grad = jax.value_and_grad(loss_fn, has_aux=True)(state.delta)
        pred = logits.argmax(-1)  # (n, B)
        correct = (pred == y[None]).astype(x.dtype).reshape(-1)
        return grad, {"correct": correct}


def _dhf_class(base, name):
    class _DHF(DHFMixin, base):
        def __init__(self, model_name="resnet50", dhf_modules=None,
                     mixup_weight_max=0.2, random_keep_prob=0.9, **kwargs):
            kwargs.setdefault("attack", name)
            super().__init__(model_name, **kwargs)
            self._dhf_init(dhf_modules, mixup_weight_max, random_keep_prob)

    _DHF.__name__ = name
    _DHF.__qualname__ = name
    return _DHF


DHF_MIFGSM = _dhf_class(MIFGSM, "DHF_MIFGSM")
DHF_NIFGSM = _dhf_class(NIFGSM, "DHF_NIFGSM")
DHF_DIM = _dhf_class(DIM, "DHF_DIM")
DHF_TIM = _dhf_class(TIM, "DHF_TIM")
DHF_SIM = _dhf_class(SIM, "DHF_SIM")
DHF_Admix = _dhf_class(Admix, "DHF_Admix")


class DHF_IFGSM(DHF_MIFGSM):
    """I-FGSM variant: decay=0 (``dhf.py:26-40``)."""

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("attack", "DHF_IFGSM")
        super().__init__(*args, **kwargs)
        self.decay = 0.0
