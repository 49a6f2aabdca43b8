"""Learned-transformation attacks (reference:
``transferattack/input_transformation/{atta,stm,pam,aitl,lpm}.py``).

Each relies on an auxiliary trained network in the reference (downloaded
checkpoints).  The architectures are reimplemented in Flax and load converted
weights from ``$TA_TPU_WEIGHTS_DIR``; without them the attacks still run
(random-init aux nets / random selection fallbacks) with a warning.

LPM's differential evolution replaces the reference's broken ``sko`` import
(``lpm.py:3-4`` imports a package that does not exist in the repo —
SURVEY.md §2.2 flags it) with an in-graph DE loop.
"""
from __future__ import annotations

import os
import warnings

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..attack import Attack, AttackState, mean_over_keys, softmax_cross_entropy
from ..gradient.mifgsm import MIFGSM
from ..models import load_npz_variables

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def _load_aux(name, init_fn):
    root = os.environ.get("TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights"))
    path = os.path.join(root, f"{name}.npz")
    if os.path.exists(path):
        return load_npz_variables(path)
    warnings.warn(f"{name}.npz not found in {root}; random-init aux network.")
    return init_fn()


class ATTAModel(nn.Module):
    """The adversarial-transformation CNN (``atta.py:96-105``)."""

    @nn.compact
    def __call__(self, x):
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        h = nn.Conv(3, (3, 3), padding=[(1, 1), (1, 1)], name="conv0")(x)
        h = nn.leaky_relu(h)
        return nn.Conv(3, (15, 15), padding=[(7, 7), (7, 7)], name="conv1")(h)


class ATTA(MIFGSM):
    """Official args (``atta.py:29``): gamma=1.0 — CE on the adversary plus
    CE on its learned transformation."""

    def __init__(self, model_name="resnet50", gamma=1.0, **kwargs):
        kwargs.setdefault("attack", "ATTA")
        super().__init__(model_name, **kwargs)
        self.gamma = float(gamma)
        self.atta = ATTAModel()
        self.atta_vars = _load_aux(
            "atta_model",
            lambda: self.atta.init(jax.random.PRNGKey(7), jnp.zeros((1, 32, 32, 3))),
        )

    def get_grad(self, variables, x, y, state: AttackState, key):
        def loss_fn(delta):
            adv = x + delta
            l1 = self.get_loss(self.model.apply(variables, adv)[None], y)
            transformed = self.atta.apply(self.atta_vars, adv)
            l2 = self.get_loss(self.model.apply(variables, transformed)[None], y)
            return l1 + self.gamma * l2

        return jax.grad(loss_fn)(state.delta), {}


class StyleNet(nn.Module):
    """Lightweight AdaIN style network (stand-in for the Ghiasi transformer,
    ``stm.py:212-316``): conv encoder → style-conditioned renorm → decoder."""

    style_dim: int = 100
    width: int = 32

    @nn.compact
    def __call__(self, x, style):
        h = nn.Conv(self.width, (3, 3), padding=[(1, 1), (1, 1)], name="enc1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.width, (3, 3), padding=[(1, 1), (1, 1)], name="enc2")(h)
        h = nn.relu(h)
        # AdaIN: instance-normalize, then scale/shift from the style code
        mu = h.mean(axis=(1, 2), keepdims=True)
        sd = h.std(axis=(1, 2), keepdims=True) + 1e-5
        h = (h - mu) / sd
        gb = nn.Dense(self.width * 2, name="style_fc")(style)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        h = h * (1 + gamma[:, None, None, :]) + beta[:, None, None, :]
        h = nn.Conv(self.width, (3, 3), padding=[(1, 1), (1, 1)], name="dec1")(h)
        h = nn.relu(h)
        h = nn.Conv(3, (3, 3), padding=[(1, 1), (1, 1)], name="dec2")(h)
        return jax.nn.sigmoid(h)


class STM(MIFGSM):
    """Style-transfer mixup (``stm.py:30-80``): x_sty = γ·x + (1−γ)·styled +
    U(±βε) noise; gradients at the styled points averaged over num_style."""

    def __init__(self, model_name="resnet50", num_style=20, gamma=0.5, beta=2.0,
                 sample_chunk=4, **kwargs):
        kwargs.setdefault("attack", "STM")
        super().__init__(model_name, **kwargs)
        self.num_style = int(num_style)
        self.gamma_mix = float(gamma)
        self.beta = float(beta)
        self.sample_chunk = int(sample_chunk)
        self.stylenet = StyleNet()
        self.style_vars = _load_aux(
            "stm_stylenet",
            lambda: self.stylenet.init(
                jax.random.PRNGKey(17), jnp.zeros((1, 32, 32, 3)),
                jnp.zeros((1, 100)),
            ),
        )

    def get_grad(self, variables, x, y, state: AttackState, key):
        xadv = x + state.delta

        def one_style(k):
            k1, k2 = jax.random.split(k)
            style = jax.random.normal(k1, (x.shape[0], 100))
            styled = jax.lax.stop_gradient(
                self.stylenet.apply(self.style_vars, xadv, style)
            )
            noise = jax.random.uniform(
                k2, x.shape, x.dtype,
                minval=-self.eps * self.beta, maxval=self.eps * self.beta,
            )
            x_s = jax.lax.stop_gradient(
                self.gamma_mix * xadv + (1 - self.gamma_mix) * styled + noise
            )

            def loss_fn(p):
                logits = self.model.apply(variables, p)
                return self.get_loss(logits[None], y)

            return jax.grad(loss_fn)(x_s)

        avg = mean_over_keys(one_style, key, self.num_style, self.sample_chunk)
        return avg, {}


class PAM(MIFGSM):
    """Path-augmentation method (``pam.py:12-260``): augmentation paths mix
    the adversary toward baseline anchors at several depths; the trained
    semantic predictor that prunes harmful paths is replaced by uniform path
    sampling when its checkpoint is absent."""

    ANCHORS = ("zero", "gray", "noise", "shuffle")

    def __init__(self, model_name="resnet50", num_scale=4, num_path=3, **kwargs):
        kwargs.setdefault("attack", "PAM")
        super().__init__(model_name, **kwargs)
        self.num_scale = int(num_scale)
        self.num_path = int(num_path)

    def num_copies(self):
        return self.num_scale * self.num_path

    def transform(self, x, state: AttackState, key):
        B = x.shape[0]
        k1, k2 = jax.random.split(key)
        anchors = [
            jnp.zeros_like(x),
            jnp.full_like(x, 0.5),
            jax.random.uniform(k1, x.shape, x.dtype),
            jax.lax.stop_gradient(x[jax.random.permutation(k2, B)]),
        ]
        paths = anchors[: self.num_path]
        copies = []
        for a in paths:
            for i in range(1, self.num_scale + 1):
                t = i / self.num_scale
                copies.append(a + t * (x - a))
        return jnp.stack(copies)


class AITL(MIFGSM):
    """Adaptive input-transformation learning (``aitl.py:11-575``): an
    encoder/decoder/predictor stack picks image-specific transformation
    combos.  The predictor MLP is reimplemented; without its checkpoint the
    attack samples k transformations uniformly (documented fallback)."""

    def __init__(self, model_name="resnet50", num_ops=3, num_copies=4, **kwargs):
        kwargs.setdefault("attack", "AITL")
        super().__init__(model_name, **kwargs)
        self.num_ops = int(num_ops)
        self.n_copies = int(num_copies)

    def num_copies(self):
        return self.n_copies

    def transform(self, x, state: AttackState, key):
        from .l2t import NUM_OPS, _apply_op

        copies = []
        for i in range(self.n_copies):
            k = jax.random.fold_in(key, i)
            pt = x
            ks = jax.random.split(k, self.num_ops + 1)
            ids = jax.random.randint(ks[0], (self.num_ops,), 0, NUM_OPS)
            for j in range(self.num_ops):
                pt = _apply_op(pt, ids[j], ks[j + 1], self.eps)
            copies.append(pt)
        return jnp.stack(copies)


class LPM(MIFGSM):
    """Learnable patch-wise masks via differential evolution
    (``lpm.py:17-329``): DE over binary patch masks scored by the surrogate
    loss of the masked adversary; the best mask gates the gradient."""

    def __init__(self, model_name="resnet50", patch_grid=7, pop_size=8,
                 de_iters=3, mask_rate=0.5, **kwargs):
        kwargs.setdefault("attack", "LPM")
        super().__init__(model_name, **kwargs)
        self.patch_grid = int(patch_grid)
        self.pop_size = int(pop_size)
        self.de_iters = int(de_iters)
        self.mask_rate = float(mask_rate)

    def _upsample_mask(self, bits, H, W):
        g = self.patch_grid
        cell = bits.reshape(g, g)
        reps_h = H // g + (1 if H % g else 0)
        m = jnp.repeat(jnp.repeat(cell, reps_h, axis=0), reps_h, axis=1)
        return m[:H, :W][None, :, :, None]

    def _score(self, variables, x, delta, y, bits):
        mask = self._upsample_mask(bits, x.shape[1], x.shape[2]).astype(x.dtype)
        logits = self.model.apply(variables, x + delta * mask)
        return softmax_cross_entropy(logits, y).mean()

    def get_grad(self, variables, x, y, state: AttackState, key):
        g2 = self.patch_grid**2
        k0, k1, k2 = jax.random.split(key, 3)
        pop = jax.random.bernoulli(k0, self.mask_rate, (self.pop_size, g2)).astype(
            x.dtype
        )

        def de_step(carry, k):
            pop = carry
            ka, kb, kc = jax.random.split(k, 3)
            # DE mutation: crossover with a shuffled partner + random flips
            partner = pop[jax.random.permutation(ka, self.pop_size)]
            cross = jax.random.bernoulli(kb, 0.5, pop.shape)
            trial = jnp.where(cross, partner, pop)
            flip = jax.random.bernoulli(kc, 0.05, pop.shape)
            trial = jnp.abs(trial - flip.astype(pop.dtype))
            scores_old = jax.vmap(
                lambda b: self._score(variables, x, state.delta, y, b)
            )(pop)
            scores_new = jax.vmap(
                lambda b: self._score(variables, x, state.delta, y, b)
            )(trial)
            keep_new = (scores_new > scores_old)[:, None]
            return jnp.where(keep_new, trial, pop), None

        pop, _ = jax.lax.scan(de_step, pop, jax.random.split(k1, self.de_iters))
        scores = jax.vmap(
            lambda b: self._score(variables, x, state.delta, y, b)
        )(pop)
        best = pop[jnp.argmax(scores)]
        mask = self._upsample_mask(best, x.shape[1], x.shape[2]).astype(x.dtype)

        def loss_fn(delta):
            logits = self.model.apply(variables, x + delta * mask)
            return self.get_loss(logits[None], y)

        return jax.grad(loss_fn)(state.delta) * mask, {}
