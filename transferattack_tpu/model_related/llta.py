"""LLTA / LL2S / ATA-ViT (reference: ``transferattack/model_related/
{llta_networks/llta.py, ll2s.py, ata_vit.py}``).

LLTA: per-sample backward-decay factors γ on each non-first residual block
(DecayReLU, ``llta_networks/models/decayrelu.py``) optimized by NES-style
gaussian sampling, then gradients averaged over sampled meta-tasks (model
augmentation = γ jitter; data augmentation = DIM-style resize-pad).  The
decay is the straight-through rewrite ``γ·f + sg((1−γ)·f)`` at block-output
taps — exactly the reference's ``x·γ − sg(x)·γ + sg(x)``.

LL2S: ViT redundancy exploitation — per iteration one of several redundancy
transformations (head permutation / attention sparsification / token drop)
chosen by an online softmax bandit over carried scores (redesign of the
reference's 705-LoC GlobalState machinery).

ATA-ViT: attention-rollout-weighted perturbation allocation + embedding
perturbation (stand-in for the vendored 2,186-LoC LRP explainability stack).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import AttackState, softmax_cross_entropy
from ..gradient.mifgsm import MIFGSM
from ..input_transformation.dim import random_resize_pad
from ..models import make_model
from ..models.vit import ViTSurgery
from .vit_attacks2 import _rebuild_vit


class LLTA(MIFGSM):
    """Official args (``llta.py:43-56``): inner_iters=5, nsample=5,
    task_num=5, sigma=0.05; reference demands batchsize=1 — per-sample γ
    makes it batched here."""

    def __init__(self, model_name="resnet50", inner_iters=5, nsample=5,
                 task_num=5, sigma=0.05, aug_prob=0.5, **kwargs):
        kwargs.setdefault("attack", "LLTA")
        model = make_model(model_name, pretrained=kwargs.pop("pretrained", True),
                           input_size=kwargs.pop("input_size", None))
        super().__init__(model, **kwargs)
        self.inner_iters = int(inner_iters)
        self.nsample = int(nsample)
        self.task_num = int(task_num)
        self.sigma = float(sigma)
        self.aug_prob = float(aug_prob)
        # decay taps on every non-first block of each stage (``decayresnet``)
        sizes = self.model.module.backbone.stage_sizes
        self.decay_blocks = tuple(
            f"layer{i + 1}_{j}"
            for i, n in enumerate(sizes)
            for j in range(1, n)
        )

    def _gamma_logits(self, variables, point, y, gammas):
        """Forward with per-sample per-block backward decay γ."""
        shape1 = (-1,) + (1,) * 3

        taps = {}
        for bi, name in enumerate(self.decay_blocks):
            def tap(feat, bi=bi):
                g = gammas[:, bi].reshape(shape1)
                return feat * g + jax.lax.stop_gradient(feat * (1 - g))

            taps[name] = tap
        return self.model.apply(variables, point, tap_fns=taps)

    def _gamma_loss(self, variables, point, y, gammas):
        logits = self._gamma_logits(variables, point, y, gammas)
        return softmax_cross_entropy(logits, y)  # per-sample

    def get_grad(self, variables, x, y, state: AttackState, key):
        B = x.shape[0]
        G = len(self.decay_blocks)
        point = jax.lax.stop_gradient(x + state.delta)
        gammas = jnp.full((B, G), 0.5, x.dtype)

        # NES-style γ optimization: maximize per-sample CE (``llta.py:90-96``)
        def inner(carry, k):
            g = carry
            ks = jax.random.split(k, self.nsample)

            def one(kk):
                eps = jax.random.normal(kk, g.shape, g.dtype) * self.sigma
                loss = self._gamma_loss(variables, point, y, jnp.clip(g + eps, 0, 1))
                return loss[:, None] * eps  # (B, G) NES estimate

            est = jnp.mean(jnp.stack([one(kk) for kk in ks]), axis=0)
            g = jnp.clip(g + est / (self.sigma + 1e-12) * 0.1, 0.0, 1.0)
            return g, None

        key, kin = jax.random.split(key)
        gammas, _ = jax.lax.scan(
            inner, gammas, jax.random.split(kin, self.inner_iters)
        )
        gammas = jax.lax.stop_gradient(gammas)

        # meta-task gradient averaging: γ jitter + optional data augmentation
        def task_grad(k):
            k1, k2, k3 = jax.random.split(k, 3)
            gt = jnp.clip(
                gammas + jax.random.normal(k1, gammas.shape) * self.sigma, 0, 1
            )

            def loss_fn(delta):
                p = x + delta
                p = random_resize_pad(p, k2, 1.1, self.aug_prob)
                logits = self._gamma_logits(variables, p, y, gt)
                return self.get_loss(logits[None], y)

            return jax.grad(loss_fn)(state.delta)

        key, kt = jax.random.split(key)
        grads = jnp.stack(
            [task_grad(k) for k in jax.random.split(kt, self.task_num)]
        )
        return grads.mean(0), {}


class LL2S(MIFGSM):
    """Layer-level redundancy exploitation (``ll2s.py:395-705``): an online
    bandit over redundancy transformations of the ViT forward."""

    N_STRATEGIES = 3  # head-permute, attn-sparsify, token-drop

    def __init__(self, model_name="vit_base_patch16_224", topk_frac=0.5,
                 token_keep=0.9, bandit_lr=0.1, **kwargs):
        kwargs.setdefault("attack", "LL2S")
        model = make_model(model_name, pretrained=kwargs.pop("pretrained", True),
                           input_size=kwargs.pop("input_size", None))
        super().__init__(model, **kwargs)
        self.topk_frac = float(topk_frac)
        self.token_keep = float(token_keep)
        self.bandit_lr = float(bandit_lr)

    def init_extra(self, x, y):
        return {"scores": jnp.zeros((self.N_STRATEGIES,), x.dtype),
                "last_loss": jnp.zeros((), x.dtype)}

    def _strategy_module(self, strat, key):
        def attn_post(attn, meta):
            kb = jax.random.fold_in(key, meta["block"])
            h = attn.shape[1]
            N = attn.shape[-1]

            def head_perm():
                perm = jax.random.permutation(kb, h)
                return attn[:, perm]

            def sparsify():
                k = max(int(N * self.topk_frac), 1)
                thresh = jnp.sort(attn, axis=-1)[..., N - k][..., None]
                sparse = jnp.where(attn >= thresh, attn, 0.0)
                return sparse / (sparse.sum(-1, keepdims=True) + 1e-12)

            def token_drop():
                keep = jax.random.bernoulli(
                    kb, self.token_keep, (1, 1, 1, N)
                ).astype(attn.dtype)
                keep = keep.at[..., 0].set(1.0)
                masked = attn * keep
                return masked / (masked.sum(-1, keepdims=True) + 1e-12)

            return jax.lax.switch(strat, [head_perm, sparsify, token_drop])

        return _rebuild_vit(self.model, ViTSurgery(attn_post=attn_post))

    def get_grad(self, variables, x, y, state: AttackState, key):
        k1, k2 = jax.random.split(key)
        scores = state.extra["scores"]
        strat = jax.random.categorical(k1, scores / 0.5)
        module = self._strategy_module(strat, k2)

        def loss_fn(delta):
            logits = module.apply(variables, x + delta)
            return self.get_loss(logits[None], y)

        loss, grad = jax.value_and_grad(loss_fn)(state.delta)
        # bandit update: reward = loss improvement over the previous step
        reward = loss - state.extra["last_loss"]
        scores = scores.at[strat].add(self.bandit_lr * reward)
        return grad, {"scores": scores, "last_loss": loss}


class ATA_ViT(MIFGSM):
    """Attention-aware ViT attack (``ata_vit.py:13-421``): the perturbation
    is concentrated on high-attention patches (attention rollout replaces the
    vendored LRP stack) plus a patch-embedding perturbation loss."""

    def __init__(self, model_name="vit_base_patch16_224", region_frac=0.5,
                 emb_weight=0.1, **kwargs):
        kwargs.setdefault("attack", "ATA_ViT")
        model = make_model(model_name, pretrained=kwargs.pop("pretrained", True),
                           input_size=kwargs.pop("input_size", None))
        super().__init__(model, **kwargs)
        self.region_frac = float(region_frac)
        self.emb_weight = float(emb_weight)
        self.depth = model.module.backbone.depth

    def _attention_rollout(self, variables, x):
        """cls-to-patch attention rollout over all blocks."""
        from ..models import find_feature

        _, feats = self.model.apply_with_feats(variables, x, "__none__")
        N = None
        rollout = None
        for b in range(self.depth):
            blk = find_feature(feats, f"blocks_{b}")
            amap = find_feature({"d": blk}, "attn")  # (B, h, N, N)
            while isinstance(amap, dict):
                amap = find_feature({"d": amap}, "attn")
            if amap is None:
                continue
            a = amap.mean(axis=1)  # head-average
            N = a.shape[-1]
            a = a + jnp.eye(N, dtype=a.dtype)[None]
            a = a / a.sum(-1, keepdims=True)
            rollout = a if rollout is None else a @ rollout
        cls_attn = rollout[:, 0, 1:]  # (B, N-1) cls → patches
        return cls_attn

    def get_grad(self, variables, x, y, state: AttackState, key):
        bb = self.model.module.backbone
        H, W = x.shape[1], x.shape[2]
        size = self.model.input_size
        ph = size // bb.patch_size

        cls_attn = jax.lax.stop_gradient(
            self._attention_rollout(variables, x + state.delta)
        )
        n_patches = cls_attn.shape[-1]
        k = max(int(n_patches * self.region_frac), 1)
        thresh = jnp.sort(cls_attn, axis=-1)[:, n_patches - k][:, None]
        patch_mask = (cls_attn >= thresh).astype(x.dtype).reshape(-1, ph, ph)
        mask = jnp.repeat(
            jnp.repeat(patch_mask, H // ph, axis=1), W // ph, axis=2
        )[..., None]

        def loss_fn(delta):
            logits = self.model.apply(variables, x + delta * mask)
            ce = self.get_loss(logits[None], y)
            # embedding-perturbation regularizer on the attacked region
            return ce + self.emb_weight * jnp.mean(jnp.abs(delta * mask))

        return jax.grad(loss_fn)(state.delta), {}
