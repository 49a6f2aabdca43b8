"""ViT-surrogate attacks (reference: ``transferattack/model_related/
{pna_patchout,sapr,tgr,fdap}.py``).

Torch backward hooks on attention internals become ``ViTSurgery`` callbacks
compiled into the forward graph (``models/vit.py``).  The reference computes
its token-truncation indices from batch element 0 (it mandates batchsize=1);
here the indices are computed per-sample, which reduces to the same thing at
B=1 and generalizes it correctly for any batch.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..attack import AttackState
from ..gradient.mifgsm import MIFGSM
from ..models import Surrogate, make_model
from ..models.vit import ViTSurgery


def _with_surgery(spec, surgery, kwargs):
    """Resolve a model spec and re-house its ViT backbone with ``surgery``
    (Surrogate specs let parity twins inject converted tiny models)."""
    if isinstance(spec, Surrogate):
        from .vit_attacks2 import _rebuild_vit

        kwargs.pop("pretrained", None)
        kwargs.pop("input_size", None)
        return Surrogate(
            name=spec.name, module=_rebuild_vit(spec, surgery),
            variables=spec.variables, input_size=spec.input_size,
            num_classes=spec.num_classes,
        )
    return make_model(spec, surgery=surgery,
                      pretrained=kwargs.pop("pretrained", True),
                      input_size=kwargs.pop("input_size", None))


def _zero_token_extremes(g, axis):
    """Zero the argmax/argmin positions along ``axis`` per remaining index."""
    mx = jnp.argmax(g, axis=axis, keepdims=True)
    mn = jnp.argmin(g, axis=axis, keepdims=True)
    idx = jnp.arange(g.shape[axis]).reshape(
        [-1 if a == axis else 1 for a in range(g.ndim)]
    )
    keep = (idx != mx) & (idx != mn)
    return g * keep.astype(g.dtype)


def tgr_attn_bwd(g, meta, gamma=0.25):
    """(B, h, N, N) PRE-softmax score cotangent: scale by γ then zero the whole
    row+column of the per-head max and min entries (``tgr.py:53-85``; the
    reference's attn_drop hook lands on the softmax-input node because
    eval-mode Dropout is an identity)."""
    g = gamma * g
    B, H, N, _ = g.shape
    flat = g.reshape(B, H, N * N)
    mx = jnp.argmax(flat, axis=-1)
    mn = jnp.argmin(flat, axis=-1)
    rows = jnp.arange(N)
    def row_col_mask(pos):
        r, c = pos // N, pos % N
        rmask = (rows[None, None, :] != r[:, :, None])
        cmask = (rows[None, None, :] != c[:, :, None])
        return rmask[..., :, None] & cmask[..., None, :]

    keep = row_col_mask(mx) & row_col_mask(mn)
    return g * keep.astype(g.dtype)


def tgr_token_bwd(g, meta, gamma):
    """(B, N, C) output cotangent of the qkv/mlp projection: scale by γ then
    zero per-channel extreme tokens (``tgr.py:107-194`` v_tgr / mlp_tgr; a
    legacy module hook on a Linear/Mlp lands on the output node, so the
    modified tensor is the OUTPUT cotangent)."""
    return _zero_token_extremes(gamma * g, axis=1)


TGR_SURGERY = ViTSurgery(
    scores_bwd=lambda g, m: tgr_attn_bwd(g, m, 0.25),
    qkv_bwd=lambda g, m: tgr_token_bwd(g, m, 0.75),
    mlp_out_bwd=lambda g, m: tgr_token_bwd(g, m, 0.5),
)


def tgr_cls_attn_bwd(g, meta, gamma=0.25):
    """(B, h, 1, N) class-attention map grad: scale by γ then zero the
    per-key max/min HEAD (``tgr.py:87-98`` attn_cait_tgr — the truncation
    axis for CaiT's class attention is the head axis)."""
    return _zero_token_extremes(gamma * g, axis=1)


# CaiT class-attention stage (``tgr.py:223-230``): q grads dropped entirely,
# k/v and mlp truncated like the main blocks.  The reference's loop skips
# blocks_token_only[0] (its `block_ind > 24` off-by-one); we hook both
# class-attention blocks — same semantics, no index gap.
TGR_CLS_SURGERY = ViTSurgery(
    scores_bwd=lambda g, m: tgr_cls_attn_bwd(g, m, 0.25),
    q_bwd=lambda g, m: jnp.zeros_like(g),
    qkv_bwd=lambda g, m: tgr_token_bwd(g, m, 0.75),
    mlp_out_bwd=lambda g, m: tgr_token_bwd(g, m, 0.5),
)


class TGR(MIFGSM):
    """Token gradient regularization (``tgr.py``, CVPR 2023)."""

    def __init__(self, model_name="vit_base_patch16_224", **kwargs):
        kwargs.setdefault("attack", "TGR")
        mkw = {"surgery": TGR_SURGERY}
        if model_name.startswith("cait"):
            mkw["cls_surgery"] = TGR_CLS_SURGERY
        model = make_model(model_name, **mkw,
                           pretrained=kwargs.pop("pretrained", True),
                           input_size=kwargs.pop("input_size", None))
        super().__init__(model, **kwargs)


class PNA_PatchOut(MIFGSM):
    """Pay-No-Attention + PatchOut (``pna_patchout.py``): attention-map
    gradients dropped; each iteration attacks a random subset of patches;
    L2 penalty on delta."""

    def __init__(self, model_name="vit_base_patch16_224", crop_length=16,
                 sample_num_patches=130, lamb=0.1, **kwargs):
        kwargs.setdefault("attack", "PNA_PatchOut")
        model = make_model(model_name, surgery=ViTSurgery(skip_attn_grad=True),
                           pretrained=kwargs.pop("pretrained", True),
                           input_size=kwargs.pop("input_size", None))
        super().__init__(model, **kwargs)
        self.crop_length = int(crop_length)
        self.sample_num_patches = int(sample_num_patches)
        self.lamb = float(lamb)

    def _patchout_mask(self, x, key):
        H, W = x.shape[1], x.shape[2]
        cl = self.crop_length
        gh, gw = H // cl, W // cl
        n_patches = gh * gw
        n_keep = min(self.sample_num_patches, n_patches)
        scores = jax.random.uniform(key, (n_patches,))
        thresh = jnp.sort(scores)[n_patches - n_keep]
        keep = (scores >= thresh).astype(x.dtype).reshape(gh, gw)
        mask = jnp.repeat(jnp.repeat(keep, cl, axis=0), cl, axis=1)
        return mask[None, :, :, None]

    def get_grad(self, variables, x, y, state: AttackState, key):
        k1, k2 = jax.random.split(key)
        mask = self._patchout_mask(x, k1)

        def loss_fn(delta):
            logits = self.model.apply(variables, x + delta * mask)
            ce = self.get_loss(logits[None], y)
            # eps inside the sqrt: the L2 norm's gradient at delta=0 is NaN
            l2 = jnp.sqrt(jnp.sum(delta**2) + 1e-12)
            return ce + self.lamb * l2

        return jax.grad(loss_fn)(state.delta), {}


class SAPR(MIFGSM):
    """Self-attention patch reweighting via random token permutation
    (``sapr.py:38-68``): every attention input has prob 0.15 of arriving
    with its non-cls tokens permuted (one shared permutation per draw)."""

    rng_collections = ("surgery",)

    def __init__(self, model_name="vit_base_patch16_224", prob=0.15, **kwargs):
        kwargs.setdefault("attack", "SAPR")
        self.prob = float(prob)
        surgery = ViTSurgery(attn_pre=self._attn_pre)
        model = _with_surgery(model_name, surgery, kwargs)
        super().__init__(model, **kwargs)

    def token_perm(self, rng, n_tokens, block):
        """(non-cls permutation (n_tokens−1,) of values 1..N−1, apply flag)
        per draw (``sapr.py:56-68``) — overridable seam for parity twins."""
        k1, k2 = jax.random.split(rng)
        perm = jax.random.permutation(k1, n_tokens - 1) + 1
        return perm, jax.random.bernoulli(k2, self.prob)

    def _attn_pre(self, x, meta, rng):
        B, N, C = x.shape
        perm, apply = self.token_perm(rng, N, meta["block"])
        idx = jnp.concatenate([jnp.zeros((1,), perm.dtype), perm])
        return jnp.where(apply, x[:, idx], x)


class FDAP(MIFGSM):
    """Feature-diversity collapse (``fdap.py``): push mid-block token
    features toward their mean — minimize Σ (log ||f − f̄||)^β over blocks
    5-9; alpha=3/255, epoch=30."""

    def __init__(self, model_name="vit_base_patch16_224", epoch=30, beta=2.0,
                 gamma=0.1, blocks=(5, 6, 7, 8, 9), **kwargs):
        kwargs.setdefault("attack", "FDAP")
        kwargs.setdefault("alpha", 3 / 255)
        from ..models import resolve_model

        model = resolve_model(model_name,
                              pretrained=kwargs.pop("pretrained", True),
                              input_size=kwargs.pop("input_size", None))
        super().__init__(model, epoch=epoch, **kwargs)
        self.beta = float(beta)
        self.gamma = float(gamma)
        self.blocks = tuple(blocks)

    def get_grad(self, variables, x, y, state: AttackState, key):
        def loss_fn(delta):
            # the reference hooks ``encoder_layer_i.ln_2`` OUTPUTS
            # (``fdap.py:37-47``) — the normalized MLP-branch input, not the
            # block output; collect them through a pass-through surgery tap
            feats = []

            def mlp_in_post(h, m):
                if m["block"] in self.blocks:
                    feats.append(h)
                return h

            from .vit_attacks2 import _rebuild_vit

            module = _rebuild_vit(
                self.model, ViTSurgery(mlp_in_post=mlp_in_post)
            )
            logits = module.apply(variables, x + delta)
            loss_div = 0.0
            for f in feats:
                mean = f.mean(axis=1, keepdims=True)
                r = jnp.linalg.norm(
                    (f - mean).reshape(f.shape[0], -1), axis=1
                ) + 1e-8
                loss_div = loss_div + jnp.mean(jnp.log(r) ** self.beta)
            ce = self.get_loss(logits[None], y)
            return ce - self.gamma * loss_div

        return jax.grad(loss_fn)(state.delta), {}
