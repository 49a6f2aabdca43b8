"""ViT-B/16 (timm layout, NHWC input) with gradient-surgery hook points.

The ViT-specific attacks (PNA-PatchOut ``model_related/pna_patchout.py``, SAPR
``sapr.py``, TGR ``tgr.py``, VDC ``vdc.py``, ATT ``att.py``, FPR ``fpr.py``)
mutate gradients/activations of attention internals via torch hooks.  Here
the transformer exposes explicit surgery callbacks — pure functions applied
inside ``jax.custom_vjp`` wrappers on the attention map, QKV, and MLP paths —
so every hook becomes a jit-compatible config.

Naming tracks timm's ``vit_base_patch16_224`` for weight conversion:
``patch_embed.proj`` → ``patch_embed``; ``blocks.i.attn.qkv`` →
``blocks_i/attn/qkv``; etc.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import LN, register_model


@dataclasses.dataclass(frozen=True)
class ViTSurgery:
    """Gradient/activation surgery hooks.

    Each ``*_bwd`` is ``fn(grad, meta) -> grad`` applied to the cotangent of
    that tensor; ``attn_post`` is ``fn(attn_weights, meta) -> weights``
    applied in the forward (SAPR token permutation, FPR refinement).
    ``meta`` is a dict with ``block`` (index) and RNG key when available.
    """

    attn_bwd: Optional[Callable] = None   # grad of softmax attention map
    scores_bwd: Optional[Callable] = None  # grad of PRE-softmax attn scores —
                                          # where the reference's attn_drop
                                          # backward hooks actually land (an
                                          # eval-mode Dropout attaches to the
                                          # softmax node, so grad_in[0] is the
                                          # softmax-INPUT cotangent; TGR/PNA)
    qkv_bwd: Optional[Callable] = None    # grad of the fused qkv projection
    mlp_bwd: Optional[Callable] = None    # grad of mlp hidden activations
    mlp_in_bwd: Optional[Callable] = None  # grad at the mlp block input
    mlp_out_bwd: Optional[Callable] = None  # grad of the mlp OUTPUT — where a
                                          # legacy module hook on `mlp` lands
                                          # (fc2's output node; TGR mlp_tgr)
    attn_post: Optional[Callable] = None  # forward-mode attention map edit
    attn_pre: Optional[Callable] = None   # forward edit of attention input
                                          # tokens; fn(x, meta, rng) (SAPR)
    kv_extra: Optional[Callable] = None   # fn(meta) -> (k_ext, v_ext[, bias]),
                                          # k/v each (B, h, R, dh) appended
                                          # along the key axis (LL2S REST
                                          # attack: the reference also appends
                                          # q rows but truncates their outputs,
                                          # which is equivalent to appending
                                          # k/v only).  Optional ``bias`` is
                                          # added to the extra R pre-softmax
                                          # score columns (broadcastable to
                                          # (B, h, N, R)) — a -1e9 bias
                                          # disables the slots regardless of q
    mlp_hidden_post: Optional[Callable] = None  # forward edit of the mlp
                                          # hidden activation; fn(h, meta)
                                          # (LL2S MoE: averaging the linear
                                          # fc2 over expert dropout masks ≡
                                          # one forward with the mean mask)
    attn_out_post: Optional[Callable] = None  # forward edit of attention
                                              # module output (FPR momentum)
    mlp_out_post: Optional[Callable] = None   # forward edit of mlp output
    mlp_in_post: Optional[Callable] = None    # forward edit at the mlp input
    qkv_post: Optional[Callable] = None       # forward edit of the fused qkv
    q_bwd: Optional[Callable] = None      # grad of a separate q projection
                                          # (CaiT class-attention, TGR q_tgr)
    scores_post: Optional[Callable] = None  # forward edit of PRE-softmax attn
                                          # scores; fn(scores, meta).  VDC's
                                          # traced per-iteration cotangent
                                          # scale/inject lands here as the
                                          # forward rewrite (traced closures
                                          # cannot ride custom_vjp hooks)
    mlp_branch_pre: Optional[Callable] = None  # forward edit of the MLP
                                          # branch's view of the residual
                                          # stream BEFORE norm2 (the skip path
                                          # is untouched) — where a legacy
                                          # backward hook on norm2 lands
                                          # (grad_in[0] = grad w.r.t. the LN
                                          # input through this module only)
    block_out_post: Optional[Callable] = None  # forward edit of a block's
                                          # output (block D-1's output is the
                                          # final-norm input — VDC norm probe)
    skip_attn_grad: bool = False          # PNA: drop grads through attn map

    def __hash__(self):
        return hash((id(self.attn_bwd), id(self.scores_bwd), id(self.qkv_bwd),
                     id(self.mlp_bwd), id(self.mlp_in_bwd), id(self.mlp_out_bwd),
                     id(self.attn_post), id(self.attn_pre), id(self.kv_extra),
                     id(self.mlp_hidden_post),
                     id(self.attn_out_post), id(self.mlp_out_post),
                     id(self.mlp_in_post), id(self.qkv_post), id(self.q_bwd),
                     id(self.scores_post), id(self.mlp_branch_pre),
                     id(self.block_out_post),
                     self.skip_attn_grad))


DEFAULT_VIT_SURGERY = ViTSurgery()


def apply_bwd_hook(x, hook: Optional[Callable], meta):
    """Identity whose backward applies ``hook`` to the cotangent."""
    if hook is None:
        return x

    @jax.custom_vjp
    def _ident(v):
        return v

    def fwd(v):
        return v, None

    def bwd(_, g):
        return (hook(g, meta),)

    _ident.defvjp(fwd, bwd)
    return _ident(x)


class Attention(nn.Module):
    dim: int
    num_heads: int
    surgery: ViTSurgery = DEFAULT_VIT_SURGERY
    block_index: int = 0

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        h = self.num_heads
        head_dim = D // h
        s = self.surgery
        meta = {"block": self.block_index, "num_heads": h, "tokens": N}

        if s.attn_pre is not None:
            x = s.attn_pre(x, meta, self.make_rng("surgery"))
        qkv = nn.Dense(D * 3, name="qkv")(x)
        if s.qkv_post is not None:
            qkv = s.qkv_post(qkv, meta)
        qkv = apply_bwd_hook(qkv, s.qkv_bwd, meta)
        # Layout choice (measured, r3): with no attention-map hooks the
        # (B, N, h, dh) einsum form avoids 5-D transpose copies (~16% of the
        # ViT-B backward; 92→126 img/s at batch 32).  With score/attn-map
        # surgery (TGR et al) the head-major explicit form backprops the
        # hook's (B, h, N, N) cotangent without extra relayouts (97 vs 76).
        fast_layout = (s.scores_bwd is None and s.attn_bwd is None
                       and s.attn_post is None and s.scores_post is None
                       and not s.skip_attn_grad)
        ext_bias = None
        if fast_layout:
            qkv = qkv.reshape(B, N, 3, h, head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B,N,h,dh)
            if s.kv_extra is not None:
                ext = s.kv_extra(meta)
                k_ext, v_ext = ext[0], ext[1]  # (B, h, R, dh)
                if len(ext) > 2:
                    ext_bias = ext[2]
                k = jnp.concatenate(
                    [k, k_ext.transpose(0, 2, 1, 3).astype(k.dtype)], axis=1)
                v = jnp.concatenate(
                    [v, v_ext.transpose(0, 2, 1, 3).astype(v.dtype)], axis=1)
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (head_dim**-0.5)
        else:
            qkv = qkv.reshape(B, N, 3, h, head_dim).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]  # (B, h, N, dh)
            if s.kv_extra is not None:
                ext = s.kv_extra(meta)
                k_ext, v_ext = ext[0], ext[1]
                if len(ext) > 2:
                    ext_bias = ext[2]
                k = jnp.concatenate([k, k_ext.astype(k.dtype)], axis=2)
                v = jnp.concatenate([v, v_ext.astype(v.dtype)], axis=2)
            attn = (q @ k.transpose(0, 1, 3, 2)) * (head_dim**-0.5)
        if ext_bias is not None:
            # per-slot logit bias on the appended columns only: disabling a
            # slot must not depend on q (a poisoned key of -1e9 flips sign
            # with sum(q) — the bias form is unconditional)
            attn = attn.at[..., N:].add(jnp.asarray(ext_bias, attn.dtype))
        attn = apply_bwd_hook(attn, s.scores_bwd, meta)
        if s.scores_post is not None:
            attn = s.scores_post(attn, meta)
        attn = jax.nn.softmax(attn, axis=-1)  # (B, h, N, N[+R])
        if s.attn_post is not None:
            attn = s.attn_post(attn, meta)
        if s.skip_attn_grad:
            # PNA (``pna_patchout.py``): forward through attention, but the
            # backward pass treats the attention map as a constant
            attn = jax.lax.stop_gradient(attn)
        else:
            attn = apply_bwd_hook(attn, s.attn_bwd, meta)

        if fast_layout:
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, D)
        else:
            out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, D)
        self.sow("intermediates", "attn", attn)
        out = nn.Dense(D, name="proj")(out)
        if s.attn_out_post is not None:
            out = s.attn_out_post(out, meta)
        return out


class Mlp(nn.Module):
    hidden: int
    out: int
    surgery: ViTSurgery = DEFAULT_VIT_SURGERY
    block_index: int = 0

    @nn.compact
    def __call__(self, x):
        meta = {"block": self.block_index}
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        if self.surgery.mlp_hidden_post is not None:
            x = self.surgery.mlp_hidden_post(x, meta)
        x = apply_bwd_hook(x, self.surgery.mlp_bwd, meta)
        x = nn.Dense(self.out, name="fc2")(x)
        x = apply_bwd_hook(x, self.surgery.mlp_out_bwd, meta)
        if self.surgery.mlp_out_post is not None:
            x = self.surgery.mlp_out_post(x, meta)
        return x


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    surgery: ViTSurgery = DEFAULT_VIT_SURGERY
    block_index: int = 0

    @nn.compact
    def __call__(self, x):
        x = x + Attention(
            self.dim, self.num_heads, self.surgery, self.block_index, name="attn"
        )(LN(epsilon=1e-6, name="norm1")(x))
        h_in = x
        if self.surgery.mlp_branch_pre is not None:
            # the skip path keeps the untouched x: edits/cotangent rewrites
            # here reach the residual stream only through norm2, matching a
            # legacy backward hook's grad_in[0] on norm2
            h_in = self.surgery.mlp_branch_pre(h_in, {"block": self.block_index})
        h = LN(epsilon=1e-6, name="norm2")(h_in)
        if self.surgery.mlp_in_post is not None:
            h = self.surgery.mlp_in_post(h, {"block": self.block_index})
        # TGR's mlp hook fires on the gradient at the mlp-branch input
        h = apply_bwd_hook(
            h, self.surgery.mlp_in_bwd, {"block": self.block_index}
        )
        x = x + Mlp(
            int(self.dim * self.mlp_ratio), self.dim, self.surgery,
            self.block_index, name="mlp",
        )(h)
        if self.surgery.block_out_post is not None:
            x = self.surgery.block_out_post(x, {"block": self.block_index})
        self.sow("intermediates", "block_out", x)
        return x


class PatchEmbed(nn.Module):
    """Non-overlapping patch projection as space-to-depth + matmul.

    A stride==kernel conv (16×16/16, 3→768) contracts only 147 input-deep
    taps per output and its input gradient is a transposed conv producing 3
    channels — both starve the MXU (the profiler showed this single
    convolution fusion at ~40% of the ViT-B attack iteration).  Extracting
    the patches by reshape and applying the kernel as a (P·P·C, D) matmul is
    bit-exact (identical MACs) and runs both directions as dense GEMMs.
    Param names/shapes match ``nn.Conv`` so converted timm checkpoints load
    unchanged (``patch_embed/kernel`` HWIO, ``patch_embed/bias``).
    """

    dim: int
    patch: int

    @nn.compact
    def __call__(self, x):
        P = self.patch
        B, H, W, C = x.shape
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (P, P, C, self.dim))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        xp = x.reshape(B, H // P, P, W // P, P, C).transpose(0, 1, 3, 2, 4, 5)
        xp = xp.reshape(B, (H // P) * (W // P), P * P * C)
        return xp @ k.reshape(P * P * C, self.dim) + b


class VisionTransformer(nn.Module):
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    surgery: ViTSurgery = DEFAULT_VIT_SURGERY
    token_drop: float = 0.0  # PNA-PatchOut random patch drop (rng 'patch')
    distilled: bool = False  # DeiT: dist token + dual head (timm deit.py)

    @nn.compact
    def __call__(self, x, features_only: bool = False, extra_tokens=None):
        """``extra_tokens``: optional (B, R, D) sequence appended after the
        positional embedding — LL2S robust-token injection
        (``ll2s.py:286-306`` vit_forward_features)."""
        B = x.shape[0]
        x = PatchEmbed(self.dim, self.patch_size, name="patch_embed")(x)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        prefix = [jnp.broadcast_to(cls, (B, 1, self.dim))]
        if self.distilled:
            dist = self.param("dist_token", nn.initializers.zeros,
                              (1, 1, self.dim))
            prefix.append(jnp.broadcast_to(dist, (B, 1, self.dim)))
        x = jnp.concatenate(prefix + [x], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, x.shape[1], self.dim)
        )
        x = x + pos
        if extra_tokens is not None:
            x = jnp.concatenate([x, extra_tokens.astype(x.dtype)], axis=1)
        n_prefix = 2 if self.distilled else 1
        if self.token_drop > 0.0:
            # PatchOut: randomly zero patch tokens per forward (never cls/dist)
            rng = self.make_rng("patch")
            keep = jax.random.bernoulli(
                rng, 1.0 - self.token_drop, (B, x.shape[1], 1)
            ).astype(x.dtype)
            keep = keep.at[:, :n_prefix, :].set(1.0)
            x = x * keep
        for i in range(self.depth):
            x = Block(
                self.dim, self.num_heads, self.mlp_ratio, self.surgery, i,
                name=f"blocks_{i}",
            )(x)
        x = LN(epsilon=1e-6, name="norm")(x)
        feats = x[:, 0]
        if features_only:
            return feats
        logits = nn.Dense(self.num_classes, name="head")(feats)
        if self.distilled:
            # timm DeiT eval: mean of the class and distillation heads
            logits_dist = nn.Dense(self.num_classes, name="head_dist")(x[:, 1])
            logits = (logits + logits_dist) / 2.0
        return logits


register_model("vit_base_patch16_224")(VisionTransformer)
register_model("vit_small_patch16_224")(
    lambda **kw: VisionTransformer(dim=384, depth=12, num_heads=6, **kw)
)
register_model("deit_base_distilled_patch16_224")(
    lambda **kw: VisionTransformer(distilled=True, **kw)
)
