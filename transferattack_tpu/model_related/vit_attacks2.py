"""Advanced ViT-surrogate attacks (reference: ``transferattack/model_related/
{vdc,fpr,att,setr}.py``).

These torch implementations mutate hook state across two backward passes
(VDC), keep cross-iteration accumulators in hooks (FPR), or calibrate
gradient-penalty factors from recorded variances (ATT).  Translating torch
backward-hook mutation to pure JAX uses two identities:

* additive cotangent injection at point p equals adding ``⟨add, p⟩`` to the
  loss (VDC's virtual dense connections);
* scaling the cotangent at p by a traced factor s equals the forward rewrite
  ``s·p + stop_grad((1−s)·p)`` (ATT's gradient-penalty factors).

Cotangent *recording* is an offset-gradient probe (grad w.r.t. a zero offset
added at the point) — never a Python-side capture, which would leak tracers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..attack import AttackState
from ..gradient.mifgsm import MIFGSM
from ..models import Surrogate, make_model, resolve_model
from ..models.vit import ViTSurgery


def _rebuild_vit(surrogate: Surrogate, surgery: ViTSurgery):
    """Clone the surrogate's module with a new surgery config (same params)."""
    backbone = surrogate.module.backbone.clone(surgery=surgery)
    return surrogate.module.clone(backbone=backbone)


def _probe_shapes(model, variables, x, depth):
    """Static shapes of per-block attention maps and token tensors, from the
    backbone's hyperparameters (the wrapped preprocess resizes to the
    registry size, so token count follows the model's own input size)."""
    bb = model.module.backbone
    size = model.input_size
    n_tokens = (size // bb.patch_size) ** 2 + 1
    B = x.shape[0]
    attn_shape = (B, bb.num_heads, n_tokens, n_tokens)
    tok_shape = (B, n_tokens, bb.dim)
    return attn_shape, tok_shape


class VDC(MIFGSM):
    """Virtual dense connections (``vdc.py:10-519``): pass 1 records the
    attn/MLP cotangents of every block in a vanilla backward; pass 2 injects
    depth-accumulated, geometrically-damped copies into the backward as
    virtual skips while scaling the pass-through cotangents.

    Faithful hook placement (``vdc.py:355-361`` with legacy module-hook
    semantics): the ``attn.attn_drop`` backward hook attaches to the softmax
    node, so its grad_in[0] is the PRE-softmax scores cotangent; the
    ``norm2`` hook's grad_in[0] is the cotangent at norm2's input through
    the MLP branch only; the final ``norm`` hook records the last block's
    output cotangent.  Pass 2 scales the scores cotangent ×0.25 and the
    MLP-branch cotangent ×0.5 (``vdc.py:329-333`` gammas, compounding
    through depth) and seeds the MLP chain's deepest add with the
    final-norm cls-row record ×0.1×0.5 (``vdc.py:71-79``)."""

    def __init__(self, model_name="vit_base_patch16_224", lamb=0.1, **kwargs):
        kwargs.setdefault("attack", "VDC")
        model = resolve_model(model_name,
                              pretrained=kwargs.pop("pretrained", True),
                              input_size=kwargs.pop("input_size", None))
        super().__init__(model, **kwargs)
        self.lamb = float(lamb)
        self.depth = model.module.backbone.depth

    def get_grad(self, variables, x, y, state: AttackState, key):
        D = self.depth
        point = x + state.delta
        attn_shape, tok_shape = _probe_shapes(self.model, variables, x, D)

        # ---- pass 1: vanilla-backward cotangent probes via zero offsets ----
        def probed_loss(offsets, p):
            def block_out_post(o, m):
                return o + offsets["norm"] if m["block"] == D - 1 else o

            surgery = ViTSurgery(
                scores_post=lambda sc, m: sc + offsets["attn"][m["block"]],
                mlp_branch_pre=lambda h, m: h + offsets["mlp"][m["block"]],
                block_out_post=block_out_post,
            )
            module = _rebuild_vit(self.model, surgery)
            logits = module.apply(variables, p)
            return self.get_loss(logits[None], y)

        zero_off = {
            "attn": jnp.zeros((D,) + attn_shape, x.dtype),
            "mlp": jnp.zeros((D,) + tok_shape, x.dtype),
            "norm": jnp.zeros(tok_shape, x.dtype),
        }
        cotangents = jax.grad(probed_loss)(zero_off, point)

        # depth-accumulation (``vdc.py:64-117``): walking backward (deep →
        # shallow), block b receives the damped records of deeper blocks;
        # visit index k = D-1-b damps by 0.1·0.5^k
        def accumulate(recs, seed=None):
            adds = []
            acc = jnp.zeros_like(recs[0]) if seed is None else seed
            for b in range(D - 1, -1, -1):
                adds.append(acc)
                g = jax.lax.stop_gradient(recs[b]) * 0.1 * (0.5 ** (D - 1 - b))
                acc = acc + g
            return jnp.stack(adds[::-1])  # index by block again

        # mlp chain seed: zeros except the cls-token row = the final-norm
        # input cotangent's cls row ×0.1×0.5 (``vdc.py:73-76``)
        norm_cot = jax.lax.stop_gradient(cotangents["norm"])
        seed = jnp.zeros(tok_shape, x.dtype).at[:, 0, :].set(
            norm_cot[:, 0, :] * 0.1 * 0.5
        )
        attn_add = accumulate(cotangents["attn"])
        mlp_add = accumulate(cotangents["mlp"], seed=seed)

        # ---- pass 2: cotangent scale (forward rewrite s·p + sg((1−s)·p))
        # plus additive injection via inner-product loss terms ----
        def loss_fn(delta):
            side = []

            def scores_post(sc, m):
                side.append(jnp.sum(attn_add[m["block"]] * sc))
                return 0.25 * sc + jax.lax.stop_gradient(0.75 * sc)

            def mlp_branch_pre(h, m):
                side.append(jnp.sum(mlp_add[m["block"]] * h))
                return 0.5 * h + jax.lax.stop_gradient(0.5 * h)

            module = _rebuild_vit(
                self.model,
                ViTSurgery(scores_post=scores_post,
                           mlp_branch_pre=mlp_branch_pre),
            )
            logits = module.apply(variables, x + delta)
            return self.get_loss(logits[None], y) + sum(side)

        return jax.grad(loss_fn)(state.delta), {}


class FPR(MIFGSM):
    """Feature-map perturbation + refinement (``fpr.py:25-115``): noisy
    re-softmaxed attention maps at blocks {0,1,4,9,11}; attention/MLP outputs
    scaled ×0.8 and accumulated across iterations with decay 0.3 — the
    accumulators ride the scan carry and are refreshed by a capture pass."""

    noisy_blocks = (0, 1, 4, 9, 11)

    def __init__(self, model_name="vit_base_patch16_224", attn_range=25.0,
                 scale=0.8, mom_decay=0.3, **kwargs):
        kwargs.setdefault("attack", "fpr")
        model = resolve_model(model_name,
                              pretrained=kwargs.pop("pretrained", True),
                              input_size=kwargs.pop("input_size", None))
        super().__init__(model, **kwargs)
        self.attn_range = float(attn_range)
        self.scale = float(scale)
        self.mom_decay = float(mom_decay)
        self.depth = model.module.backbone.depth

    def init_extra(self, x, y):
        _, tok_shape = _probe_shapes(
            self.model, self.model.variables, x, self.depth
        )
        zeros = jnp.zeros((self.depth,) + tok_shape, x.dtype)
        return {"attn_acc": zeros, "mlp_acc": zeros}

    def attn_noise(self, key, step, block, shape, dtype):
        """Per-head U(1−range, 1+range) map multiplier, shared over the batch
        (``fpr.py:89-97``) — overridable seam for paired-RNG parity twins."""
        return jax.random.uniform(
            jax.random.fold_in(key, block), shape, dtype,
            minval=1 - self.attn_range, maxval=1 + self.attn_range,
        )

    def _hooked_module(self, attn_acc, mlp_acc, key, step):
        def attn_post(attn, m):
            b = m["block"]
            if b not in self.noisy_blocks:
                return attn
            N = attn.shape[-1]
            M = self.attn_noise(key, step, b, (attn.shape[1], N, N), attn.dtype)
            return jax.nn.softmax(attn * M[None], axis=-1)

        def attn_out_post(out, m):
            return self.mom_decay * attn_acc[m["block"]] + out * self.scale

        def mlp_out_post(out, m):
            return self.mom_decay * mlp_acc[m["block"]] + out * self.scale

        return _rebuild_vit(
            self.model,
            ViTSurgery(attn_post=attn_post, attn_out_post=attn_out_post,
                       mlp_out_post=mlp_out_post),
        )

    def get_grad(self, variables, x, y, state: AttackState, key):
        attn_acc = jax.lax.stop_gradient(state.extra["attn_acc"])
        mlp_acc = jax.lax.stop_gradient(state.extra["mlp_acc"])
        module = self._hooked_module(attn_acc, mlp_acc, key, state.step)

        def loss_fn(delta):
            logits = module.apply(variables, x + delta)
            return self.get_loss(logits[None], y)

        grad = jax.grad(loss_fn)(state.delta)

        # capture pass: the hooked attention/MLP outputs ARE the new
        # accumulators (module outputs captured via intermediates)
        _, feats = module.apply(
            variables, x + state.delta,
            capture_intermediates=lambda mdl, _m: mdl.name in ("attn", "mlp"),
            mutable=["intermediates"],
        )
        from ..models import find_feature

        new_attn, new_mlp = [], []
        inter = feats["intermediates"]
        for b in range(self.depth):
            blk = find_feature(inter, f"blocks_{b}")
            new_attn.append(jax.lax.stop_gradient(find_feature({"d": blk}, "attn")))
            new_mlp.append(jax.lax.stop_gradient(find_feature({"d": blk}, "mlp")))
        return grad, {
            "attn_acc": jnp.stack(new_attn),
            "mlp_acc": jnp.stack(new_mlp),
        }


class ATT(MIFGSM):
    """Adaptive token tuning (``att.py:41-296``): per-iteration cotangent
    probes give per-path gradient variances; the attack pass scales each
    path's backward by GPF = clamp(γ + λ(1 − √(var/var_ref)), 0, 1) using the
    forward rewrite ``s·p + stop_grad((1−s)·p)``; PatchOut input sampling."""

    def __init__(self, model_name="vit_base_patch16_224", lam=0.01, gamma=0.5,
                 crop_length=16, sample_num_patches=130, **kwargs):
        kwargs.setdefault("attack", "ATT")
        model = resolve_model(model_name,
                              pretrained=kwargs.pop("pretrained", True),
                              input_size=kwargs.pop("input_size", None))
        super().__init__(model, **kwargs)
        self.lam = float(lam)
        self.gamma = float(gamma)
        self.crop_length = int(crop_length)
        self.sample_num_patches = int(sample_num_patches)
        self.depth = model.module.backbone.depth

    def init_extra(self, x, y):
        D = self.depth
        return {
            "var_ref": {
                "attn": jnp.full((D,), -1.0, x.dtype),
                "qkv": jnp.full((D,), -1.0, x.dtype),
                "mlp": jnp.full((D,), -1.0, x.dtype),
            }
        }

    def _patchout_mask(self, x, key):
        H, W = x.shape[1], x.shape[2]
        cl = min(self.crop_length, H)
        gh, gw = H // cl, W // cl
        n = gh * gw
        keep_n = min(self.sample_num_patches, n)
        scores = jax.random.uniform(key, (n,))
        thresh = jnp.sort(scores)[n - keep_n]
        keep = (scores >= thresh).astype(x.dtype).reshape(gh, gw)
        return jnp.repeat(jnp.repeat(keep, cl, axis=0), cl, axis=1)[None, :, :, None]

    def get_grad(self, variables, x, y, state: AttackState, key):
        D = self.depth
        point = x + state.delta
        attn_shape, tok_shape = _probe_shapes(self.model, variables, x, D)
        qkv_shape = tok_shape[:-1] + (tok_shape[-1] * 3,)

        # probe pass: variances of the unscaled cotangents
        def probed_loss(offsets, p):
            surgery = ViTSurgery(
                attn_post=lambda a, m: a + offsets["attn"][m["block"]],
                qkv_post=lambda q, m: q + offsets["qkv"][m["block"]],
                mlp_in_post=lambda h, m: h + offsets["mlp"][m["block"]],
            )
            module = _rebuild_vit(self.model, surgery)
            logits = module.apply(variables, p)
            return self.get_loss(logits[None], y)

        zero_off = {
            "attn": jnp.zeros((D,) + attn_shape, x.dtype),
            "qkv": jnp.zeros((D,) + qkv_shape, x.dtype),
            "mlp": jnp.zeros((D,) + tok_shape, x.dtype),
        }
        cots = jax.grad(probed_loss)(zero_off, point)
        cur_var = {
            k: jnp.stack([jnp.var(cots[k][b]) for b in range(D)])
            for k in ("attn", "qkv", "mlp")
        }
        # first iteration establishes the reference variances
        var_ref = {
            k: jnp.where(state.extra["var_ref"][k] < 0, cur_var[k],
                         state.extra["var_ref"][k])
            for k in cur_var
        }
        gpf = {
            k: jnp.clip(
                self.gamma
                + self.lam * (1 - jnp.sqrt(cur_var[k] / (var_ref[k] + 1e-12))),
                0.0, 1.0,
            )
            for k in cur_var
        }
        gpf = jax.lax.stop_gradient(gpf)

        def scale_fwd(p, s):
            return s * p + jax.lax.stop_gradient((1 - s) * p)

        k1, _ = jax.random.split(key)
        mask = self._patchout_mask(x, k1)

        def loss_fn(delta):
            surgery = ViTSurgery(
                attn_post=lambda a, m: scale_fwd(a, gpf["attn"][m["block"]]),
                qkv_post=lambda q, m: scale_fwd(q, gpf["qkv"][m["block"]]),
                mlp_in_post=lambda h, m: scale_fwd(h, gpf["mlp"][m["block"]]),
            )
            module = _rebuild_vit(self.model, surgery)
            logits = module.apply(variables, x + delta * mask)
            return self.get_loss(logits[None], y)

        grad = jax.grad(loss_fn)(state.delta)
        return grad, {"var_ref": var_ref}


class TRMHead(nn.Module):
    """Token-refinement head (``setr_networks/deit_ensemble.py:17-59``).
    The reference assigns ``self.conv``/``self.bn`` twice — the second
    assignment overwrites the first, so ONE shared conv/bn pair is applied
    twice; the shortcut is the identity (stride 1, expansion 1); the
    hardcoded 14×14 avg_pool over the 14×14 patch grid is a global mean."""

    @nn.compact
    def __call__(self, tokens):
        cls_tok, patches = tokens[:, 0], tokens[:, 1:]
        B, N, D = patches.shape
        s = int(round(N ** 0.5))
        p = patches.reshape(B, s, s, D)
        conv = nn.Conv(D, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                       name="conv")
        bn = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn")
        f = nn.relu(bn(conv(p)))
        f = bn(conv(f))
        f = nn.relu(f + p)
        pooled = f.mean(axis=(1, 2))
        return pooled + nn.Dense(D, name="token_fc")(cls_tok)


class TRMHeads(nn.Module):
    """The 11 refinement heads of ``VisionTransformer_hierarchical``
    (``deit_ensemble.py:70-73``), one per non-final block."""

    depth: int = 11

    @nn.compact
    def __call__(self, token_list):
        return [
            TRMHead(name=f"transformerheads_{i}")(t)
            for i, t in enumerate(token_list)
        ]


class SETR(MIFGSM):
    """Self-ensemble + token refinement (``setr.py:7-111`` +
    ``setr_networks/``).  The reference default (``trm=True``, setr.py:33)
    classifies every non-final block's final-norm'd tokens through a
    learned TransformerHead then the shared classifier, plus the normal
    final logits, and SUMS the losses (``setr.py:62-73``).  TRM weights
    come from the converted ATViT checkpoint
    (``$TA_TPU_WEIGHTS_DIR/setr_trm_<model>.npz``); without it the attack
    falls back to the ``trm=False`` self-ensemble (``deit.py:68-118``:
    shared final norm + head on every block's cls token, summed), which
    needs no extra weights — the vendored 1,933-LoC per-architecture forks
    reduce to block_out intermediates either way."""

    def __init__(self, model_name="vit_base_patch16_224", trm=True, **kwargs):
        kwargs.setdefault("attack", "SETR")
        model = resolve_model(model_name,
                              pretrained=kwargs.pop("pretrained", True),
                              input_size=kwargs.pop("input_size", None))
        super().__init__(model, **kwargs)
        self.depth = model.module.backbone.depth
        self.trm = TRMHeads(depth=self.depth - 1) if trm else None
        self.trm_vars = None
        if trm:
            import os
            import warnings

            from ..models import load_npz_variables
            from ..utils.weights_manifest import record_fallback

            root = os.environ.get("TA_TPU_WEIGHTS_DIR",
                                  os.path.join(os.getcwd(), "weights"))
            path = os.path.join(root, f"setr_trm_{model_name}.npz")
            if os.path.exists(path):
                self.trm_vars = load_npz_variables(path)
            else:
                record_fallback(f"setr_trm_{model_name}")
                warnings.warn(
                    f"SETR: TRM checkpoint {path} missing; falling back to "
                    "the trm=False self-ensemble loss.")

    def _final_norm(self, tok, bparams):
        nvar = bparams["norm"]
        mean = tok.mean(-1, keepdims=True)
        var = tok.var(-1, keepdims=True)
        tok = (tok - mean) / jnp.sqrt(var + 1e-6)
        return tok * nvar["scale"] + nvar["bias"]

    def get_grad(self, variables, x, y, state: AttackState, key):
        from ..attack import softmax_cross_entropy
        from ..models import find_feature

        def loss_fn(delta):
            logits, feats = self.model.apply_with_feats(
                variables, x + delta, "__nocapture__"
            )
            bparams = variables["params"]["backbone"]
            head = bparams["head"]
            # final logits = head(norm(x_final)[:, 0]) — the model output
            total = softmax_cross_entropy(logits, y).mean()
            toks = []
            for b in range(self.depth - 1):
                tok = find_feature(feats, f"blocks_{b}")
                if isinstance(tok, dict):
                    tok = find_feature({"d": tok}, "block_out")
                if tok is None:
                    continue
                toks.append(self._final_norm(tok, bparams))
            if self.trm_vars is not None:
                refined = self.trm.apply(self.trm_vars, toks)
                for out in refined:
                    blogits = out @ head["kernel"] + head["bias"]
                    total = total + softmax_cross_entropy(blogits, y).mean()
            else:
                for tok in toks:
                    blogits = tok[:, 0] @ head["kernel"] + head["bias"]
                    total = total + softmax_cross_entropy(blogits, y).mean()
            return -total if self.targeted else total

        return jax.grad(loss_fn)(state.delta), {}
