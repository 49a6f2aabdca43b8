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

ATA-ViT: transformer-attribution-weighted perturbation allocation +
embedding perturbation — the Chefer grad⊙attn relevance rollout the
reference's vendored 2,186-LoC explainability stack computes for
method='transformer_attribution' (``ViT_LRP.py:357-369``), via offset-probe
cotangent capture instead of LRP layer classes.
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


GMIN, GMAX = 0.0, 1e5  # ``llta_networks/llta.py:21-22``


class LLTA(MIFGSM):
    """Learning-to-learn transferable attack, faithful to
    ``llta_networks/llta.py:81-254``.  Per iteration:

    1. γ re-initialized to 0.5 per sample/decay-block (DecayReLU factors on
       the non-first blocks, ``decayresnet.py``), then refined for
       ``inner_iters`` rounds of importance-weighted gaussian search that
       MINIMIZES the L2 norm of the input gradient (``optimize_parameter``,
       weights exp(−Δ)·1[Δ<0] / q);
    2. a support set of ``spt_size`` (model-aug = γ jitter, data-aug = DI)
       tasks and a query set of ``qry_size`` tasks are sampled;
    3. for each of ``task_num`` meta-tasks: an FGSM step on a sampled
       support batch gives spt_delta; the query loss's gradient *at*
       spt_delta accumulates into the outer gradient.

    The reference demands batchsize=1; per-sample γ and per-sample support
    sampling generalize it batched (B=1 reduces exactly)."""

    def __init__(self, model_name="resnet50", inner_iters=5, nsample=5,
                 task_num=5, sigma=0.05, spt_size=20, qry_size=10,
                 prob_m=0.5, region=0.1, prob_d=0.5, **kwargs):
        kwargs.setdefault("attack", "LLTA")
        model = make_model(model_name, pretrained=kwargs.pop("pretrained", True),
                           input_size=kwargs.pop("input_size", None))
        super().__init__(model, **kwargs)
        self.inner_iters = int(inner_iters)
        self.nsample = int(nsample)
        self.task_num = int(task_num)
        self.sigma = float(sigma)
        self.spt_size = int(spt_size)
        self.qry_size = int(qry_size)
        self.prob_m = float(prob_m)
        self.region = float(region)
        self.prob_d = float(prob_d)
        sizes = self.model.module.backbone.stage_sizes
        self.gamma_num = sum(n - 1 for n in sizes)  # gamma_num_dic

    def _apply_set(self, variables, xs, gammas):
        """(S, B, ...) set forward through the decay surrogate."""
        S, B = xs.shape[0], xs.shape[1]
        flat_x = xs.reshape((S * B,) + xs.shape[2:])
        flat_g = gammas.reshape(S * B, -1)
        return self.model.apply(variables, flat_x, gammas=flat_g)

    def _set_ce(self, variables, xs, gammas, y):
        S = xs.shape[0]
        logits = self._apply_set(variables, xs, gammas)
        yrep = jnp.tile(y, S)
        ce = softmax_cross_entropy(logits, yrep).sum()
        return -ce if self.targeted else ce

    def _l2grad(self, variables, point, y, gammas):
        """Per-sample L2 norm of the input gradient (``get_l2grad``)."""
        def f(zero):
            logits = self.model.apply(variables, point + zero, gammas=gammas)
            return softmax_cross_entropy(logits, y).sum()

        g = jax.grad(f)(jnp.zeros_like(point))
        return jnp.linalg.norm(g.reshape(g.shape[0], -1), axis=1)

    def _optimize_gammas(self, variables, point, y, key):
        B = point.shape[0]
        gammas = jnp.full((B, self.gamma_num), 0.5, point.dtype)

        def round_(g, k):
            cur = self._l2grad(variables, point, y, g)
            gd = jax.random.normal(
                k, (self.nsample, B, self.gamma_num), g.dtype) * self.sigma
            new = jnp.stack([
                self._l2grad(variables, point, y,
                             jnp.clip(g + gd[i], GMIN, GMAX))
                for i in range(self.nsample)
            ])
            diff = new - cur[None]                       # (n, B)
            prob_p = (jnp.exp(-diff) * (diff < 0))[..., None]
            prob_q = (jnp.exp(-0.5 * (gd / self.sigma) ** 2)
                      / (self.sigma * jnp.sqrt(2 * jnp.pi)))
            w = prob_p / prob_q                          # (n, B, G)
            opt = (w * gd).sum(0) / (w.sum(0) + 1e-12)
            return jnp.clip(g + opt, GMIN, GMAX), None

        key_rounds = jax.random.split(key, self.inner_iters)
        for k in key_rounds:  # unrolled: each round re-runs nsample+1 bwds
            gammas, _ = round_(gammas, k)
        return jax.lax.stop_gradient(gammas)

    def _model_task_set(self, gammas, key, size):
        """γ jitter set (``create_model_task_set``): (S, B, G)."""
        k1, k2 = jax.random.split(key)
        delta = (jax.random.uniform(
            k1, (size,) + gammas.shape) - 0.5) * 2 * self.region
        mask = (jax.random.uniform(k2, (size, gammas.shape[0], 1))
                < self.prob_m).astype(gammas.dtype)
        return jnp.clip(gammas[None] + mask * delta, GMIN, GMAX)

    def _data_task_set(self, x, key, size):
        """DI-augmented copies (``create_data_task_set``): (S, B, ...)."""
        def one(k):
            k1, k2 = jax.random.split(k)
            aug = random_resize_pad(x, k1, 1.0 / 0.875, 1.0)
            use = jax.random.uniform(k2, ()) < self.prob_d
            return jnp.where(use, aug, x)

        return jax.vmap(one)(jax.random.split(key, size))

    def get_grad(self, variables, x, y, state: AttackState, key):
        B = x.shape[0]
        point = jax.lax.stop_gradient(x + state.delta)
        k_opt, k_sg, k_sd, k_qg, k_qd, k_task = jax.random.split(key, 6)

        gammas = self._optimize_gammas(variables, point, y, k_opt)
        spt_g = self._model_task_set(gammas, k_sg, self.spt_size)
        spt_x = self._data_task_set(point, k_sd, self.spt_size)
        qry_g = self._model_task_set(gammas, k_qg, self.qry_size)
        qry_x = self._data_task_set(point, k_qd, self.qry_size)

        def one_task(k):
            # per-sample choice of qry_size support entries w/o replacement
            idx = jax.vmap(
                lambda kk: jax.random.permutation(kk, self.spt_size)
                [: self.qry_size]
            )(jax.random.split(k, B))                    # (B, q)
            sel_g = jnp.take_along_axis(
                spt_g.transpose(1, 0, 2), idx[..., None], axis=1
            ).transpose(1, 0, 2)                         # (q, B, G)
            sel_x = jnp.take_along_axis(
                spt_x.transpose(1, 0, 2, 3, 4), idx[:, :, None, None, None],
                axis=1,
            ).transpose(1, 0, 2, 3, 4)                   # (q, B, H, W, C)

            # FGSM on the support batch (``llta.py:152-162``)
            g_spt = jax.grad(
                lambda d: self._set_ce(variables, sel_x + d, sel_g, y)
            )(jnp.zeros_like(sel_x))
            spt_delta = jnp.clip(self.eps * jnp.sign(g_spt), -self.eps, self.eps)
            spt_delta = jnp.clip(sel_x + spt_delta, 0.0, 1.0) - sel_x

            # query gradient evaluated AT spt_delta (``llta.py:165-170``)
            g_qry = jax.grad(
                lambda d: self._set_ce(variables, qry_x + d, qry_g, y)
            )(spt_delta)
            return g_qry.sum(0)                          # (B, H, W, C)

        grads = jnp.zeros_like(x)
        for k in jax.random.split(k_task, self.task_num):
            grads = grads + one_task(k)
        return grads, {}


class LL2S(MIFGSM):
    """Layer-level redundancy exploitation, faithful to ``ll2s.py:387-705``.

    The strategy pool is the paper's op_list (``ll2s.py:387-392``): per
    transformer layer one of {REST (benign k/v token reinjection), sparse
    attention (p=0.4 random mask), head shuffle (prob 0.5, ratio 0.45),
    MoE FFN (2–5 experts, dropout 0.3)}.  A (num_layers × 4) operation
    distribution is REINFORCE-updated each iteration with the prob-weighted
    losses (``select_op``/``trace_prob``, lr 0.01); ``num_scale``×``ops_num``
    op assignments are sampled per iteration and their gradients summed.
    Dynamic robust tokens (``init_robust_tokens``, N(0,10²) extra token
    embeddings appended after the pos-embed) take their own signed step each
    iteration.  The reference's 'global' token file ships as a placeholder
    path, so 'dynamic' is the default here."""

    SPARSE_P = 0.4
    SHUFFLE_PROB, SHUFFLE_RATIO = 0.5, 0.45
    MOE_N, MOE_PROB = 5, 0.3
    REST_P = 0.3

    def __init__(self, model_name="vit_base_patch16_224", num_scale=10,
                 ops_num=2, ops_lr=0.01, robust_tokens_type="dynamic",
                 num_robust_tokens=400, prompt_lr=1e-2, **kwargs):
        kwargs.setdefault("attack", "LL2S")
        model = make_model(model_name, pretrained=kwargs.pop("pretrained", True),
                           input_size=kwargs.pop("input_size", None))
        super().__init__(model, **kwargs)
        self.num_scale = int(num_scale)
        self.ops_num = int(ops_num)
        self.ops_lr = float(ops_lr)
        self.robust_tokens_type = robust_tokens_type
        self.num_robust_tokens = int(num_robust_tokens)
        self.prompt_lr = float(prompt_lr)
        bb = model.module.backbone
        self.num_layers = bb.depth
        self.num_heads = bb.num_heads
        self.head_dim = bb.dim // bb.num_heads
        self.token_dim = bb.dim

    def init_extra(self, x, y):
        B = x.shape[0]
        extra = {"aug_param": jnp.zeros((self.num_layers, 4), x.dtype)}
        if self.robust_tokens_type == "dynamic":
            k = jax.random.fold_in(jax.random.PRNGKey(self.seed + 77),
                                   jnp.int32(0))
            extra["robust_tokens"] = jax.random.normal(
                k, (B, self.num_robust_tokens, self.token_dim), x.dtype) * 10.0
            extra["robust_momentum"] = jnp.zeros_like(extra["robust_tokens"])
        # REST tokens: sampled once per batch from the clean forward's qkv
        # (the reference stores the first REST layer's tokens in GlobalState
        # for the whole attack, ``ll2s.py:119-141``)
        n_rest = max(int(self.REST_P * self._n_tokens(x)), 1)
        extra["rest_kv"] = self._sample_rest_tokens(x, n_rest)
        return extra

    def _n_tokens(self, x):
        size = self.model.input_size
        return (size // self.model.module.backbone.patch_size) ** 2 + 1

    def _sample_rest_tokens(self, x, n_rest):
        """(2, B, h, R, dh) benign k/v tokens from block 0."""
        from ..models import find_feature

        _, feats = self.model.apply_with_feats(
            self.model.variables, x, "blocks_0/attn/qkv")
        qkv = find_feature(feats, "qkv")
        if isinstance(qkv, (tuple, list)):
            qkv = qkv[0]
        B, N = qkv.shape[0], qkv.shape[1]
        qkv = qkv.reshape(B, N, 3, self.num_heads, self.head_dim)
        k = jax.random.PRNGKey(self.seed + 99)
        ids = jax.vmap(
            lambda kk: 1 + jax.random.permutation(kk, N - 1)[:n_rest]
        )(jax.random.split(k, self.num_heads))           # (h, R)
        kv = qkv.transpose(2, 0, 3, 1, 4)                # (3, B, h, N, dh)
        gather = jax.vmap(  # over the head axis, each with its own token ids
            lambda stream_h, idx: stream_h[:, idx],      # (B, N, dh) → (B, R, dh)
            in_axes=(1, 0), out_axes=1,
        )
        k_rest = gather(kv[1], ids)                      # (B, h, R, dh)
        v_rest = gather(kv[2], ids)
        return jax.lax.stop_gradient(jnp.stack([k_rest, v_rest]))

    def _op_module(self, ops, rest_kv, key):
        """Surgery applying per-layer op ids (0=REST,1=sparse,2=shuffle,3=MoE)."""
        h_total = self.num_heads

        def kv_extra(meta):
            b = meta["block"]
            use = (ops[b] == 0).astype(rest_kv.dtype)
            # Gate at the SCORE level: the extra columns get a -1e9 logit
            # bias whenever the layer op is not REST, so softmax assigns them
            # ~0 mass regardless of q.  (A poisoned key of -1e9 would make
            # q·k = -1e9·sum(q) — *positive* huge for negative-sum queries —
            # collapsing attention onto the disabled slot.)
            bias = (use - 1.0) * 1e9
            return rest_kv[0], rest_kv[1] * use, bias

        def attn_post(attn, meta):
            b = meta["block"]
            kb = jax.random.fold_in(key, b)
            k1, k2, k3 = jax.random.split(kb, 3)

            def sparse(a):
                return a * (jax.random.uniform(k1, a.shape) > self.SPARSE_P
                            ).astype(a.dtype)

            def shuffle(a):
                n_sh = int(h_total * self.SHUFFLE_RATIO)
                idx = jax.random.permutation(k2, h_total)[:n_sh]
                src = jnp.sort(idx)
                do = jax.random.uniform(k3, ()) < self.SHUFFLE_PROB
                shuffled = a.at[:, idx].set(a[:, src])
                return jnp.where(do, shuffled, a)

            a = attn
            a = jnp.where(ops[b] == 1, sparse(a), a)
            a = jnp.where(ops[b] == 2, shuffle(a), a)
            return a

        def mlp_hidden_post(hid, meta):
            b = meta["block"]
            kb = jax.random.fold_in(jax.random.fold_in(key, 1000), b)
            k1, k2 = jax.random.split(kb)
            n_exp = jax.random.randint(k1, (), 2, self.MOE_N + 1)
            # fc2 is linear: averaging over expert dropout masks equals one
            # forward with the mean mask (``Wrapper_FFN_forward_MoE_Attack``)
            masks = (jax.random.uniform(
                k2, (self.MOE_N,) + hid.shape) > self.MOE_PROB)
            active = (jnp.arange(self.MOE_N) < n_exp).astype(hid.dtype)
            mean_mask = (masks * active.reshape(-1, *([1] * hid.ndim))
                         ).sum(0) / n_exp
            return jnp.where(ops[b] == 3, hid * mean_mask, hid)

        return _rebuild_vit(self.model, ViTSurgery(
            kv_extra=kv_extra, attn_post=attn_post,
            mlp_hidden_post=mlp_hidden_post))

    def get_grad(self, variables, x, y, state: AttackState, key):
        aug_param = state.extra["aug_param"]
        rest_kv = state.extra["rest_kv"]
        robust = state.extra.get("robust_tokens")
        k_sel, k_fwd, k_rob = jax.random.split(key, 3)

        n_assign = self.num_scale * self.ops_num
        probs = jax.nn.softmax(aug_param, axis=-1)
        op_ids = jax.vmap(
            lambda kk: jax.vmap(
                lambda kl, p: jax.random.categorical(kl, jnp.log(p + 1e-12))
            )(jax.random.split(kk, self.num_layers), probs)
        )(jax.random.split(k_sel, n_assign))             # (n_assign, L)

        def one_loss(delta, ops, kf):
            module = self._op_module(ops, rest_kv, kf)
            kwargs = {}
            if robust is not None:
                kwargs["extra_tokens"] = jax.lax.stop_gradient(robust)
            logits = module.apply(variables, x + delta, **kwargs)
            return self.get_loss(logits[None], y)

        def total_loss(delta):
            losses = []
            for i in range(n_assign):
                losses.append(one_loss(delta, op_ids[i],
                                       jax.random.fold_in(k_fwd, i)))
            return jnp.stack(losses)

        losses_all, vjp = jax.vjp(total_loss, state.delta)
        grad = vjp(jnp.full((n_assign,), 1.0 / self.num_scale))[0]
        losses_all = jax.lax.stop_gradient(losses_all)

        # REINFORCE on the op distribution (``trace_prob`` chain products)
        def aug_loss(param):
            p = jax.nn.softmax(param, axis=-1)
            chain = jnp.prod(
                p[jnp.arange(self.num_layers)[None], op_ids], axis=1
            )  # (n_assign,)
            return jnp.sum(chain * losses_all) / self.num_scale

        aug_param = aug_param + self.ops_lr * jax.grad(aug_loss)(aug_param)

        updates = {"aug_param": aug_param}
        if robust is not None:
            # robust-token step on the plain (identity-op) forward
            def rob_loss(r):
                logits = self.model.apply(variables, x + state.delta,
                                          extra_tokens=r)
                return self.get_loss(logits[None], y)

            g_r = jax.grad(rob_loss)(robust)
            mom = state.extra["robust_momentum"] * self.decay + g_r
            updates["robust_momentum"] = mom
            updates["robust_tokens"] = robust - self.prompt_lr * jnp.sign(mom)
        return grad, updates


def transformer_attribution(model, variables, x, y, depth: int):
    """The reference's actual relevance map: Chefer transformer attribution
    (``ViT_LRP.py:357-369`` via ``ViT_explanation_generator.LRP``, the
    method ATA-ViT calls at ``ata_vit.py:147-155``): per block
    cam_l = E_heads[(∇A_l ⊙ A_l)⁺] w.r.t. the class score, rolled out as
    ∏(cam_l + I) WITHOUT row normalization
    (``ViT_LRP.compute_rollout_attention:38-49`` — its normalization is
    commented out upstream).  The attn-map cotangents are gradients w.r.t.
    zero offsets added at each attention map — the repo's standard hook
    translation (same trick as FIA's offset probe); pinned against a raw
    torch twin in ``test_llta_semantics.py``."""
    from ..models import find_feature
    from ..models.vit import ViTSurgery

    bb = model.module.backbone
    B = x.shape[0]
    P = bb.patch_size
    n_prefix = 2 if getattr(bb, "distilled", False) else 1
    N = (x.shape[1] // P) * (x.shape[2] // P) + n_prefix
    h = bb.num_heads
    zeros = [jnp.zeros((B, h, N, N), x.dtype) for _ in range(depth)]

    def f(offsets):
        surgery = ViTSurgery(
            attn_post=lambda a, meta: a + offsets[meta["block"]])
        m2 = model.module.clone(backbone=bb.clone(surgery=surgery))
        logits, state = m2.apply(variables, x, mutable=["intermediates"])
        score = jnp.take_along_axis(logits, y[:, None], axis=1).sum()
        return score, state["intermediates"]

    grads, feats = jax.grad(f, has_aux=True)(zeros)
    eye = jnp.eye(N, dtype=x.dtype)[None]
    joint = None
    for b in range(depth):
        blk = find_feature(feats, f"blocks_{b}")
        amap = find_feature({"d": blk}, "attn")
        while isinstance(amap, dict):
            amap = find_feature({"d": amap}, "attn")
        cam = jnp.clip(grads[b] * amap, 0.0, None).mean(axis=1) + eye
        joint = cam if joint is None else cam @ joint
    return joint


class ATA_ViT(MIFGSM):
    """Attention-aware patch attack on ViTs (``ata_vit.py:13-128``),
    faithful to the reference pipeline:

    1. **budget allocation** (ATTENTION_RIGION, ``ata_vit.py:130-199``): a
       per-token attention entropy score −Σⱼ r_ji·log₂(r_ji) over the
       relevance matrix distributes a fixed pixel budget (1024/224², i.e.
       ~2%, capped at 255 per 16² patch) across the patch grid — the
       relevance is the reference's transformer attribution
       (``_transformer_attribution``; on a toy ViT plain rollout ranks
       patches differently — see ``test_llta_semantics.py`` comparison);
    2. **pixel selection** (EMBED_POSITION + make_mask_embed,
       ``ata_vit.py:201-333``): within each patch the budgeted number of
       pixels with the largest input-saliency magnitude form the mask;
    3. **patch optimization** (``ata_vit.py:97-128``): Adam (LR=1, ×1/3 at
       epochs 50/150) on loss −log(1−p_y) over UNBOUNDED patch values in
       [0, 1] — this is a patch attack, so the returned delta is not
       ε-bounded inside the mask (matching the reference's returned
       ``inputs − data``).
    """

    def __init__(self, model_name="vit_base_patch16_224", epoch=250, lr=1.0,
                 budget_frac=1024.0 / (224 * 224), **kwargs):
        kwargs.setdefault("attack", "ATA_ViT")
        model = make_model(model_name, pretrained=kwargs.pop("pretrained", True),
                           input_size=kwargs.pop("input_size", None))
        super().__init__(model, epoch=epoch, **kwargs)
        self.lr = float(lr)
        self.budget_frac = float(budget_frac)
        self.depth = model.module.backbone.depth

    def _attention_rollout(self, variables, x):
        """Plain attention rollout (B, N, N) — the Abnar-Zuidema baseline
        (ViT_LRP ``relprop`` method='rollout'), kept for comparison
        (``tests/test_llta_semantics.py`` quantifies it vs the attribution)."""
        from ..models import find_feature

        _, feats = self.model.apply_with_feats(variables, x, "__none__")
        rollout = None
        for b in range(self.depth):
            blk = find_feature(feats, f"blocks_{b}")
            amap = find_feature({"d": blk}, "attn")  # (B, h, N, N)
            while isinstance(amap, dict):
                amap = find_feature({"d": amap}, "attn")
            if amap is None:
                continue
            a = amap.mean(axis=1)
            N = a.shape[-1]
            a = a + jnp.eye(N, dtype=a.dtype)[None]
            a = a / a.sum(-1, keepdims=True)
            rollout = a if rollout is None else a @ rollout
        return rollout

    def _transformer_attribution(self, variables, x, y):
        return transformer_attribution(
            self.model, variables, x, y, self.depth)

    def _build_mask(self, variables, x, y):
        bb = self.model.module.backbone
        H, W = x.shape[1], x.shape[2]
        P = bb.patch_size
        gh, gw = H // P, W // P
        B = x.shape[0]

        # 1. entropy-based per-patch budget (``ata_vit.py:362-383``) over
        # the transformer-attribution relevance (the reference's LRP path)
        r = self._transformer_attribution(variables, x, y)  # (B, N, N)
        rp = jnp.clip(r[:, 1:, 1:], 1e-10, 1.0)
        ent = -jnp.sum(rp * jnp.log2(rp), axis=1)  # (B, n_patches)
        ent = ent / (ent.sum(-1, keepdims=True) + 1e-12)
        total = self.budget_frac * H * W
        n_per_patch = jnp.clip(
            jnp.floor(ent * total), 0, P * P).astype(jnp.int32)  # (B, gh*gw)

        # 2. within-patch saliency pixel selection (make_mask_embed)
        def ce(img):
            logits = self.model.apply(variables, img)
            return softmax_cross_entropy(logits, y).sum()

        sal = jnp.abs(jax.grad(ce)(x)).sum(-1)  # (B, H, W)
        patches = sal.reshape(B, gh, P, gw, P).transpose(0, 1, 3, 2, 4)
        patches = patches.reshape(B, gh * gw, P * P)
        order = jnp.argsort(-patches, axis=-1)
        rank = jnp.argsort(order, axis=-1)  # rank of each pixel by saliency
        mask = (rank < n_per_patch[..., None]).astype(x.dtype)
        mask = mask.reshape(B, gh, gw, P, P).transpose(0, 1, 3, 2, 4)
        return mask.reshape(B, H, W)[..., None]

    def run(self, variables, x, y, key):
        """Adam patch optimization (``ata_vit.py:97-128``) as a lax.scan."""
        import optax

        mask = jax.lax.stop_gradient(self._build_mask(variables, x, y))
        schedule = optax.piecewise_constant_schedule(
            self.lr, {50: 1.0 / 3.0, 150: 1.0 / 3.0})
        opt = optax.adam(schedule)
        patch0 = x  # reference initializes from precomputed patches; the
        # clean image is the weight-free equivalent starting point
        state0 = (patch0, opt.init(patch0))

        def loss_fn(patch):
            inputs = jnp.clip(x * (1 - mask) + patch * mask, 0.0, 1.0)
            logits = self.model.apply(variables, inputs)
            probs = jax.nn.softmax(logits, axis=-1)
            p = jnp.take_along_axis(probs, y[:, None], axis=1)[:, 0]
            p = 1.0 - p if self.targeted else p
            return jnp.mean(-jnp.log(1.0 - p + 1e-10))

        def body(carry, _):
            patch, opt_state = carry
            g = jax.grad(loss_fn)(patch)
            updates, opt_state = opt.update(g, opt_state)
            patch = jnp.clip(optax.apply_updates(patch, updates), 0.0, 1.0)
            return (patch, opt_state), None

        (patch, _), _ = jax.lax.scan(body, state0, None, length=self.epoch)
        inputs = jnp.clip(x * (1 - mask) + patch * mask, 0.0, 1.0)
        return inputs - x
