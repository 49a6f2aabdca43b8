"""ATA / MFAA / YAILA / CFM / FTM / FFT (reference:
``transferattack/advanced_objective/{ata,mfaa,yaila/yaila,cfm,ftm,fft}.py``).

Feature-level objectives built on the tap/offset-probe machinery; torch's
module-wrapping (CFM's ``FeatureMixup``) and layer-surgery (YAILA's
ResNet50-specific rewiring) operate at our block-tap granularity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState, softmax_cross_entropy
from ..gradient.mifgsm import MIFGSM
from ..input_transformation.dim import random_resize_pad
from ..input_transformation.su import SU
from ..models import tap_key
from ..ops import gaussian_kernel, smooth_conv
from .fia import FIA


class ATA(Attack):
    """Attention-map (grad-CAM) regularizer (``ata.py:28-110``):
    loss = CE + λ·||CAM(adv) − CAM(clean)||² at layer4."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 lamda=1.0, layer_name="layer4", targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 attack="ATA", **kwargs):
        kwargs.pop("decay", None)
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=0.0,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.lamda = float(lamda)
        self.feature_layer = layer_name

    def _cam(self, variables, point, y):
        """Grad-CAM: relu(Σ_c w_c·f_c), w = spatial-mean feature gradient of
        the true-class softmax probability."""
        keyname = tap_key(self.feature_layer)
        feat_shape = self.model.feature_shape(point.shape, self.feature_layer)

        def prob_loss(offset):
            taps = {keyname: lambda f: f + offset}
            logits = self.model.apply(variables, point, tap_fns=taps)
            probs = jax.nn.softmax(logits, axis=-1)
            return jnp.take_along_axis(probs, y[:, None], axis=1).sum()

        zero = jnp.zeros(feat_shape, point.dtype)
        grad = jax.grad(prob_loss)(zero)
        _, fmap = self.model.feature(variables, point, self.feature_layer)
        w = grad.mean(axis=(1, 2), keepdims=True)
        return jax.nn.relu(jnp.sum(w * fmap, axis=-1))

    def run(self, variables, x, y, key):
        cam_ori = jax.lax.stop_gradient(self._cam(variables, x, y))
        state = self.init_state(x, y, key)

        def loss_fn(delta):
            cam_adv = self._cam(variables, x + delta, y)
            logits = self.model.apply(variables, x + delta)
            l1 = softmax_cross_entropy(logits, y).mean()
            l2 = self.lamda * jnp.sum((cam_adv - cam_ori) ** 2)
            return l1 + l2

        def body(st, _):
            k, _ = jax.random.split(st.key)
            grad = jax.grad(loss_fn)(st.delta)
            delta = self.update_delta(st.delta, x, grad)
            return st.replace(delta=delta, key=k, step=st.step + 1), None

        state, _ = jax.lax.scan(body, state, None, length=self.epoch)
        return self.finalize(state, x, y)


def _l2_normalize_per_sample(t, eps=1e-12):
    """Reference ``mfaa._l2_normalize_per_sample:103-108``."""
    v = t.reshape(t.shape[0], -1)
    n = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True) + eps)
    return (v / n).reshape(t.shape)


class MFAA(Attack):
    """Multi-feature attention attack (``mfaa.py:34-252``): guidance weights
    are the negated, per-sample-normalized mean true-logit feature gradients
    under shared input drop masks at FIVE specific taps (resnet50:
    layer4[-1], layer3[-1], layer3[-3], layer3[-5], layer2[-1],
    ``mfaa.py:64-77``; resnet152 offsets −8/−17/−27, ``mfaa.py:50-58``);
    each iteration runs the LAG chain — loss at L4 with its guidance, whose
    feature gradient (adv half, detached, normalized, plus guidance) becomes
    the weights of the next-shallower loss, down to layer2 — then ascends
    the final layer2 loss with MI momentum (``mfaa.py:196-245``).  The
    reference forwards concat(clean, adv) but its losses touch only the adv
    half; the clean half survives solely in the ``numel`` divisor (×2 here,
    ``mfaa.py:110-117``)."""

    def __init__(self, model_name="resnet50", num_ens=30, probb=0.8,
                 taps=None, **kwargs):
        kwargs.setdefault("attack", "MFAA")
        super().__init__(model_name, **kwargs)
        self.num_ens = int(num_ens)
        self.probb = float(probb)
        self._taps = tuple(taps) if taps else self._default_taps()

    def _default_taps(self):
        sizes = list(self.model.module.backbone.stage_sizes)
        off = (8, 17, 27) if sizes == [3, 8, 36, 3] else (1, 3, 5)
        if sizes[2] < off[2] + 1:
            raise ValueError(
                f"MFAA needs >= {off[2] + 1} layer3 units (got stage sizes "
                f"{sizes}); pass taps= explicitly for this surrogate"
            )
        return (f"layer4_{sizes[3] - 1}",
                f"layer3_{sizes[2] - off[0]}",
                f"layer3_{sizes[2] - off[1]}",
                f"layer3_{sizes[2] - off[2]}",
                f"layer2_{sizes[1] - 1}")

    def drop_mask(self, key, x, i):
        """Bernoulli keep mask, prob ``probb`` (``mfaa.py:118-123``) —
        overridable seam for paired-RNG parity twins."""
        return jax.random.bernoulli(key, self.probb, x.shape).astype(x.dtype)

    def _feats_fn(self, variables):
        names = self._taps

        def F(x_in, offs):
            captured = {}
            taps = {}
            for n in names:
                def tap(f, n=n):
                    f = f + offs[n]
                    captured[n] = f
                    return f

                taps[tap_key(n)] = tap
            logits = self.model.apply(variables, x_in, tap_fns=taps)
            return captured, logits

        return F

    def _zero_offs(self, variables, x):
        return {
            n: jnp.zeros(self.model.feature_shape(x.shape, n), x.dtype)
            for n in self._taps
        }

    def _guidance(self, variables, x, y, key):
        """Mean true-logit feature gradients over num_ens shared drop masks,
        negated + per-sample normalized (``mfaa.py:127-173``)."""
        F = self._feats_fn(variables)
        zero = self._zero_offs(variables, x)

        def one(ki):
            k, i = ki
            x_drop = jax.lax.stop_gradient(x * self.drop_mask(k, x, i))

            def chosen_fn(offs):
                _, logits = F(x_drop, offs)
                oh = jax.nn.one_hot(y, logits.shape[-1], dtype=logits.dtype)
                return jnp.sum(logits * oh)

            return jax.grad(chosen_fn)(zero)

        keys = jax.random.split(key, self.num_ens)
        acc = jax.lax.map(one, (keys, jnp.arange(self.num_ens)))
        return {
            n: -_l2_normalize_per_sample(acc[n].mean(0)) for n in self._taps
        }

    def run(self, variables, x, y, key):
        key, kg = jax.random.split(key)
        guidance = jax.lax.stop_gradient(self._guidance(variables, x, y, kg))
        state = self.init_state(x, y, key)
        F = self._feats_fn(variables)
        zero = self._zero_offs(variables, x)
        L4, L3a, L3b, L3c, L2 = self._taps

        def body(st, _):
            k, _ = jax.random.split(st.key)
            (feats, logits), pull = jax.vjp(
                lambda d, o: F(x + d, o), st.delta, zero
            )

            def cot(n, w):
                c = {m: jnp.zeros_like(feats[m]) for m in self._taps}
                # (adv·w).sum()/numel(concat(clean, adv)) — the ×2 is the
                # clean half's only role (``mfaa.py:110-117``)
                c[n] = w / (2.0 * feats[n].size)
                return (c, jnp.zeros_like(logits))

            w = guidance[L4]
            prev = L4
            for nxt in (L3a, L3b, L3c, L2):
                _, g_offs = pull(cot(prev, w))
                g = jax.lax.stop_gradient(g_offs[nxt])
                w = _l2_normalize_per_sample(g) + guidance[nxt]
                prev = nxt
            grad, _ = pull(cot(L2, w))
            momentum = self.get_momentum(grad, st.momentum)
            delta = self.update_delta(st.delta, x, momentum)
            return st.replace(delta=delta, momentum=momentum, key=k,
                              step=st.step + 1), None

        state, _ = jax.lax.scan(body, state, None, length=self.epoch)
        return self.finalize(state, x, y)


def yaila_calculate_w(H, r, lam: float = 1.0):
    """The reference's dual-form ridge fit (``yaila_utils.calculate_w:140-159``
    at normalize_H=True): rows of H L2-normalized, then
    w = Hᵀr − Hᵀ(HHᵀ+λI)⁻¹HHᵀr  (= λ·Hᵀ(HHᵀ+λI)⁻¹r by Woodbury).
    H: (B, T, D) feature displacements; r: (B, T, 1) losses → (B, D)."""
    Hn = H / (jnp.linalg.norm(H, axis=2, keepdims=True) + 1e-12)
    G = jnp.einsum("btd,bsd->bts", Hn, Hn)
    T = G.shape[1]
    A = G + lam * jnp.eye(T, dtype=G.dtype)[None]
    Ht_r = jnp.einsum("btd,bto->bdo", Hn, r)
    H_Ht_r = jnp.einsum("btd,bdo->bto", Hn, Ht_r)
    z = jnp.linalg.solve(A, H_Ht_r)
    return (Ht_r - jnp.einsum("btd,bto->bdo", Hn, z))[..., 0]


class YAILA(MIFGSM):
    """Yet another intermediate-level attack, faithful to the reference
    pipeline (``yaila/yaila.py:43-68`` + ``yaila/yaila_utils.py:140-256``):

    1. **TAP-loss baseline** (``yaila_utils.attack`` with method='tap',
       ``Transferable_Adversarial_Perturbations_Loss:260-285``): epoch+1
       plain sign-ascent steps at lr=1/255 recording, from iteration 1 on,
       the flattened mid-layer feature displacement H[:, t] and the
       per-sample CE r[:, t] (``yaila_utils.py:196-221``).
    2. **Dual-form ridge fit** (``calculate_w:140-159``, lam=1.0,
       normalize_H=True): rows of H L2-normalized, then
       w = Hᵀr − Hᵀ(HHᵀ+λI)⁻¹HHᵀr  (= λ·Hᵀ(HHᵀ+λI)⁻¹r).
    3. **ILA phase** (``Proj_Loss:245-256``): ila_epoch+1 sign-ascent steps
       on ⟨feat − feat₀, w/‖w‖⟩ from a fresh start.

    Reference quirks kept: epsilon defaults to 0.03 (``yaila.py:33`` — NOT
    the protocol's 16/255, and main.py never forwards --eps); the mid layer
    '3_1' is 1-indexed and shifted down one unit (``yaila.py:57-59``), i.e.
    block tap ``layer3_0``; both phases bound steps with lr, not alpha.
    """

    def __init__(self, model_name="resnet50", mid_layer="3_1", lam=1.0,
                 ila_epoch=50, lr=1 / 255, tap_lam=0.005, tap_alpha=0.5,
                 tap_s=3, tap_yita=0.01, **kwargs):
        kwargs.setdefault("attack", "YAILA")
        kwargs.setdefault("eps", 0.03)
        super().__init__(model_name, **kwargs)
        bi, ui = mid_layer.split("_")
        self.mid_tap = f"layer{bi}_{int(ui) - 1}"
        self.lam = float(lam)
        self.ila_epoch = int(ila_epoch)
        self.lr = float(lr)
        self.tap_lam = float(tap_lam)
        self.tap_alpha = float(tap_alpha)
        self.tap_s = int(tap_s)
        self.tap_yita = float(tap_yita)

    def _forward_parts(self, variables, xadv):
        """(logits, [stage feats], mid-block feat) in one forward — the
        reference's ``resnet50_forward(tap=True)`` (``yaila_utils.py:94-127``)."""
        from ..models import find_feature

        logits, feats = self.model.apply_with_feats(variables, xadv, self.mid_tap)
        stages = [find_feature(feats, f"stage{i}") for i in (1, 2, 3, 4)]
        mid = find_feature(feats, self.mid_tap)
        if mid is None:
            raise KeyError(f"no block tap {self.mid_tap!r} in intermediates")
        return logits, stages, mid

    def _sign_step(self, delta, x, grad):
        d = jnp.clip(delta + self.lr * jnp.sign(grad), -self.eps, self.eps)
        return jnp.clip(x + d, 0.0, 1.0) - x

    def run(self, variables, x, y, key):
        from flax import linen as fnn

        B = x.shape[0]
        _, stages0, mid0 = self._forward_parts(variables, x)
        stages0 = [jax.lax.stop_gradient(f) for f in stages0]
        mid0_flat = jax.lax.stop_gradient(mid0).reshape(B, -1)

        def powsign(f):
            return jnp.sign(f) * jnp.abs(f) ** self.tap_alpha

        def tap_loss(delta):
            xadv = x + delta
            logits, stages, mid = self._forward_parts(variables, xadv)
            ce = softmax_cross_entropy(logits, y)
            l2 = 0.0
            for f0, f in zip(stages0, stages):
                diff = powsign(f0) - powsign(f)
                sq = jnp.sum(diff**2, axis=tuple(range(1, diff.ndim)))
                l2 = l2 + self.tap_lam * jnp.sum(sq) / B
            pooled = fnn.avg_pool(x - xadv, (self.tap_s, self.tap_s),
                                  strides=(self.tap_s, self.tap_s))
            l3 = self.tap_yita * jnp.sum(jnp.abs(pooled)) / B
            loss = ce.mean() + l2 + l3
            dmid = mid.reshape(B, -1) - mid0_flat
            return loss, (ce, dmid)

        # phase 1: epoch+1 sign steps, recording (Δfeat, ce) at the visited
        # state of iterations 1..epoch (the i!=0 rule, yaila_utils.py:216-219)
        def base_body(delta, _):
            (_, (ce, dmid)), g = jax.value_and_grad(
                tap_loss, has_aux=True)(delta)
            return self._sign_step(delta, x, g), (ce, dmid)

        _, (ces, dmids) = jax.lax.scan(
            base_body, jnp.zeros_like(x), None, length=self.epoch + 1)
        r = jnp.transpose(ces[1:], (1, 0))[..., None]       # (B, T, 1)
        H = jnp.transpose(dmids[1:], (1, 0, 2))             # (B, T, D)
        w = yaila_calculate_w(H, r, self.lam)
        w = w / (jnp.linalg.norm(w, axis=1, keepdims=True) + 1e-12)
        w = jax.lax.stop_gradient(w)

        # phase 2: ILA projection ascent from a fresh start (Proj_Loss)
        def proj(delta):
            _, _, mid = self._forward_parts(variables, x + delta)
            return jnp.sum((mid.reshape(B, -1) - mid0_flat) * w) / B

        def ila_body(delta, _):
            return self._sign_step(delta, x, jax.grad(proj)(delta)), None

        delta, _ = jax.lax.scan(
            ila_body, jnp.zeros_like(x), None, length=self.ila_epoch + 1)
        state = self.init_state(x, y, key)
        return self.finalize(state.replace(delta=delta), x, y)


class CFM(Attack):
    """Clean feature mixup (``cfm.py:12-301``): targeted logit attack
    (T=300, alpha=2/255, DI+TI) where block features randomly mix with
    stored clean features (prob 0.1, channelwise ratio U(0, 0.75))."""

    def __init__(self, model_name="resnet50", epoch=300, eps=16 / 255, alpha=2 / 255,
                 decay=1.0, mix_prob=0.1, mix_upper=0.75, mix_lower=0.0,
                 layers=("layer2", "layer3", "layer4"), resize_rate=1.1,
                 diversity_prob=0.7, kernel_size=5, targeted=True,
                 random_start=False, norm="linfty", loss="crossentropy",
                 attack="CFM", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.mix_prob = float(mix_prob)
        self.mix_upper = float(mix_upper)
        self.mix_lower = float(mix_lower)
        self.layers = tuple(layers)
        self.resize_rate = float(resize_rate)
        self.diversity_prob = float(diversity_prob)
        self.kernel = gaussian_kernel(int(kernel_size))

    def get_loss(self, logits, y):
        picked = jnp.take_along_axis(
            logits, jnp.broadcast_to(y[None, :, None], logits.shape[:2] + (1,)),
            axis=-1,
        )
        total = picked.sum()
        return total if self.targeted else -total

    def get_momentum(self, grad, momentum):
        return grad + self.decay * momentum

    def post_grad(self, grad, state: AttackState):
        return smooth_conv(grad, self.kernel)

    def get_grad(self, variables, x, y, state: AttackState, key):
        k1, k2 = jax.random.split(key)
        # stored clean features per mix layer
        clean = {}
        for layer in self.layers:
            _, f = self.model.feature(variables, x, layer)
            clean[layer] = jax.lax.stop_gradient(f)

        taps = {}
        for i, layer in enumerate(self.layers):
            kl = jax.random.fold_in(k2, i)

            def tap(feat, layer=layer, kl=kl):
                ka, kb, kc = jax.random.split(kl, 3)
                B = feat.shape[0]
                apply_mix = jax.random.bernoulli(ka, self.mix_prob, (B,))
                C = feat.shape[-1]
                ratio = jax.random.uniform(
                    kb, (B, 1, 1, C), feat.dtype,
                    minval=self.mix_lower, maxval=self.mix_upper,
                )
                # random pairing with other images' clean features
                perm = jax.random.permutation(kc, B)
                mixed = (1 - ratio) * feat + ratio * clean[layer][perm]
                sel = apply_mix.reshape(-1, 1, 1, 1)
                return jnp.where(sel, mixed, feat)

            taps[tap_key(layer)] = tap

        def loss_fn(delta):
            pts = random_resize_pad(x + delta, k1, self.resize_rate,
                                    self.diversity_prob)
            logits = self.model.apply(variables, pts, tap_fns=taps)
            return self.get_loss(logits[None], y)

        return jax.grad(loss_fn)(state.delta), {}


class FTM(CFM):
    """Feature tuning mixup (``ftm.py:13-400``): CFM with learnable feature
    perturbations — a stochastic per-layer offset updated by its own
    gradient each iteration (stochastic update of tuned features)."""

    def __init__(self, *args, ftm_lr=0.01, update_prob=0.5, attack="FTM", **kwargs):
        kwargs["attack"] = attack
        super().__init__(*args, **kwargs)
        self.ftm_lr = float(ftm_lr)
        self.update_prob = float(update_prob)

    def init_extra(self, x, y):
        extras = {}
        for layer in self.layers:
            shape = self.model.feature_shape(x.shape, layer)
            extras[f"pert_{layer}"] = jnp.zeros(shape, jnp.float32)
        return extras

    def get_grad(self, variables, x, y, state: AttackState, key):
        k1, k2, k3 = jax.random.split(key, 3)
        perts = {layer: state.extra[f"pert_{layer}"] for layer in self.layers}

        def loss_with(delta, perts):
            taps = {}
            for i, layer in enumerate(self.layers):
                kl = jax.random.fold_in(k2, i)

                def tap(feat, layer=layer, kl=kl):
                    B = feat.shape[0]
                    apply_mix = jax.random.bernoulli(kl, self.mix_prob, (B, 1, 1, 1))
                    return jnp.where(apply_mix, feat + perts[layer], feat)

                taps[tap_key(layer)] = tap
            pts = random_resize_pad(x + delta, k1, self.resize_rate,
                                    self.diversity_prob)
            logits = self.model.apply(variables, pts, tap_fns=taps)
            return self.get_loss(logits[None], y)

        grad, pgrads = jax.grad(loss_with, argnums=(0, 1))(state.delta, perts)
        updates = {}
        for layer in self.layers:
            do = jax.random.bernoulli(jax.random.fold_in(k3, hash(layer) % 97),
                                      self.update_prob)
            newp = perts[layer] + self.ftm_lr * pgrads[layer]
            updates[f"pert_{layer}"] = jnp.where(
                do, jax.lax.stop_gradient(newp), perts[layer]
            )
        return grad, updates


def di_keepresolution(x, key, margin: int = 22, prob: float = 0.7):
    """The reference FFT's resolution-preserving DI (``fft.py:66-80``):
    with prob 0.7 downscale to a random rnd ∈ [size−margin, size) and
    zero-pad back to size at a random offset.  One static-shape
    ``scale_and_translate`` (torch uses nearest interpolation; the linear
    kernel here is the framework-wide continuous stand-in, see DIM)."""
    H, W = x.shape[1], x.shape[2]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    rnd = jax.random.randint(k1, (), H - margin, H).astype(x.dtype)
    top = jnp.floor(jax.random.uniform(k2, (), x.dtype) * (H - rnd + 1))
    left = jnp.floor(jax.random.uniform(k3, (), x.dtype) * (W - rnd + 1))
    scale = rnd / H
    out = jax.image.scale_and_translate(
        x, x.shape, (1, 2), jnp.stack([scale, scale]),
        jnp.stack([top, left]), method="linear",
    )
    apply = jax.random.uniform(k4, (), x.dtype) <= prob
    return jnp.where(apply, out, x)


class FFT(SU):
    """Feature fine-tuning (``fft.py:12-313``), faithful to the reference
    pipeline:

    1. **Baseline = SU** (``fft.py:49`` super().__init__ with coef=0.001,
       scale=(0.1, 0.0)) under ``loss_base`` ∈ CE / logit / logit_margin
       (default logit_margin, ``fft.py:46,143-152``) — the self-universality
       targeted attack with its built-in DI + TI.
    2. **Combined aggregate gradient** (``fft.py:181-235``): FIA-style
       dropout-ensemble feature gradients at the mid layer — on the clean
       image w.r.t. the ORIGINAL label and on the baseline adversary w.r.t.
       the TARGET label — combined as agg_adv − β·agg_clean.  The dropout
       mask applies in normalized space (``fft.py:125-131`` drops
       ``model[0](data)``), i.e. raw pixels collapse toward the dataset
       mean: x' = mean + M⊙(x − mean).
    3. **Fine-tune** (``fft.py:256-277``): epoch_ft iterations at
       alpha_ft = alpha/2 ascending Σ(combined ⊙ feat) under the
       resolution-preserving DI (``DI_keepresolution:66-80``) + TI kernel 5;
       the OVERALL perturbation init_delta+delta is eps-bounded each step.
    """

    def __init__(self, model_name="resnet50", epoch=300, alpha=2 / 255,
                 num_ens=30, drop_rate=0.3, beta_combine=0.2, ft_epoch=10,
                 loss_base="logit_margin", mid_layer="layer3",
                 attack="FFT", **kwargs):
        kwargs["attack"] = attack
        kwargs.setdefault("targeted", True)
        super().__init__(model_name, epoch=epoch, alpha=alpha,
                         coef=0.001, scale=(0.1, 0.0), **kwargs)
        self.num_ens = int(num_ens)
        self.drop_rate = float(drop_rate)
        self.beta_combine = float(beta_combine)
        self.ft_epoch = int(ft_epoch)
        self.alpha_ft = float(alpha) / 2.0
        self.loss_base = str(loss_base)
        self.mid_layer = mid_layer
        if self.loss_base not in ("CE", "logit", "logit_margin"):
            raise ValueError(
                "Only CE, logit, logit_margin are supported (fft.py:152)")

    def class_loss(self, logits, yy):
        """loss_base for the SU baseline (``fft.py:143-152,287-313``)."""
        if self.loss_base == "logit":
            picked = jnp.take_along_axis(logits, yy[:, None], axis=1)[:, 0]
            return -picked.mean()
        if self.loss_base == "logit_margin":
            v = jnp.sort(logits, axis=1)[:, ::-1]
            margin = jax.lax.stop_gradient(v[:, 0] - v[:, 1])[:, None]
            return softmax_cross_entropy(logits / margin, yy).mean()
        return softmax_cross_entropy(logits, yy).mean()

    def prepare_labels(self, label):
        """Keep BOTH columns: the aggregate gradients need the original
        label (clean pass) AND the target (adv pass), ``fft.py:154-157``."""
        import numpy as _np

        label = _np.asarray(label)
        if label.ndim == 2:
            return jnp.asarray(label.astype(_np.int32))
        return jnp.asarray(
            _np.stack([label, label], axis=1).astype(_np.int32))

    def _dropout_in_norm_space(self, x, k):
        """x' = mean + M⊙(x − mean): equals dropping the normalized image."""
        mean = jnp.asarray(
            getattr(self.model.module, "mean", (0.0, 0.0, 0.0)), x.dtype)
        M = jax.random.bernoulli(k, 1.0 - self.drop_rate, x.shape)
        return mean + M.astype(x.dtype) * (x - mean)

    def _agg_grad(self, variables, point, labels, key):
        """FIA-style aggregate feature gradient of the label-logit sum over
        num_ens dropout copies, per-sample L2-normalized (``fft.py:181-235``)."""
        feat_shape = self.model.feature_shape(point.shape, self.mid_layer)
        keyname = tap_key(self.mid_layer)

        def one(k):
            def loss(offset):
                taps = {keyname: lambda f: f + offset}
                logits = self.model.apply(
                    variables, self._dropout_in_norm_space(point, k),
                    tap_fns=taps)
                return jnp.take_along_axis(
                    logits, labels[:, None], axis=1).sum()

            return jax.grad(loss)(jnp.zeros(feat_shape, point.dtype))

        def body(acc, k):
            return acc + one(k), None

        agg, _ = jax.lax.scan(
            body, jnp.zeros(feat_shape, point.dtype),
            jax.random.split(key, self.num_ens))
        axes = tuple(range(1, agg.ndim))
        return agg / (jnp.sqrt(jnp.sum(agg**2, axis=axes, keepdims=True))
                      + 1e-12)

    def run(self, variables, x, y, key):
        from ..utils import img_max, img_min

        y_ori, y_tar = y[:, 0], y[:, 1]
        k1, k2, k3, k4 = jax.random.split(key, 4)

        # 1. baseline SU attack toward the target label
        init_delta = super().run(variables, x, y_tar, k1)
        init_delta = jax.lax.stop_gradient(init_delta)

        # 2. combined aggregate gradient
        agg_clean = self._agg_grad(variables, x, y_ori, k2)
        agg_adv = self._agg_grad(variables, x + init_delta, y_tar, k3)
        combined = jax.lax.stop_gradient(
            agg_adv - self.beta_combine * agg_clean)

        # 3. feature fine-tune of the pre-crafted adversary
        data_adv = x + init_delta

        def ft_loss(delta, k):
            pts = di_keepresolution(data_adv + delta, k)
            _, feat = self.model.feature(variables, pts, self.mid_layer)
            return jnp.sum(combined * feat)

        def body(carry, k):
            delta, mom = carry
            kd, kg = jax.random.split(k)
            grad = jax.grad(ft_loss)(delta, kd)
            grad = smooth_conv(grad, self.kernel)
            mom = self.get_momentum(grad, mom)
            d = jnp.clip(init_delta + delta + self.alpha_ft * jnp.sign(mom),
                         -self.eps, self.eps) - init_delta
            d = jnp.clip(d, img_min - data_adv, img_max - data_adv)
            return (d, mom), None

        (delta, _), _ = jax.lax.scan(
            body, (jnp.zeros_like(x), jnp.zeros_like(x)),
            jax.random.split(k4, self.ft_epoch))
        return jnp.clip(x + init_delta + delta, img_min, img_max) - x
