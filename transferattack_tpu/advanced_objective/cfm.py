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


class MFAA(FIA):
    """Multi-layer feature-attention fusion (``mfaa.py:34-252``): FIA-style
    aggregate weights at EVERY stage, fused into one loss; drop masks with
    prob ``probb``."""

    def __init__(self, model_name="resnet50", num_ens=30, probb=0.8,
                 layers=("layer1", "layer2", "layer3", "layer4"), **kwargs):
        kwargs.setdefault("attack", "MFAA")
        kwargs.setdefault("feature_layer", layers[0])
        super().__init__(model_name, num_ens=num_ens, **kwargs)
        self.layers = tuple(layers)
        self.probb = float(probb)
        self.drop_rate = 1 - self.probb

    def run(self, variables, x, y, key):
        key, kagg = jax.random.split(key)
        aggs = {}
        for i, layer in enumerate(self.layers):
            self.feature_layer = layer
            aggs[layer] = jax.lax.stop_gradient(
                self.aggregate_grad(variables, x, y, jax.random.fold_in(kagg, i))
            )
        state = self.init_state(x, y, key)

        def feature_loss(delta):
            total = 0.0
            for layer in self.layers:
                _, feat = self.model.feature(variables, x + delta, layer)
                total = total + jnp.sum(feat * aggs[layer]) / len(self.layers)
            return total

        def body(st, _):
            k, _ = jax.random.split(st.key)
            grad = jax.grad(feature_loss)(st.delta)
            momentum = self.get_momentum(-grad, st.momentum)
            delta = self.update_delta(st.delta, x, momentum)
            return st.replace(delta=delta, momentum=momentum, key=k,
                              step=st.step + 1), None

        state, _ = jax.lax.scan(body, state, None, length=self.epoch)
        return self.finalize(state, x, y)


class YAILA(MIFGSM):
    """Yet another intermediate-level attack (``yaila/yaila.py:8-68`` +
    1,933-LoC layer surgery): fit a linear map w from mid-layer feature
    displacements to losses over a short baseline attack trajectory, then
    maximize ⟨w, Δfeat⟩.  Mid layer '3_1' ≈ our stage3 block 1 tap."""

    def __init__(self, model_name="resnet50", mid_layer="layer3.1",
                 baseline_epoch=5, **kwargs):
        kwargs.setdefault("attack", "YAILA")
        super().__init__(model_name, **kwargs)
        self.mid_layer = mid_layer
        self.baseline_epoch = int(baseline_epoch)

    def run(self, variables, x, y, key):
        k1, k2 = jax.random.split(key)
        _, feat0 = self.model.feature(variables, x, self.mid_layer)
        feat0 = jax.lax.stop_gradient(feat0)

        # short baseline attack collecting (Δfeat, loss) pairs
        state = self.init_state(x, y, k1)

        def base_body(st, _):
            k, sub = jax.random.split(st.key)
            grad = self.input_grad(variables, x + st.delta, y, st, sub)
            momentum = self.get_momentum(grad, st.momentum)
            delta = self.update_delta(st.delta, x, momentum)
            logits, feat = self.model.feature(
                variables, x + delta, self.mid_layer
            )
            ce = softmax_cross_entropy(logits, y)
            return st.replace(delta=delta, momentum=momentum, key=k,
                              step=st.step + 1), (feat - feat0, ce)

        state, (dfeats, losses) = jax.lax.scan(
            base_body, state, None, length=self.baseline_epoch
        )
        # least-squares fit per sample: w ∝ Σ_t loss_t · Δfeat_t
        w = jnp.einsum("tb,tb...->b...", losses, dfeats)
        axes = tuple(range(1, w.ndim))
        w = w / (jnp.sqrt(jnp.sum(w**2, axis=axes, keepdims=True)) + 1e-12)
        w = jax.lax.stop_gradient(w)

        state2 = self.init_state(x, y, k2)

        def ila_body(st, _):
            k, _ = jax.random.split(st.key)

            def proj(delta):
                _, feat = self.model.feature(variables, x + delta, self.mid_layer)
                return jnp.sum((feat - feat0) * w)

            grad = jax.grad(proj)(st.delta)
            delta = self.update_delta(st.delta, x, grad)
            return st.replace(delta=delta, key=k, step=st.step + 1), None

        state2, _ = jax.lax.scan(ila_body, state2, None, length=self.epoch)
        return self.finalize(state2, x, y)


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


class FFT(CFM):
    """Feature fine-tuning (``fft.py:12-313``): fine-tune a pre-crafted
    adversary in feature space — phase 1 runs the base targeted logit
    attack, phase 2 fine-tunes with mid-layer feature-similarity loss."""

    def __init__(self, *args, ft_epoch=10, feature_layer="layer3",
                 attack="FFT", **kwargs):
        kwargs["attack"] = attack
        super().__init__(*args, **kwargs)
        self.ft_epoch = int(ft_epoch)
        self.feature_layer = feature_layer

    def run(self, variables, x, y, key):
        k1, k2 = jax.random.split(key)
        base_delta = super().run(variables, x, y, k1)
        _, feat_adv = self.model.feature(
            variables, x + base_delta, self.feature_layer
        )
        feat_adv = jax.lax.stop_gradient(feat_adv)

        state = self.init_state(x, y, k2)
        state = state.replace(delta=base_delta)

        def ft_loss(delta):
            logits, feat = self.model.feature(
                variables, x + delta, self.feature_layer
            )
            sim = jnp.sum(feat * feat_adv) / (
                jnp.linalg.norm(feat.reshape(-1))
                * jnp.linalg.norm(feat_adv.reshape(-1)) + 1e-12
            )
            ce = self.get_loss(logits[None], y)
            return ce + sim

        def body(st, _):
            k, _ = jax.random.split(st.key)
            grad = jax.grad(ft_loss)(st.delta)
            momentum = self.get_momentum(grad, st.momentum)
            delta = self.update_delta(st.delta, x, momentum)
            return st.replace(delta=delta, momentum=momentum, key=k,
                              step=st.step + 1), None

        state, _ = jax.lax.scan(body, state, None, length=self.ft_epoch)
        return self.finalize(state, x, y)
