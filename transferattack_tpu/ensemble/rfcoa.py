"""RFCoA — robust-feature collaborative attack (reference:
``transferattack/ensemble/rfcoa/rfcoa.py``, AAAI 2025).

Targeted: blends a per-target-class robust feature into the VGG-autoencoder
latent of the image, optimizes a pixel mask + latent blend weight with Adam
under an adversarial + cognition (L1/TV/SSIM) loss against the ensemble,
and composites the decoded image.  The whole Adam loop is one ``lax.scan``.

Per-class robust features load from ``$TA_TPU_WEIGHTS_DIR/rfcoa_<cls>.npz``
(key ``array``; the reference ships them at ``ensemble/rfcoa/<cls>.npz``);
the autoencoder weights from ``rfcoa_autoencoder.npz``.
"""
from __future__ import annotations

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ..attack import softmax_cross_entropy
from ..utils import generation_target_classes
from .ens import _MultiModelAttack
from ..utils.weights_manifest import record_fallback

VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]


class VGGEncoder(nn.Module):
    @nn.compact
    def __call__(self, x):
        i = 0
        for v in VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=[(1, 1), (1, 1)], name=f"enc_{i}")(x)
                x = nn.relu(x)
                i += 1
        return x


class VGGDecoder(nn.Module):
    @nn.compact
    def __call__(self, z):
        i = 0
        for v in reversed([c for c in VGG16_CFG if c != "M"]):
            if i % 3 == 0 and i > 0:
                z = jax.image.resize(
                    z, (z.shape[0], z.shape[1] * 2, z.shape[2] * 2, z.shape[3]),
                    method="nearest",
                )
            z = nn.Conv(v, (3, 3), padding=[(1, 1), (1, 1)], name=f"dec_{i}")(z)
            z = nn.relu(z)
            i += 1
        z = jax.image.resize(
            z, (z.shape[0], z.shape[1] * 2, z.shape[2] * 2, z.shape[3]),
            method="nearest",
        )
        z = nn.Conv(3, (3, 3), padding=[(1, 1), (1, 1)], name="dec_out")(z)
        return jax.nn.sigmoid(z)


def ssim(a, b, c1=0.01**2, c2=0.03**2):
    """Global-statistics SSIM over NHWC batches (structural-similarity
    surrogate for torchmetrics' windowed version)."""
    mu_a = a.mean(axis=(1, 2, 3))
    mu_b = b.mean(axis=(1, 2, 3))
    var_a = a.var(axis=(1, 2, 3))
    var_b = b.var(axis=(1, 2, 3))
    cov = ((a - mu_a.reshape(-1, 1, 1, 1)) * (b - mu_b.reshape(-1, 1, 1, 1))).mean(
        axis=(1, 2, 3)
    )
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    return (num / den).mean()


def total_variation(t):
    # d*sign(d) == |d| with torch's |.| subgradient (0 at 0): a flat mask
    # init would otherwise pick up jnp.abs's unit derivative at exactly 0
    dh = t[:, 1:, :, :] - t[:, :-1, :, :]
    dw = t[:, :, 1:, :] - t[:, :, :-1, :]
    return jnp.sum(dh * jnp.sign(dh)) + jnp.sum(dw * jnp.sign(dw))


class RFCoA(_MultiModelAttack):
    """Official args (``rfcoa.py:38``): epoch=300, targeted, ensemble of
    resnet50/vgg16/densenet121."""

    host_state = True  # custom __call__ drives the Adam mask/alpha loop

    def __init__(self, model_name=None, epoch=300, eps=16 / 255, targeted=True,
                 random_start=True, norm="linfty", loss="crossentropy",
                 attack="RFCoA", **kwargs):
        if model_name is None or isinstance(model_name, str):
            model_name = ["resnet50", "vgg16", "densenet121"]
        pretrained = kwargs.get("pretrained", True)
        input_size = kwargs.get("input_size", None)
        super().__init__(model_name, epoch=epoch, eps=eps, targeted=targeted,
                         random_start=random_start, norm=norm, loss=loss,
                         attack=attack, **kwargs)
        self.encoder = VGGEncoder()
        self.decoder = VGGDecoder()
        size = input_size or 224
        rng = jax.random.PRNGKey(11)
        dummy = jnp.zeros((1, size, size, 3))
        self.enc_vars = self.encoder.init(rng, dummy)
        z = self.encoder.apply(self.enc_vars, dummy)
        self.dec_vars = self.decoder.init(rng, z)
        root = os.environ.get("TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights"))
        ae = os.path.join(root, "rfcoa_autoencoder.npz")
        if os.path.exists(ae):
            from ..models import load_npz_variables

            packed = load_npz_variables(ae)
            self.enc_vars = {"params": packed["params"]["encoder"]}
            self.dec_vars = {"params": packed["params"]["decoder"]}
        else:
            record_fallback("rfcoa_autoencoder")
            warnings.warn("RFCoA: rfcoa_autoencoder.npz not found; random AE.")
        self._feat_root = root

    def _robust_feature(self, idx, z_shape):
        """Per-class robust feature.  The reference ships these in-repo
        (``ensemble/rfcoa/{24..919}.npz``, key ``array``, (1,512,7,7) NCHW);
        we vendor them bit-for-bit at ``assets/rfcoa/<cls>.npz``
        (``scripts/convert_ref_assets.py``) and transpose to NHWC here."""
        cls = generation_target_classes[idx]
        asset = os.path.join(os.path.dirname(__file__), "..", "assets",
                             "rfcoa", f"{cls}.npz")
        if os.path.exists(asset):
            arr = np.load(asset)["array"]  # (1, 512, 7, 7) NCHW float32
            return jnp.asarray(arr.transpose(0, 2, 3, 1))
        path = os.path.join(self._feat_root, f"rfcoa_{cls}.npz")
        if os.path.exists(path):
            arr = np.load(path)["array"]
            if arr.ndim == 4 and arr.shape[1] == z_shape[-1]:
                arr = arr.transpose(0, 2, 3, 1)
            return jnp.asarray(arr)
        record_fallback(path)
        warnings.warn(f"RFCoA: {path} missing; using random robust feature.")
        return jax.random.normal(jax.random.PRNGKey(cls), z_shape)

    def __call__(self, data, label, key=None, idx: int = 0):
        label = np.asarray(label)
        x = jnp.asarray(data)
        if label.ndim == 2:
            y_src = jnp.asarray(label[:, 0])
            y_tgt = jnp.asarray(label[:, 1])
        else:
            y_src = jnp.asarray(label)
            y_tgt = jnp.full_like(y_src, generation_target_classes[idx])
        if key is None:
            key = jax.random.PRNGKey(self.seed + idx)

        org = self.encoder.apply(self.enc_vars, x)
        feature = self._robust_feature(idx, org.shape)
        if feature.shape[1:3] != org.shape[1:3]:
            # only off the official 224 path (latent 7x7); tiny-test inputs
            feature = jax.image.resize(
                feature, (feature.shape[0],) + org.shape[1:3] + (feature.shape[3],),
                method="bilinear",
            )
        feature = jnp.broadcast_to(feature, org.shape)
        mvars = self.member_variables(self.model.variables)

        # spatial attention map from the decoded-org ensemble CE gradient
        def sam_loss(z):
            dec = self.decoder.apply(self.dec_vars, z)
            loss = 0.0
            for k in range(self.K):
                loss = loss + softmax_cross_entropy(
                    self.member_logits(mvars, dec, k), y_src
                ).mean()
            return loss / self.K

        sam = jax.nn.sigmoid(jnp.abs(jax.grad(sam_loss)(org)))

        k1, k2 = jax.random.split(key)
        alpha0 = jax.random.uniform(k1, org.shape)
        mask0 = jax.random.uniform(k2, x.shape)
        opt = optax.multi_transform(
            {"mask": optax.adam(0.002), "alpha": optax.adam(0.04)},
            {"mask": "mask", "alpha": "alpha"},
        )
        params0 = {"mask": mask0, "alpha": alpha0}
        opt_state0 = opt.init(params0)

        def loss_fn(p):
            encode = p["alpha"] * feature + (1 - sam) * org
            decoded = self.decoder.apply(self.dec_vars, encode)
            decoded = p["mask"] * decoded + (1 - p["mask"]) * x
            per_loss = jnp.sum(jnp.abs(p["mask"]))
            tv_loss = total_variation(p["mask"])
            ssim_loss = ssim(decoded, x)
            adv1, adv2 = 0.0, 0.0
            for k in range(self.K):
                logits = self.member_logits(mvars, decoded, k)
                adv1 = adv1 + softmax_cross_entropy(logits, y_tgt).mean()
                adv2 = adv2 + softmax_cross_entropy(logits, y_src).mean()
            adv = 5 * adv1 / self.K - 2 * adv2 / self.K
            return adv + 0.005 * per_loss + 0.002 * tv_loss - 200 * ssim_loss

        def body(carry, _):
            p, s = carry
            g = jax.grad(loss_fn)(p)
            updates, s = opt.update(g, s, p)
            p = optax.apply_updates(p, updates)
            p = jax.tree.map(lambda v: jnp.clip(v, 0.0, 1.0), p)
            return (p, s), None

        (params, _), _ = jax.lax.scan(
            body, (params0, opt_state0), None, length=self.epoch
        )
        # final composite uses sam·org (``rfcoa.py:120-123``)
        encode = params["alpha"] * feature + sam * org
        decoded = self.decoder.apply(self.dec_vars, encode)
        adv = params["mask"] * decoded + (1 - params["mask"]) * x
        return jnp.clip(adv, 0.0, 1.0) - x
