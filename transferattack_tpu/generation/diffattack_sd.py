"""DiffAttack on the real Stable-Diffusion stack (reference:
``transferattack/generation/diffattack.py:38-1766``).

The reference pipeline: VAE-encode the image, DDIM-invert the latent to
``start_step`` under the label prompt, optimize the latent with AdamW
against the surrogate's CE plus the attention-control terms
(``diffattack.py:279-287``), DDIM-decode with classifier-free guidance and
VAE-decode back to pixels.  The attention terms come from the
AttentionStore (``diffattack.py:689-759``): self-attention preservation
(MSE between the optimized and clean trajectories' attn1 maps) and the
cross-attention variance term on the label token's attn2 column.

This backend activates when converted SD artifacts
(``sd_unet.npz``/``sd_vae.npz``/``sd_text.npz``) exist in
``$TA_TPU_WEIGHTS_DIR``; otherwise it runs on random-init modules with a
recorded fallback (mechanically complete, not paper-comparable) — the
repo-wide convention for missing weights.
"""
from __future__ import annotations

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from ..attack import softmax_cross_entropy
from ..models import load_npz_variables
from ..utils.weights_manifest import record_fallback
from .sd_text import MAX_TOKENS, CLIPTextEncoder, SDTokenizer
from .sd_unet import SDUNet
from .sd_vae import SD_VAE_SCALE, SDVAE


def sd_alphas_cumprod(T: int = 1000, beta_start: float = 0.00085,
                      beta_end: float = 0.012) -> jnp.ndarray:
    """SD's scaled_linear schedule (diffusers DDIMScheduler defaults)."""
    betas = jnp.linspace(beta_start ** 0.5, beta_end ** 0.5, T) ** 2
    return jnp.cumprod(1.0 - betas)


def _load_or_init(tag, module, init_args, seed):
    root = os.environ.get("TA_TPU_WEIGHTS_DIR",
                          os.path.join(os.getcwd(), "weights"))
    path = os.path.join(root, f"{tag}.npz")
    if os.path.exists(path):
        return load_npz_variables(path)
    record_fallback(tag)
    warnings.warn(f"DiffAttack(SD): {path} missing; random init.")
    return module.init(jax.random.PRNGKey(seed), *init_args)


def sd_weights_present() -> bool:
    root = os.environ.get("TA_TPU_WEIGHTS_DIR",
                          os.path.join(os.getcwd(), "weights"))
    return all(os.path.exists(os.path.join(root, f"{t}.npz"))
               for t in ("sd_unet", "sd_vae", "sd_text"))


class SDDiffAttack:
    """Latent-optimization attack over the SD UNet/VAE/CLIP stack."""

    host_state = True  # tokenization happens host-side in __call__

    def __init__(self, model_name="resnet50", diffusion_steps=20,
                 start_step=15, iterations=30, lr=0.01, guidance=2.5,
                 attack_weight=10.0, cross_attn_weight=10000.0,
                 self_attn_weight=100.0, recon_weight=0.1,
                 image_size=512, targeted=False, seed=0,
                 attack="DiffAttack", unet=None, vae=None, text=None,
                 **kwargs):
        from ..models import make_model

        self.surrogate = make_model(
            model_name, pretrained=kwargs.pop("pretrained", True),
            input_size=kwargs.pop("input_size", None))
        self.unet = unet or SDUNet()
        self.vae = vae or SDVAE()
        self.text = text or CLIPTextEncoder()
        ctx_dim = getattr(self.unet, "cross_attention_dim", 768)
        latent_hw = image_size // (2 ** (len(self.vae.block_out_channels) - 1))
        self.unet_vars = _load_or_init(
            "sd_unet", self.unet,
            (jnp.zeros((1, latent_hw, latent_hw, 4)), jnp.zeros((1,)),
             jnp.zeros((1, MAX_TOKENS, ctx_dim))), seed + 11)
        self.vae_vars = _load_or_init(
            "sd_vae", self.vae, (jnp.zeros((1, image_size, image_size, 3)),),
            seed + 12)
        self.text_vars = _load_or_init(
            "sd_text", self.text, (jnp.zeros((1, MAX_TOKENS), jnp.int32),),
            seed + 13)
        self.tokenizer = SDTokenizer()
        self.T = 1000
        self.alphas_cum = sd_alphas_cumprod(self.T)
        self.diffusion_steps = int(diffusion_steps)
        self.start_step = int(start_step)
        self.iterations = int(iterations)
        self.lr = float(lr)
        self.guidance = float(guidance)
        self.attack_weight = float(attack_weight)
        self.cross_attn_weight = float(cross_attn_weight)
        self.self_attn_weight = float(self_attn_weight)
        self.recon_weight = float(recon_weight)
        self.image_size = int(image_size)
        self.targeted = targeted
        self.seed = int(seed)
        self.attack = attack
        self.requires_batchsize = None
        self._jitted = None

    # ---- prompt -----------------------------------------------------------

    def _class_text(self, idx: int) -> str:
        root = os.environ.get("TA_TPU_WEIGHTS_DIR",
                              os.path.join(os.getcwd(), "weights"))
        path = os.path.join(root, "imagenet_classes.txt")
        if os.path.exists(path):
            if not hasattr(self, "_classnames"):
                with open(path) as f:
                    self._classnames = [l.strip() for l in f]
            if idx < len(self._classnames):
                return self._classnames[idx]
        return f"class {idx}"

    def _prompt_ids(self, labels: np.ndarray):
        """(cond_ids, uncond_ids, label_token_pos) — the reference builds
        'a photo of a <label text>' prompts (``diffattack.py:759`` TextLabel)
        and the empty prompt for classifier-free guidance."""
        texts = [f"a photo of a {self._class_text(int(c))}" for c in labels]
        cond = self.tokenizer(texts)
        uncond = self.tokenizer([""] * len(texts))
        from .sd_text import EOS

        # the label token column: the last real token before EOS
        pos = (cond != EOS).sum(axis=1) - 1
        return cond, uncond, pos.astype(np.int32)

    # ---- diffusion --------------------------------------------------------

    def _times(self):
        stride = max(self.T // self.diffusion_steps, 1)
        return stride

    def _eps(self, latent, t, ctx):
        tt = jnp.full((latent.shape[0],), t, jnp.float32)
        return self.unet.apply(self.unet_vars, latent, tt, ctx)

    def _eps_guided_with_attn(self, latent, t, ctx_cond, ctx_uncond):
        """One CFG step; returns eps and the cond branch's attention maps."""
        tt = jnp.full((latent.shape[0],), t, jnp.float32)
        eps_u = self.unet.apply(self.unet_vars, latent, tt, ctx_uncond)
        eps_c, state = self.unet.apply(
            self.unet_vars, latent, tt, ctx_cond, mutable=["intermediates"])
        self_maps, cross_maps = [], []

        def walk(node):
            if isinstance(node, dict):
                for k, v in node.items():
                    if k == "attn":
                        self_maps.append(v[0] if isinstance(v, tuple) else v)
                    elif k == "cross_attn":
                        cross_maps.append(v[0] if isinstance(v, tuple) else v)
                    else:
                        walk(v)

        walk(state["intermediates"])
        eps = eps_u + self.guidance * (eps_c - eps_u)
        return eps, self_maps, cross_maps

    def _ddim_invert(self, z0, ctx):
        stride = self._times()

        def body(z, i):
            t = i * stride
            eps = self._eps(z, t, ctx)
            a_t = self.alphas_cum[t]
            a_next = self.alphas_cum[jnp.minimum(t + stride, self.T - 1)]
            x0 = (z - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
            return jnp.sqrt(a_next) * x0 + jnp.sqrt(1 - a_next) * eps, None

        z, _ = jax.lax.scan(body, z0, jnp.arange(self.start_step))
        return z

    def _decode_with_attn(self, latent, ctx_cond, ctx_uncond):
        """CFG DDIM decode accumulating the AttentionStore
        (``diffattack.py:689-720`` between_steps averaging)."""
        stride = self._times()
        z = latent
        acc_self = acc_cross = None
        for i in range(self.start_step - 1, -1, -1):
            t = i * stride
            eps, smaps, cmaps = self._eps_guided_with_attn(
                z, t, ctx_cond, ctx_uncond)
            a_t = self.alphas_cum[t]
            a_prev = self.alphas_cum[max(t - stride, 0)]
            x0 = (z - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
            z = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps
            acc_self = (smaps if acc_self is None
                        else [a + m for a, m in zip(acc_self, smaps)])
            acc_cross = (cmaps if acc_cross is None
                         else [a + m for a, m in zip(acc_cross, cmaps)])
        n = max(self.start_step, 1)
        return (z, [a / n for a in (acc_self or [])],
                [a / n for a in (acc_cross or [])])

    # ---- attack -----------------------------------------------------------

    def _attack(self, svars, x, y, cond_ids, uncond_ids, label_pos):
        import optax

        B = x.shape[0]
        ctx_cond = self.text.apply(self.text_vars, cond_ids)
        ctx_uncond = self.text.apply(self.text_vars, uncond_ids)
        S = self.image_size
        x_sd = jax.image.resize(x, (B, S, S, x.shape[-1]), method="bilinear")
        x2 = x_sd * 2.0 - 1.0
        z0 = self.vae.apply(self.vae_vars, x2, method=SDVAE.encode)
        z0 = z0 * SD_VAE_SCALE
        latent0 = self._ddim_invert(z0, ctx_cond)
        _, base_self, _ = self._decode_with_attn(
            jax.lax.stop_gradient(latent0), ctx_cond, ctx_uncond)
        base_self = [jax.lax.stop_gradient(m) for m in base_self]
        # store only layers at ≤(res/16)² tokens (``diffattack.py:703``)
        if base_self:
            t_cap = max(m.shape[-1] for m in base_self)
            keep = [i for i, m in enumerate(base_self)
                    if m.shape[-1] <= max(t_cap // 4, 1)
                    or len(base_self) <= 2]
        else:
            keep = []
        onehot_pos = jax.nn.one_hot(label_pos, MAX_TOKENS)  # (B, 77)

        opt = optax.adamw(self.lr)
        opt_state = opt.init(latent0)

        def loss_fn(latent):
            z, smaps, cmaps = self._decode_with_attn(
                latent, ctx_cond, ctx_uncond)
            img = self.vae.apply(self.vae_vars, z / SD_VAE_SCALE,
                                 method=SDVAE.decode)
            img = jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)
            img_s = jax.image.resize(img, x.shape, method="bilinear")
            logits = self.surrogate.apply(svars, img_s)
            ce = softmax_cross_entropy(logits, y).mean()
            attack_loss = (ce if self.targeted else -ce) * self.attack_weight
            self_loss = 0.0
            if keep:
                for i in keep:
                    self_loss = self_loss + jnp.mean(
                        (smaps[i] - base_self[i]) ** 2)
                self_loss = self_loss / len(keep) * self.self_attn_weight
            cross_loss = 0.0
            if cmaps:
                # the label token's received cross-attention, flattened over
                # heads+queries: penalize its spatial variance
                # (``diffattack.py:264-282`` "disrupt" variance term)
                var = 0.0
                for m in cmaps:  # (B, h, N, 77)
                    col = jnp.einsum("bhnt,bt->bhn", m, onehot_pos)
                    var = var + jnp.var(col.reshape(B, -1), axis=-1).mean()
                cross_loss = var / len(cmaps) * self.cross_attn_weight
            recon = self.recon_weight * jnp.mean((img_s - x) ** 2)
            return attack_loss + self_loss + cross_loss + recon

        def body(carry, _):
            latent, s = carry
            g = jax.grad(loss_fn)(latent)
            updates, s = opt.update(g, s, latent)
            return (optax.apply_updates(latent, updates), s), None

        (latent, _), _ = jax.lax.scan(
            body, (latent0, opt_state), None, length=self.iterations)

        z, _, _ = self._decode_with_attn(latent, ctx_cond, ctx_uncond)
        img = self.vae.apply(self.vae_vars, z / SD_VAE_SCALE,
                             method=SDVAE.decode)
        img = jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)
        return jax.image.resize(img, x.shape, method="bilinear") - x

    def __call__(self, data, label, key=None, idx: int = 0):
        x = jnp.asarray(data)
        label = np.asarray(label)
        yv = label[:, 1] if (self.targeted and label.ndim == 2) else label
        cond, uncond, pos = self._prompt_ids(np.asarray(yv))
        if self._jitted is None:
            self._jitted = jax.jit(self._attack)
        return self._jitted(self.surrogate.variables, x, jnp.asarray(yv),
                            jnp.asarray(cond), jnp.asarray(uncond),
                            jnp.asarray(pos))
