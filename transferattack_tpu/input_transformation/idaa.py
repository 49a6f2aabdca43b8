"""IDAA / EverywhereAttack (reference:
``transferattack/input_transformation/{idaa,everywhere}.py``, both targeted).

IDAA: num_scale transformed copies through a random augmentation pipeline
(flip/rotation/affine/erasing — a JAX-native subset of the reference's
kornia stack) with local mixup (random boxes swapped between copies), and
Adam-style (β1, β2) moment updates on the raw gradient.

Everywhere: splits the image into a block grid; each iteration maximizes the
target logit on several randomly-chosen region crops so the target class is
planted 'everywhere' (``everywhere.py:14-412``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState, softmax_cross_entropy
from ..ops import rotate_shear, translate_sep
from ..utils import img_max, img_min


def _random_augment(x, key, aug_p=1.0):
    B = x.shape[0]
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    # horizontal flip
    do_h = jax.random.bernoulli(k1, aug_p * 0.5)
    x = jnp.where(do_h, x[:, :, ::-1, :], x)
    # rotation ±15° — gather-free three-shear (see ops/image.py): the 2-D
    # warp's scatter-add backward was both the cost (~1 s/step, L2T probe)
    # and the trigger for the v5e bf16 runtime fault worked around below
    ang = jax.random.uniform(k2, (B,), minval=-15.0, maxval=15.0) * jnp.pi / 180
    x = rotate_shear(x, ang, max_angle=15.0 * jnp.pi / 180)
    # translation ±10% — exactly-separable gather-free form
    tx = jax.random.uniform(k3, (B,), minval=-0.1, maxval=0.1)
    ty = jax.random.uniform(k4, (B,), minval=-0.1, maxval=0.1)
    x = translate_sep(x, tx, ty, max_shift=12)
    # random erasing (fill 1, small box)
    H, W = x.shape[1], x.shape[2]
    eh = max(int(H * 0.15), 1)
    ew = max(int(W * 0.15), 1)
    top = jax.random.randint(k5, (), 0, H - eh)
    left = jax.random.randint(k6, (), 0, W - ew)
    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(W)[None, :]
    box = ((rows >= top) & (rows < top + eh) & (cols >= left) & (cols < left + ew))
    return jnp.where(box[None, :, :, None], 1.0, x)


def _local_mixup(copies, key, alpha=0.4, num=3):
    """Swap random boxes between consecutive copies (local mixup)."""
    n, B, H, W, C = copies.shape
    out = copies
    for i in range(num):
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, i), 3)
        lam = jax.random.beta(k1, alpha, alpha)
        cut = jnp.sqrt(1.0 - lam)
        ch = jnp.maximum((cut * H).astype(jnp.int32), 1)
        cw = jnp.maximum((cut * W).astype(jnp.int32), 1)
        top = jax.random.randint(k2, (), 0, H)
        left = jax.random.randint(k3, (), 0, W)
        rows = jnp.arange(H)[:, None]
        cols = jnp.arange(W)[None, :]
        box = ((rows >= top) & (rows < top + ch)
               & (cols >= left) & (cols < left + cw))
        partner = jnp.roll(out, 1, axis=0)
        out = jnp.where(box[None, None, :, :, None], partner, out)
    return out


class IDAA(Attack):
    """Official args (``idaa.py:57``): num_scale=10, mixup_num=3,
    mixup_alpha=0.4, crop_size=0.7, β1=0.99, β2=0.999; targeted."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, num_scale=10, gamma=0.1, mixup_num=3, mixup_alpha=0.4,
                 aug_p=1.0, targeted=True, random_start=False, norm="linfty",
                 loss="crossentropy", attack="IDAA", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.num_scale = int(num_scale)
        # two copies per sequential group: originally a workaround for a
        # v5e bf16 runtime fault in the fused warp backward (n·B ≥ 160
        # crashed); the gather-free warps removed the fault, but the
        # measured A/B keeps the chunking for performance — the single
        # fused n·B=320 ResNet-50 backward spills (3.72 img/s vs 15.48
        # chunked, round 3, BASELINE.md)
        self.logits_chunk = 2
        self.gamma = float(gamma)
        self.mixup_num = int(mixup_num)
        self.mixup_alpha = float(mixup_alpha)
        self.aug_p = float(aug_p)
        self.beta1, self.beta2 = 0.99, 0.999

    def init_extra(self, x, y):
        return {"m": jnp.zeros_like(x), "v": jnp.zeros_like(x)}

    def num_copies(self):
        return self.num_scale

    def transform(self, x, state: AttackState, key):
        keys = jax.random.split(key, self.num_scale)
        # vmap, not a Python loop: an unrolled loop repeats the two
        # grid_sample warps (8 gathers each) per copy in the HLO and blew
        # the TPU compile past 10 minutes at batch 32
        copies = jax.vmap(lambda k: _random_augment(x, k, self.aug_p))(keys)
        kmix = jax.random.fold_in(key, 999)
        return _local_mixup(copies, kmix, self.mixup_alpha, self.mixup_num)

    def step(self, variables, x, y, state: AttackState):
        key, sub = jax.random.split(state.key)
        grad, _ = self.get_grad(variables, x, y, state, sub)
        t = (state.step + 1).astype(x.dtype)
        m = self.beta1 * state.extra["m"] + (1 - self.beta1) * grad
        v = self.beta2 * state.extra["v"] + (1 - self.beta2) * grad * grad
        mh = m / (1 - self.beta1**t)
        vh = v / (1 - self.beta2**t)
        direction = mh / (jnp.sqrt(vh) + 1e-8)
        delta = jnp.clip(
            state.delta + self.alpha * jnp.sign(direction), -self.eps, self.eps
        )
        delta = jnp.clip(x + delta, img_min, img_max) - x
        return state.replace(delta=delta, key=key, step=state.step + 1,
                             extra={"m": m, "v": v})


class EverywhereAttack(Attack):
    """Everywhere attack — the reference's ``advanced_fgsm_every_memory``
    with ``attack_type='CDTM'`` (``everywhere.py:284-409``): each iteration
    attacks the whole image plus ``sample_num=4`` randomly-chosen 3×3-grid
    regions (region kept, elsewhere filled with the ImageNet channel mean),
    under CFM clean-feature mixup, resolution-preserving DI, a 5×5 TI
    kernel, and momentum, maximizing the summed target logit.

    Reference-exact pieces: the 3×3 mask layout incl. the ``H//3`` floor
    that leaves the last ``H%3`` rows/cols outside every mask
    (``everywhere.py:292-300``), mean-tensor fill (``:338``), clean features
    recorded once for the (9+1)·B combine batch with one iteration deducted
    (``consumed_iteration``, ``everywhere.py:341-363``), SelfShuffle mixup
    indexing — one batch permutation shared by all region groups, each adv
    group mixing with clean features of its *own* region kind
    (``everywhere.py:139-146``) — scalar per-layer mix prob 0.1, channelwise
    ratio U(0, 0.75), convex blending, DI margin 29 / p 0.7
    (``DI_keepresolution``), ``gkern(5, 3)`` TI, L1-sum momentum
    (``everywhere.py:394-397``), and the summed-logit loss (``LogitLoss``).
    Adapted (documented, same as CFM): torch hooks every conv/linear with
    spatial ≤ size/4 — here the mixup runs at our block-tap granularity.
    The reference's ``num_blocks``/``N`` constructor args are dead code in
    its own loop (3×3/4 are hardcoded); accepted here for signature parity.

    Official args (``everywhere.py:36``): epoch=300, eps=16/255,
    alpha=1.6/255; targeted (delta itself starts at zero —
    ``everywhere.py:306`` — despite the base-class random_start flag)."""

    def __init__(self, model_name="resnet50", epoch=300, eps=16 / 255, alpha=1.6 / 255,
                 num_blocks=16, N=9, sample_num=4, mix_prob=0.1, mix_upper=0.75,
                 layers=("layer2", "layer3", "layer4"), kernel_size=5,
                 di_margin=29, di_prob=0.7, targeted=True, random_start=False,
                 norm="linfty", loss="crossentropy", attack="everywhere", **kwargs):
        kwargs.pop("decay", None)
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=1.0,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        from ..ops import gaussian_kernel

        self.num_blocks = int(num_blocks)
        self.N = int(N)
        self.sample_num = int(sample_num)
        self.mix_prob = float(mix_prob)
        self.mix_upper = float(mix_upper)
        self.layers = tuple(layers)
        self.kernel = gaussian_kernel(int(kernel_size))
        self.di_margin = int(di_margin)
        self.di_prob = float(di_prob)
        # the first iteration is consumed recording clean features
        # ("Deduct 1 iteration ... for strictly fair comparisons",
        # everywhere.py:363); the recording itself runs before the scan
        self.epoch = max(self.epoch - 1, 1)

    _MEAN = (0.485, 0.456, 0.406)

    def _masks(self, H: int, W: int):
        import numpy as np

        hb, wb = H // 3, W // 3
        m = np.zeros((9, H, W, 1), np.float32)
        for i in range(9):
            up, left = (i // 3) * hb, (i % 3) * wb
            m[i, up:min(up + hb, H), left:min(left + wb, W)] = 1.0
        return jnp.asarray(m)

    def num_copies(self):
        return self.sample_num + 1

    def _record_clean(self, variables, x):
        """Clean features of [whole; 9 masked] · B at every mix layer —
        the reference's feature-recording forward (``everywhere.py:341-360``),
        run once per batch before the scan and carried in ``extra``."""
        B, H, W, _ = x.shape
        masks = self._masks(H, W)[:, None]  # (9, 1, H, W, 1)
        mean = jnp.asarray(self._MEAN, x.dtype)
        combine = jnp.concatenate(
            [x[None], masks * x[None] + (1.0 - masks) * mean], axis=0)
        flat = combine.reshape((-1,) + x.shape[1:])
        store = self.compute_dtype or jnp.float32
        clean = {}
        for layer in self.layers:
            _, f = self.model.feature(variables, flat, layer)
            clean[f"clean_{layer}"] = jax.lax.stop_gradient(
                f.reshape((10, B) + f.shape[1:]).astype(store))
        return clean

    def run(self, variables, x, y, key):
        state0 = self.init_state(x, y, key)
        state0 = state0.replace(
            extra={**state0.extra, **self._record_clean(variables, x)})

        def body(state, _):
            return self.step(variables, x, y, state), None

        state, _ = jax.lax.scan(body, state0, None, length=self.epoch)
        return self.finalize(state, x, y)

    def post_grad(self, grad, state: AttackState):
        from ..ops import smooth_conv

        return smooth_conv(grad, self.kernel)

    def get_momentum(self, grad, momentum):
        # L1-*sum* normalization (everywhere.py:395 divides by sum, not the
        # base class's mean; same sign trajectory, kept for faithfulness)
        denom = jnp.sum(jnp.abs(grad), axis=(1, 2, 3), keepdims=True)
        return momentum * self.decay + grad / (denom + 1e-12)

    def get_grad(self, variables, x, y, state: AttackState, key):
        from ..advanced_objective.cfm import di_keepresolution
        from ..models import tap_key

        B, H, W, _ = x.shape
        n = self.sample_num + 1
        ksel, kperm, kdi, kmix = jax.random.split(key, 4)
        masks = self._masks(H, W)
        sel = jax.random.permutation(ksel, 9)[: self.sample_num]
        perm = jax.random.permutation(kperm, B)
        groups = jnp.concatenate(
            [jnp.zeros((1,), sel.dtype), sel + 1])  # clean-feature group ids
        mean = jnp.asarray(self._MEAN, x.dtype)

        taps = {}
        for i, layer in enumerate(self.layers):
            kl = jax.random.fold_in(kmix, i)
            clean = state.extra[f"clean_{layer}"]  # (10, B, h, w, c)

            def tap(feat, clean=clean, kl=kl):
                ka, kb = jax.random.split(kl)
                fb = feat.reshape((n, B) + feat.shape[1:])
                prev = clean[groups][:, perm].astype(fb.dtype)
                ratio = jax.random.uniform(
                    kb, (n, B, 1, 1, fb.shape[-1]), fb.dtype,
                    maxval=self.mix_upper)
                mixed = (1.0 - ratio) * fb + ratio * prev
                do = jax.random.bernoulli(ka, self.mix_prob)  # scalar/layer
                return jnp.where(do, mixed, fb).reshape(feat.shape)

            taps[tap_key(layer)] = tap

        def loss_fn(delta):
            xadv = x + delta
            sel_m = masks[sel][:, None]  # (4, 1, H, W, 1)
            views = sel_m * xadv[None] + (1.0 - sel_m) * mean
            allv = jnp.concatenate([xadv[None], views], axis=0)
            flat = allv.reshape((-1,) + x.shape[1:])
            flat = di_keepresolution(flat, kdi, self.di_margin, self.di_prob)
            logits = self.model.apply(variables, flat, tap_fns=taps)
            picked = jnp.take_along_axis(
                logits, jnp.tile(y, n)[:, None], axis=-1)
            total = picked.sum()
            return total if self.targeted else -total

        return jax.grad(loss_fn)(state.delta), {}
