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
    """Official args (``everywhere.py:36``): epoch=300, num_blocks=16, N=9;
    targeted with random_start."""

    def __init__(self, model_name="resnet50", epoch=300, eps=16 / 255, alpha=1.6 / 255,
                 num_blocks=16, N=9, targeted=True, random_start=True,
                 norm="linfty", loss="crossentropy", attack="everywhere", **kwargs):
        kwargs.pop("decay", None)
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=1.0,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.num_blocks = int(num_blocks)
        self.N = int(N)

    def _region_views(self, xadv, key):
        """N random grid regions upsampled to full resolution."""
        H, W = xadv.shape[1], xadv.shape[2]
        g = int(self.num_blocks**0.5)
        rh, rw = H // g, W // g
        keys = jax.random.split(key, self.N)
        views = []
        for k in keys:
            k1, k2 = jax.random.split(k)
            gi = jax.random.randint(k1, (), 0, g)
            gj = jax.random.randint(k2, (), 0, g)
            crop = jax.lax.dynamic_slice(
                xadv, (0, gi * rh, gj * rw, 0),
                (xadv.shape[0], rh, rw, xadv.shape[3]),
            )
            views.append(jax.image.resize(
                crop, xadv.shape, method="bilinear"
            ))
        return jnp.stack(views)

    def get_grad(self, variables, x, y, state: AttackState, key):
        def loss_fn(delta):
            xadv = x + delta
            views = self._region_views(xadv, key)
            allv = jnp.concatenate([xadv[None], views], axis=0)
            flat = allv.reshape((-1,) + x.shape[1:])
            logits = self.model.apply(variables, flat)
            yy = jnp.tile(y, allv.shape[0])
            ce = softmax_cross_entropy(logits, yy).mean()
            return -ce if self.targeted else ce

        return jax.grad(loss_fn)(state.delta), {}
