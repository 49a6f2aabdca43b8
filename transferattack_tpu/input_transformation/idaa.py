"""IDAA / EverywhereAttack (reference:
``transferattack/input_transformation/{idaa,everywhere}.py``, both targeted).

IDAA (``idaa.py:21-204``): the perturbation is *tanh-parameterized* — an
unbounded ``w`` is squashed into the per-pixel box
``[-min(x, eps), min(1-x, eps)]`` so both the eps ball and the [0,1] image
bounds hold by construction — and optimized by Adam *descent* (no sign, no
bias correction) on ``CE(target) − γ·CE(source)``.  Each iteration the
shared ``w`` is replicated into num_scale+1 copies; every flattened copy
index gets ONE augmentation from a fixed op list (``op[k % len]`` cycling,
``idaa.py:190-195``), then local mixup swaps random boxes across the whole
flattened batch; per-copy gradients are L1-mean-normalized *before* the
copy average (``idaa.py:198-202``).

Everywhere (``everywhere.py:284-409``): see :class:`EverywhereAttack`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState, softmax_cross_entropy
from ..ops import rotate_shear, translate_sep
from ..utils import img_max, img_min


def _op_hflip(seg, key):
    return seg[:, :, ::-1, :]


def _perspective_field(d, H, W):
    """kornia RandomPerspective sampling field (``idaa.py:81``): end corners
    = base + U(0, scale)·inward; ``warp_perspective`` inverts M internally,
    so the output samples src at M⁻¹·p — out(end_i) = src(base_i), content
    moves INWARD.  M⁻¹ is the homography mapping end→base, solved directly
    by the generalized DLT."""
    from ..ops.image import homography_field

    S = d.shape[0]
    base = jnp.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]],
                     jnp.float32)
    inward = jnp.array([[1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0], [1.0, -1.0]],
                       jnp.float32)
    end = base[None] + inward[None] * d
    return homography_field(jnp.broadcast_to(base, (S, 4, 2)), H, W,
                            dst_corners=end)


def _op_perspective(seg, key, scale=0.5):
    """RandomPerspective(0.5) (``idaa.py:81``), kornia direction (content
    inward; the inverse map pushes corner sources outward by up to
    d/(1−d) ≈ 1.0 normalized at scale 0.5, hence the wide clamp window).
    Deviations from kornia, documented: bilinear separable resampling
    instead of 'nearest' grid_sample, and edge-clamp instead of zeros
    padding at the outward-sampling corners (gather-free TPU warps —
    scatter backwards fault the v5e worker, BASELINE.md round 3)."""
    S, H, W, _ = seg.shape
    from ..ops.image import warp_field_sep

    d = jax.random.uniform(key, (S, 4, 2), minval=0.0, maxval=scale)
    dx, dy = _perspective_field(d, H, W)
    frac = scale / (1.0 - scale)
    M = int(frac * W / 2) + 2
    return warp_field_sep(seg, dx, dy, M, int(frac * H / 2) + 2)


def _op_rotation(seg, key):
    S = seg.shape[0]
    ang = jax.random.uniform(key, (S,), minval=-15.0, maxval=15.0)
    return rotate_shear(seg, ang * jnp.pi / 180,
                        max_angle=15.5 * jnp.pi / 180)


def _op_vflip(seg, key):
    do_v = jax.random.bernoulli(key, 0.6, (seg.shape[0], 1, 1, 1))
    return jnp.where(do_v, seg[:, ::-1, :, :], seg)


def _op_tps(seg, key, scale=0.3):
    """RandomThinPlateSpline(0.3) (``idaa.py:84``): 3×3 control grid
    displaced by U(−scale, scale); exact TPS field (static control points →
    compile-time system inverse), separable field warp."""
    from ..ops.image import tps_field, warp_field_sep

    S, H, W, _ = seg.shape
    off = jax.random.uniform(key, (S, 9, 2), minval=-scale, maxval=scale)
    dx, dy = tps_field(off, H, W)
    # TPS can overshoot the control offsets between knots; 1.5× margin
    M = int(1.5 * scale * W / 2) + 2
    return warp_field_sep(seg, dx, dy, M, int(1.5 * scale * H / 2) + 2)


def _op_resize(seg, key):
    # per-image scale (the reference's RandomResize sees each image in its
    # own batch of 1, so scales are independent)
    S, H, W, _ = seg.shape
    s = jax.random.uniform(key, (S,), minval=0.9, maxval=1.0)
    return jax.vmap(
        lambda img, si: jax.image.scale_and_translate(
            img[None], (1, H, W, img.shape[-1]), (1, 2), jnp.stack([si, si]),
            jnp.stack([H * (1 - si) / 2, W * (1 - si) / 2]),
            method="linear")[0])(seg, s)


def _op_affine(seg, key):
    """RandomAffine((-1, 5)°, translate=(0.3, 1.0), scale=(0.4, 1.3),
    shear=0.5 (``idaa.py:85-86``)): content sheared, rotated + scaled about
    the center, then translated — kornia's ``get_affine_matrix2d``
    composition order.  Documented deviations (gather-free TPU warps):
    the vertical translate draw is clamped to ±0.3·H (the reference's
    ±1.0·H reflection-padded translate throws most content out of frame
    and would cost an O(H) window per shift pass), padding is zeros, and
    resampling is separable linear rather than 'nearest'."""
    from ..ops.image import shift_interp

    S, H, W, _ = seg.shape
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    ang = jax.random.uniform(k1, (S,), minval=-1.0, maxval=5.0)
    sc = jax.random.uniform(k2, (S,), minval=0.4, maxval=1.3)
    shear = jax.random.uniform(k3, (S,), minval=-0.5, maxval=0.5)
    tx = jax.random.uniform(k4, (S,), minval=-0.3, maxval=0.3)
    ty = jnp.clip(
        jax.random.uniform(k5, (S,), minval=-1.0, maxval=1.0), -0.3, 0.3
    )

    # 1. x-shear about the center: src_x = x − tan(sh)·y_c (≤1 px at 0.5°)
    y_c = jnp.arange(H, dtype=seg.dtype) - (H - 1) / 2.0
    dxs = -jnp.tan(shear * jnp.pi / 180)[:, None, None] * y_c[None, :, None]
    out = shift_interp(seg, dxs, 2, max(int(0.01 * H), 1) + 2)

    # 2. scale about the center (exact linear resample, gather-free)
    out = jax.vmap(
        lambda img, si: jax.image.scale_and_translate(
            img[None], (1, H, W, img.shape[-1]), (1, 2), jnp.stack([si, si]),
            jnp.stack([H * (1 - si) / 2, W * (1 - si) / 2]),
            method="linear")[0])(out, sc)

    # 3. rotation
    out = rotate_shear(out, ang * jnp.pi / 180, max_angle=5.5 * jnp.pi / 180)

    # 4. translate: kornia fractions are of the FULL side (±0.3·W px =
    # ±0.6 in half-side units)
    return translate_sep(out, -2.0 * tx, -2.0 * ty,
                         max_shift=int(0.3 * W) + 2)


def _op_erase(seg, key):
    S, H, W, _ = seg.shape
    k1, k2, k3 = jax.random.split(key, 3)
    area = jax.random.uniform(k1, (S, 1, 1), minval=0.01, maxval=0.04) * H * W
    ratio = jax.random.uniform(k2, (S, 1, 1), minval=0.3, maxval=1.0)
    eh, ew = jnp.sqrt(area * ratio), jnp.sqrt(area / ratio)
    u = jax.random.uniform(k3, (2, S, 1, 1))
    top, left = u[0] * (H - eh), u[1] * (W - ew)
    rows = jnp.arange(H, dtype=seg.dtype)[None, :, None]
    cols = jnp.arange(W, dtype=seg.dtype)[None, None, :]
    box = ((rows >= top) & (rows < top + eh)
           & (cols >= left) & (cols < left + ew))
    return jnp.where(box[..., None], 1.0, seg)


def _op_elastic(seg, key):
    """RandomElasticTransform((27,27), (33,31), (0.1,1.0)) (``idaa.py:88``):
    U(−1,1) noise, 27-tap gaussian blur (σ 33/31 ≈ box), scaled by
    α = (0.1, 1.0) in normalized units, applied as a per-pixel field."""
    from ..ops.image import gaussian_blur_sep, warp_field_sep

    S, H, W, _ = seg.shape
    noise = jax.random.uniform(key, (S, H, W, 2), minval=-1.0, maxval=1.0)
    disp = gaussian_blur_sep(noise, 27, 33.0, 31.0)
    dx = disp[..., 0] * 0.1 * (W / 2.0)
    dy = disp[..., 1] * 1.0 * (H / 2.0)
    # post-blur amplitude ≪ 1; clamp window sized to the realistic tail
    return warp_field_sep(seg, dx, dy, max(int(0.02 * W), 2) + 2,
                          max(int(0.15 * H), 2) + 2)


def _fisheye_field(cx, cy, g, H, W):
    """kornia RandomFisheye sampling field (``idaa.py:89``): barrel
    distortion ``src = p + (p−c)·γ·r²`` on the normalized grid; (cx, cy, g)
    are (S,) draws.  Returns (dx, dy) in pixels."""
    from ..ops.image import _norm_grid

    cx = cx.reshape(-1, 1, 1)
    cy = cy.reshape(-1, 1, 1)
    g = g.reshape(-1, 1, 1)
    gy, gx = _norm_grid(H, W)
    rx, ry = gx[None] - cx, gy[None] - cy
    r2 = rx * rx + ry * ry
    return rx * g * r2 * (W / 2.0), ry * g * r2 * (H / 2.0)


def _op_fisheye(seg, key):
    """RandomFisheye(±0.3 center, γ∈[0.9,1.0]) (``idaa.py:89``); the outer
    ring whose sources fall beyond the clamp window samples outside the
    image and is zeroed (``zero_beyond``)."""
    from ..ops.image import warp_field_sep

    S, H, W, _ = seg.shape
    k1, k2, k3 = jax.random.split(key, 3)
    cx = jax.random.uniform(k1, (S,), minval=-0.3, maxval=0.3)
    cy = jax.random.uniform(k2, (S,), minval=-0.3, maxval=0.3)
    g = jax.random.uniform(k3, (S,), minval=0.9, maxval=1.0)
    dx, dy = _fisheye_field(cx, cy, g, H, W)
    M = int(0.4 * W) + 2
    return warp_field_sep(seg, dx, dy, M, int(0.4 * H) + 2, zero_beyond=True)


_IDAA_OPS = (_op_hflip, _op_perspective, _op_rotation, _op_vflip, _op_tps,
             _op_resize, _op_affine, _op_erase, _op_elastic, _op_fisheye)


def _op_cycle(flat, key, aug_p=1.0):
    """Assign each flattened image one op from the reference's ten-op
    kornia list in order (``idaa.py:79-90``: hflip, perspective, rotation
    ±15°, vflip p=0.6, thin-plate-spline, resize [0.9,1], affine, erasing,
    elastic, fisheye — all ten implemented gather-free since round 4; the
    2-D warps ride :func:`warp_field_sep`'s separable per-pixel shifts).

    Adaptation (documented): the reference assigns ``op[k % 10]`` over the
    flattened copies·batch axis; here ops own *contiguous* blocks of the
    same sizes, so each op runs once on a static slice — no masked
    execute-all-branches, no gather to reassemble.  The per-image op
    multiset across copies is equivalent up to block-boundary placement,
    and each image still sees ~all ops across its num_scale+1 copies."""
    N = flat.shape[0]
    n_ops = len(_IDAA_OPS)
    bounds = [round(j * N / n_ops) for j in range(n_ops + 1)]
    ks = jax.random.split(key, n_ops)
    outs = []
    for j, op in enumerate(_IDAA_OPS):
        seg = flat[bounds[j]:bounds[j + 1]]
        if seg.shape[0] == 0:
            continue
        outs.append(op(seg, ks[j]))
    out = jnp.concatenate(outs, axis=0)
    if aug_p < 1.0:
        gate = jax.random.bernoulli(
            jax.random.fold_in(key, 77), aug_p, (N, 1, 1, 1))
        out = jnp.where(gate, out, flat)
    return out


def _local_mix(flat, key, alpha=0.4, num=3, crop_size=0.7):
    """Local mixup over the flattened copies·batch axis
    (``idaa.py:110-123``): ``num`` rounds; each round permutes the batch
    and blends, per image, a random ``crop_size``-scaled center-clipped box
    with weight ``lam = max(Beta(α,α), 1−Beta)``.  Adaptations (documented):
    the box content comes from the *same* location in the partner (the
    reference samples an equal-size source box elsewhere) and rounds update
    batch-synchronously rather than image-sequentially within a round."""
    N, H, W, _ = flat.shape
    cut_h, cut_w = int(H * crop_size) // 2, int(W * crop_size) // 2
    rows = jnp.arange(H)[None, :, None]
    cols = jnp.arange(W)[None, None, :]
    out = flat
    for i in range(num):
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, i), 3)
        lam = jax.random.beta(k1, alpha, alpha, (N, 1, 1, 1))
        lam = jnp.maximum(lam, 1.0 - lam)
        perm = jax.random.permutation(k3, N)
        c = jax.random.randint(k2, (2, N, 1, 1), 0,
                               jnp.array([H, W]).reshape(2, 1, 1, 1))
        box = ((rows >= c[0] - cut_h) & (rows < c[0] + cut_h)
               & (cols >= c[1] - cut_w) & (cols < c[1] + cut_w))
        mixed = lam * out + (1.0 - lam) * out[perm]
        out = jnp.where(box[..., None], mixed, out)
    return out


class IDAA(Attack):
    """Official args (``idaa.py:65``): alpha=1 (w-space Adam step),
    num_scale=10, gamma=0.1, mixup_num=3, mixup_alpha=0.4, crop_size=0.7,
    β1=0.99, β2=0.999; targeted; delta init ~ N(0,1) in w space."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.0,
                 decay=1.0, num_scale=10, gamma=0.1, mixup_num=3, mixup_alpha=0.4,
                 crop_size=0.7, aug_p=1.0, targeted=True, random_start=False,
                 norm="linfty", loss="crossentropy", attack="IDAA", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.num_scale = int(num_scale)
        # two copies per sequential group: originally a workaround for a
        # v5e bf16 runtime fault in the fused warp backward (n·B ≥ 160
        # crashed); the gather-free warps removed the fault, but the
        # measured A/B keeps the chunking for performance — the single
        # fused n·B=320 ResNet-50 backward spills (3.72 img/s vs 15.48
        # chunked, round 3, BASELINE.md).  The default n = num_scale+1 = 11
        # is odd; get_logits handles the remainder as one extra group
        # (5x2 + 1), so chunking stays active off the even path too.
        self.logits_chunk = 2
        self.gamma = float(gamma)
        self.mixup_num = int(mixup_num)
        self.mixup_alpha = float(mixup_alpha)
        self.crop_size = float(crop_size)
        self.aug_p = float(aug_p)
        self.beta1, self.beta2 = 0.99, 0.999

    def prepare_labels(self, label):
        # keep the (source, target) pair: the targeted loss consumes BOTH
        # columns (CE(tgt) − γ·CE(src), ``idaa.py:125-131``)
        return jnp.asarray(label)

    def init_delta(self, x, key):
        # delta slot holds the unbounded tanh parameter w, init ~ N(0, 1)
        # (``init_delta_and_normal_distribute``, ``idaa.py:148-151``)
        return jax.random.normal(key, x.shape, x.dtype)

    def init_extra(self, x, y):
        return {"m": jnp.zeros_like(x), "v": jnp.zeros_like(x)}

    def num_copies(self):
        return self.num_scale + 1

    def _bounds(self, x):
        # forward unpacks get_bound's (lower, upper) as ``ub, lb = ...``
        # (``idaa.py:176``), inverting the tanh orientation; reproduced
        # exactly — the span is still the full valid box
        ub = -jnp.minimum(x, self.eps)
        lb = jnp.minimum(img_max - x, self.eps)
        return lb, ub

    def _pert(self, w, lb, ub):
        return lb + (ub - lb) * (jnp.tanh(w) / 2 + 0.5)

    def step(self, variables, x, y, state: AttackState):
        key, sub = jax.random.split(state.key)
        tkey, mkey = jax.random.split(sub)
        n = self.num_scale + 1
        B = x.shape[0]
        lb, ub = self._bounds(x)
        if self.targeted:
            y_src, y_tgt = y[:, 0], y[:, 1]
        else:
            y_src = y_tgt = y

        def loss_fn(ws):  # (n, B, H, W, C) — replicated w, per-copy grads
            r = self._pert(ws, lb, ub)
            flat = (x[None] + r).reshape((n * B,) + x.shape[1:])
            flat = _op_cycle(flat, tkey, self.aug_p)
            flat = _local_mix(flat, mkey, self.mixup_alpha, self.mixup_num,
                              self.crop_size)
            logits = self.get_logits(
                variables, flat.reshape((n, B) + x.shape[1:]))
            lf = logits.reshape((n * B, -1))
            ce_t = softmax_cross_entropy(lf, jnp.tile(y_tgt, n)).mean()
            if self.targeted:
                ce_s = softmax_cross_entropy(lf, jnp.tile(y_src, n)).mean()
                return ce_t - self.gamma * ce_s
            return ce_t

        ws = jnp.broadcast_to(state.delta, (n,) + state.delta.shape)
        g = jax.grad(loss_fn)(ws)
        # per-(copy, image) L1-mean normalization BEFORE the copy average
        gn = jnp.mean(jnp.abs(g), axis=(2, 3, 4), keepdims=True)
        grad = (g / (gn + 1e-8)).mean(0)
        m = self.beta1 * state.extra["m"] + (1 - self.beta1) * grad
        v = self.beta2 * state.extra["v"] + (1 - self.beta2) * grad * grad
        # descent, no sign, no bias correction (``update_delta``, idaa.py:141)
        w = state.delta - self.alpha * m / (jnp.sqrt(v) + 1e-8)
        return state.replace(delta=w, key=key, step=state.step + 1,
                             extra={"m": m, "v": v})

    def finalize(self, state: AttackState, x, y):
        lb, ub = self._bounds(x)
        return self._pert(state.delta, lb, ub)


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
    indexing — a fresh batch permutation per tapped layer (the reference
    hook draws ``torch.randperm`` per hooked layer, ``everywhere.py:139``),
    shared across region groups within a layer, each adv group mixing with
    clean features of its *own* region kind
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

    # --- RNG seams (overridable for paired-bank parity twins) -----------
    def region_select(self, key, step):
        return jax.random.permutation(key, 9)[: self.sample_num]

    def layer_perm(self, key, i, B, step):
        return jax.random.permutation(jax.random.fold_in(key, i), B)

    def mix_draws(self, key, i, n, B, C, dtype, step):
        ka, kb = jax.random.split(jax.random.fold_in(key, i))
        do = jax.random.bernoulli(ka, self.mix_prob)  # scalar per layer
        ratio = jax.random.uniform(kb, (n, B, 1, 1, C), dtype,
                                   maxval=self.mix_upper)
        return do, ratio

    def di(self, flat, key, step):
        from ..advanced_objective.cfm import di_keepresolution

        return di_keepresolution(flat, key, self.di_margin, self.di_prob)

    def get_grad(self, variables, x, y, state: AttackState, key):
        from ..models import tap_key

        B, H, W, _ = x.shape
        n = self.sample_num + 1
        ksel, kperm, kdi, kmix = jax.random.split(key, 4)
        masks = self._masks(H, W)
        sel = self.region_select(ksel, state.step)
        groups = jnp.concatenate(
            [jnp.zeros((1,), sel.dtype), sel + 1])  # clean-feature group ids
        mean = jnp.asarray(self._MEAN, x.dtype)

        taps = {}
        for i, layer in enumerate(self.layers):
            clean = state.extra[f"clean_{layer}"]  # (10, B, h, w, c)
            # fresh batch permutation per tapped layer — the reference hook
            # draws torch.randperm per hooked layer per forward
            # (everywhere.py:139); granularity adaptation: per block-tap
            # layer here vs per hooked conv/linear there
            perm_i = self.layer_perm(kperm, i, B, state.step)
            do_i, ratio_i = self.mix_draws(
                kmix, i, n, B, clean.shape[-1], x.dtype, state.step)

            def tap(feat, clean=clean, perm=perm_i, do=do_i, ratio=ratio_i):
                fb = feat.reshape((n, B) + feat.shape[1:])
                prev = clean[groups][:, perm].astype(fb.dtype)
                mixed = (1.0 - ratio.astype(fb.dtype)) * fb \
                    + ratio.astype(fb.dtype) * prev
                return jnp.where(do, mixed, fb).reshape(feat.shape)

            taps[tap_key(layer)] = tap

        def loss_fn(delta):
            xadv = x + delta
            sel_m = masks[sel][:, None]  # (4, 1, H, W, 1)
            views = sel_m * xadv[None] + (1.0 - sel_m) * mean
            allv = jnp.concatenate([xadv[None], views], axis=0)
            flat = allv.reshape((-1,) + x.shape[1:])
            flat = self.di(flat, kdi, state.step)
            logits = self.model.apply(variables, flat, tap_fns=taps)
            picked = jnp.take_along_axis(
                logits, jnp.tile(y, n)[:, None], axis=-1)
            total = picked.sum()
            return total if self.targeted else -total

        return jax.grad(loss_fn)(state.delta), {}
