"""ResNet / ResNeXt family in Flax linen, NHWC.

Structure and naming mirror torchvision's ResNet so that a PyTorch
``state_dict`` converts mechanically (``layer1.0.conv1.weight`` →
``params/layer1_0/conv1/kernel`` with OIHW→HWIO transpose); see
``transferattack_tpu/utils/convert.py``.  Referenced by the reference's
surrogate loader at ``transferattack/attack.py:51-60``.

TPU notes: convolutions stay NHWC so XLA tiles them straight onto the MXU;
BatchNorm runs in inference mode (folded scale/bias — XLA fuses it into the
preceding conv).

Gradient-surgery knobs (used by model_related attacks):

* ``gamma``     — SGM backward ReLU scaling (``model_related/sgm.py:47-97``):
                  implemented as a ``jax.custom_vjp`` ReLU on residual branches.
* ``softplus_beta`` — IAA's ReLU→Softplus swap (``model_related/iaa.py``).
* ``residual_scale`` — IAA's residual-branch downweighting.
* ``skip_drop`` — ghost networks' per-forward dropout on skip connections
                  (``model_related/ghost_networks/resnet.py:64-177``); draws
                  from the ``'ghost'`` RNG collection when > 0.
* ``linbp_start`` — LinBP (``model_related/linbp.py``): from this block index
                  on, ReLU backward passes gradients straight through.
"""
from __future__ import annotations

import functools
import os
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import register_model

# perf experiment toggles (read once at import; see BASELINE.md perf notes)
_RELU_IMPL = os.environ.get("TA_TPU_RELU", "plain")
_MAXPOOL_IMPL = os.environ.get("TA_TPU_MAXPOOL", "fused")


@jax.custom_vjp
def mask_relu(x):
    """ReLU that saves its backward mask as a same-dtype 0/1 tensor and
    multiplies, instead of letting XLA bitpack a PRED mask and re-expand it
    in the backward (the convert/reduce machinery in the bench profile)."""
    return jax.nn.relu(x)


def _mask_relu_fwd(x):
    return jax.nn.relu(x), (x > 0).astype(x.dtype)


def _mask_relu_bwd(mask, g):
    return (g * mask,)


mask_relu.defvjp(_mask_relu_fwd, _mask_relu_bwd)


def plain_relu(x):
    return mask_relu(x) if _RELU_IMPL == "mask" else jax.nn.relu(x)


_BN_IMPL = os.environ.get("TA_TPU_BN", "bn")


class FoldedBN(nn.Module):
    """Bias-only stand-in for an inference-mode BatchNorm whose scale has
    been folded into the preceding conv kernel (``fold_bn_variables``).

    The multiply by ``scale·rsqrt(var+eps)`` cannot be eliminated by XLA
    because the parameters are runtime arguments, so with the stock
    BatchNorm every backward pass pays a full-tensor multiply between each
    transposed conv and its ReLU mask; folding moves it into the conv
    weights once at load time."""

    @nn.compact
    def __call__(self, x):
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return x + b.astype(x.dtype)


def fold_bn_variables(variables, eps: float = 1e-5):
    """Fold every conv→BN pair's scale into the conv kernel (exact rewrite).

    Returns a new variables tree: ``kernel *= scale·rsqrt(var+eps)`` per
    output channel, ``bias ← bias − mean·scale·rsqrt(var+eps)``, and the BN
    stats neutralized (scale=1, mean=0, var=1−eps) so the tree stays valid
    for the stock module too.  Pairs are matched by name within each module
    dict (``bnN`` ↔ ``convN``, ``downsample_bn`` ↔ ``downsample_conv``)."""
    import flax

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables.get("batch_stats", {}))

    def walk(p, s):
        for k, v in list(p.items()):
            if isinstance(v, dict):
                walk(v, s.get(k, {}) if isinstance(s, dict) else {})
        for bnk in list(p.keys()):
            if bnk.startswith("bn"):
                convk = "conv" + bnk[2:]
            elif bnk == "downsample_bn":
                convk = "downsample_conv"
            else:
                continue
            bn_p, bn_s = p.get(bnk), s.get(bnk) if isinstance(s, dict) else None
            if (not isinstance(bn_p, dict) or "scale" not in bn_p
                    or bn_s is None or convk not in p):
                continue
            mult = bn_p["scale"] / jnp.sqrt(bn_s["var"] + eps)
            p[convk]["kernel"] = p[convk]["kernel"] * mult
            bn_p["bias"] = bn_p["bias"] - bn_s["mean"] * mult
            bn_p["scale"] = jnp.ones_like(bn_p["scale"])
            bn_s["mean"] = jnp.zeros_like(bn_s["mean"])
            bn_s["var"] = jnp.full_like(bn_s["var"], 1.0 - eps)

    walk(params, stats)
    out = dict(variables)
    out["params"] = params
    if stats:
        out["batch_stats"] = stats
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def scaled_grad_relu(x, gamma):
    return jax.nn.relu(x)


def _sgr_fwd(x, gamma):
    return jax.nn.relu(x), x


def _sgr_bwd(gamma, x, g):
    # SGM: backward mask scaled by gamma (gamma=1 → plain ReLU grad)
    return (g * jnp.where(x > 0, 1.0, 0.0).astype(g.dtype) * gamma,)


scaled_grad_relu.defvjp(_sgr_fwd, _sgr_bwd)


@jax.custom_vjp
def linbp_relu(x):
    """ReLU forward, identity backward (LinBP, ``model_related/linbp.py:158-161``:
    ``x + relu(-x).detach()``)."""
    return jax.nn.relu(x)


linbp_relu.defvjp(lambda x: (jax.nn.relu(x), None), lambda _, g: (g,))


@jax.custom_vjp
def std_norm_relu(x):
    """ReLU whose backward divides the (masked) gradient by its global std.

    The reference SGM registers ``backward_hook_norm`` on every residual
    block (``model_related/sgm.py:58-64,83-84``); with PyTorch's legacy
    module-hook semantics that hook lands on the block's final post-add ReLU
    node, so the gradient leaving each block is ``g·mask / std(g·mask)``
    (the γ hook on the same node cancels inside the std).  ``torch.std``
    is unbiased over all elements, batch included.
    """
    return jax.nn.relu(x)


def _stdnr_fwd(x):
    return jax.nn.relu(x), x


def _stdnr_bwd(x, g):
    v = g * (x > 0).astype(g.dtype)
    n = v.size
    mean = jnp.mean(v)
    var = jnp.sum((v - mean) ** 2) / max(n - 1, 1)
    return (v / jnp.sqrt(var + 1e-30),)


std_norm_relu.defvjp(_stdnr_fwd, _stdnr_bwd)


@jax.custom_vjp
def relu_silu(x):
    """ReLU forward, SiLU-derivative backward (BPA, ``model_related/bpa.py:109-136``)."""
    return jax.nn.relu(x)


def _rs_fwd(x):
    return jax.nn.relu(x), x


def _rs_bwd(x, g):
    s = jax.nn.sigmoid(x)
    return (g * (x * s * (1 - s) + s),)


relu_silu.defvjp(_rs_fwd, _rs_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def softmax_maxpool(x, temperature):
    """3×3/2 'same' max pool whose backward distributes the gradient by a
    softmax over each window (BPA, ``model_related/bpa.py:67-106``).
    NHWC input."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    return jax.lax.reduce_window(
        xp, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _extract_patches(x):
    """(B, Ho, Wo, 9, C) 3×3/2 window patches of an NHWC array."""
    B, H, W, C = x.shape
    patches = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, Ho, Wo, C*9) with channel-major grouping
    Ho, Wo = patches.shape[1], patches.shape[2]
    return patches.reshape(B, Ho, Wo, C, 9).transpose(0, 1, 2, 4, 3)


def _smp_fwd(x, temperature):
    return softmax_maxpool(x, temperature), x


def _smp_bwd(temperature, x, g):
    def patches_sum(inp):
        return _extract_patches(inp)

    patches, unfold_vjp = jax.vjp(patches_sum, x)
    weights = jax.nn.softmax(temperature * patches, axis=3)
    grad_patches = weights * g[:, :, :, None, :]
    (grad_x,) = unfold_vjp(grad_patches)
    return (grad_x,)


softmax_maxpool.defvjp(_smp_fwd, _smp_bwd)


def conv(features, kernel, stride=1, groups=1, name=None):
    pad = kernel // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        use_bias=False,
        feature_group_count=groups,
        name=name,
    )


def bn(name):
    if _BN_IMPL == "folded":
        return FoldedBN(name=name)
    return nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5, name=name)


class SurgeryConfig:
    """Immutable bag of gradient-surgery settings shared by block modules."""

    def __init__(
        self,
        gamma: float = 1.0,
        softplus_beta: Optional[float] = None,
        residual_scale=1.0,
        skip_drop: float = 0.0,
        linbp_start: int = 10**9,
        ghost_range: float = 0.0,
        bpa_start: int = 10**9,
        bpa_maxpool: bool = False,
        bpa_temperature: float = 10.0,
    ):
        self.gamma = gamma
        self.softplus_beta = softplus_beta
        # scalar, or a 4-tuple of per-stage scales (IAA, ``iaa.py:34-38``)
        self.residual_scale = residual_scale
        self.skip_drop = skip_drop
        self.linbp_start = linbp_start
        # ghost networks: identity scaled per-channel by U(1±range)
        # (``ghost_networks/resnet.py:110``)
        self.ghost_range = ghost_range
        # BPA: SiLU-derivative ReLU backward from this block index on, and a
        # softmax-backward stem maxpool (``bpa.py:40-50``)
        self.bpa_start = bpa_start
        self.bpa_maxpool = bpa_maxpool
        self.bpa_temperature = bpa_temperature

    def stage_scale(self, stage_index: int) -> float:
        if isinstance(self.residual_scale, (tuple, list)):
            return self.residual_scale[stage_index]
        return self.residual_scale

    def key(self):
        rs = self.residual_scale
        return (
            self.gamma,
            self.softplus_beta,
            tuple(rs) if isinstance(rs, (tuple, list)) else rs,
            self.skip_drop,
            self.linbp_start,
            self.ghost_range,
            self.bpa_start,
            self.bpa_maxpool,
            self.bpa_temperature,
        )

    def __eq__(self, other):
        return isinstance(other, SurgeryConfig) and self.key() == other.key()

    def __hash__(self):
        return hash(self.key())


DEFAULT_SURGERY = SurgeryConfig()


def decay_relu(x, gamma):
    """LLTA's DecayReLU (``llta_networks/models/decayrelu.py``): ReLU
    forward, backward scaled per-sample by γ — the straight-through rewrite
    ``r·γ + sg(r·(1−γ))`` of the reference's ``x·γ − sg(x)·γ + sg(x)``."""
    r = jax.nn.relu(x)
    g = gamma.reshape((-1,) + (1,) * (x.ndim - 1))
    return r * g + jax.lax.stop_gradient(r * (1.0 - g))


def _inner_act(x, s: SurgeryConfig, block_index: int, stage_first: bool,
               mode: str = "surgery"):
    """Activation on the residual main branch (the reference's inner ReLUs)."""
    if mode == "masked":
        return jax.nn.relu(x)
    if mode == "linear":
        return linbp_relu(x)
    if block_index >= s.bpa_start:
        return relu_silu(x)
    if s.softplus_beta is not None:
        return jax.nn.softplus(s.softplus_beta * x) / s.softplus_beta
    if s.gamma != 1.0 and not stage_first:
        # SGM hooks every 'relu' module EXCEPT names containing '0.relu'
        # (``sgm.py:78-80``) — i.e. the first block of each stage keeps
        # plain ReLU backward.
        return scaled_grad_relu(x, s.gamma)
    return plain_relu(x)


def _final_act(x, s: SurgeryConfig, block_index: int):
    """Activation after the residual add (the block's output ReLU)."""
    if block_index >= s.linbp_start:
        # the reference keeps the post-add ReLU masked (``linbp.py:152-153``)
        return jax.nn.relu(x)
    if block_index >= s.bpa_start:
        return relu_silu(x)
    if s.softplus_beta is not None:
        return jax.nn.softplus(s.softplus_beta * x) / s.softplus_beta
    if s.gamma != 1.0:
        # SGM's block-level norm hook (see std_norm_relu docstring)
        return std_norm_relu(x)
    return plain_relu(x)


def _linbp_block_main(mdl: nn.Module, x):
    """Main branch of a LinBP-active block with the reference's backward.

    ``linbp_backw_resnet50`` (``linbp.py:163-177``) propagates the *linear*
    (identity-ReLU) gradient through the main branch but rescales it
    per-sample to the L2 norm of the *masked* (normal-ReLU) gradient:
    ``main_grad_norm = xp · (‖g_masked‖₂/‖g_linear‖₂) · g_linear`` (xp=1).
    The skip branch passes through untouched.
    """

    def f(m, v):
        return m._main(v, "masked")

    def fwd(m, v):
        y, vjp_masked = nn.vjp(lambda mm, u: mm._main(u, "masked"), m, v)
        _, vjp_linear = nn.vjp(lambda mm, u: mm._main(u, "linear"), m, v)
        return y, (vjp_masked, vjp_linear)

    def bwd(res, g):
        vjp_masked, vjp_linear = res
        params_t, gm = vjp_masked(g)
        _, gl = vjp_linear(g)
        nm = jnp.linalg.norm(gm.reshape(gm.shape[0], -1), axis=1)
        nl = jnp.linalg.norm(gl.reshape(gl.shape[0], -1), axis=1)
        scale = (nm / (nl + 1e-20)).reshape((-1,) + (1,) * (gl.ndim - 1))
        return params_t, gl * scale

    return nn.custom_vjp(f, forward_fn=fwd, backward_fn=bwd)(mdl, x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    surgery: SurgeryConfig = DEFAULT_SURGERY
    block_index: int = 0
    stage_index: int = 0
    stage_first: bool = False
    expansion: int = 1

    def setup(self):
        self.conv1 = conv(self.planes, 3, self.stride)
        self.bn1 = bn(None)
        self.conv2 = conv(self.planes, 3, 1)
        self.bn2 = bn(None)
        if self.downsample:
            self.downsample_conv = conv(self.planes, 1, self.stride)
            self.downsample_bn = bn(None)

    def _main(self, x, mode: str = "surgery", gamma=None):
        s = self.surgery
        out = self.bn1(self.conv1(x))
        out = (decay_relu(out, gamma) if gamma is not None
               else _inner_act(out, s, self.block_index, self.stage_first, mode))
        return self.bn2(self.conv2(out))

    def __call__(self, x, gamma=None):
        s = self.surgery
        if self.block_index >= s.linbp_start:
            out = _linbp_block_main(self, x)
        else:
            out = self._main(x, gamma=gamma)
        identity = x
        if self.downsample:
            identity = self.downsample_bn(self.downsample_conv(x))
        out = _merge(out, identity, self, s, self.stage_index)
        return _final_act(out, s, self.block_index)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    surgery: SurgeryConfig = DEFAULT_SURGERY
    block_index: int = 0
    stage_index: int = 0
    stage_first: bool = False
    expansion: int = 4

    def setup(self):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        self.conv1 = conv(width, 1, 1)
        self.bn1 = bn(None)
        self.conv2 = conv(width, 3, self.stride, groups=self.groups)
        self.bn2 = bn(None)
        self.conv3 = conv(self.planes * 4, 1, 1)
        self.bn3 = bn(None)
        if self.downsample:
            self.downsample_conv = conv(self.planes * 4, 1, self.stride)
            self.downsample_bn = bn(None)

    def _main(self, x, mode: str = "surgery", gamma=None):
        s = self.surgery
        out = self.bn1(self.conv1(x))
        out = (decay_relu(out, gamma) if gamma is not None
               else _inner_act(out, s, self.block_index, self.stage_first, mode))
        out = self.bn2(self.conv2(out))
        out = (decay_relu(out, gamma) if gamma is not None
               else _inner_act(out, s, self.block_index, self.stage_first, mode))
        return self.bn3(self.conv3(out))

    def __call__(self, x, gamma=None):
        s = self.surgery
        if self.block_index >= s.linbp_start:
            out = _linbp_block_main(self, x)
        else:
            out = self._main(x, gamma=gamma)
        identity = x
        if self.downsample:
            identity = self.downsample_bn(self.downsample_conv(x))
        out = _merge(out, identity, self, s, self.stage_index)
        return _final_act(out, s, self.block_index)


def _merge(out, identity, mdl: nn.Module, s: SurgeryConfig, stage_index: int = 0):
    """Residual add, with ghost skip-scaling / IAA residual downweighting."""
    if s.skip_drop > 0.0:
        rng = mdl.make_rng("ghost")
        keep = 1.0 - s.skip_drop
        mask = jax.random.bernoulli(rng, keep, out.shape[:1] + (1,) * (out.ndim - 1))
        out = out * mask.astype(out.dtype) / keep
    if s.ghost_range > 0.0:
        # per-channel uniform scaling of the skip (``ghost_networks/resnet.py:110``)
        rng = mdl.make_rng("ghost")
        scale = jax.random.uniform(
            rng, (1,) * (out.ndim - 1) + (out.shape[-1],), out.dtype,
            minval=1.0 - s.ghost_range, maxval=1.0 + s.ghost_range,
        )
        # exposed for the golden-parity twin (tests/test_surgery_parity.py)
        mdl.sow("intermediates", "ghost_scale", scale)
        identity = identity * scale
    return out * s.stage_scale(stage_index) + identity


class _StemKernel(nn.Module):
    """Holds the stem conv kernel at the same tree path as ``nn.Conv``
    (``params/conv1/kernel``) so checkpoints are interchangeable between the
    folded and stock stem paths."""

    features: int = 64

    @nn.compact
    def __call__(self, in_channels: int):
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, in_channels, self.features),
        )


def _stem_space_to_depth(x, w):
    """7×7/2 stem conv computed as a 4×4/1 conv on 2×2 space-to-depth blocks.

    The stock stem (7·7·3=147-deep contraction at 224², and its input-gradient
    a transposed conv producing only 3 channels) underutilizes the MXU and was
    the single hottest op in the bench profile.  Folding the kernel into block
    space (12 input channels, 112² positions) is bit-exact — same MACs — and
    ~4× friendlier to the systolic array in the backward pass.

    ``w``: HWIO (7, 7, 3, C).  Derivation: out[o] = Σ_k w[k]·x[2o+k−3]; with
    x'[p,d] = x[2p+d] and k = 2·mm+d−1 this is a kernel w'[mm,d] = w[2mm+d−1]
    (zero at k=−1), block-space padding (2, 1).
    """
    B, H, W, C = x.shape
    xs = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(B, H // 2, W // 2, 4 * C)  # channel order (dH, dW, c)
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # wp[j] = w[j-1]
    wf = wp.reshape(4, 2, 4, 2, w.shape[2], w.shape[3]).transpose(0, 2, 1, 3, 4, 5)
    wf = wf.reshape(4, 4, 4 * w.shape[2], w.shape[3])
    # raw lax conv does not promote mixed dtypes the way nn.Conv does
    # (bf16 params + fp32 inputs happen when attacks bypass get_logits)
    dt = jnp.promote_types(xs.dtype, wf.dtype)
    xs, wf = xs.astype(dt), wf.astype(dt)
    return jax.lax.conv_general_dilated(
        xs, wf, window_strides=(1, 1), padding=[(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class ResNet(nn.Module):
    """torchvision-layout ResNet (NHWC)."""

    stage_sizes: Sequence[int]
    block_cls: Any
    num_classes: int = 1000
    groups: int = 1
    base_width: int = 64
    surgery: SurgeryConfig = DEFAULT_SURGERY
    stem_s2d: bool = True  # space-to-depth stem (bit-exact; see above)

    @nn.compact
    def __call__(self, x, features_only: bool = False, tap_fns=None,
                 gammas=None):
        """``tap_fns``: optional dict mapping tap names (``stage{i}``, or a
        block name like ``layer2_3``) to pure functions applied to that
        activation in the forward graph — the functional replacement for the
        reference's forward/backward hooks (FIA ``fia.py:55-61``, ILPD
        feature mixing, FAUG noise injection).  Differentiating w.r.t. a
        value closed over by a tap gives the hooked feature gradient.

        ``gammas``: optional (B, G) per-sample DecayReLU backward scales for
        LLTA (``llta_networks/models/decayresnet.py``): the inner ReLUs of
        every NON-first block of each stage use ``decay_relu`` with its own
        γ column, ordered stage-major (G = Σ(stage_size − 1))."""
        s = self.surgery
        taps = tap_fns or {}
        if self.stem_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            # same parameter tree as nn.Conv(name='conv1'), folded compute
            w = _StemKernel(name="conv1")(x.shape[-1])
            x = _stem_space_to_depth(x, w)
        else:
            x = nn.Conv(
                64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                use_bias=False, name="conv1",
            )(x)
        if "conv1" in taps:
            x = taps["conv1"](x)  # FAUG noise injection point (``faug.py``)
        x = bn("bn1")(x)
        # the stem ReLU ('1.relu') does get SGM's γ hook (``sgm.py:78-79``)
        x = _inner_act(x, s, -1, False)
        if s.bpa_maxpool:
            x = softmax_maxpool(x, s.bpa_temperature)
        elif _MAXPOOL_IMPL == "sep":
            # separable 3×3/2 max: two 1-D maxes are exact and replace one
            # large select-and-scatter backward with two much smaller ones
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 3, 1, 1), (1, 2, 1, 1),
                [(0, 0), (1, 1), (0, 0), (0, 0)],
            )
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 3, 1), (1, 1, 2, 1),
                [(0, 0), (0, 0), (1, 1), (0, 0)],
            )
        else:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                [(0, 0), (1, 1), (1, 1), (0, 0)],
            )
        block_idx = 0
        decay_idx = 0
        for i, n_blocks in enumerate(self.stage_sizes):
            planes = 64 * (2 ** i)
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                exp = 4 if self.block_cls is Bottleneck else 1
                down = j == 0 and (stride != 1 or i == 0 and exp != 1)
                kwargs = dict(
                    planes=planes,
                    stride=stride,
                    downsample=down,
                    surgery=s,
                    block_index=block_idx,
                    stage_index=i,
                    stage_first=j == 0,
                    name=f"layer{i + 1}_{j}",
                )
                if self.block_cls is Bottleneck:
                    kwargs.update(groups=self.groups, base_width=self.base_width)
                gamma = None
                if gammas is not None and j > 0:
                    gamma = gammas[:, decay_idx]
                    decay_idx += 1
                x = self.block_cls(**kwargs)(x, gamma=gamma)
                if f"layer{i + 1}_{j}" in taps:
                    x = taps[f"layer{i + 1}_{j}"](x)
                block_idx += 1
            if f"stage{i + 1}" in taps:
                x = taps[f"stage{i + 1}"](x)
            # expose per-stage features for feature-level attacks via sow
            self.sow("intermediates", f"stage{i + 1}", x)
        x = jnp.mean(x, axis=(1, 2))
        if features_only:
            return x
        return nn.Dense(self.num_classes, name="fc")(x)


def _make(stage_sizes, block_cls, **defaults):
    def builder(**kwargs):
        cfg = {**defaults, **kwargs}
        return ResNet(stage_sizes=stage_sizes, block_cls=block_cls, **cfg)

    return builder


register_model("resnet18")(_make([2, 2, 2, 2], BasicBlock))
register_model("resnet34")(_make([3, 4, 6, 3], BasicBlock))
register_model("resnet50")(_make([3, 4, 6, 3], Bottleneck))
register_model("resnet101")(_make([3, 4, 23, 3], Bottleneck))
register_model("resnet152")(_make([3, 8, 36, 3], Bottleneck))
register_model("resnext50_32x4d")(
    _make([3, 4, 6, 3], Bottleneck, groups=32, base_width=4)
)
register_model("resnext101_32x4d")(
    _make([3, 4, 23, 3], Bottleneck, groups=32, base_width=4)
)
