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
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import register_model


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
    """ReLU forward, identity backward (LinBP, ``model_related/linbp.py:78-177``)."""
    return jax.nn.relu(x)


linbp_relu.defvjp(lambda x: (jax.nn.relu(x), None), lambda _, g: (g,))


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


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    surgery: SurgeryConfig = DEFAULT_SURGERY
    block_index: int = 0
    stage_index: int = 0
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        s = self.surgery
        identity = x
        out = conv(self.planes, 3, self.stride, name="conv1")(x)
        out = bn("bn1")(out)
        out = _act(out, s, self.block_index)
        out = conv(self.planes, 3, 1, name="conv2")(out)
        out = bn("bn2")(out)
        if self.downsample:
            identity = conv(self.planes, 1, self.stride, name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        out = _merge(out, identity, self, s, self.stage_index)
        return _act(out, s, self.block_index)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    surgery: SurgeryConfig = DEFAULT_SURGERY
    block_index: int = 0
    stage_index: int = 0
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        s = self.surgery
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        out = conv(width, 1, 1, name="conv1")(x)
        out = bn("bn1")(out)
        out = _act(out, s, self.block_index)
        out = conv(width, 3, self.stride, groups=self.groups, name="conv2")(out)
        out = bn("bn2")(out)
        out = _act(out, s, self.block_index)
        out = conv(self.planes * 4, 1, 1, name="conv3")(out)
        out = bn("bn3")(out)
        if self.downsample:
            identity = conv(self.planes * 4, 1, self.stride, name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        out = _merge(out, identity, self, s, self.stage_index)
        return _act(out, s, self.block_index)


def _act(x, s: SurgeryConfig, block_index: int):
    if block_index >= s.linbp_start:
        return linbp_relu(x)
    if block_index >= s.bpa_start:
        return relu_silu(x)
    if s.softplus_beta is not None:
        return jax.nn.softplus(s.softplus_beta * x) / s.softplus_beta
    if s.gamma != 1.0:
        return scaled_grad_relu(x, s.gamma)
    return jax.nn.relu(x)


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
        identity = identity * scale
    return out * s.stage_scale(stage_index) + identity


class ResNet(nn.Module):
    """torchvision-layout ResNet (NHWC)."""

    stage_sizes: Sequence[int]
    block_cls: Any
    num_classes: int = 1000
    groups: int = 1
    base_width: int = 64
    surgery: SurgeryConfig = DEFAULT_SURGERY

    @nn.compact
    def __call__(self, x, features_only: bool = False, tap_fns=None):
        """``tap_fns``: optional dict mapping tap names (``stage{i}``, or a
        block name like ``layer2_3``) to pure functions applied to that
        activation in the forward graph — the functional replacement for the
        reference's forward/backward hooks (FIA ``fia.py:55-61``, ILPD
        feature mixing, FAUG noise injection).  Differentiating w.r.t. a
        value closed over by a tap gives the hooked feature gradient."""
        s = self.surgery
        taps = tap_fns or {}
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
            name="conv1",
        )(x)
        if "conv1" in taps:
            x = taps["conv1"](x)  # FAUG noise injection point (``faug.py``)
        x = bn("bn1")(x)
        x = _act(x, s, -1)
        if s.bpa_maxpool:
            x = softmax_maxpool(x, s.bpa_temperature)
        else:
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
            x = nn.max_pool(x, (3, 3), strides=(2, 2))
        block_idx = 0
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
                    name=f"layer{i + 1}_{j}",
                )
                if self.block_cls is Bottleneck:
                    kwargs.update(groups=self.groups, base_width=self.base_width)
                x = self.block_cls(**kwargs)(x)
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
