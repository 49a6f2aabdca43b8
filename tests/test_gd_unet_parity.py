"""Converter round-trip parity for the guided-diffusion UNet.

A raw-PyTorch twin reproduces the reference UNetModel structure and naming
(``defense/diffpure/guided_diffusion/unet.py:404-672``) at a tiny
configuration; its randomly-initialized state_dict must convert onto
``defense/gd_unet.GuidedDiffusionUNet`` with zero missing / zero mismatched
parameters and matching outputs — the proof that the official
``256x256_diffusion_uncond.pt`` checkpoint (same tree, bigger sizes) will
load.
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

TINY = dict(model_channels=32, num_res_blocks=1, attention_ds=(2,),
            channel_mult=(1, 2), num_head_channels=16, out_channels=6)


def t_timestep_embedding(t, dim):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float() / half)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TResBlock(tnn.Module):
    def __init__(self, ch, emb_ch, out_ch, up=False, down=False):
        super().__init__()
        self.in_layers = tnn.Sequential(
            tnn.GroupNorm(32, ch), tnn.SiLU(),
            tnn.Conv2d(ch, out_ch, 3, padding=1),
        )
        self.emb_layers = tnn.Sequential(
            tnn.SiLU(), tnn.Linear(emb_ch, 2 * out_ch),
        )
        self.out_layers = tnn.Sequential(
            tnn.GroupNorm(32, out_ch), tnn.SiLU(), tnn.Dropout(0.0),
            tnn.Conv2d(out_ch, out_ch, 3, padding=1),
        )
        self.skip_connection = (
            tnn.Identity() if ch == out_ch else tnn.Conv2d(ch, out_ch, 1)
        )
        self.up, self.down = up, down

    def _resample(self, x):
        if self.up:
            return F.interpolate(x, scale_factor=2, mode="nearest")
        if self.down:
            return F.avg_pool2d(x, 2)
        return x

    def forward(self, x, emb):
        if self.up or self.down:
            h = self.in_layers[1](self.in_layers[0](x))
            h = self.in_layers[2](self._resample(h))
            x = self._resample(x)
        else:
            h = self.in_layers(x)
        e = self.emb_layers(emb)[:, :, None, None]
        scale, shift = torch.chunk(e, 2, dim=1)
        h = self.out_layers[0](h) * (1 + scale) + shift
        h = self.out_layers[3](self.out_layers[2](self.out_layers[1](h)))
        return self.skip_connection(x) + h


class TAttnBlock(tnn.Module):
    def __init__(self, ch, head_ch):
        super().__init__()
        self.norm = tnn.GroupNorm(32, ch)
        self.qkv = tnn.Conv1d(ch, ch * 3, 1)
        self.proj_out = tnn.Conv1d(ch, ch, 1)
        self.heads = ch // head_ch

    def forward(self, x):
        b, c, *spatial = x.shape
        xf = x.reshape(b, c, -1)
        qkv = self.qkv(self.norm(xf))
        bs, width, length = qkv.shape
        ch = width // (3 * self.heads)
        q, k, v = qkv.reshape(bs * self.heads, ch * 3, length).split(ch, dim=1)
        scale = 1 / math.sqrt(math.sqrt(ch))
        w = torch.einsum("bct,bcs->bts", q * scale, k * scale)
        w = torch.softmax(w.float(), dim=-1).type(w.dtype)
        a = torch.einsum("bts,bcs->bct", w, v).reshape(bs, -1, length)
        return (xf + self.proj_out(a)).reshape(b, c, *spatial)


class TSeq(tnn.Sequential):
    def forward(self, x, emb):
        for m in self:
            x = m(x, emb) if isinstance(m, TResBlock) else m(x)
        return x


class TUNet(tnn.Module):
    """Reference UNetModel constructor logic at the tiny config."""

    def __init__(self, in_ch=3, mc=32, num_res=1, attn_ds=(2,),
                 mult=(1, 2), head_ch=16, out_ch=6):
        super().__init__()
        emb_ch = mc * 4
        self.mc = mc
        self.time_embed = tnn.Sequential(
            tnn.Linear(mc, emb_ch), tnn.SiLU(), tnn.Linear(emb_ch, emb_ch),
        )
        ch = input_ch = int(mult[0] * mc)
        self.input_blocks = tnn.ModuleList(
            [TSeq(tnn.Conv2d(in_ch, ch, 3, padding=1))]
        )
        chans = [ch]
        ds = 1
        for level, m in enumerate(mult):
            for _ in range(num_res):
                layers = [TResBlock(ch, emb_ch, int(m * mc))]
                ch = int(m * mc)
                if ds in attn_ds:
                    layers.append(TAttnBlock(ch, head_ch))
                self.input_blocks.append(TSeq(*layers))
                chans.append(ch)
            if level != len(mult) - 1:
                self.input_blocks.append(
                    TSeq(TResBlock(ch, emb_ch, ch, down=True))
                )
                chans.append(ch)
                ds *= 2
        self.middle_block = TSeq(
            TResBlock(ch, emb_ch, ch), TAttnBlock(ch, head_ch),
            TResBlock(ch, emb_ch, ch),
        )
        self.output_blocks = tnn.ModuleList([])
        for level, m in list(enumerate(mult))[::-1]:
            for i in range(num_res + 1):
                ich = chans.pop()
                layers = [TResBlock(ch + ich, emb_ch, int(m * mc))]
                ch = int(m * mc)
                if ds in attn_ds:
                    layers.append(TAttnBlock(ch, head_ch))
                if level and i == num_res:
                    layers.append(TResBlock(ch, emb_ch, ch, up=True))
                    ds //= 2
                self.output_blocks.append(TSeq(*layers))
        self.out = tnn.Sequential(
            tnn.GroupNorm(32, ch), tnn.SiLU(),
            tnn.Conv2d(input_ch, out_ch, 3, padding=1),
        )

    def forward(self, x, timesteps):
        emb = self.time_embed(t_timestep_embedding(timesteps, self.mc))
        hs = []
        h = x
        for m in self.input_blocks:
            h = m(h, emb)
            hs.append(h)
        h = self.middle_block(h, emb)
        for m in self.output_blocks:
            h = m(torch.cat([h, hs.pop()], dim=1), emb)
        return self.out(h)


def test_gd_unet_converter_roundtrip():
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.defense.gd_unet import GuidedDiffusionUNet
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    torch.manual_seed(3)
    tmodel = TUNet().eval()
    # the reference zero-inits out convs; randomize so the test is non-trivial
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.ndim >= 2 and p.abs().sum() == 0:
                p.normal_(0, 0.05)

    jmodel = GuidedDiffusionUNet(
        image_size=32, model_channels=TINY["model_channels"],
        num_res_blocks=TINY["num_res_blocks"],
        attention_ds=TINY["attention_ds"],
        channel_mult=TINY["channel_mult"],
        num_head_channels=TINY["num_head_channels"],
        out_channels=TINY["out_channels"],
    )
    variables = jmodel.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,))
    )
    converted = torch_state_dict_to_flax(tmodel.state_dict(), prefix="")
    variables, report = reconcile_with_module(converted, variables)
    assert not report["missing"], report["missing"][:10]
    assert not report["mismatched"], report["mismatched"][:10]

    rng = np.random.RandomState(0)
    x = rng.randn(2, 32, 32, 3).astype(np.float32) * 0.5
    t = np.array([7.0, 123.0], np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                       torch.from_numpy(t)).numpy().transpose(0, 2, 3, 1)
    j_out = np.asarray(jmodel.apply(variables, jnp.asarray(x), jnp.asarray(t)))
    scale = np.abs(t_out).max() + 1e-12
    np.testing.assert_allclose(j_out / scale, t_out / scale, atol=2e-4)


def test_diffpure_purify_shapes_and_range():
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.defense.diffpure import DiffPure

    dp = DiffPure(t_star=5)  # tiny fallback UNet, 5 reverse steps
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    out = dp(x, jax.random.PRNGKey(0))
    assert out.shape == x.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    assert bool(jnp.any(out != x))
