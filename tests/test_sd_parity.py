"""Converter round-trip parity for the Stable-Diffusion stack (DiffAttack).

Raw-PyTorch twins reproduce the diffusers ``UNet2DConditionModel`` /
``AutoencoderKL`` structure and state_dict naming
(``transferattack/generation/diffattack.py:27-32`` loads these from the SD
pipeline) at tiny configurations, plus transformers' real ``CLIPTextModel``
as the text-tower twin.  Each randomly-initialized state_dict must convert
onto the Flax modules with zero missing / zero mismatched parameters and
matching outputs — the proof that real SD checkpoints (same trees, bigger
sizes) load.
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def _to_jax_nhwc(x):
    import jax.numpy as jnp

    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def _convert(module_torch):
    from transferattack_tpu.utils.convert import torch_state_dict_to_flax

    return torch_state_dict_to_flax(module_torch.state_dict(), prefix="")


def _reconcile(converted, ref_vars):
    from transferattack_tpu.utils.convert import reconcile_with_module

    variables, report = reconcile_with_module(converted, ref_vars)
    assert not report["missing"], report["missing"][:10]
    assert not report["mismatched"], report["mismatched"][:10]
    return variables


# ---------------------------------------------------------------------------
# torch twins (diffusers naming)
# ---------------------------------------------------------------------------


class TResnetBlock(tnn.Module):
    """diffusers ResnetBlock2D."""

    def __init__(self, cin, cout, temb_ch=0, groups=8):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        if temb_ch:
            self.time_emb_proj = tnn.Linear(temb_ch, cout)
        self.norm2 = tnn.GroupNorm(groups, cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class TAttention(tnn.Module):
    """diffusers Attention (to_q/to_k/to_v no bias, to_out.0 with)."""

    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = tnn.Linear(dim, dim, bias=False)
        self.to_k = tnn.Linear(ctx_dim, dim, bias=False)
        self.to_v = tnn.Linear(ctx_dim, dim, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(dim, dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        B, N, C = x.shape
        M = ctx.shape[1]
        dh = C // self.heads
        q = self.to_q(x).reshape(B, N, self.heads, dh).transpose(1, 2)
        k = self.to_k(ctx).reshape(B, M, self.heads, dh).transpose(1, 2)
        v = self.to_v(ctx).reshape(B, M, self.heads, dh).transpose(1, 2)
        w = torch.softmax(q @ k.transpose(-1, -2) * dh ** -0.5, dim=-1)
        a = (w @ v).transpose(1, 2).reshape(B, N, C)
        return self.to_out[0](a)


class TGEGLU(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = tnn.Linear(dim, dim * 8)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class TFeedForward(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.net = tnn.ModuleList([TGEGLU(dim), tnn.Identity(),
                                   tnn.Linear(dim * 4, dim)])

    def forward(self, x):
        return self.net[2](self.net[0](x))


class TTransformerBlock(tnn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TAttention(dim, dim, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TAttention(dim, ctx_dim, heads)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = TFeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class TTransformer2D(tnn.Module):
    def __init__(self, dim, ctx_dim, heads, groups=8):
        super().__init__()
        self.norm = tnn.GroupNorm(groups, dim)
        self.proj_in = tnn.Conv2d(dim, dim, 1)
        self.transformer_blocks = tnn.ModuleList(
            [TTransformerBlock(dim, ctx_dim, heads)])
        self.proj_out = tnn.Conv2d(dim, dim, 1)

    def forward(self, x, ctx):
        B, C, H, W = x.shape
        res = x
        h = self.proj_in(self.norm(x))
        h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
        h = self.transformer_blocks[0](h, ctx)
        h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
        return self.proj_out(h) + res


class TDownBlock(tnn.Module):
    def __init__(self, cin, cout, temb_ch, ctx_dim, heads, layers,
                 with_attn, downsample, groups=8):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [TResnetBlock(cin if i == 0 else cout, cout, temb_ch, groups)
             for i in range(layers)])
        if with_attn:
            self.attentions = tnn.ModuleList(
                [TTransformer2D(cout, ctx_dim, heads, groups)
                 for _ in range(layers)])
        if downsample:
            self.downsamplers = tnn.ModuleList([tnn.Module()])
            self.downsamplers[0].conv = tnn.Conv2d(cout, cout, 3, stride=2,
                                                   padding=1)

    def forward(self, h, temb, ctx):
        skips = []
        for i, res in enumerate(self.resnets):
            h = res(h, temb)
            if hasattr(self, "attentions"):
                h = self.attentions[i](h, ctx)
            skips.append(h)
        if hasattr(self, "downsamplers"):
            h = self.downsamplers[0].conv(h)
            skips.append(h)
        return h, skips


class TUpBlock(tnn.Module):
    def __init__(self, cins, cout, temb_ch, ctx_dim, heads,
                 with_attn, upsample, groups=8):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [TResnetBlock(cin, cout, temb_ch, groups) for cin in cins])
        if with_attn:
            self.attentions = tnn.ModuleList(
                [TTransformer2D(cout, ctx_dim, heads, groups)
                 for _ in cins])
        if upsample:
            self.upsamplers = tnn.ModuleList([tnn.Module()])
            self.upsamplers[0].conv = tnn.Conv2d(cout, cout, 3, padding=1)

    def forward(self, h, skips, temb, ctx):
        for i, res in enumerate(self.resnets):
            h = torch.cat([h, skips.pop()], dim=1)
            h = res(h, temb)
            if hasattr(self, "attentions"):
                h = self.attentions[i](h, ctx)
        if hasattr(self, "upsamplers"):
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = self.upsamplers[0].conv(h)
        return h


class TMidBlock(tnn.Module):
    def __init__(self, ch, temb_ch, ctx_dim, heads, groups=8):
        super().__init__()
        self.resnets = tnn.ModuleList([
            TResnetBlock(ch, ch, temb_ch, groups),
            TResnetBlock(ch, ch, temb_ch, groups)])
        self.attentions = tnn.ModuleList(
            [TTransformer2D(ch, ctx_dim, heads, groups)])

    def forward(self, h, temb, ctx):
        h = self.resnets[0](h, temb)
        h = self.attentions[0](h, ctx)
        return self.resnets[1](h, temb)


class TTimeEmbedding(tnn.Module):
    def __init__(self, cin, dim):
        super().__init__()
        self.linear_1 = tnn.Linear(cin, dim)
        self.linear_2 = tnn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


def t_sd_timestep_embedding(t, dim):
    """diffusers Timesteps, flip_sin_to_cos=True, shift=0 → cat[cos, sin]."""
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float() / half)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TSDUNet(tnn.Module):
    """UNet2DConditionModel at a tiny config: block_out (32, 64),
    layers_per_block 1, heads 2, cross_dim 16, groups 8."""

    def __init__(self, block_out=(32, 64), layers=1, heads=2, ctx_dim=16,
                 groups=8):
        super().__init__()
        temb_ch = block_out[0] * 4
        self.block_out = block_out
        self.time_embedding = TTimeEmbedding(block_out[0], temb_ch)
        self.conv_in = tnn.Conv2d(4, block_out[0], 3, padding=1)
        n = len(block_out)
        self.down_blocks = tnn.ModuleList()
        ch = block_out[0]
        for bi, co in enumerate(block_out):
            self.down_blocks.append(TDownBlock(
                ch, co, temb_ch, ctx_dim, heads, layers,
                with_attn=bi < n - 1, downsample=bi < n - 1, groups=groups))
            ch = co
        self.mid_block = TMidBlock(ch, temb_ch, ctx_dim, heads, groups)
        # up path channel bookkeeping mirrors diffusers' get_up_block wiring
        skip_chs = [block_out[0]]
        for bi, co in enumerate(block_out):
            skip_chs += [co] * layers
            if bi < n - 1:
                skip_chs.append(co)
        self.up_blocks = tnn.ModuleList()
        for bi, co in enumerate(reversed(block_out)):
            cins = []
            for _ in range(layers + 1):
                cins.append(ch + skip_chs.pop())
                ch = co
            self.up_blocks.append(TUpBlock(
                cins, co, temb_ch, ctx_dim, heads,
                with_attn=bi > 0, upsample=bi < n - 1, groups=groups))
        self.conv_norm_out = tnn.GroupNorm(groups, block_out[0])
        self.conv_out = tnn.Conv2d(block_out[0], 4, 3, padding=1)

    def forward(self, x, t, ctx):
        temb = self.time_embedding(t_sd_timestep_embedding(t, self.block_out[0]))
        h = self.conv_in(x)
        skips = [h]
        for db in self.down_blocks:
            h, s = db(h, temb, ctx)
            skips.extend(s)
        h = self.mid_block(h, temb, ctx)
        for ub in self.up_blocks:
            h = ub(h, skips, temb, ctx)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


def test_sd_unet_parity():
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.generation.sd_unet import SDUNet

    torch.manual_seed(0)
    twin = TSDUNet().eval()
    flax_unet = SDUNet(block_out_channels=(32, 64), layers_per_block=1,
                       heads=2, cross_attention_dim=16, norm_groups=8)
    ref_vars = flax_unet.init(jax.random.PRNGKey(0),
                              jnp.zeros((2, 8, 8, 4)), jnp.zeros((2,)),
                              jnp.zeros((2, 7, 16)))
    variables = _reconcile(_convert(twin), ref_vars)
    rng = np.random.RandomState(0)
    x = torch.tensor(rng.rand(2, 4, 8, 8).astype(np.float32))
    t = torch.tensor([5.0, 300.0])
    ctx = torch.tensor(rng.rand(2, 7, 16).astype(np.float32))
    with torch.no_grad():
        ref = twin(x, t, ctx).numpy().transpose(0, 2, 3, 1)
    out = flax_unet.apply(variables, _to_jax_nhwc(x), jnp.asarray([5.0, 300.0]),
                          jnp.asarray(ctx.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-4)


def test_sd_unet_attention_store():
    """Both attention families sow: DiffAttack's AttentionStore needs self
    (attn1) and text-cross (attn2) maps (``diffattack.py:689-720``)."""
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.generation.sd_unet import SDUNet

    unet = SDUNet(block_out_channels=(32, 64), layers_per_block=1,
                  heads=2, cross_attention_dim=16, norm_groups=8)
    v = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                  jnp.zeros((1,)), jnp.zeros((1, 7, 16)))
    _, state = unet.apply(v, jnp.ones((1, 8, 8, 4)), jnp.ones((1,)),
                          jnp.ones((1, 7, 16)), mutable=["intermediates"])
    flat = jax.tree_util.tree_leaves_with_path(state["intermediates"])
    self_maps = [l for p, l in flat if "attn" in str(p) and "cross" not in str(p)]
    cross_maps = [l for p, l in flat if "cross_attn" in str(p)]
    assert len(self_maps) >= 2 and len(cross_maps) >= 2
    # cross maps attend over the 7 context tokens
    assert all(m.shape[-1] == 7 for m in cross_maps)


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


class TVAEAttention(tnn.Module):
    def __init__(self, ch, groups=8):
        super().__init__()
        self.group_norm = tnn.GroupNorm(groups, ch)
        self.to_q = tnn.Linear(ch, ch)
        self.to_k = tnn.Linear(ch, ch)
        self.to_v = tnn.Linear(ch, ch)
        self.to_out = tnn.ModuleList([tnn.Linear(ch, ch)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        w = torch.softmax(q @ k.transpose(-1, -2) * C ** -0.5, dim=-1)
        a = self.to_out[0](w @ v)
        return x + a.reshape(B, H, W, C).permute(0, 3, 1, 2)


class TVAEMid(tnn.Module):
    def __init__(self, ch, groups=8):
        super().__init__()
        self.resnets = tnn.ModuleList([
            TResnetBlock(ch, ch, 0, groups), TResnetBlock(ch, ch, 0, groups)])
        self.attentions = tnn.ModuleList([TVAEAttention(ch, groups)])

    def forward(self, h):
        h = self.resnets[0](h)
        h = self.attentions[0](h)
        return self.resnets[1](h)


class TVAEEncoder(tnn.Module):
    def __init__(self, block_out=(32, 64), layers=1, latent=4, groups=8):
        super().__init__()
        self.conv_in = tnn.Conv2d(3, block_out[0], 3, padding=1)
        n = len(block_out)
        self.down_blocks = tnn.ModuleList()
        ch = block_out[0]
        for bi, co in enumerate(block_out):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList(
                [TResnetBlock(ch if i == 0 else co, co, 0, groups)
                 for i in range(layers)])
            if bi < n - 1:
                blk.downsamplers = tnn.ModuleList([tnn.Module()])
                blk.downsamplers[0].conv = tnn.Conv2d(co, co, 3, stride=2,
                                                      padding=0)
            self.down_blocks.append(blk)
            ch = co
        self.mid_block = TVAEMid(ch, groups)
        self.conv_norm_out = tnn.GroupNorm(groups, ch)
        self.conv_out = tnn.Conv2d(ch, 2 * latent, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "downsamplers"):
                h = F.pad(h, (0, 1, 0, 1))
                h = blk.downsamplers[0].conv(h)
        h = self.mid_block(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TVAEDecoder(tnn.Module):
    def __init__(self, block_out=(32, 64), layers=1, latent=4, groups=8):
        super().__init__()
        rev = list(reversed(block_out))
        self.conv_in = tnn.Conv2d(latent, rev[0], 3, padding=1)
        self.mid_block = TVAEMid(rev[0], groups)
        n = len(block_out)
        self.up_blocks = tnn.ModuleList()
        ch = rev[0]
        for bi, co in enumerate(rev):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList(
                [TResnetBlock(ch if i == 0 else co, co, 0, groups)
                 for i in range(layers + 1)])
            if bi < n - 1:
                blk.upsamplers = tnn.ModuleList([tnn.Module()])
                blk.upsamplers[0].conv = tnn.Conv2d(co, co, 3, padding=1)
            self.up_blocks.append(blk)
            ch = co
        self.conv_norm_out = tnn.GroupNorm(groups, ch)
        self.conv_out = tnn.Conv2d(ch, 3, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid_block(h)
        for blk in self.up_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TSDVAE(tnn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = TVAEEncoder()
        self.decoder = TVAEDecoder()
        self.quant_conv = tnn.Conv2d(8, 8, 1)
        self.post_quant_conv = tnn.Conv2d(4, 4, 1)

    def forward(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, _ = moments.chunk(2, dim=1)
        return self.decoder(self.post_quant_conv(mean))


def test_sd_vae_parity():
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.generation.sd_vae import SDVAE

    torch.manual_seed(1)
    twin = TSDVAE().eval()
    vae = SDVAE(block_out_channels=(32, 64), layers_per_block=1,
                latent_channels=4, groups=8)
    ref_vars = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    variables = _reconcile(_convert(twin), ref_vars)
    rng = np.random.RandomState(1)
    x = torch.tensor(rng.rand(2, 3, 16, 16).astype(np.float32))
    with torch.no_grad():
        ref = twin(x).numpy().transpose(0, 2, 3, 1)
    out = vae.apply(variables, _to_jax_nhwc(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-4)


def test_sd_vae_roundtrip_shapes():
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.generation.sd_vae import SDVAE

    vae = SDVAE(block_out_channels=(32, 64), layers_per_block=1, groups=8)
    v = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    z = vae.apply(v, jnp.ones((2, 16, 16, 3)), method=SDVAE.encode)
    assert z.shape == (2, 8, 8, 4)  # one stride-2 stage at this tiny config
    img = vae.apply(v, z, method=SDVAE.decode)
    assert img.shape == (2, 16, 16, 3)


# ---------------------------------------------------------------------------
# CLIP text encoder (twin = transformers' real CLIPTextModel)
# ---------------------------------------------------------------------------


def test_sd_text_encoder_parity():
    transformers = pytest.importorskip("transformers")
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.generation.sd_text import CLIPTextEncoder

    cfg = transformers.CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="quick_gelu")
    torch.manual_seed(2)
    twin = transformers.CLIPTextModel(cfg).eval()
    enc = CLIPTextEncoder(vocab_size=100, width=32, layers=2, heads=2)
    ref_vars = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    variables = _reconcile(_convert(twin), ref_vars)
    rng = np.random.RandomState(2)
    ids = rng.randint(0, 100, size=(2, 77)).astype(np.int64)
    with torch.no_grad():
        ref = twin(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    out = enc.apply(variables, jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-4)


def test_sd_tokenizer_fallback_and_bpe(tmp_path):
    import json

    from transferattack_tpu.generation.sd_text import (
        BOS, EOS, SDTokenizer, _CLIPBPE)

    with pytest.warns(UserWarning):
        tok = SDTokenizer(weights_dir=str(tmp_path))
    ids = tok(["a photo of a dog", "a photo of a cat"])
    assert ids.shape == (2, 77)
    assert (ids[:, 0] == BOS).all()
    assert (ids == EOS).any(axis=1).all()
    assert not np.array_equal(ids[0], ids[1])
    # a minimal real vocab exercises the BPE path
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1, "a</w>": 2,
             "d": 3, "o": 4, "g": 5, "do": 6, "dog</w>": 7}
    (tmp_path / "clip_vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "clip_merges.txt").write_text("#version\nd o\ndo g</w>\n")
    bpe = _CLIPBPE(str(tmp_path / "clip_vocab.json"),
                   str(tmp_path / "clip_merges.txt"))
    assert bpe.encode("a dog") == [2, 7]
