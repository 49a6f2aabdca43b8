"""Loop-level parity twin, stage 15: the Everywhere attack
(``input_transformation/everywhere.py:284-409``, ``attack_type='CDTM'``).

The torch side transcribes the reference loop — 3×3 floor-division region
masks with mean fill, clean features of the (9+1)·B combine batch recorded
once (one iteration consumed), CFM SelfShuffle mixup (shared batch perm
across region groups within a layer, each adv group mixing with the clean
features of its OWN region kind), channelwise U(0, 0.75) convex blending
with a scalar per-layer Bernoulli(0.1), summed-target-logit loss, 5×5 TI
on the gradient, L1-SUM momentum — at the repo's documented granularity
adaptation (taps at the layer2/3/4 block outputs instead of every
conv/linear).  All randomness is paired through pre-drawn banks; DI is
pinned to its pass-through branch (the continuous-DI equivalence is
covered by the DIM/CFM twins).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tests.test_attack_parity import _fresh_pair, torch_forward  # noqa: E402

EPS = 16 / 255
MEAN = np.array([0.485, 0.456, 0.406], np.float32)


def _gkern(kernlen=5, nsig=3):
    x = np.linspace(-nsig, nsig, kernlen)
    k1 = np.exp(-0.5 * x**2) / np.sqrt(2 * np.pi)
    k = np.outer(k1, k1)
    return (k / k.sum()).astype(np.float32)


def _region_masks(H, W):
    """``everywhere.py:292-301``: floor-division 3×3 blocks (the last H%3
    rows/cols fall outside every mask)."""
    hb, wb = H // 3, W // 3
    m = np.zeros((9, 1, H, W), np.float32)
    for i in range(9):
        up, left = (i // 3) * hb, (i % 3) * wb
        m[i, :, up:min(up + hb, H), left:min(left + wb, W)] = 1.0
    return m


def test_everywhere_cdtm_loop_parity():
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(151)
    rng = np.random.RandomState(151)
    B, H = 2, 64
    T = 5           # num_iter; first iteration is consumed recording
    updates = T - 1
    alpha = 1.6 / 255
    layers = ("layer2", "layer3", "layer4")
    chans = (128, 256, 512)

    x = rng.rand(B, H, H, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)
    tgt = rng.randint(0, 1000, (B,)).astype(np.int32)

    sel_bank = np.stack([rng.permutation(9)[:4] for _ in range(updates)])
    perm_bank = np.stack([
        [rng.permutation(B) for _ in layers] for _ in range(updates)])
    do_bank = rng.rand(updates, len(layers)) < 0.5  # exercise both branches
    ratio_banks = [
        rng.rand(updates, 5, B, c).astype(np.float32) * 0.75 for c in chans]

    # ---------------- torch transcription ----------------
    masks = torch.from_numpy(_region_masks(H, H))       # (9,1,H,W)
    mean_t = torch.from_numpy(MEAN)[None, :, None, None]
    xt = torch.from_numpy(x)
    tt = torch.from_numpy(tgt).long()
    kern = torch.from_numpy(_gkern(5, 3))[None, None].repeat(3, 1, 1, 1)

    captured = {}
    mix_cfg = {"mode": "record"}

    def make_hook(li):
        def hook(module, inp, out):
            if mix_cfg["mode"] == "record":
                captured[li] = out.detach().clone()
                return None
            t = mix_cfg["t"]
            fb = out.reshape((5, B) + out.shape[1:])
            groups = [0] + [int(s) + 1 for s in sel_bank[t]]
            clean = captured[li].reshape((10, B) + out.shape[1:])
            prev = clean[groups][:, perm_bank[t, li]]
            r = torch.from_numpy(ratio_banks[li][t])[:, :, :, None, None]
            mixed = (1 - r) * fb + r * prev
            if bool(do_bank[t, li]):
                return mixed.reshape(out.shape)
            return None
        return hook

    hooks = [getattr(tmodel, l).register_forward_hook(make_hook(i))
             for i, l in enumerate(layers)]

    # clean-feature recording on the (9+1)·B combine (everywhere.py:341-360)
    xt_nchw = xt.permute(0, 3, 1, 2)
    combine = [xt_nchw] + [masks[i] * xt_nchw + (1 - masks[i]) * mean_t
                           for i in range(9)]
    with torch.no_grad():
        _ = torch_forward(tmodel, torch.cat(combine).permute(0, 2, 3, 1))

    mix_cfg["mode"] = "mix"
    delta = torch.zeros_like(xt_nchw)
    g = torch.zeros_like(xt_nchw)
    for t in range(updates):
        mix_cfg["t"] = t
        d = delta.clone().requires_grad_(True)
        xadv = xt_nchw + d
        views = [xadv] + [
            masks[s] * xadv + (1 - masks[s]) * mean_t for s in sel_bank[t]]
        flat = torch.cat(views)
        logits = torch_forward(tmodel, flat.permute(0, 2, 3, 1))
        loss = logits.gather(1, tt.repeat(5)[:, None]).sum()
        ghat = torch.autograd.grad(loss, d)[0]
        ghat = F.conv2d(ghat, kern, stride=1, padding=(2, 2), groups=3)
        g = g + ghat / ghat.abs().sum(dim=(1, 2, 3), keepdim=True)
        delta = (delta + alpha * g.sign()).clamp(-EPS, EPS)
        delta = (xt_nchw + delta).clamp(0, 1) - xt_nchw
    for h in hooks:
        h.remove()
    ref = delta.permute(0, 2, 3, 1).numpy()

    # ---------------- repo side, paired ----------------
    EVW = ta.load_attack_class("everywhere")
    jsel = jnp.asarray(sel_bank)
    jperm = jnp.asarray(perm_bank)
    jdo = jnp.asarray(do_bank)
    jratios = [jnp.asarray(r) for r in ratio_banks]

    class _Paired(EVW):
        def region_select(self, key, step):
            return jsel[step]

        def layer_perm(self, key, i, B_, step):
            return jperm[step, i]

        def mix_draws(self, key, i, n, B_, C, dtype, step):
            ratio = jratios[i][step][:, :, None, None, :].astype(dtype)
            return jdo[step, i], ratio

        def di(self, flat, key, step):
            return flat  # pinned pass-through branch (c > 0.7)

    atk = _Paired(model_name="resnet18", pretrained=False, input_size=64,
                  epoch=T, alpha=alpha, layers=layers)
    atk.model = surrogate
    ours = np.asarray(atk(x, np.stack([y, tgt], axis=1)))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"everywhere delta sign agreement {agree:.4f}"
