"""Loop-level parity twins, stage 10: the ViT cotangent-surgery tail.

VDC's two-pass record/inject backward (with the reference's legacy-hook
placement: the attn_drop hook lands on the PRE-softmax scores node, the
norm2 hook on the MLP-branch view of the residual stream, gammas 0.25/0.5
in the inject pass, and the final-norm cls-row seed) and FPR's forward
refinement (noisy re-softmaxed attention maps + cross-iteration embedding
momentum).  The torch side registers the REFERENCE'S actual hooks on a
tiny ViT and runs the reference loop; FPR's noise is paired through a
pre-drawn bank so both run at the deterministic sign-agreement bar.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from tests.test_surgery_parity import TViT, _convert  # noqa: E402

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)

DEPTH = 4
EPOCH = 10
EPS, ALPHA = 16 / 255, 1.6 / 255


def _tiny_pair(depth=DEPTH, seed=11):
    import jax
    import jax.numpy as jnp
    from transferattack_tpu.models import Surrogate, WrappedModel
    from transferattack_tpu.models.vit import VisionTransformer

    torch.manual_seed(seed)
    tmodel = TViT(dim=64, depth=depth, heads=2).eval()
    backbone = VisionTransformer(patch_size=16, dim=64, depth=depth,
                                 num_heads=2)
    module = WrappedModel(backbone=backbone, size=32,
                          mean=tuple(MEAN), std=tuple(STD))
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    surrogate = Surrogate(name="tiny_vit", module=module,
                          variables=variables, input_size=32)
    return tmodel, _convert(tmodel, surrogate)


def _fwd(tmodel, x_raw):
    """Raw-[0,1] NHWC forward through the wrapped normalization."""
    xn = (x_raw - torch.from_numpy(MEAN)) / torch.from_numpy(STD)
    return tmodel(xn.permute(0, 3, 1, 2))


def _mi_step(delta, momentum, grad, x, decay=1.0):
    momentum = decay * momentum + grad / grad.abs().mean(
        dim=(1, 2, 3), keepdim=True)
    d = torch.clamp(delta.data + ALPHA * momentum.sign(), -EPS, EPS)
    delta = torch.clamp(x + d, 0, 1) - x
    delta.requires_grad_(True)
    return delta, momentum


def _sign_agree(a, b):
    return (np.sign(a) == np.sign(b)).mean()


# --------------------------------------------------------------------- VDC
def torch_vdc(tmodel, x, y, depth=DEPTH):
    """The reference VDC loop (``model_related/vdc.py:466-519``) with its
    actual vit-branch hooks (``vdc.py:64-128,329-333,355-361,406-410``):
    record pass gamma=1.0 hooks on every block's norm2 (grad_in[0] = the
    MLP-branch cotangent at the LN input, damped 0.1·0.5^k in backward
    visit order) and attn.attn_drop (legacy semantics: the softmax node, so
    grad_in[0] is the pre-softmax scores cotangent), plus the final norm
    (cls-row seed); inject pass scales the pass-through cotangents by
    gamma=0.5 (mlp) / 0.25 (attn) and adds the accumulated records."""
    x = torch.from_numpy(x)
    y = torch.from_numpy(y).long()
    st = {}
    hooks = []

    def reset(phase):
        st["phase"] = phase
        st["attn_k"] = st["mlp_k"] = 0
        if phase == "record":
            st["attn_rec"], st["attn_add"] = [], []
            st["mlp_rec"], st["mlp_add"] = [], []

    def norm_record(module, grad_in, grad_out):
        st["norm"] = grad_in[0].data.numpy().copy()
        return grad_in

    def mlp_hook(module, grad_in, grad_out):
        g = grad_in[0]
        if st["phase"] == "record":
            rec = g.data.numpy() * 0.1 * (0.5 ** st["mlp_k"])
            if st["mlp_k"] == 0:
                grad_add = np.zeros_like(rec)
                grad_add[:, 0, :] = st["norm"][:, 0, :] * 0.1 * 0.5
                st["mlp_add"].append(grad_add)
                st["mlp_rec"].append(rec + grad_add)
            else:
                st["mlp_add"].append(st["mlp_rec"][-1])
                st["mlp_rec"].append(st["mlp_rec"][-1] + rec)
            out = 1.0 * g
        else:
            out = 0.5 * g + torch.from_numpy(
                st["mlp_add"][st["mlp_k"]]).float()
        st["mlp_k"] += 1
        return (out,) + tuple(grad_in[1:])

    def attn_hook(module, grad_in, grad_out):
        g = grad_in[0]
        if st["phase"] == "record":
            rec = g.data.numpy() * 0.1 * (0.5 ** st["attn_k"])
            if st["attn_k"] == 0:
                st["attn_add"].append(np.zeros_like(rec))
                st["attn_rec"].append(rec)
            else:
                st["attn_add"].append(st["attn_rec"][-1])
                st["attn_rec"].append(st["attn_rec"][-1] + rec)
            out = 1.0 * g
        else:
            out = 0.25 * g + torch.from_numpy(
                st["attn_add"][st["attn_k"]]).float()
        st["attn_k"] += 1
        return (out,)

    hooks.append(tmodel.norm.register_backward_hook(norm_record))
    for blk in tmodel.blocks:
        hooks.append(blk.norm2.register_backward_hook(mlp_hook))
        hooks.append(blk.attn.attn_drop.register_backward_hook(attn_hook))

    delta = torch.zeros_like(x, requires_grad=True)
    momentum = torch.zeros_like(x)
    for _ in range(EPOCH):
        reset("record")
        loss = F.cross_entropy(_fwd(tmodel, x + delta), y)
        loss.backward()
        delta.grad = None

        reset("add")
        loss = F.cross_entropy(_fwd(tmodel, x + delta), y)
        loss.backward()
        grad = delta.grad.data
        delta, momentum = _mi_step(delta, momentum, grad, x)
    for h in hooks:
        h.remove()
    return delta.detach().numpy()


def test_vdc_two_pass_loop_parity():
    import transferattack_tpu as ta

    tmodel, surrogate = _tiny_pair(seed=11)
    rng = np.random.RandomState(5)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)

    ref = torch_vdc(tmodel, x, y)
    atk = ta.load_attack_class("vdc")(model_name=surrogate, epoch=EPOCH)
    ours = np.asarray(atk(x, y))
    agree = _sign_agree(ref, ours)
    assert agree > 0.98, f"VDC delta sign agreement {agree:.4f}"


# --------------------------------------------------------------------- FPR
NOISY = (0, 1, 3)  # depth-4 analogue of the reference's {0,1,4,9,11}


def torch_fpr(tmodel, x, y, bank, noisy=NOISY, rng_range=25.0):
    """The reference FPR loop (``model_related/fpr.py:49-115``): forward
    hooks only — noisy re-softmaxed attention maps at the noisy blocks
    (per-head multiplier shared over the batch), and cross-iteration
    embedding momentum acc = 0.3·detach(acc) + 0.8·out on every block's
    attn and mlp module outputs (module-id-keyed, never reset)."""
    x = torch.from_numpy(x)
    y = torch.from_numpy(y).long()
    acc = {}
    it = {"i": 0}
    slot = {b: j for j, b in enumerate(noisy)}

    def diverse(module, inp, out, blk):
        M = torch.from_numpy(bank[it["i"], slot[blk]]).float()  # (h, N, N)
        return torch.softmax(out * M[None], dim=-1)

    def emb_momentum(module, inp, out):
        mid = id(module)
        if mid not in acc:
            acc[mid] = (out * 0.8).clone()
        else:
            acc[mid] = 0.3 * acc[mid].clone().detach() + out * 0.8
        return acc[mid]

    from functools import partial

    hooks = []
    for b, blk in enumerate(tmodel.blocks):
        if b in noisy:
            hooks.append(blk.attn.attn_drop.register_forward_hook(
                partial(diverse, blk=b)))
        hooks.append(blk.attn.register_forward_hook(emb_momentum))
        hooks.append(blk.mlp.register_forward_hook(emb_momentum))

    delta = torch.zeros_like(x, requires_grad=True)
    momentum = torch.zeros_like(x)
    for _ in range(EPOCH):
        loss = F.cross_entropy(_fwd(tmodel, x + delta), y)
        grad = torch.autograd.grad(loss, delta)[0]
        delta, momentum = _mi_step(delta, momentum, grad, x)
        it["i"] += 1
    for h in hooks:
        h.remove()
    return delta.detach().numpy()


def test_fpr_forward_refinement_loop_parity():
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, surrogate = _tiny_pair(seed=13)
    rng = np.random.RandomState(7)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    # pre-drawn per-(iteration, noisy-block) per-head multipliers, shared
    # across the batch exactly like the reference's np.random draw
    bank = rng.uniform(1 - 25.0, 1 + 25.0,
                       (EPOCH, len(NOISY), 2, 5, 5)).astype(np.float32)

    ref = torch_fpr(tmodel, x, y, bank)

    FPR = ta.load_attack_class("fpr")

    class PairedFPR(FPR):
        noisy_blocks = NOISY

        def attn_noise(self, key, step, block, shape, dtype):
            slot = {b: j for j, b in enumerate(NOISY)}[block]
            return jnp.asarray(bank)[step, slot].astype(dtype)

    atk = PairedFPR(model_name=surrogate, epoch=EPOCH)
    ours = np.asarray(atk(x, y))
    agree = _sign_agree(ref, ours)
    assert agree > 0.98, f"FPR delta sign agreement {agree:.4f}"
