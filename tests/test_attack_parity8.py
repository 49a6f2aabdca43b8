"""Loop-level parity twins, stage 8: the 'bag of tricks' MI-FGSM trio
(``gradient/mifgsm_with_tricks.py``).

RGMIFGSM's multi-restart warm momentum (carried ACROSS directions, divided
by num_directions, then a zero-start main loop), DualMIFGSM's fresh random
start each iteration driving a separate dual adversary, and
Ens_FGSM_MIFGSM's per-iteration direction-averaged gradients.

Random starts are paired through the ``restart_delta`` seams with
pre-drawn banks, so all three run at the deterministic bar.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tests.test_attack_parity import _fresh_pair, torch_forward  # noqa: E402


def _mi_norm(g):
    return g / g.abs().mean(dim=(1, 2, 3), keepdim=True)


def _grad_at(tmodel, xt, delta, yt):
    d = delta.clone().requires_grad_(True)
    loss = F.cross_entropy(torch_forward(tmodel, xt + d), yt)
    return torch.autograd.grad(loss, d)[0]


def test_rgmifgsm_warm_momentum_loop_parity():
    """RGMIFGSM (``mifgsm_with_tricks.py:54-101``): num_directions random
    restarts each run pre_epoch iterations at step alpha·s; the momentum
    buffer is NEVER reset between directions (the ``direction_momentum``
    accumulator in the reference is a dead no-op), is divided by
    num_directions, and seeds a zero-start main loop at step alpha."""
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(84)
    rng = np.random.RandomState(84)
    B = 2
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)
    eps, alpha, decay = 16 / 255, 1.6 / 255, 1.0
    n_dir, pre_epoch, epoch, s = 2, 3, 5, 10.0
    bank = rng.uniform(-eps, eps, size=(n_dir, B, 64, 64, 3)).astype(np.float32)

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    momentum = torch.zeros_like(xt)
    for di in range(n_dir):
        delta = torch.clamp(xt + torch.from_numpy(bank[di]), 0, 1) - xt
        for _ in range(pre_epoch):
            grad = _grad_at(tmodel, xt, delta, yt)
            momentum = decay * momentum + _mi_norm(grad)
            delta = torch.clamp(delta + alpha * s * momentum.sign(), -eps, eps)
            delta = torch.clamp(xt + delta, 0, 1) - xt
    momentum = momentum / n_dir
    delta = torch.zeros_like(xt)
    for _ in range(epoch):
        grad = _grad_at(tmodel, xt, delta, yt)
        momentum = decay * momentum + _mi_norm(grad)
        delta = torch.clamp(delta + alpha * momentum.sign(), -eps, eps)
        delta = torch.clamp(xt + delta, 0, 1) - xt
    ref = delta.numpy()

    RGMIFGSM = ta.load_attack_class("rgmifgsm")
    jbank = jnp.asarray(bank)

    class _Fixed(RGMIFGSM):
        def restart_delta(self, key, xx, idx):
            from transferattack_tpu.utils import img_max, img_min

            return jnp.clip(xx + jbank[idx], img_min, img_max) - xx

    atk = _Fixed(model_name="resnet18", pretrained=False, input_size=64,
                 epoch=epoch, pre_epoch=pre_epoch, num_directions=n_dir, s=s)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"RGMIFGSM delta sign agreement {agree:.4f}"


def test_dual_mifgsm_loop_parity():
    """DualMIFGSM (``mifgsm_with_tricks.py:135-180``): every iteration draws
    a FRESH random-start delta, takes the gradient there, updates both the
    primary momentum (dead) and the dual momentum, and steps only the dual
    adversary, which is returned."""
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(85)
    rng = np.random.RandomState(85)
    B = 2
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)
    eps, alpha, decay, epoch = 16 / 255, 1.6 / 255, 1.0, 8
    bank = rng.uniform(-eps, eps, size=(epoch, B, 64, 64, 3)).astype(np.float32)

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    momentum = torch.zeros_like(xt)
    momentum_dual = torch.zeros_like(xt)
    delta_dual = torch.zeros_like(xt)
    for it in range(epoch):
        delta = torch.clamp(xt + torch.from_numpy(bank[it]), 0, 1) - xt
        grad = _grad_at(tmodel, xt, delta, yt)
        momentum = decay * momentum + _mi_norm(grad)
        momentum_dual = decay * momentum_dual + _mi_norm(grad)
        delta_dual = torch.clamp(
            delta_dual + alpha * momentum_dual.sign(), -eps, eps)
        delta_dual = torch.clamp(xt + delta_dual, 0, 1) - xt
    ref = delta_dual.numpy()

    Dual = ta.load_attack_class("dual_mifgsm")
    jbank = jnp.asarray(bank)

    class _Fixed(Dual):
        def restart_delta(self, key, xx, state, idx=0):
            from transferattack_tpu.utils import img_max, img_min

            return jnp.clip(xx + jbank[state.step], img_min, img_max) - xx

    atk = _Fixed(model_name="resnet18", pretrained=False, input_size=64,
                 epoch=epoch)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"DualMIFGSM delta sign agreement {agree:.4f}"


def test_ens_mifgsm_direction_average_loop_parity():
    """Ens_FGSM_MIFGSM (``mifgsm_with_tricks.py:214-266``): per iteration
    num_d fresh random starts, gradients AVERAGED over directions, both
    momentums updated from the average, only the dual adversary stepped."""
    import jax.numpy as jnp

    import transferattack_tpu as ta

    tmodel, _, surrogate = _fresh_pair(86)
    rng = np.random.RandomState(86)
    B, n_d = 2, 2
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (B,)).astype(np.int32)
    eps, alpha, decay, epoch = 16 / 255, 1.6 / 255, 1.0, 6
    bank = rng.uniform(-eps, eps,
                       size=(epoch, n_d, B, 64, 64, 3)).astype(np.float32)

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y).long()
    momentum = torch.zeros_like(xt)
    momentum_dual = torch.zeros_like(xt)
    delta_dual = torch.zeros_like(xt)
    for it in range(epoch):
        grad_c = torch.zeros_like(xt)
        for nd in range(n_d):
            delta = torch.clamp(xt + torch.from_numpy(bank[it, nd]), 0, 1) - xt
            grad_c = grad_c + _grad_at(tmodel, xt, delta, yt)
        grad = grad_c / n_d
        momentum = decay * momentum + _mi_norm(grad)
        momentum_dual = decay * momentum_dual + _mi_norm(grad)
        delta_dual = torch.clamp(
            delta_dual + alpha * momentum_dual.sign(), -eps, eps)
        delta_dual = torch.clamp(xt + delta_dual, 0, 1) - xt
    ref = delta_dual.numpy()

    Ens = ta.load_attack_class("ens_mifgsm")
    jbank = jnp.asarray(bank)

    class _Fixed(Ens):
        def restart_delta(self, key, xx, state, idx=0):
            from transferattack_tpu.utils import img_max, img_min

            return jnp.clip(xx + jbank[state.step, idx], img_min, img_max) - xx

    atk = _Fixed(model_name="resnet18", pretrained=False, input_size=64,
                 epoch=epoch, num_d=n_d)
    atk.model = surrogate
    ours = np.asarray(atk(x, y))
    agree = (np.sign(ref) == np.sign(ours)).mean()
    assert agree > 0.98, f"Ens_FGSM_MIFGSM delta sign agreement {agree:.4f}"
