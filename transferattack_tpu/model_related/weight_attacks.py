"""Surrogate-weight-manipulating attacks (reference:
``transferattack/model_related/{mup,awt,faug}.py``).

MUP: per-iteration Taylor-score pruning of conv kernels (smallest 15% of
|w·∂L/∂w| masked) before taking the attack gradient.
AWT: a SAM (sharpness-aware) weight update each iteration, then a PGN-style
neighborhood gradient — the evolving parameters ride the scan carry.
FAUG: gaussian noise injected at the first conv's output via a tap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState, softmax_cross_entropy
from ..gradient.mifgsm import MIFGSM


def _is_conv_kernel(path, leaf):
    return leaf.ndim == 4 and path[-1].key == "kernel"


class MUP(MIFGSM):
    """Mask unimportant parameters (``mup.py:28-130``): mask_ratio=0.15,
    taylor scores, alpha=2/255.  The reference demands batchsize=1; the
    per-batch scores here generalize it.

    Gradient-freshness note: although the reference calls
    ``loss_1.backward(retain_graph=True)`` without ever zeroing grads
    (``mup.py:69-71``), its conv ``.grad``s do NOT accumulate across
    iterations — both ``restore_weight`` (``mup.py:120-128``) and
    ``prune_from_mask`` (``mup.py:127-130``) rebuild each conv weight as a
    fresh ``nn.Parameter`` whose ``.grad`` starts ``None``, so every
    iteration's Taylor score |w·g| uses a fresh per-step gradient (only
    non-conv params, which are never scored, accumulate).  The fresh
    per-step gradient here matches that; iteration-1 masks bit-match the
    torch twin (``tests/test_attack_parity5.py``)."""

    def __init__(self, model_name="resnet50", mask_ratio=0.15, mask_type="taylor",
                 **kwargs):
        kwargs.setdefault("attack", "MUP")
        kwargs.setdefault("alpha", 2 / 255)
        super().__init__(model_name, **kwargs)
        self.mask_ratio = float(mask_ratio)
        self.mask_type = mask_type

    def _pruned_variables(self, variables, x, y, state, key):
        params = variables["params"]

        def param_loss(p):
            v = {**variables, "params": p}
            logits = self.model.apply(v, x + state.delta)
            return self.get_loss(logits[None], y)

        grads = jax.grad(param_loss)(params)

        def prune(path, w, g):
            if not _is_conv_kernel(path, w):
                return w
            if self.mask_type == "taylor":
                scores = jnp.abs(w * g)
            elif self.mask_type == "grad":
                scores = jnp.abs(g)
            else:  # l1: per-spatial-kernel norms broadcast back
                scores = jnp.broadcast_to(
                    jnp.sum(jnp.abs(w), axis=(0, 1), keepdims=True), w.shape
                )
            # the reference takes the int(numel·p)-th order statistic, not an
            # interpolated quantile (``mup.py:86-90``)
            flat = jnp.sort(scores.reshape(-1))
            thresh = flat[int(flat.shape[0] * self.mask_ratio)]
            return w * (scores > thresh).astype(w.dtype)

        pruned = jax.tree_util.tree_map_with_path(
            lambda path, w, g: prune(path, w, g), params, grads
        )
        return {**variables, "params": pruned}

    def get_grad(self, variables, x, y, state: AttackState, key):
        pruned = self._pruned_variables(variables, x, y, state, key)
        pruned = jax.lax.stop_gradient(pruned)

        def loss_fn(delta):
            logits = self.model.apply(pruned, x + delta)
            return self.get_loss(logits[None], y)

        return jax.grad(loss_fn)(state.delta), {}


class AWT(Attack):
    """Adversarial weight tuning (``awt.py``): SAM(lr, rho, momentum=0.5) on
    the surrogate weights per iteration + PGN-style neighbor gradients."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 beta=3.0, gamma=0.5, num_neighbor=20, decay=1.0, sam_lr=0.002,
                 sam_rho=0.005, targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", sample_chunk=4, attack="AWT", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.zeta = beta * self.eps
        self.gamma = float(gamma)
        self.num_neighbor = int(num_neighbor)
        self.sam_lr = float(sam_lr)
        self.sam_rho = float(sam_rho)
        self.sample_chunk = int(sample_chunk)

    def init_extra(self, x, y):
        params = self.model.variables["params"]
        zeros = jax.tree.map(jnp.zeros_like, params)
        return {
            "params": params,
            "sgd_buf": zeros,
            # leftover param-grads: the reference never zeroes grads before
            # the first closure call, so the SAM ascent direction at
            # iteration i is g2_{i-1} + g_closure_i (``awt.py:88-99`` with
            # ``SAM.step`` zeroing only inside ``first_step``)
            "grad_residue": zeros,
        }

    def _sam_update(self, variables, params, buf, residue, x, delta, y):
        def closure_loss(p):
            v = {**variables, "params": p}
            adv = self.model.apply(v, x + delta)
            clean = self.model.apply(v, x)
            return self.get_loss(adv[None], y) + self.get_loss(clean[None], y)

        g_fresh = jax.grad(closure_loss)(params)
        # accumulated ascent grad = previous iteration's perturbed-point grad
        # (never zeroed) + this iteration's closure grad
        g = jax.tree.map(jnp.add, residue, g_fresh)
        gn = jnp.sqrt(
            sum(jnp.sum(v**2) for v in jax.tree.leaves(g))
        ) + 1e-12
        perturbed = jax.tree.map(lambda w, gg: w + self.sam_rho * gg / gn, params, g)
        g2 = jax.grad(closure_loss)(perturbed)
        # SGD(momentum=0.5) from the ORIGINAL weights (SAM second step)
        buf = jax.tree.map(lambda b, gg: 0.5 * b + gg, buf, g2)
        params = jax.tree.map(lambda w, b: w - self.sam_lr * b, params, buf)
        return params, buf, g2

    def neighbor_noise(self, key, x, state, idx):
        """zeta-ball uniform draw (``awt.py:54``) — overridable seam for
        paired-RNG parity twins."""
        return jax.random.uniform(
            key, x.shape, x.dtype, minval=-self.zeta, maxval=self.zeta
        )

    def step(self, variables, x, y, state: AttackState):
        key, sub = jax.random.split(state.key)
        params, buf, residue = self._sam_update(
            variables, state.extra["params"], state.extra["sgd_buf"],
            state.extra["grad_residue"], x, state.delta, y,
        )
        tuned = jax.lax.stop_gradient({**variables, "params": params})

        from ..attack import l1_normalize

        def sample_grad(ki):
            k, idx = ki
            k1, k2, k3 = jax.random.split(k, 3)
            noise = self.neighbor_noise(k1, x, state, idx)

            def ce_at(p):
                logits = self.model.apply(tuned, p)
                return self.get_loss(logits[None], y)

            x_near = x + state.delta + noise
            g1 = jax.grad(ce_at)(x_near)
            x_next = x_near - self.alpha * l1_normalize(g1)
            g2 = jax.grad(ce_at)(x_next)
            return (1 - self.gamma) * g1 + self.gamma * g2

        grads = jax.lax.map(
            sample_grad,
            (jax.random.split(sub, self.num_neighbor),
             jnp.arange(self.num_neighbor)),
            batch_size=min(self.sample_chunk, self.num_neighbor),
        )
        avg = grads.mean(0)
        momentum = self.get_momentum(avg, state.momentum)
        delta = self.update_delta(state.delta, x, momentum)
        return state.replace(
            delta=delta, momentum=momentum, key=key, step=state.step + 1,
            extra={"params": jax.lax.stop_gradient(params),
                   "sgd_buf": jax.lax.stop_gradient(buf),
                   "grad_residue": jax.lax.stop_gradient(residue)},
        )


class FAUG(MIFGSM):
    """Feature augmentation (``faug.py``): additive N(0, (0.3·std(f))²) noise
    at the stem conv output from step burn_in=1 on; alpha=2/255."""

    def __init__(self, model_name="resnet50", noise_type="normal", mean1=0.0,
                 std1=0.3, lower1=-0.2, upper1=0.2, burn_in_steps=1,
                 tap_layer="conv1", **kwargs):
        kwargs.setdefault("attack", "FAUG")
        kwargs.setdefault("alpha", 2 / 255)
        super().__init__(model_name, **kwargs)
        self.noise_type = noise_type
        self.mean1, self.std1 = float(mean1), float(std1)
        self.lower1, self.upper1 = float(lower1), float(upper1)
        self.burn_in = int(burn_in_steps)
        self.tap_layer = tap_layer

    def unit_noise(self, key, shape, dtype, state):
        """Standard-normal draw scaled later by std1·std(feat)
        (``faug.py:150-156``) — overridable seam for paired-RNG twins."""
        return jax.random.normal(key, shape, dtype)

    def get_grad(self, variables, x, y, state: AttackState, key):
        k1, k2 = jax.random.split(key)
        use_noise = (state.step >= self.burn_in).astype(x.dtype)

        def tap(feat):
            if self.noise_type == "normal":
                std = self.std1 * jnp.std(feat)
                noise = self.mean1 + std * self.unit_noise(
                    k1, feat.shape, feat.dtype, state
                )
            else:
                noise = jax.random.uniform(
                    k1, feat.shape, feat.dtype,
                    minval=self.lower1, maxval=self.upper1,
                )
            return feat + use_noise * jax.lax.stop_gradient(noise)

        def loss_fn(delta):
            logits = self.model.apply(
                variables, x + delta, tap_fns={self.tap_layer: tap}
            )
            return self.get_loss(logits[None], y)

        return jax.grad(loss_fn)(state.delta), {}
