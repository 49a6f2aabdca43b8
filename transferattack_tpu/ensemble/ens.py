"""Ensemble attacks (reference: ``transferattack/ensemble/{ens,svre,cwa,
adaea,smer}.py``).

The reference runs K co-resident torch models serially on one GPU
(``utils.py:94-101``).  Here members are separate Flax surrogates invoked
inside one jit program; random member selection (SVRE/SMER) is a
``lax.switch`` so the whole inner loop stays compiled.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import Attack, AttackState, l1_normalize, softmax_cross_entropy
from ..models import make_ensemble
from ..utils import img_max, img_min


class _MultiModelAttack(Attack):
    """Base for attacks needing per-member forward access."""

    def __init__(self, model_name, **kwargs):
        if not isinstance(model_name, (list, tuple)):
            model_name = ["resnet18", "resnet34", "resnet50", "resnet101"]
        pretrained = kwargs.pop("pretrained", True)
        input_size = kwargs.pop("input_size", None)
        ensemble = make_ensemble(
            list(model_name), pretrained=pretrained, input_size=input_size
        )
        super().__init__(ensemble, **kwargs)
        self.members = ensemble.members
        self.K = len(self.members)

    def member_logits(self, member_variables, x, k: int):
        return self.members[k].apply(member_variables[k], x)

    def member_variables(self, variables):
        # the ensemble variables pack members as members_{i}
        out = []
        for i in range(self.K):
            v = {"params": variables["params"][f"members_{i}"]}
            bs = variables.get("batch_stats", {}).get(f"members_{i}")
            if bs is not None:
                v["batch_stats"] = bs
            out.append(v)
        return out

    def member_grad(self, member_variables, point, y, k, sign=1.0):
        def loss_fn(p):
            logits = self.member_logits(member_variables, p, k)
            ce = softmax_cross_entropy(logits, y).mean()
            return -ce if self.targeted else ce

        return sign * jax.grad(loss_fn)(point)

    def switch_member_grad(self, member_variables, point, y, k_traced):
        """Gradient of a dynamically-selected member via lax.switch."""
        branches = [
            (lambda p, kk=k: self.member_grad(member_variables, p, y, kk))
            for k in range(self.K)
        ]
        return jax.lax.switch(k_traced, branches, point)


class ENS(Attack):
    """Logit-mean ensemble (``ens.py:6-37``): the engine's list-handling
    already builds the mean-logit ensemble; this class exists for registry
    parity and defaults to the 4-CNN paper ensemble."""

    def __init__(self, model_name=None, **kwargs):
        if model_name is None or isinstance(model_name, str):
            from ..utils import cnn_model_paper

            model_name = list(cnn_model_paper)
        kwargs.setdefault("attack", "ENS")
        super().__init__(model_name, **kwargs)


class SVRE(_MultiModelAttack):
    """Stochastic variance-reduced ensemble (``svre.py:28-95``): M=4K inner
    steps against a random member with control-variate correction."""

    def __init__(self, model_name=None, epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, targeted=False, random_start=False, norm="linfty",
                 loss="crossentropy", attack="SVRE", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.M = 4 * self.K

    def get_grad(self, variables, x, y, state: AttackState, key):
        mvars = self.member_variables(variables)

        def ens_loss(p):
            logits = self.model.apply(variables, p)
            ce = softmax_cross_entropy(logits, y).mean()
            return -ce if self.targeted else ce

        grad = jax.grad(ens_loss)(x + state.delta)

        def body(carry, k):
            inner_delta, inner_G = carry
            kk, ksel = jax.random.split(k)
            midx = jax.random.randint(ksel, (), 0, self.K)
            inner_k_grad = self.switch_member_grad(
                mvars, x + inner_delta, y, midx
            )
            adv_k_grad = self.switch_member_grad(mvars, x + state.delta, y, midx)
            gm = inner_k_grad - (adv_k_grad - grad)
            inner_G = self.get_momentum(gm, inner_G)
            inner_delta = self.update_delta(inner_delta, x, inner_G)
            return (inner_delta, inner_G), None

        (_, inner_G), _ = jax.lax.scan(
            body, (state.delta, jnp.zeros_like(x)), jax.random.split(key, self.M)
        )
        return inner_G, {}


class CWA(_MultiModelAttack):
    """Common weakness attack (``cwa.py:20-96``): inner per-member SAM-like
    sweep, outer momentum on the net inner displacement."""

    def __init__(self, model_name=None, epoch=10, eps=16 / 255, alpha=3.2 / 255,
                 decay=1.0, beta=50, r_size=16 / 255 / 15, inner_step_size=250.0,
                 targeted=False, random_start=True, norm="linfty",
                 loss="crossentropy", attack="CWA", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.r_size = float(r_size)
        self.inner_step_size = float(inner_step_size)

    def init_extra(self, x, y):
        return {"inner_momentum": jnp.zeros_like(x)}

    def get_grad(self, variables, x, y, state: AttackState, key):
        mvars = self.member_variables(variables)

        def ens_loss(p):
            logits = self.model.apply(variables, p)
            ce = softmax_cross_entropy(logits, y).mean()
            return -ce if self.targeted else ce

        grad = jax.grad(ens_loss)(x + state.delta)
        # backward step (reverse direction, ``cwa.py:57``)
        inner_delta = jnp.clip(
            state.delta - self.r_size * jnp.sign(grad), -self.eps, self.eps
        )
        inner_delta = jnp.clip(x + inner_delta, img_min, img_max) - x
        inner_momentum = state.extra["inner_momentum"]
        for k in range(self.K):
            g = self.member_grad(mvars, x + inner_delta, y, k)
            n2 = jnp.sqrt(
                jnp.sum(g.reshape(x.shape[0], -1) ** 2, axis=1)
            ).reshape((-1,) + (1,) * (x.ndim - 1))
            inner_momentum = self.decay * inner_momentum + g / (n2 + 1e-12)
            inner_delta = jnp.clip(
                inner_delta + self.inner_step_size * inner_momentum,
                -self.eps, self.eps,
            )
            inner_delta = jnp.clip(x + inner_delta, img_min, img_max) - x
        fake_grad = inner_delta - state.delta
        return fake_grad / (jnp.sum(jnp.abs(fake_grad)) + 1e-12), {
            "inner_momentum": inner_momentum
        }

    def get_momentum(self, grad, momentum):
        # fake_grad is pre-normalized globally (``cwa.py:66``)
        return momentum * self.decay + grad


class AdaEA(_MultiModelAttack):
    """Adaptive ensemble (``adaea.py:30-148``): agreement-weighted logits +
    disparity-reduced gradient filtering."""

    def __init__(self, model_name=None, epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, beta=10.0, threshold=-0.3, targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 attack="AdaEA", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.beta = float(beta)
        self.threshold = float(threshold)

    def init_delta(self, x, key):
        # AdaEA starts from small gaussian noise (``adaea.py:50``)
        return 0.001 * jax.random.normal(key, x.shape, x.dtype)

    def get_grad(self, variables, x, y, state: AttackState, key):
        mvars = self.member_variables(variables)
        xadv = x + state.delta
        grads = [self.member_grad(mvars, xadv, y, k) for k in range(self.K)]

        # adaptive gradient modulation (``adaea.py:90-113``): each member's
        # one-ALPHA-step example adv_j, scored by every other member i and
        # normalized by member i's loss on ITS OWN example adv_i
        # (``loss_self[i]`` at ``adaea.py:109``)
        adv = [
            jnp.clip(
                x + jnp.clip(
                    xadv + self.alpha * jnp.sign(grads[j]) - x,
                    -self.eps, self.eps,
                ),
                img_min, img_max,
            )
            for j in range(self.K)
        ]
        loss_self = [
            softmax_cross_entropy(self.member_logits(mvars, adv[i], i), y).mean()
            for i in range(self.K)
        ]
        w = []
        for j in range(self.K):
            wj = 0.0
            for i in range(self.K):
                if i == j:
                    continue
                ce_ij = softmax_cross_entropy(
                    self.member_logits(mvars, adv[j], i), y
                ).mean()
                wj = wj + ce_ij / (loss_self[i] + 1e-12) * self.beta
            w.append(wj)
        alpha_w = jax.nn.softmax(jnp.stack(w))

        # disparity-reduced filter: mean pairwise channel-cosine per pixel.
        # The reference's row loop (``adaea.py:115-137``) guards the row
        # write with a stale inner-loop ``j``, so the LAST model's row is
        # never written and stays zero — replicated here for parity.
        def channel_norm(g):
            return g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-8)

        sims = []
        for i in range(self.K):
            if i == self.K - 1:
                sims.append(jnp.zeros(x.shape[:-1], x.dtype))
                continue
            acc = 0.0
            for j in range(self.K):
                if i == j:
                    continue
                acc = acc + jnp.sum(
                    channel_norm(grads[i]) * channel_norm(grads[j]), axis=-1
                )
            sims.append(acc / (self.K - 1))
        cos_map = jnp.stack(sims).mean(0)[..., None]
        mask = (cos_map >= self.threshold).astype(x.dtype)

        def weighted_loss(delta):
            logits = 0.0
            for k in range(self.K):
                logits = logits + alpha_w[k] * self.member_logits(
                    mvars, x + delta, k
                )
            ce = softmax_cross_entropy(logits, y).mean()
            return -ce if self.targeted else ce

        grad = jax.grad(weighted_loss)(state.delta)
        return grad * mask, {}


class SMER(_MultiModelAttack):
    """RL-reweighted per-model sampling (``smer.py:28-138``): 4K inner steps
    against shuffled members with learnable per-member logit weights updated
    by an outer −log(ensemble loss) objective."""

    def __init__(self, model_name=None, epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, lr=2e-2, weight_decay=2e-3, targeted=False,
                 random_start=True, norm="linfty", loss="crossentropy",
                 attack="SMER", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.m_smer = self.K * 4
        self.lr = float(lr)
        self.weight_decay = float(weight_decay)

    def init_extra(self, x, y):
        return {"weights": jnp.ones((self.K,), x.dtype)}

    def get_grad(self, variables, x, y, state: AttackState, key):
        mvars = self.member_variables(variables)

        def member_ce(p, k, wsel):
            branches = [
                (lambda pp, kk=i: self.member_logits(mvars, pp, kk))
                for i in range(self.K)
            ]
            logits = jax.lax.switch(k, branches, p) * wsel[k]
            ce = softmax_cross_entropy(logits, y).mean()
            return -ce if self.targeted else ce

        def group_loss(wsel, p):
            logits = 0.0
            for i in range(self.K):
                logits = logits + self.member_logits(mvars, p, i) * wsel[i] / self.K
            ce = softmax_cross_entropy(logits, y).mean()
            return ce if not self.targeted else -ce

        # shuffled member schedule: K groups of a permutation each
        perms = []
        for i in range(self.m_smer // self.K):
            key, sub = jax.random.split(key)
            perms.append(jax.random.permutation(sub, self.K))
        schedule = jnp.concatenate(perms)

        def body(carry, k_idx):
            inner_delta, grad_inner, wsel = carry
            g = jax.grad(member_ce)(x + inner_delta, k_idx, wsel)
            # outer objective tunes the weights: −log(group CE)
            gw = jax.grad(
                lambda w: -jnp.log(group_loss(w, x + inner_delta) + 1e-12)
            )(wsel)
            wsel = wsel - self.lr * (gw + self.weight_decay * wsel)
            grad_inner = self.get_momentum(g, grad_inner)
            inner_delta = self.update_delta(inner_delta, x, grad_inner)
            return (inner_delta, grad_inner, wsel), None

        (inner_delta, grad_inner, wsel), _ = jax.lax.scan(
            body, (state.delta, jnp.zeros_like(x), state.extra["weights"]),
            schedule,
        )
        return grad_inner, {"weights": wsel}
