"""MetaSSA — meta-learning in the frequency domain (reference:
``transferattack/model_related/metassa.py``).

The reference's 500-LoC vendored DWT autograd stack reduces to: its custom
``IDWTFunction_2D.forward`` DROPS the LL term (``metassa.py:542-546``, the
commented-out line), so ``inputs_hh = IDWT(DWT(x))`` is the high-pass
projection and ``inputs_ll = x - inputs_hh`` is the Haar LL reconstruction
— a 2×2 block average; both custom backwards are the (symmetric) same
projections, so plain ``jax.grad`` through ``lowfreq`` is exact.  Each
meta-train step runs the model on the LOW-frequency component of the
perturbed point; meta-test runs on the full point.  Both mix clean low/high
features with the live features at a random stage (a·f_lo + b·f_hi +
c·f_live, a+b+c=1, ``metassa.py:600-618``) — a tap replacement here.  The
reference chooses among all 9 torchvision top-level children (conv1..avgpool);
the Flax zoo taps the 4 residual stages, the stages where features change.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attack import AttackState, l1_normalize
from ..gradient.mifgsm import MIFGSM

STAGES = ("stage1", "stage2", "stage3", "stage4")


def lowfreq(x):
    """Haar LL-only reconstruction = 2×2 block average, upsampled back."""
    B, H, W, C = x.shape
    avg = x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))
    return jnp.repeat(jnp.repeat(avg, 2, axis=1), 2, axis=2)


class MetaSSA(MIFGSM):
    """Official args (``metassa.py:32``): n_sample=10."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, n_sample=10, targeted=False, random_start=False,
                 norm="linfty", loss="crossentropy", attack="MetaSSA", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.n_sample = int(n_sample)
        self._stages = None

    def stages(self):
        if self._stages is None:
            probe = self.model.feature
            avail = []
            import jax as _jax

            for s in STAGES:
                try:
                    self.model.feature_shape((1, 32, 32, 3), s)
                    avail.append(s)
                except Exception:
                    pass
            self._stages = tuple(avail) or ("stage1",)
        return self._stages

    def _stage_feats(self, variables, x):
        feats = {}
        for s in self.stages():
            _, f = self.model.feature(variables, x, s)
            feats[s] = jax.lax.stop_gradient(f)
        return feats

    def mix_coeffs(self, key, step, i, phase):
        """(a, b, stage-index) for one mixed forward
        (``metassa.py:600-608``): a ~ U(0,1), b ~ U(0,1-a), c = 1-a-b, and a
        uniformly chosen mixing stage.  Overridable seam for paired-RNG
        twins (``phase`` 0 = meta-train, 1 = meta-test)."""
        k1, k2, k3 = jax.random.split(key, 3)
        a = jax.random.uniform(k1, ())
        b = jax.random.uniform(k2, ()) * (1 - a)
        sel = jax.random.randint(k3, (), 0, len(self.stages()))
        return a, b, sel

    def gauss_draw(self, key, x, step, i, phase):
        """N(0, eps²) exploration noise (``metassa.py:56,113``) — seam."""
        return jax.random.normal(key, x.shape, x.dtype) * self.eps

    def _mixed_logits(self, variables, point, f_lo, f_hi, coeffs):
        # reference weighting (``metassa.py:600-612``): features1 = the
        # LOW-frequency clean features get weight a, features2 = the
        # high-frequency clean features get weight b, the live path c=1-a-b
        a, b, sel = coeffs
        c = 1 - a - b
        taps = {}
        for i, s in enumerate(self.stages()):
            def tap(feat, i=i, s=s):
                mixed = a * f_lo[s] + b * f_hi[s] + c * feat
                return jnp.where(sel == i, mixed, feat)

            taps[s] = tap
        return self.model.apply(variables, point, tap_fns=taps)

    def run(self, variables, x, y, key):
        lo = lowfreq(x)
        hi = x - lo
        f_lo = self._stage_feats(variables, lo)
        f_hi = self._stage_feats(variables, hi)
        state = self.init_state(x, y, key)

        def craft(delta, grad_pre, k, step, i):
            k1, k2 = jax.random.split(k)
            gauss = self.gauss_draw(k1, x, step, i, 0)
            coeffs = self.mix_coeffs(k2, step, i, 0)

            def loss_fn(d):
                # the meta-train live path runs on the LOW-frequency
                # component of the perturbed point (``metassa.py:57-60``:
                # inputs_ll = x_idct - IDWT(DWT(x_idct)), whose custom
                # backward drops the LL path — gradients flow through the
                # block-average projection)
                logits = self._mixed_logits(
                    variables, lowfreq(x + d + gauss), f_lo, f_hi, coeffs
                )
                return self.get_loss(logits[None], y)

            g = jax.grad(loss_fn)(delta)
            momentum = self.get_momentum(g, grad_pre)
            return self.update_delta(delta, x, momentum), momentum

        def body(st, _):
            key, ktr, kte = jax.random.split(st.key, 3)
            # meta-train: n_sample inner updates recording the trajectory
            def train_body(carry, ki):
                k, i = ki
                d, gp = carry
                d, gp = craft(d, gp, k, st.step, i)
                return (d, gp), d

            (adv_delta, grad_pre_train), traj = jax.lax.scan(
                train_body,
                (st.delta, st.extra["grad_pre_train"]),
                (jax.random.split(ktr, self.n_sample),
                 jnp.arange(self.n_sample)),
            )

            # meta-test: normalized gradients at each trajectory point, the
            # live path on the FULL perturbed point (``metassa.py:115-118``)
            def test_body(acc, dki):
                d, k, i = dki
                k1, k2 = jax.random.split(k)
                gauss = self.gauss_draw(k1, x, st.step, i, 1)
                coeffs = self.mix_coeffs(k2, st.step, i, 1)

                def loss_fn(dd):
                    logits = self._mixed_logits(
                        variables, x + dd + gauss, f_lo, f_hi, coeffs
                    )
                    return self.get_loss(logits[None], y)

                g = jax.grad(loss_fn)(d)
                return acc + l1_normalize(g), None

            test_total, _ = jax.lax.scan(
                test_body, jnp.zeros_like(x),
                (traj, jax.random.split(kte, self.n_sample),
                 jnp.arange(self.n_sample)),
            )
            grad_mu = test_total / self.n_sample + st.extra["grad_pre_test"]
            delta = self.update_delta(st.delta, x, grad_pre_train + grad_mu)
            return st.replace(
                delta=delta, key=key, step=st.step + 1,
                extra={"grad_pre_train": grad_pre_train,
                       "grad_pre_test": grad_mu},
            ), None

        state = state.replace(extra={
            "grad_pre_train": jnp.zeros_like(x),
            "grad_pre_test": jnp.zeros_like(x),
        })
        state, _ = jax.lax.scan(body, state, None, length=self.epoch)
        return self.finalize(state, x, y)
