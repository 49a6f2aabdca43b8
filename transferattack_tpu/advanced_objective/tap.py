"""TAP — transferable adversarial perturbation (reference:
``transferattack/advanced_objective/tap.py``, ECCV 2018).

Loss = CE + λ·Σ_layers ||sign(f)·|f|^α − sign(f')·|f'|^α||² + η·|avgpool(x−x')|
over ALL per-block features.  The reference hooks every backbone submodule
(``tap.py:70-82``); here per-stage sown features stand in for the layer set.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..attack import Attack, AttackState, softmax_cross_entropy


class TAP(Attack):
    """Official args (``tap.py:30``): lam=0.005, alpha_tap=0.5, s=3,
    yita=0.01, epoch=100."""

    def __init__(self, model_name="resnet50", epoch=100, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, lam=0.005, alpha_tap=0.5, s=3, yita=0.01, targeted=False,
                 random_start=False, norm="linfty", loss="crossentropy",
                 attack="TAP", **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.lam = float(lam)
        self.alpha_tap = float(alpha_tap)
        self.s = int(s)
        self.yita = float(yita)

    def _feats(self, variables, x):
        _, feats = self.model.apply_with_feats(variables, x, "stage")
        leaves = [l for l in jax.tree.leaves(feats)]
        return leaves

    def _powsign(self, f):
        return jnp.sign(f) * jnp.abs(f) ** self.alpha_tap

    def run(self, variables, x, y, key):
        orig_feats = [
            jax.lax.stop_gradient(f) for f in self._feats(variables, x)
        ]
        state = self.init_state(x, y, key)

        def tap_loss(delta):
            xadv = x + delta
            logits, feats = self.model.apply_with_feats(variables, xadv, "stage")
            l1 = softmax_cross_entropy(logits, y).mean()
            l2 = 0.0
            for fo, fn_ in zip(orig_feats, jax.tree.leaves(feats)):
                diff = self._powsign(fo) - self._powsign(fn_)
                l2 = l2 + self.lam * jnp.sum(diff**2)
            pooled = nn.avg_pool(
                x - xadv, (self.s, self.s), strides=(self.s, self.s)
            )
            # p*sign(p) == |p| but with torch's |.| subgradient (0 at 0):
            # jnp.abs differentiates to 1 at exactly 0, which would bias the
            # very first step (delta==0 -> pooled==0) away from the reference
            l3 = self.yita * jnp.sum(pooled * jnp.sign(pooled))
            total = l1 + l2 + l3
            return -total if self.targeted else total

        def body(st, _):
            k, _ = jax.random.split(st.key)
            grad = jax.grad(tap_loss)(st.delta)
            delta = self.update_delta(st.delta, x, grad)
            return st.replace(delta=delta, key=k, step=st.step + 1), None

        state, _ = jax.lax.scan(body, state, None, length=self.epoch)
        return self.finalize(state, x, y)


class Fuzziness_Tuned(Attack):
    """Fuzziness-tuned logits (``fuzziness_tuned.py:28-79``): scale the
    true-class logit by K then temperature-divide before CE."""

    def __init__(self, model_name="resnet50", epoch=10, eps=16 / 255, alpha=1.6 / 255,
                 decay=1.0, K=0.8, T=2.0, targeted=False, random_start=False,
                 norm="linfty", loss="crossentropy", attack="Fuzziness_Tuned",
                 **kwargs):
        super().__init__(model_name, epoch=epoch, eps=eps, alpha=alpha, decay=decay,
                         targeted=targeted, random_start=random_start, norm=norm,
                         loss=loss, attack=attack, **kwargs)
        self.K = float(K)
        self.T = float(T)

    def get_loss(self, logits, y):
        onehot = jax.nn.one_hot(y, logits.shape[-1], dtype=logits.dtype)
        scaled = logits * (1.0 + (self.K - 1.0) * onehot)
        return super().get_loss(scaled / self.T, y)
