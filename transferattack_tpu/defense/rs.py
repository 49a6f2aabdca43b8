"""RS — randomized smoothing defense (reference: ``defense/rs/core.py:8-112``,
``defense/rs/predict.py``).

``Smooth.predict``: Monte-Carlo vote under N(0, σ²) input noise with a
two-sided binomial test; abstains (−1) when the top-2 counts are not
significantly different.  The reference loops noise batches per image on GPU
(~1 h/1000 images on a 4090, ``defense/README.md:35``); here the noise axis
is vmapped and the whole batch of images runs in one jit program.
"""
from __future__ import annotations

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import binomtest

from ..models import load_npz_variables, make_model
from ..utils.weights_manifest import record_fallback


class Smooth:
    """Official args (``predict.py``): sigma=0.50, N=1000, alpha=0.001."""

    ABSTAIN = -1

    def __init__(self, surrogate, num_classes: int = 1000, sigma: float = 0.5):
        self.model = surrogate
        self.num_classes = num_classes
        self.sigma = float(sigma)
        self._counts_fn = None

    def _count_votes(self, variables, x, key, n: int, chunk: int = 50):
        """(B, num_classes) vote counts over n noise draws (scanned chunks)."""

        def body(acc, k):
            noise = jax.random.normal(
                k, (chunk,) + x.shape, x.dtype
            ) * self.sigma
            pts = jnp.clip(x[None] + noise, 0.0, 1.0)
            flat = pts.reshape((-1,) + x.shape[1:])
            logits = self.model.apply(variables, flat)
            preds = logits.reshape(chunk, x.shape[0], -1).argmax(-1)
            onehot = jax.nn.one_hot(preds, self.num_classes).sum(0)
            return acc + onehot, None

        steps = max(n // chunk, 1)
        init = jnp.zeros((x.shape[0], self.num_classes))
        counts, _ = jax.lax.scan(body, init, jax.random.split(key, steps))
        return counts

    def certify(self, x, key, n0: int = 100, n: int = 1000,
                alpha: float = 0.001, chunk: int = 50):
        """Certified prediction + L2 radius per image (``core.py:18-52``):
        select the top class with n0 draws, lower-bound its probability with
        n draws (Clopper–Pearson), radius = σ·Φ⁻¹(p̲A); abstain below 0.5."""
        from scipy.stats import beta, norm

        k1, k2 = jax.random.split(key)
        if self._counts_fn is None:
            self._counts_fn = jax.jit(
                self._count_votes, static_argnames=("n", "chunk")
            )
        sel = np.asarray(
            self._counts_fn(self.model.variables, jnp.asarray(x), k1,
                            max(n0, chunk), chunk)
        )
        est = np.asarray(
            self._counts_fn(self.model.variables, jnp.asarray(x), k2, n, chunk)
        )
        preds, radii = [], []
        for c_sel, c_est in zip(sel, est):
            cA = int(c_sel.argmax())
            nA = int(c_est[cA])
            total = int(c_est.sum())
            # Clopper–Pearson lower bound at level alpha
            p_lower = beta.ppf(alpha, nA, total - nA + 1) if nA > 0 else 0.0
            if p_lower < 0.5:
                preds.append(self.ABSTAIN)
                radii.append(0.0)
            else:
                preds.append(cA)
                radii.append(float(self.sigma * norm.ppf(p_lower)))
        return np.asarray(preds), np.asarray(radii)

    def predict(self, x, key, n: int = 1000, alpha: float = 0.001,
                chunk: int = 50) -> np.ndarray:
        """Per-image smoothed prediction with abstention (``core.py:53+``)."""
        if self._counts_fn is None:
            self._counts_fn = jax.jit(
                self._count_votes, static_argnames=("n", "chunk")
            )
        counts = np.asarray(
            self._counts_fn(self.model.variables, jnp.asarray(x), key, n, chunk)
        )
        preds = []
        for c in counts:
            top2 = c.argsort()[::-1][:2]
            n1, n2 = int(c[top2[0]]), int(c[top2[1]])
            # two-sided binomial test between the top two counts
            if binomtest(n1, n1 + n2, 0.5).pvalue > alpha:
                preds.append(self.ABSTAIN)
            else:
                preds.append(int(top2[0]))
        return np.asarray(preds)


def run_rs(input_dir: str, output_dir: str, batchsize: int = 16,
           sigma: float = 0.5, n: int = 1000, alpha: float = 0.001,
           model_name: str = "resnet50", ckpt: str = "rs_resnet50_noise050",
           out_csv: str = "rs_predictions.csv", seed: int = 0) -> str:
    """Classify adversarial PNGs with the smoothed classifier and write the
    prediction CSV for ``scoring.asr_from_labels``."""
    from ..utils.data import AdvDataset
    from .scoring import write_label_csv

    surrogate = make_model(model_name)
    root = os.environ.get("TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights"))
    path = os.path.join(root, f"{ckpt}.npz")
    if os.path.exists(path):
        surrogate.variables = load_npz_variables(path)
    else:
        record_fallback("rs_resnet50_sigma050")
        warnings.warn(f"RS: noise-trained checkpoint {path} missing; "
                      "base weights used.")
    smooth = Smooth(surrogate, sigma=sigma)
    ds = AdvDataset(input_dir=input_dir, output_dir=output_dir, eval_mode=True)
    preds = {}
    key = jax.random.PRNGKey(seed)
    for xs, ys, names in ds.as_batches(batchsize):
        key, sub = jax.random.split(key)
        p = smooth.predict(xs, sub, n=n, alpha=alpha)
        for nm, pi in zip(names, p):
            preds[nm] = int(pi)
    out = os.path.join(output_dir, out_csv)
    write_label_csv(out, preds)
    return out
