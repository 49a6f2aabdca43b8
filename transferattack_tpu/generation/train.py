"""Generator training for generation-based attacks.

The reference downloads pre-trained generators (TTP/M3D/CDTP/LTP/... from
HuggingFace, ``generation/*.py`` docstrings); only AIM ships a training path
(``aim.py:11-60``).  In a zero-egress environment the generators must be
trainable in-framework: this module trains a GeneratorResnet against a
surrogate with the TTP-style targeted objective (CE of the generated
adversary toward the target class, with the eps-ball projection inside the
graph), one jit-compiled update per step, checkpointing to the standard
``$TA_TPU_WEIGHTS_DIR/<prefix>_<class>.npz`` layout the attacks load.

Usage:
  python -m transferattack_tpu.generation.train --input_dir ./data \
      --target_class 24 --steps 2000 --ckpt_prefix ttp_resnet50
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..attack import softmax_cross_entropy
from ..models import make_model, save_npz_variables
from .generators import GeneratorResnet


def make_train_step(generator, surrogate, eps: float, lr: float,
                    smooth_weight: float = 0.0):
    opt = optax.adam(lr)

    def loss_fn(params, rest, svars, x, target):
        adv = generator.apply({**rest, "params": params}, x)
        delta = jnp.clip(adv - x, -eps, eps)
        adv = jnp.clip(x + delta, 0.0, 1.0)
        logits = surrogate.apply(svars, adv)
        ce = softmax_cross_entropy(logits, target).mean()
        reg = smooth_weight * jnp.mean(jnp.abs(adv[:, 1:] - adv[:, :-1]))
        return ce + reg

    @jax.jit
    def step(params, opt_state, rest, svars, x, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, rest, svars, x, target)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return opt, step


def train_generator(input_dir: str, target_class: int, steps: int = 2000,
                    batchsize: int = 16, lr: float = 2e-4, eps: float = 16 / 255,
                    model_name: str = "resnet50", ckpt_prefix: str = "ttp_resnet50",
                    seed: int = 0, log_every: int = 100, generator=None) -> str:
    from ..utils.data import AdvDataset

    surrogate = make_model(model_name)
    generator = generator if generator is not None else GeneratorResnet()
    rng = jax.random.PRNGKey(seed)
    ds = AdvDataset(input_dir=input_dir)
    x0, _, _ = next(ds.as_batches(1))
    gvars = generator.init(rng, jnp.asarray(x0))
    params = gvars["params"]
    rest = {k: v for k, v in gvars.items() if k != "params"}
    opt, step = make_train_step(generator, surrogate, eps, lr)
    opt_state = opt.init(params)

    it = 0
    while it < steps:
        for xs, _ys, _names in ds.as_batches(batchsize):
            target = jnp.full((len(xs),), target_class, jnp.int32)
            params, opt_state, loss = step(
                params, opt_state, rest, surrogate.variables,
                jnp.asarray(xs), target,
            )
            if it % log_every == 0:
                print(f"step {it}: loss {float(loss):.4f}", flush=True)
            it += 1
            if it >= steps:
                break
    gvars = {**rest, "params": params}

    root = os.environ.get("TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights"))
    path = os.path.join(root, f"{ckpt_prefix}_{target_class}.npz")
    save_npz_variables(path, gvars)
    print("saved", path)
    return path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", default="./data")
    p.add_argument("--target_class", type=int, required=True)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batchsize", type=int, default=16)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--model", default="resnet50")
    p.add_argument("--ckpt_prefix", default="ttp_resnet50")
    args = p.parse_args()
    train_generator(args.input_dir, args.target_class, args.steps,
                    args.batchsize, args.lr, model_name=args.model,
                    ckpt_prefix=args.ckpt_prefix)


if __name__ == "__main__":
    main()
