"""Headline benchmark: adversarial images/sec for MI-FGSM / ResNet-50 / 10 iters.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (SURVEY.md §6); BASELINE.md
documents the PyTorch-GPU estimate used as the denominator: ~100 adv images/s
for MI-FGSM(eps=16/255, T=10) on ResNet-50 on a single modern GPU (RTX
4090-class; one fwd+bwd per iteration ≈ a training step, ~1000 img/s single
pass → /10 iterations). ``vs_baseline`` = our adv-img/s ÷ that estimate.

Throughput is weight-independent, so the surrogate runs with fixed-seed random
parameters if no converted checkpoint is present.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

PYTORCH_GPU_BASELINE_IPS = 100.0


def main():
    import transferattack_tpu as ta
    from transferattack_tpu.parallel import ShardedAttackRunner, make_mesh

    batch = 32
    iters = 10
    n_dev = len(jax.devices())
    attacker = ta.load_attack_class("mifgsm")(model_name="resnet50", epoch=iters)
    runner = ShardedAttackRunner(attacker, make_mesh())

    rng = np.random.RandomState(0)
    per_call = batch * max(n_dev, 1)
    x = rng.rand(per_call, 224, 224, 3).astype(np.float32)
    y = rng.randint(0, 1000, size=(per_call,)).astype(np.int32)

    # compile + warmup
    runner(x, y)
    # timed region
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        delta = runner(x, y, idx=i)
    jax.block_until_ready(jnp.asarray(delta))
    dt = time.perf_counter() - t0

    ips = per_call * reps / dt
    print(
        json.dumps(
            {
                "metric": "mifgsm_resnet50_10iter_adv_images_per_sec",
                "value": round(ips, 2),
                "unit": "images/sec",
                "vs_baseline": round(ips / PYTORCH_GPU_BASELINE_IPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
