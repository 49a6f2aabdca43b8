"""ViT-family throughput dissection (VERDICT r3 item 1).

Separates "the ViT backward is slow" from "the TGR surgery is slow" by
benching MI-FGSM (no surgery) and TGR on the same ViT-B/16 at batch 32/128,
optionally dumping a jax.profiler trace for leaf-op analysis.

Usage: python scripts/profile_vit.py [--batches 32,128] [--trace-dir DIR]
       [--only mifgsm_vit,tgr]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def bench_one(key, model, batch, trace_dir, extra=None):
    import numpy as np
    import jax
    import jax.numpy as jnp

    import transferattack_tpu as ta

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 224, 224, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 1000, size=(batch,)).astype(np.int32))
    atk = ta.load_attack_class(key)(
        model_name=model, compute_dtype="bfloat16", **(extra or {}))
    run = jax.jit(atk.run)
    v = atk.model.variables
    t0 = time.perf_counter()
    _ = float(run(v, x, y, jax.random.PRNGKey(9)).sum())
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(run(v, x, y, jax.random.PRNGKey(10)).sum())
    est = time.perf_counter() - t0
    reps = max(3, int(10.0 / max(est, 1e-3)) + 1)
    t0 = time.perf_counter()
    outs = [run(v, x, y, jax.random.PRNGKey(i)).sum() for i in range(reps)]
    _ = float(jnp.stack(outs).sum())
    dt = time.perf_counter() - t0
    ips = batch * reps / dt
    print(json.dumps({
        "case": f"{key}/{model}", "batch": batch,
        "img_per_sec": round(ips, 2), "reps": reps,
        "compile_s": round(compile_s, 1),
        "ms_per_iter": round(1000 * dt / (reps * 10), 2),
    }), flush=True)
    if trace_dir:
        with jax.profiler.trace(f"{trace_dir}/{key}_{model}_b{batch}"):
            _ = float(run(v, x, y, jax.random.PRNGKey(99)).sum())
    return ips


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="32,128")
    ap.add_argument("--trace-dir", type=str, default="")
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    cases = [
        ("mifgsm_vit", "mifgsm", "vit_base_patch16_224", {}),
        ("tgr", "tgr", "vit_base_patch16_224", {}),
    ]
    for b in [int(s) for s in args.batches.split(",")]:
        for name, key, model, extra in cases:
            if args.only and name not in args.only.split(","):
                continue
            try:
                bench_one(key, model, b, args.trace_dir, extra)
            except Exception as exc:
                print(json.dumps({"case": name, "batch": b,
                                  "error": str(exc)[:300]}), flush=True)


if __name__ == "__main__":
    main()
