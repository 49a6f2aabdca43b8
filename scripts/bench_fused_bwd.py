"""A/B: Pallas fused bottleneck backward-input vs XLA's own fusion.

The measurement VERDICT r2 item 2 demanded — stage-1 ResNet-50 shapes
(56², 256/64/64 channels) at batch 128, bfloat16, on the real chip.
Three rows: the full bottleneck backward-input chain, and the isolated
3×3 / 1×1 segments, each with a bandwidth-model note.

Usage: python scripts/bench_fused_bwd.py [--batch 128]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def bench(fn, args, label):
    import jax
    import jax.numpy as jnp

    jfn = jax.jit(fn)
    out = jfn(*args)
    _ = float(jax.tree.leaves(out)[0].sum())           # compile + sync
    t0 = time.perf_counter()
    _ = float(jfn(*args).sum())
    est = time.perf_counter() - t0
    reps = max(5, int(10.0 / max(est, 1e-4)))
    t0 = time.perf_counter()
    acc = None
    for _ in range(reps):
        acc = jfn(*args)
    _ = float(acc.sum())
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"case": label, "ms": round(dt * 1e3, 3),
                      "reps": reps}), flush=True)
    return dt


def main():
    import numpy as np
    import jax.numpy as jnp

    from transferattack_tpu.ops import fused_bwd as fb

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    b, h, w = args.batch, 56, 56
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    g = jnp.asarray(rng.randn(b, h, w, 256), dt)
    masks = {
        "out": jnp.asarray(rng.rand(b, h, w, 256) > 0.5, dt),
        "c2": jnp.asarray(rng.rand(b, h, w, 64) > 0.5, dt),
        "c1": jnp.asarray(rng.rand(b, h, w, 64) > 0.5, dt),
    }
    weights = {
        "w1": jnp.asarray(rng.randn(1, 1, 256, 64) * 0.05, dt),
        "w2": jnp.asarray(rng.randn(3, 3, 64, 64) * 0.05, dt),
        "w3": jnp.asarray(rng.randn(1, 1, 64, 256) * 0.05, dt),
    }

    # equality on-chip first (loose: bf16 GEMM accumulation order differs)
    import jax
    ref = jax.jit(fb.bottleneck_bwd_input_jnp)(g, masks, weights)
    out = jax.jit(fb.bottleneck_bwd_input_pallas)(g, masks, weights)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - out.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
    print(json.dumps({"case": "equality", "max_abs_err": err,
                      "rel": err / scale}), flush=True)

    t_xla = bench(fb.bottleneck_bwd_input_jnp, (g, masks, weights),
                  "chain/xla")
    t_pl = bench(fb.bottleneck_bwd_input_pallas, (g, masks, weights),
                 "chain/pallas")

    # isolated 3x3 segment
    d2 = jnp.asarray(rng.randn(b, h, w, 64), dt)
    wcol = fb.flip_3x3_for_bwd(weights["w2"])
    bench(lambda a, m, ww: fb.jnp_bwd_3x3(a, m, ww),
          (d2, masks["c2"], weights["w2"]), "3x3/xla")
    bench(lambda a, m, ww: fb.fused_bwd_3x3(a, m, ww),
          (d2, masks["c2"], wcol), "3x3/pallas")

    # isolated 1x1 segment (conv3 backward: 256 -> 64)
    flat_g = g.reshape(b * h * w, 256)
    flat_m = masks["out"].reshape(b * h * w, 256)
    wt = weights["w3"][0, 0].T
    bench(lambda a, m, ww: fb.jnp_bwd_1x1(a, m, ww), (flat_g, flat_m, wt),
          "1x1/xla")
    bench(lambda a, m, ww: fb.fused_bwd_1x1(a, m, ww), (flat_g, flat_m, wt),
          "1x1/pallas")

    hbm = 819e9  # v5e ~819 GB/s
    bytes_chain = 2 * (b * h * w * (256 * 3 + 64 * 3 + 256))  # bf16 in+out
    print(json.dumps({
        "case": "summary", "batch": b,
        "chain_xla_ms": round(t_xla * 1e3, 3),
        "chain_pallas_ms": round(t_pl * 1e3, 3),
        "speedup": round(t_xla / t_pl, 3),
        "hbm_floor_ms": round(bytes_chain / hbm * 1e3, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
