"""Per-family throughput table (BASELINE.md): the heavy estimator attacks
where the copies/neighbor axes are where TPU vectorization pays off.

Usage: python scripts/bench_families.py [--batch 32] [--reps 3]
Prints one JSON line per family; paste the table into BASELINE.md.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


CASES = [
    # (key, model, kwargs, note)
    ("mifgsm", "resnet50", {}, "baseline, 10 iters"),
    ("vmifgsm", "resnet50", {}, "20-neighbor variance tuning"),
    ("ssm", "resnet50", {}, "20 spectrum copies (DCT)"),
    ("bsr", "resnet50", {}, "20 block-shuffled copies"),
    ("ens", ["resnet50", "vgg16", "mobilenet_v2", "inception_v3"], {},
     "4-CNN logit-mean ensemble"),
    ("tgr", "vit_base_patch16_224", {}, "ViT surrogate, token-grad surgery"),
    ("l2t", "resnet50", {}, "3 learned 2-op aug chains (10-way op switch)"),
    ("idaa", "resnet50", {}, "10 warp copies + local mixup, targeted"),
    ("anda", "resnet50", {}, "25 translated views per iteration"),
    # ---- round-4 tail (VERDICT r3 §6): every remaining compute shape ----
    ("rap", "resnet50", {}, "official 400 epochs, 8-step inner adv after "
     "transpoint=100 -> 2500 fwd+bwd passes (250x mifgsm bound)"),
    ("foolmix", "resnet50", {}, "m=5 mix lines x (n=3+z=1) samples + k=5 "
     "dict grads per iter -> ~25x mifgsm bound"),
    ("decowa", "resnet50", {}, "20 elastic warps x (1+rho-step grad) per "
     "iter, host TPS solve -> ~40x bound"),
    ("mef", "resnet50", {}, "20 neighbors x 20 epochs = 400 passes "
     "-> ~40x mifgsm bound"),
    ("fgsra", "resnet50", {}, "20 freq-domain neighbors (DCT mask+noise) "
     "-> ~21x bound"),
    ("cfm", "resnet50", {}, "targeted T=300 protocol, 2 mixed copies via "
     "feature-mix taps -> ~60x bound"),
    ("odi", "resnet50", {}, "num_sample=10 3D renders/iter (barycentric "
     "rasterizer) + TI smoothing, targeted T=300"),
    ("everywhere", "resnet50", {}, "CDTM region views (3x3 grid) x CFM "
     "mixup per iter"),
    ("dra", "resnet50", {}, "checkpoint-surrogate family shape (DRA "
     "fine-tuned weights; random fallback offline) = mifgsm compute"),
    ("trap", "resnet50", {}, "300-epoch two-phase; gather-forward "
     "RandomAffine view each enhance iter (see BASELINE.md warp "
     "experiments)"),
    ("vdc", "vit_base_patch16_224", {}, "ViT virtual dense connection: "
     "attn+mlp cotangent injections"),
]


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    import transferattack_tpu as ta

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.batch, 224, 224, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 1000, size=(args.batch,)).astype(np.int32))

    for key, model, kwargs, note in CASES:
        if args.only and key not in args.only.split(","):
            continue
        try:
            atk = ta.load_attack_class(key)(
                model_name=model, compute_dtype="bfloat16", **kwargs)
            # honor the attack's documented device-fault batch cap the same
            # way main.py does (e.g. DeCowA's TPS double-grad faults the v5e
            # worker at batch 32 bfloat16 -- decowa.py requires_batchsize)
            batch = min(args.batch,
                        getattr(atk, "requires_batchsize", args.batch)
                        or args.batch)
            xb, yb = x[:batch], y[:batch]
            run = jax.jit(atk.run)
            v = atk.model.variables
            # targeted attacks consume (source, target) label pairs
            yk = jnp.stack([yb, (yb + 7) % 1000], 1) if atk.targeted else yb
            yk = atk.prepare_labels(yk)
            t0 = time.perf_counter()
            _ = float(run(v, xb, yk, jax.random.PRNGKey(9)).sum())
            compile_s = time.perf_counter() - t0
            # calibrate reps for >=10s of device work so the ~1s tunnel
            # round-trip cannot dominate the measurement
            t0 = time.perf_counter()
            _ = float(run(v, xb, yk, jax.random.PRNGKey(10)).sum())
            est = time.perf_counter() - t0
            reps = max(args.reps, int(10.0 / max(est, 1e-3)) + 1)
            t0 = time.perf_counter()
            outs = [run(v, xb, yk, jax.random.PRNGKey(i)).sum()
                    for i in range(reps)]
            _ = float(jnp.stack(outs).sum())
            dt = time.perf_counter() - t0
            print(json.dumps({
                "attack": key, "note": note,
                "img_per_sec": round(batch * reps / dt, 2),
                "batch": batch, "reps": reps,
                "compile_s": round(compile_s, 1),
            }), flush=True)
        except Exception as exc:
            print(json.dumps({"attack": key, "error": str(exc)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
