"""On-chip defense throughput (VERDICT r4 #4): the one wall-clock number the
reference publishes anywhere is randomized smoothing at ≈1 h per 1000 images
on an RTX 4090 (``reference/defense/README.md:35``).  Times each defense's
device-resident core at its official configuration and prints one JSON line
per defense; paste into BASELINE.md.

Usage: python scripts/bench_defense.py [--only rs,at,hgd,nrp,diffpure]
"""
import argparse
import json
import sys
import time
import warnings

sys.path.insert(0, ".")


def _sync(arr):
    # block_until_ready is unreliable over the axon tunnel (CLAUDE.md);
    # force a scalar fetch
    import jax.numpy as jnp

    return float(jnp.asarray(arr).sum())


def bench(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        _sync(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    sel = set(args.only.split(",")) if args.only else None

    warnings.simplefilter("ignore")
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    def emit(name, batch, sec, note):
        print(json.dumps({
            "defense": name, "batch": batch,
            "sec_per_image": round(sec / batch, 4),
            "img_per_sec": round(batch / sec, 2),
            "note": note,
        }), flush=True)

    if sel is None or "rs" in sel:
        # randomized smoothing: sigma=0.5, N=1000 MC draws, resnet50@224
        from transferattack_tpu.defense.rs import Smooth
        from transferattack_tpu.models import make_model

        B = 8
        x = jnp.asarray(rng.rand(B, 224, 224, 3).astype(np.float32))
        sm = Smooth(make_model("resnet50"), sigma=0.5)
        counts = jax.jit(sm._count_votes, static_argnames=("n", "chunk"))
        sec = bench(lambda: counts(sm.model.variables, x, key, 1000, 50))
        emit("rs", B, sec,
             "sigma=0.5 N=1000 votes (reference: ~3.6 s/img on a 4090, "
             "defense/README.md:35)")

    if sel is None or "at" in sel:
        from transferattack_tpu.models import make_model

        B = 32
        x = jnp.asarray(rng.rand(B, 224, 224, 3).astype(np.float32))
        m = make_model("resnet50")
        f = jax.jit(lambda v, xx: m.apply(v, xx).argmax(-1))
        sec = bench(lambda: f(m.variables, x))
        emit("at", B, sec, "fast-AT resnet50 classify (weights timing-only)")

    if sel is None or "hgd" in sel:
        from transferattack_tpu.defense.at import _load_hgd_member

        B = 8
        x = jnp.asarray(rng.rand(B, 299, 299, 3).astype(np.float32))
        denoiser, dvars, cls, _ = _load_hgd_member(
            "hgd_inception_v3", "inception_v3", "weights")

        def hgd_fwd(xx):
            clean = denoiser.apply(dvars, xx)
            return cls.apply(cls.variables, clean).argmax(-1)

        f = jax.jit(hgd_fwd)
        sec = bench(lambda: f(x))
        emit("hgd", B, sec, "DUNET denoise + inc-v3 classify at 299 "
             "(1 of the 4-net ensemble; x4 for the full chain)")

    if sel is None or "nrp" in sel:
        from transferattack_tpu.defense.nrp import load_purifier

        B = 8
        x = jnp.asarray(rng.rand(B, 224, 224, 3).astype(np.float32))
        net, variables = load_purifier()
        f = jax.jit(lambda xx: net.apply(variables, xx))
        sec = bench(lambda: f(x))
        emit("nrp", B, sec, "RRDB-23 purifier forward at 224")

    if sel is None or "diffpure" in sel:
        from transferattack_tpu.defense.diffpure import DiffPure

        # time the REAL defense shape: the full ImageNet-256 guided-diffusion
        # UNet (weights timing-only; the weightless default falls back to a
        # tiny UNet meant for 64² and would OOM its 128² attention at 256²).
        # One jitted Euler–Maruyama step, host loop over the 150 steps — the
        # whole-scan program is too large for the tunnel's compile helper;
        # async dispatch makes the host loop equivalent to the scan.
        B = 1
        x = jnp.asarray(rng.rand(B, 256, 256, 3).astype(np.float32))
        dp = DiffPure(unet_config={})
        n_steps, slice_steps = 150, 20

        # a jitted SCAN of slice_steps EM steps with the UNet variables as
        # an ARGUMENT (closing over them inlines ~2.2 GB of weight
        # constants into the program and kills the tunnel's compile
        # helper); one UNet body in the program
        uvars = dp.unet_vars

        @jax.jit
        def em_slice(v, xt, k):
            t0 = 1.0 - dp.t_star / dp.T

            def step(xt, s, kk):
                beta_s = dp.BETA_MIN + s * (dp.BETA_MAX - dp.BETA_MIN)
                acum = jnp.exp(-0.5 * (dp.BETA_MAX - dp.BETA_MIN) * s * s
                               - dp.BETA_MIN * s)
                tt = jnp.full((xt.shape[0],), jnp.floor(s * dp.T),
                              jnp.float32)
                out = dp.unet.apply(v, xt, tt)
                eps_, _ = jnp.split(out, 2, axis=-1)
                score = -eps_ / jnp.sqrt(1.0 - acum)
                drift = -0.5 * beta_s * xt - beta_s * score
                z = jax.random.normal(kk, xt.shape, xt.dtype)
                return (xt + (-drift) * 1e-3
                        + jnp.sqrt(beta_s) * jnp.sqrt(1e-3) * z)

            def body(carry, i):
                xt, k = carry
                k, sub = jax.random.split(k)
                return (step(xt, 1.0 - (t0 + i * 1e-3), sub), k), None

            (xt, _), _ = jax.lax.scan(
                body, (xt, k), jnp.arange(slice_steps, dtype=jnp.float32))
            return xt

        sec_slice = bench(em_slice, uvars, x * 2.0 - 1.0, key, reps=1)
        sec = sec_slice * (n_steps / slice_steps)
        emit("diffpure", B, sec,
             f"full 256-UNet SDE reverse t*=150, dt=1e-3 -> 150 UNet evals "
             f"at 256 (weights timing-only; {slice_steps}-step device scan "
             f"measured, x{n_steps // slice_steps} extrapolated)")


if __name__ == "__main__":
    main()
