"""CLI driver — parity with the reference ``main.py`` (attack + eval modes).

Attack mode: craft adversarial PNGs for every image in ``input_dir`` and save
``images + delta`` to ``output_dir`` (per-target-class subdirs for the
generation attacks ttp/m3d/rfcoa/aim, reference ``main.py:44-50``).

Eval mode: score ASR over the 8 paper models and append a markdown row to
``results_eval.txt`` (reference ``main.py:54-94``).

TPU-native differences: batches are sharded over a device mesh
(``transferattack_tpu.parallel``), the whole attack loop is one jit-compiled
``lax.scan`` per batch shape, and eval model forwards are jit-compiled.
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np

# honor JAX_PLATFORMS=cpu for CLI runs: the environment's sitecustomize
# pre-imports jax onto the axon TPU backend regardless of the env var, so
# an explicit config update is required (see tests/conftest.py)
if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import transferattack_tpu as ta
from transferattack_tpu.config import build_attack
from transferattack_tpu.models import make_model
from transferattack_tpu.parallel import ShardedAttackRunner, make_mesh
from transferattack_tpu.utils import (
    AdvDataset,
    cnn_model_paper,
    generation_target_classes,
    save_images,
    vit_model_paper,
)

GENERATION_TARGETED = ("ttp", "m3d", "rfcoa", "aim")


def parse_fraction(s: str) -> float:
    """Accept '16/255' (the protocol's natural notation) or a plain float."""
    if "/" in s:
        num, den = s.split("/", 1)
        return float(num) / float(den)
    return float(s)


def get_parser():
    # flag surface mirrors the reference CLI (``main.py:10-26``); --GPU_ID is
    # accepted for script parity but ignored (device selection is JAX's)
    p = argparse.ArgumentParser(description="TPU-native TransferAttack")
    p.add_argument("-e", "--eval", action="store_true", help="attack/evaluation")
    p.add_argument("--attack", default="mifgsm", type=str)
    # hyperparameter flags default to None = "use the attack's official
    # defaults"; explicit values override them (the reference parses these
    # but never forwards them, main.py:41 — SURVEY §5 said fix, not replicate)
    p.add_argument("--epoch", default=None, type=int,
                   help="override the attack's official iteration count")
    p.add_argument("--batchsize", default=32, type=int)
    p.add_argument("--eps", default=None, type=parse_fraction,
                   help="override epsilon (accepts 16/255 or 0.0627)")
    p.add_argument("--alpha", default=None, type=parse_fraction,
                   help="override step size (accepts 1.6/255 or float)")
    p.add_argument("--momentum", default=None, type=float,
                   help="override the momentum decay factor")
    p.add_argument("--model", default="resnet50", type=str)
    p.add_argument("--ensemble", action="store_true")
    p.add_argument("--input_dir", default="./data", type=str)
    p.add_argument("--output_dir", default="./results", type=str)
    p.add_argument("--targeted", action="store_true")
    p.add_argument("--GPU_ID", default="0", type=str)
    # TPU-native extras
    p.add_argument("--no_mesh", action="store_true", help="disable data-parallel mesh")
    p.add_argument("--model_axis", default=0, type=int,
                   help="place ensemble members on their own mesh axis of "
                        "this size (devices reshape to (data, model); "
                        "psum logit-mean over ICI). 0 = members co-resident")
    p.add_argument("--eval_models", default="", type=str,
                   help="comma list overriding the 8 paper eval models")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 surrogate compute (fp32 updates)")
    p.add_argument("--skip_existing", action="store_true",
                   help="resume: skip batches whose output PNGs already exist")
    p.add_argument("--checkpoint_every", default=0, type=int,
                   help="orbax-checkpoint the attack state every N iterations "
                        "so an interrupted long sweep (T=300 targeted) "
                        "resumes mid-batch; disables the mesh pipeline")
    p.add_argument("--profile_dir", default="", type=str,
                   help="write a jax.profiler trace of the first batch here")
    return p.parse_args()


def run_attack(args) -> None:
    os.makedirs(args.output_dir, exist_ok=True)
    model = args.model.split(",") if (args.ensemble or "," in args.model) else args.model
    kwargs = {"compute_dtype": "bfloat16"} if args.bf16 else {}
    attacker = build_attack(
        args.attack, model_name=model, targeted=args.targeted,
        overrides={"epoch": args.epoch, "eps": args.eps, "alpha": args.alpha,
                   "momentum": args.momentum},
        **kwargs,
    )
    if attacker.requires_batchsize is not None:
        args.batchsize = attacker.requires_batchsize
    # generation attacks run a generator forward, not the scan engine —
    # they have no `.run` for the sharded wrapper to jit
    resumable = (args.checkpoint_every > 0
                 and getattr(attacker, "supports_resume", lambda: False)())
    shardable = hasattr(attacker, "run") and not args.no_mesh and not resumable
    mesh = make_mesh()
    if (args.model_axis > 0 and shardable
            and getattr(attacker.model, "members", None)):
        from transferattack_tpu.parallel import (data_model_mesh,
                                                 mesh_ensemble_surrogate)

        mesh = data_model_mesh(args.model_axis)
        attacker.model = mesh_ensemble_surrogate(attacker.model, mesh)
    runner = ShardedAttackRunner(attacker, mesh) if shardable else attacker
    dataset = AdvDataset(
        input_dir=args.input_dir, output_dir=args.output_dir, targeted=args.targeted
    )
    profiled = False
    pending = None
    t_start, n_done = time.perf_counter(), 0
    for batch_no, (images, labels, names) in enumerate(
            dataset.as_batches(args.batchsize)):
        if args.skip_existing and all(
            os.path.exists(os.path.join(args.output_dir, n)) for n in names
        ):
            continue
        ctx = None
        if args.profile_dir and not profiled:
            import jax

            ctx = jax.profiler.trace(args.profile_dir)
            ctx.__enter__()
        if args.attack in GENERATION_TARGETED:
            for idx, target_class in enumerate(generation_target_classes):
                delta = np.asarray(runner(images, labels, idx=idx))
                sub = os.path.join(args.output_dir, str(target_class))
                save_images(sub, images + delta, names)
        elif hasattr(runner, "dispatch"):
            # pipeline: dispatch this batch, then write the PREVIOUS batch's
            # PNGs while the chip works
            handle = runner.dispatch(images, labels)
            if pending is not None:
                ph, pimages, pnames = pending
                save_images(args.output_dir, pimages + ph(), pnames)
            pending = (handle, images, names)
        elif resumable:
            delta = np.asarray(attacker.call_resumable(
                images, labels,
                ckpt_dir=os.path.join(args.output_dir, "_ckpt"),
                every=args.checkpoint_every, idx=batch_no))
            save_images(args.output_dir, images + delta, names)
        else:
            delta = np.asarray(runner(images, labels))
            save_images(args.output_dir, images + delta, names)
        if ctx is not None:
            ctx.__exit__(None, None, None)
            profiled = True
        n_done += len(names)
    if pending is not None:
        ph, pimages, pnames = pending
        save_images(args.output_dir, pimages + ph(), pnames)
    dt = time.perf_counter() - t_start
    if n_done:
        print(f"[{args.attack}] {n_done} images in {dt:.1f}s "
              f"({n_done / dt:.1f} img/s end-to-end incl. IO+compile)")
    # machine-readable record of any random-init stand-ins that ran
    # (VERDICT r1: fallbacks must not be silent)
    from transferattack_tpu.utils.weights_manifest import fallback_weights_used

    fallbacks = fallback_weights_used()
    import json

    with open(os.path.join(args.output_dir, "attack_meta.json"), "w") as f:
        json.dump({"attack": args.attack, "model": args.model,
                   "targeted": bool(args.targeted), "n_images": n_done,
                   "fallback_weights_used": fallbacks}, f, indent=1)
    if fallbacks:
        print(f"[{args.attack}] WARNING: random-init fallbacks ran for: "
              f"{', '.join(fallbacks)} (outputs are not paper-comparable)")


def evaluate_model(surrogate, dataset, batchsize: int, is_targeted: bool) -> float:
    """ASR for one eval model (reference ``main.py:80-94``).

    The forward is data-parallel over the full device mesh (SURVEY.md §2.10
    item 1 applies to eval too — the reference's eval loop is half the
    pipeline wall-clock at 8 models × 1000 images); ragged final batches
    pad up to the device count and the padded rows are sliced off before
    scoring."""
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.parallel import (batch_sharding, make_mesh,
                                             pad_to_multiple, replicated)

    mesh = make_mesh()
    n_dev = mesh.devices.size
    if n_dev > 1:
        apply = jax.jit(
            surrogate.module.apply,
            in_shardings=(replicated(mesh), batch_sharding(mesh)),
            out_shardings=batch_sharding(mesh))
    else:
        apply = jax.jit(surrogate.module.apply)
    correct, total = 0, 0
    for images, labels, _ in dataset.as_batches(batchsize):
        if is_targeted and labels.ndim == 2:
            labels = labels[:, 1]
        xp, n = pad_to_multiple(np.asarray(images), n_dev)
        logits = apply(surrogate.variables, jnp.asarray(xp))
        pred = np.asarray(logits.argmax(-1))[:n]
        correct += int((labels == pred).sum())
        total += len(labels)
    acc = correct / max(total, 1)
    return acc * 100 if is_targeted else (1 - acc) * 100


def run_eval(args) -> None:
    if args.eval_models:
        names = args.eval_models.split(",")
    else:
        names = cnn_model_paper + vit_model_paper
    res = "|"
    records = []
    # fallbacks from the attack run that produced these PNGs live in the
    # output dir's attack_meta.json — surface them in the eval records too,
    # so an eval over fallback-generated images is flagged as such
    attack_fallbacks = []
    meta_path = os.path.join(args.output_dir, "attack_meta.json")
    if os.path.exists(meta_path):
        import json

        try:
            with open(meta_path) as f:
                attack_fallbacks = list(
                    json.load(f).get("fallback_weights_used", []))
        except (ValueError, OSError):
            pass
    for name in names:
        t_model = time.perf_counter()
        surrogate = make_model(name)
        if args.bf16:
            import jax
            import jax.numpy as jnp

            surrogate.variables = jax.tree.map(
                lambda v: v.astype(jnp.bfloat16)
                if hasattr(v, "dtype") and v.dtype == jnp.float32 else v,
                surrogate.variables,
            )
        if args.attack in ("ttp", "m3d", "rfcoa"):
            asr = 0.0
            for target_class in generation_target_classes:
                sub = os.path.join(args.output_dir, str(target_class))
                ds = AdvDataset(
                    input_dir=args.input_dir, output_dir=sub, targeted=True,
                    target_class=target_class, eval_mode=True,
                )
                asr += evaluate_model(surrogate, ds, args.batchsize, True)
            asr /= len(generation_target_classes)
        else:
            ds = AdvDataset(
                input_dir=args.input_dir, output_dir=args.output_dir,
                targeted=args.targeted, eval_mode=True,
            )
            asr = evaluate_model(surrogate, ds, args.batchsize, args.targeted)
        eval_s = time.perf_counter() - t_model
        print(f"{name}: {asr:.1f} ({eval_s:.1f}s incl. compile+IO)", flush=True)
        res += f" {asr:.1f} |"
        from transferattack_tpu.utils.weights_manifest import (
            fallback_weights_used,
        )

        records.append({"output_dir": args.output_dir, "attack": args.attack,
                        "eval_model": name, "asr": round(asr, 2),
                        "targeted": bool(args.targeted),
                        "eval_seconds": round(eval_s, 2),
                        "fallback_weights_used": fallback_weights_used(),
                        "attack_fallback_weights_used": attack_fallbacks})
    print(res)
    # reference-compatible markdown row (``main.py:75-77``) + structured
    # JSON records for programmatic consumers (SURVEY.md §5 observability)
    with open("results_eval.txt", "a") as f:
        f.write(args.output_dir + res + "\n")
    import json

    with open("results_eval.jsonl", "a") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def main():
    args = get_parser()
    if args.eval:
        run_eval(args)
    else:
        run_attack(args)


if __name__ == "__main__":
    main()
