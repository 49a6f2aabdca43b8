"""Weights-present ASR gate (VERDICT r1 weak item 1).

When `$TA_TPU_WEIGHTS_DIR` holds converted pretrained checkpoints, this
driver reproduces a subset of the BASELINE.md untargeted rows end-to-end
(attack → eval over the available eval models) and reports pass/fail per
cell against the reference numbers.

Tolerance: ±1.0 ASR point is the SURVEY §4 acceptance band for attacks with
no stochastic augmentation; sampled-augmentation attacks (DIM/SSM/BSR/...)
get ±2.5 to absorb RNG-stream differences between torch and JAX (the
protocol itself is seeded differently per framework).

Usage:
  python scripts/asr_gate.py --input_dir ./data [--rows mifgsm,dim,...]

Exits 1 if any weights-backed row falls outside tolerance; exits 0
(with a SKIP notice) when no converted weights are present.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# BASELINE.md untargeted rows: attack → ASR % per eval model
# (columns: resnet50, vgg16, mobilenet_v2, inception_v3)
BASELINE_ROWS = {
    "mifgsm": (99.9, 57.9, 53.4, 37.4),
    "ifgsm": (99.6, 36.5, 33.6, 17.7),
    "nifgsm": (100.0, 66.5, 59.3, 38.9),
    "dim": (98.7, 71.0, 66.2, 57.1),
    "tim": (97.8, 57.9, 46.9, 38.9),
    "sim": (100.0, 70.2, 64.4, 52.1),
    "admix": (100.0, 79.9, 77.7, 67.7),
    "vmifgsm": (99.6, 70.8, 66.9, 57.3),
    "ssm": (98.0, 88.8, 86.4, 83.1),
    "bsr": (99.0, 96.8, 95.6, 90.8),
    "sgm": (100.0, 73.2, 75.7, 45.9),
    "fia": (98.0, 71.2, 65.8, 40.2),
}
EVAL_MODELS = ("resnet50", "vgg16", "mobilenet_v2", "inception_v3")
DETERMINISTIC = {"mifgsm", "ifgsm", "nifgsm", "sim", "sgm", "tim"}


def weights_present(names):
    root = os.environ.get("TA_TPU_WEIGHTS_DIR",
                          os.path.join(os.getcwd(), "weights"))
    return all(os.path.exists(os.path.join(root, f"{n}.npz")) for n in names)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", default="./data")
    p.add_argument("--out_root", default="./adv_data_gate")
    p.add_argument("--rows", default=",".join(BASELINE_ROWS))
    p.add_argument("--batchsize", default=32, type=int)
    args = p.parse_args()

    if not weights_present(EVAL_MODELS):
        print("SKIP: converted pretrained weights not present in "
              "$TA_TPU_WEIGHTS_DIR — the ASR gate needs "
              f"{EVAL_MODELS} (see utils/convert.py --list).")
        return 0

    failures = []
    for attack in args.rows.split(","):
        expect = BASELINE_ROWS.get(attack)
        if expect is None:
            continue
        out_dir = os.path.join(args.out_root, attack)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "main.py"),
             "--input_dir", args.input_dir, "--output_dir", out_dir,
             "--attack", attack, "--model", "resnet50",
             "--batchsize", str(args.batchsize)],
            check=True, cwd=REPO,
        )
        subprocess.run(
            [sys.executable, os.path.join(REPO, "main.py"), "--eval",
             "--input_dir", args.input_dir, "--output_dir", out_dir,
             "--attack", attack,
             "--eval_models", ",".join(EVAL_MODELS),
             "--batchsize", str(args.batchsize)],
            check=True, cwd=REPO,
        )
        rows = [json.loads(l) for l in open(os.path.join(REPO, "results_eval.jsonl"))]
        got = {r["eval_model"]: r["asr"] for r in rows
               if r["output_dir"] == out_dir}
        tol = 1.0 if attack in DETERMINISTIC else 2.5
        for model, exp in zip(EVAL_MODELS, expect):
            asr = got.get(model)
            ok = asr is not None and abs(asr - exp) <= tol
            status = "ok" if ok else "FAIL"
            print(f"[{status}] {attack:10s} {model:14s} got={asr} "
                  f"expected={exp}±{tol}")
            if not ok:
                failures.append((attack, model, asr, exp))
    if failures:
        print(f"{len(failures)} cells outside tolerance")
        return 1
    print("ASR gate passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
