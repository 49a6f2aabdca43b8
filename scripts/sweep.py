"""Benchmark-table sweep driver (reproduces the reference's README protocol).

Runs a list of attacks over the 1000-image set and evaluates each against the
8 paper models, appending rows to results_eval.txt / results_eval.jsonl —
the programmatic equivalent of the reference's per-attack example scripts
(SURVEY.md §4.2: the README tables are the de facto golden numbers).

Usage:
  python scripts/sweep.py --input_dir ./data --out_root adv_data \
      --attacks mifgsm,dim,tim,sim,admix --model resnet50 [--bf16]

  python scripts/sweep.py --smoke     # real-resolution e2e smoke drive

ASR parity with BASELINE.md requires converted pretrained weights in
$TA_TPU_WEIGHTS_DIR (see utils/convert.py).

The ``--smoke`` mode (VERDICT r2 item 10) is the round-artifact proof
that the 224² compile path works end-to-end on the live platform: it
synthesizes 8 seeded 224² images + labels.csv, drives
``main.py --attack mifgsm`` and ``--eval`` through the CLI (surrogate
weights fall back to seeded-random — this checks the compile/IO path,
not ASR), verifies the written PNGs respect the L∞ bound, and records
a JSON summary in ``SMOKE.json`` at the repo root.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_smoke() -> int:
    import numpy as np
    from PIL import Image

    root = os.path.join("/tmp", "ta_smoke")
    data = os.path.join(root, "data")
    img_dir = os.path.join(data, "images")  # AdvDataset reads <input>/images/
    out = os.path.join(root, "adv")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    names = []
    for i in range(8):
        # structured images (blobs over a gradient), not pure noise —
        # exercises the same value range as the benchmark set
        yy, xx = np.mgrid[0:224, 0:224] / 224.0
        img = np.stack([yy, xx, (yy + xx) / 2], -1)
        for _ in range(4):
            cy, cx, r = rng.uniform(0, 224, 2).tolist() + [rng.uniform(20, 60)]
            mask = ((np.mgrid[0:224, 0:224][0] - cy) ** 2
                    + (np.mgrid[0:224, 0:224][1] - cx) ** 2) < r * r
            img[mask] = rng.uniform(0, 1, 3)
        name = f"smoke_{i}.png"
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(img_dir, name))
        names.append(name)
    with open(os.path.join(data, "labels.csv"), "w") as f:
        f.write("filename,label\n")
        for i, n in enumerate(names):
            f.write(f"{n},{i * 100 + 1}\n")

    t0 = time.perf_counter()
    atk = [sys.executable, os.path.join(REPO, "main.py"),
           "--attack", "mifgsm", "--model", "resnet50",
           "--input_dir", data, "--output_dir", out, "--batchsize", "8",
           "--bf16"]
    print("==>", " ".join(atk), flush=True)
    subprocess.run(atk, check=True)
    t_attack = time.perf_counter() - t0
    ev = [sys.executable, os.path.join(REPO, "main.py"), "--eval",
          "--attack", "mifgsm", "--input_dir", data, "--output_dir", out,
          "--eval_models", "resnet50", "--batchsize", "8"]
    print("==>", " ".join(ev), flush=True)
    subprocess.run(ev, check=True)

    eps = 16 / 255
    quant = 1 / 255  # PNG uint8 round-trip slack (reference writes PNGs too)
    max_linf, nonzero = 0.0, 0
    for n in names:
        clean = np.asarray(Image.open(os.path.join(img_dir, n)), np.float32) / 255
        adv = np.asarray(Image.open(os.path.join(out, n)), np.float32) / 255
        d = float(np.abs(adv - clean).max())
        max_linf = max(max_linf, d)
        nonzero += int(d > 0)
    ok = max_linf <= eps + quant and nonzero == len(names)
    import jax
    rec = {"smoke": "mifgsm/resnet50/224x224/batch8",
           "platform": jax.devices()[0].platform,
           "attack_seconds": round(t_attack, 2),
           "max_linf": round(max_linf, 5), "eps": round(eps, 5),
           "nonzero_deltas": nonzero, "ok": ok}
    with open(os.path.join(REPO, "SMOKE.json"), "w") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return 0 if ok else 1

UNTARGETED_DEFAULT = (
    "fgsm,ifgsm,mifgsm,nifgsm,pifgsm,vmifgsm,vnifgsm,emifgsm,dim,tim,sim,"
    "admix,ssm,bsr,sia,fia,naa,taig"
)


def main():
    p = argparse.ArgumentParser()
    if "--smoke" in sys.argv:
        sys.exit(run_smoke())
    p.add_argument("--input_dir", default="./data")
    p.add_argument("--out_root", default="./adv_data")
    p.add_argument("--attacks", default=UNTARGETED_DEFAULT)
    p.add_argument("--model", default="resnet50")
    p.add_argument("--batchsize", default=32, type=int)
    p.add_argument("--targeted", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--skip_eval", action="store_true")
    p.add_argument("--eval_models", default="", type=str,
                   help="comma list overriding the 8 paper eval models")
    args = p.parse_args()

    for attack in args.attacks.split(","):
        out_dir = os.path.join(args.out_root, attack, args.model)
        cmd = [
            sys.executable, os.path.join(REPO, "main.py"),
            "--attack", attack, "--model", args.model,
            "--input_dir", args.input_dir, "--output_dir", out_dir,
            "--batchsize", str(args.batchsize), "--skip_existing",
        ]
        if args.targeted:
            cmd.append("--targeted")
        if args.bf16:
            cmd.append("--bf16")
        print("==>", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True)
        if not args.skip_eval:
            eval_cmd = [
                sys.executable, os.path.join(REPO, "main.py"), "--eval",
                "--attack", attack,
                "--input_dir", args.input_dir, "--output_dir", out_dir,
                "--batchsize", str(args.batchsize),
            ]
            if args.targeted:
                eval_cmd.append("--targeted")
            if args.eval_models:
                eval_cmd.extend(["--eval_models", args.eval_models])
            print("==>", " ".join(eval_cmd), flush=True)
            subprocess.run(eval_cmd, check=True)


if __name__ == "__main__":
    main()
