"""Benchmark-table sweep driver (reproduces the reference's README protocol).

Runs a list of attacks over the 1000-image set and evaluates each against the
8 paper models, appending rows to results_eval.txt / results_eval.jsonl —
the programmatic equivalent of the reference's per-attack example scripts
(SURVEY.md §4.2: the README tables are the de facto golden numbers).

Usage:
  python scripts/sweep.py --input_dir ./data --out_root adv_data \
      --attacks mifgsm,dim,tim,sim,admix --model resnet50 [--bf16]

ASR parity with BASELINE.md requires converted pretrained weights in
$TA_TPU_WEIGHTS_DIR (see utils/convert.py).
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

UNTARGETED_DEFAULT = (
    "fgsm,ifgsm,mifgsm,nifgsm,pifgsm,vmifgsm,vnifgsm,emifgsm,dim,tim,sim,"
    "admix,ssm,bsr,sia,fia,naa,taig"
)


def main():
    p = argparse.ArgumentParser()
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
