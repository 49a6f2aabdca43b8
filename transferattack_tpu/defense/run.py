"""Defense CLI driver (the reference's ``defense/*_defense.sh`` equivalents).

Usage:
  python -m transferattack_tpu.defense.run --defense at   --input_dir data --output_dir adv
  python -m transferattack_tpu.defense.run --defense rs   ...
  python -m transferattack_tpu.defense.run --defense nrp  ... --purified_dir purified
  python -m transferattack_tpu.defense.run --defense hgd  ...
  python -m transferattack_tpu.defense.run --defense diffpure ...

AT/HGD/RS/DiffPure emit a prediction CSV and print ASR via the
``check_output`` scorer; NRP writes purified PNGs for a normal
``main.py --eval`` pass (``defense/nrp_defense.sh:14-16``).
"""
from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser(description="TPU defense evaluation")
    p.add_argument("--defense", required=True,
                   choices=["at", "hgd", "rs", "nrp", "diffpure"])
    p.add_argument("--input_dir", default="./data")
    p.add_argument("--output_dir", default="./results")
    p.add_argument("--purified_dir", default="./purified_data")
    p.add_argument("--batchsize", default=16, type=int)
    p.add_argument("--targeted", action="store_true")
    p.add_argument("--sigma", default=0.5, type=float)
    p.add_argument("--N", default=1000, type=int)
    p.add_argument("--dynamic", action="store_true")
    # diffpure defaults per the shipped driver (diffpure_defense.sh:11-13)
    p.add_argument("--t_star", default=150, type=int)
    p.add_argument("--diffusion_type", default="sde", choices=["sde", "ddpm"])
    p.add_argument("--classifier_name", default="resnet101")
    args = p.parse_args()

    label_file = os.path.join(args.input_dir, "labels.csv")
    from .scoring import asr_from_labels

    if args.defense == "at":
        from .at import run_at

        csv_path = run_at(args.input_dir, args.output_dir, args.batchsize)
    elif args.defense == "hgd":
        from .at import run_hgd

        csv_path = run_hgd(args.input_dir, args.output_dir, args.batchsize)
    elif args.defense == "rs":
        from .rs import run_rs

        csv_path = run_rs(args.input_dir, args.output_dir, args.batchsize,
                          sigma=args.sigma, n=args.N)
    elif args.defense == "diffpure":
        from .diffpure import run_diffpure

        csv_path = run_diffpure(args.input_dir, args.output_dir,
                                args.batchsize, t_star=args.t_star,
                                model_name=args.classifier_name,
                                diffusion_type=args.diffusion_type)
    else:  # nrp
        from .nrp import run_nrp

        out = run_nrp(args.input_dir, args.output_dir, args.purified_dir,
                      args.batchsize, dynamic=args.dynamic)
        print(f"Purified images written to {out}; score with "
              f"`python main.py --eval --input_dir {args.input_dir} "
              f"--output_dir {out}`")
        return

    asr = asr_from_labels(label_file, csv_path, targeted=args.targeted)
    print(f"{args.defense.upper()} ASR: {asr:.2f}%")


if __name__ == "__main__":
    main()
