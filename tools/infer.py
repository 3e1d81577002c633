#!/usr/bin/env python
"""Prediction saving — counterpart of reference utils/infer.py (infer.sh).

The reference's infer.py is not a separate inference engine: it rebuilds the
val loader and calls the SAME evaluate/evaluate_msf as eval.py, differing
only in always passing save_path for the colorized PNG dumps
(/root/reference/utils/infer.py:62-66,100-130). This driver therefore
delegates to tools/eval.py deliberately — one evaluation code path, with
this CLI preserving the reference's infer.sh surface."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--continue_fpath", default=None)
    ap.add_argument("--exported", default=None,
                    help="serve an AOT artifact (tools/export.py) instead "
                         "of a checkpoint")
    ap.add_argument("--save_path", required=True)
    ap.add_argument("--mst", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--sliding", action=argparse.BooleanOptionalAction,
                    default=False)
    ap.add_argument("--amp", action=argparse.BooleanOptionalAction,
                    default=False)
    ap.add_argument("--val_batch_size", type=int, default=1)
    ap.add_argument("--synthetic-data", action="store_true")
    args = ap.parse_args()

    sys.argv = [sys.argv[0], "--config", args.config,
                "--save_path", args.save_path,
                "--val_batch_size", str(args.val_batch_size)]
    if args.continue_fpath:
        sys.argv += ["--continue_fpath", args.continue_fpath]
    if args.exported:
        sys.argv += ["--exported", args.exported]
    sys.argv += ["--mst" if args.mst else "--no-mst"]
    sys.argv += ["--sliding" if args.sliding else "--no-sliding"]
    sys.argv += ["--amp" if args.amp else "--no-amp"]
    if args.synthetic_data:
        sys.argv += ["--synthetic-data"]
    from tools.eval import main as eval_main
    eval_main()


if __name__ == "__main__":
    main()
