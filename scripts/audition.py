"""Audition a training run: render WAVs (+ summary JSONs) from every
checkpoint, to hear/see the generator evolve across growth stages.

Thin CLI wrapper over :func:`musicgan_tpu.evaluate.audition_run` (the
same surface is also available as ``python -m musicgan_tpu eval``).

Usage:
  python scripts/audition.py RUN_DIR [-o OUT_DIR] [--seeds 3] [--nb-vec 2]
"""

from __future__ import annotations

import _bootstrap  # noqa: F401  (repo root onto sys.path)

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("-o", "--out-dir", default=None)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--nb-vec", type=int, default=2)
    ap.add_argument("--saves", type=str, default=None,
                    help="comma-separated save indices (default: all)")
    ap.add_argument("--raw-weights", action="store_true",
                    help="audition the raw generator weights even when the "
                         "checkpoint carries an EMA copy")
    args = ap.parse_args()

    from musicgan_tpu.evaluate import audition_run

    audition_run(
        args.run_dir,
        out_dir=args.out_dir,
        seeds=args.seeds,
        nb_vec=args.nb_vec,
        saves=([int(s) for s in args.saves.split(",")]
               if args.saves else None),
        raw_weights=args.raw_weights,
    )


if __name__ == "__main__":
    main()
