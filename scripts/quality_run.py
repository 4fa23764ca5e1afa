"""Round-2 quality run: compressed reference schedule on the rich corpus.

Reference schedule (reference ``train.py:101-109``) divided by
``--schedule-div`` (default 10): same stage proportions, 140k samples
total at div 10 (the reference's full run is 1.4M samples to full
growth).  Run on the real TPU; artifacts (checkpoints, preview PNGs,
metrics.csv) land in ``--out``.

Usage:
  python scripts/quality_run.py --dataset /root/corpus_r2/ds \
      --out /root/runs/quality_r2 [--schedule-div 10] [--compute-dtype bfloat16]
"""

from __future__ import annotations

import _bootstrap  # noqa: F401  (repo root onto sys.path)
import os as _os
import sys as _sys

import argparse
import dataclasses


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--schedule-div", type=int, default=10)
    ap.add_argument("--compute-dtype", default="float32",
                    choices=["float32", "bfloat16", "bfloat16_f32gp"])
    ap.add_argument("--max-stage", type=int, default=None)
    ap.add_argument("--max-iters", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--save-every", type=int, default=2000)
    ap.add_argument("--log-every", type=int, default=200)
    ap.add_argument("--drift-eps", type=float, default=0.0)
    ap.add_argument("--ema-decay", type=float, default=0.0)
    ap.add_argument("--chunk-steps", type=int, default=None,
                    help="iterations per dispatch; raise (e.g. 100) on "
                         "tunnel-bound chips where per-dispatch H2D RTT "
                         "dominates the small growth stages")
    ap.add_argument("--device-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="device-resident corpus storage dtype; bfloat16 "
                         "halves HBM so 2x the corpus fits (compute stays "
                         "f32; tests/test_train.py::test_device_dataset_"
                         "bf16_resident)")
    ap.add_argument("--device-budget-gb", type=float, default=4.0,
                    help="device-resident dataset HBM budget (the r3 4x "
                         "corpus needs ~8 GB; the v5e has 16)")
    ap.add_argument("--run-name", type=str, default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--max-restarts", type=int, default=0, metavar="N",
                    help="supervise the run like `train --max-restarts`: "
                         "relaunch this same command with --resume up to N "
                         "times on exit 75 (stall watchdog / preemption) "
                         "or signal death — multi-hour schedule-div-1 runs "
                         "must survive tunnel wedges unattended "
                         "(VALIDATION.md r3)")
    ap.add_argument("--stall-timeout", type=float, default=900.0,
                    help="device-stall watchdog (exit 75 for a supervised "
                         "--resume relaunch); 0 disables")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. 'cpu' for smoke/"
                         "stability runs while the TPU is busy); the "
                         "harness-pinned JAX_PLATFORMS env cannot be "
                         "overridden from the environment, only here")
    args = ap.parse_args()

    if args.max_restarts > 0:
        # Become the supervisor (same contract as `train --max-restarts`,
        # musicgan_tpu/__main__.py): re-invoke this command minus
        # --max-restarts, adding --resume from attempt 1 on.
        from musicgan_tpu.utils.supervise import run_supervised

        child_args, skip = [], False
        for a in _sys.argv[1:]:
            if skip:
                skip = False
                continue
            if a == "--max-restarts":
                skip = True
                continue
            if a.startswith("--max-restarts="):
                continue
            child_args.append(a)

        def make_cmd(attempt):
            extra = (
                ["--resume"]
                if attempt > 0 and "--resume" not in child_args
                else []
            )
            return [_sys.executable, _os.path.abspath(__file__)] + \
                child_args + extra

        raise SystemExit(run_supervised(make_cmd, args.max_restarts))

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    # The CLI entry enables this (__main__.py), but quality_run calls
    # train() directly: without it every supervisor restart after a
    # device stall recompiles the stage-7 train graphs through the slow
    # remote-compile tunnel (~10 of the ~12 observed recovery minutes).
    from musicgan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from musicgan_tpu.config import TrainConfig
    from musicgan_tpu.train import train

    base = TrainConfig()
    d = args.schedule_div
    cfg = dataclasses.replace(
        base,
        fadein_lengths=tuple(max(1, f // d) for f in base.fadein_lengths),
        train_lengths=tuple(max(1, t // d) for t in base.train_lengths),
        compute_dtype=args.compute_dtype,
        max_stage=args.max_stage,
        seed=args.seed,
        save_every=args.save_every,
        log_every=args.log_every,
        drift_eps=args.drift_eps,
        ema_decay=args.ema_decay,
        device_dataset_budget_bytes=int(args.device_budget_gb * 2**30),
        device_dataset_dtype=args.device_dtype,
        stall_timeout_s=args.stall_timeout,
        nb_epoch=100000,  # schedule-bounded, not epoch-bounded
    )
    if args.chunk_steps is not None:
        cfg = dataclasses.replace(cfg, chunk_steps=args.chunk_steps)
    total = sum(cfg.train_lengths)
    max_iters = args.max_iters
    if max_iters is None:
        # run a little past full growth, like the reference does
        max_iters = int(total * 1.15) // cfg.batch_size
    print(f"[quality_run] schedule/{d}: {total} samples to full growth, "
          f"max_iters={max_iters}, dtype={cfg.compute_dtype}")
    train(
        run_name=args.run_name or f"quality_div{d}_{args.compute_dtype}",
        input_dataset_path=args.dataset,
        output_dir=args.out,
        train_cfg=cfg,
        resume=args.resume,
        max_iters=max_iters,
    )
    from musicgan_tpu.train.loop import PREEMPTED
    from musicgan_tpu.utils.watchdog import EXIT_STALLED

    if PREEMPTED.is_set():
        # same retry contract as the train CLI: a preemption flush is a
        # retryable stop, so a supervising parent relaunches with --resume
        raise SystemExit(EXIT_STALLED)


if __name__ == "__main__":
    main()
