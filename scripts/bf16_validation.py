"""bf16-vs-float32 training convergence comparison (VERDICT item 6).

Runs the same compressed progressive schedule twice (identical seed,
corpus, and iteration budget) at ``compute_dtype=float32`` and
``bfloat16``, then compares the windowed metric trajectories from the two
``metrics.csv`` files.  WGAN losses are non-stationary and the two runs
see different rounding, so the comparison is distributional per stage:
mean critic separation (e_tp - e_tn) and gradient-penalty level must
agree within tolerance, and both runs must stay finite.

Usage:
  python scripts/bf16_validation.py --dataset DS --out-root /root/runs/bf16cmp
"""

from __future__ import annotations

import _bootstrap  # noqa: F401  (repo root onto sys.path)

import argparse
import csv
import os
import subprocess
import sys
from collections import defaultdict


def run(dataset: str, out: str, dtype: str, div: int, max_iters: int,
        seed: int = 0, max_stage: int = 5, platform: str | None = None,
        chunk_steps: int | None = None) -> None:
    cmd = [
        sys.executable, os.path.join(os.path.dirname(__file__), "quality_run.py"),
        "--dataset", dataset, "--out", out, "--schedule-div", str(div),
        "--compute-dtype", dtype, "--max-stage", str(max_stage),
        "--seed", str(seed),
        "--max-iters", str(max_iters), "--save-every", str(10 * max_iters),
    ]
    if platform:
        cmd += ["--platform", platform]
    if chunk_steps:
        cmd += ["--chunk-steps", str(chunk_steps)]
    print("[bf16cmp] running:", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def load_metrics(out: str) -> dict[int, dict[str, list[float]]]:
    per_stage: dict[int, dict[str, list[float]]] = defaultdict(
        lambda: defaultdict(list)
    )
    with open(os.path.join(out, "metrics.csv")) as f:
        for row in csv.DictReader(f):
            stage = int(float(row["stage"]))
            for k, v in row.items():
                if k in ("step", "stage", "wall_s", "alpha") or v == "":
                    continue
                per_stage[stage][k].append(float(v))
    return per_stage


def mean(xs):
    return sum(xs) / max(len(xs), 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--out-root", required=True)
    ap.add_argument("--schedule-div", type=int, default=50)
    ap.add_argument("--max-iters", type=int, default=3000)
    ap.add_argument("--max-stage", type=int, default=5,
                    help="round-2 bf16 destabilized at stage 4 (64x64); "
                         "default runs through stage 5 to cover it")
    ap.add_argument("--dtypes", type=str,
                    default="float32,bfloat16_f32gp",
                    help="comma-separated; first entry is the baseline")
    ap.add_argument("--seeds", type=str, default="0,1",
                    help="comma-separated seeds (each dtype runs each)")
    ap.add_argument("--skip-train", action="store_true",
                    help="only compare existing metrics.csv files")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform for the training runs "
                         "(e.g. 'cpu' while the TPU is busy)")
    ap.add_argument("--chunk-steps", type=int, default=None)
    args = ap.parse_args()

    dtypes = args.dtypes.split(",")
    seeds = [int(s) for s in args.seeds.split(",")]
    outs = {
        (d, s): os.path.join(args.out_root, f"{d}_seed{s}")
        for d in dtypes for s in seeds
    }
    if not args.skip_train:
        for (dtype, seed), out in outs.items():
            if os.path.isfile(os.path.join(out, "metrics.csv")):
                print(f"[bf16cmp] reusing completed run at {out}")
                continue
            run(args.dataset, out, dtype, args.schedule_div, args.max_iters,
                seed=seed, max_stage=args.max_stage,
                platform=args.platform, chunk_steps=args.chunk_steps)

    # Compare every non-baseline dtype to the baseline, averaged per seed.
    base = dtypes[0]
    all_ok = True
    for other in dtypes[1:]:
        for seed in seeds:
            print(f"\n=== {base} vs {other} (seed {seed}) ===")
            ok = compare(load_metrics(outs[(base, seed)]),
                         load_metrics(outs[(other, seed)]), base, other)
            all_ok = all_ok and ok
    print("\nmixed-precision convergence parity:",
          "PASS" if all_ok else "FAIL")
    sys.exit(0 if all_ok else 1)


def compare(f32, bf16, name_a="float32", name_b="bfloat16") -> bool:
    print(f"\n{'stage':>5} {'sep_a':>10} {'sep_b':>10} "
          f"{'gp_a':>8} {'gp_b':>8} {'dloss_a':>10} {'dloss_b':>10}"
          f"   (a={name_a}, b={name_b})")
    ok = True
    for stage in sorted(set(f32) & set(bf16)):
        a, b = f32[stage], bf16[stage]
        # drop the first quarter of each stage (fade-in transient)
        def tail(xs):
            return xs[len(xs) // 4:]

        sep_a = mean([p - n for p, n in zip(tail(a["e_tp"]), tail(a["e_tn"]))])
        sep_b = mean([p - n for p, n in zip(tail(b["e_tp"]), tail(b["e_tn"]))])
        gp_a, gp_b = mean(tail(a["grad_pen"])), mean(tail(b["grad_pen"]))
        dl_a, dl_b = mean(tail(a["disc_loss"])), mean(tail(b["disc_loss"]))
        print(f"{stage:>5} {sep_a:>10.3f} {sep_b:>10.3f} "
              f"{gp_a:>8.3f} {gp_b:>8.3f} {dl_a:>10.3f} {dl_b:>10.3f}")
        for name, x, y in (("separation", sep_a, sep_b), ("grad_pen", gp_a, gp_b)):
            denom = max(abs(x), abs(y), 1.0)
            if abs(x - y) / denom > 0.5:
                print(f"  !! stage {stage} {name} diverges: {x:.3f} vs {y:.3f}")
                ok = False
    return ok


if __name__ == "__main__":
    main()
