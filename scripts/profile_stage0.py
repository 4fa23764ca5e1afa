"""Stage-0 train-throughput attribution: host dispatch vs device scan.

VERDICT r4 weak item 1 / next-step 8: stage-0 steps/s fell from 6,466
(r2, multi-core host) to ~5.7k (r4, 1-core host) while every
device-bound metric improved; PERF.md asserts the cause is the host.
This script replaces the assertion with a decomposition. One chunked
dispatch of K stage-0 iterations (the production ``build_chunk_step``
graph, bench.py methodology) costs

    wall(K) = t_overhead + K * t_dev_step

where ``t_overhead`` = host-side dispatch work (pytree flatten, donation
bookkeeping, tunnel enqueue) + the scalar-fetch RTT, and ``t_dev_step``
is the per-iteration device cost of the scanned step. We measure
wall(K) for several K, fit the line, and separately time

  * the ASYNC dispatch alone (call returns after host work + enqueue;
    the fetch is excluded) — the host component of the overhead;
  * the scalar-fetch RTT (bench.py's ``_scalar_rtt``);
  * a CONTENTION probe: re-time the mid K while a spawned spinner
    process competes for the (single) core. The device term cannot see
    host contention, so the wall increase bounds the host share.

steps/s at the bench K follows as K / wall(K); the fitted terms say how
much of it is host-bound and therefore how the r2->r4 host-core
reduction moved the metric. Emits one JSON object (optionally to a
file) for the PERF.md close-out table.

Usage:
  python scripts/profile_stage0.py [--ks 128,512,2048] [--reps 5]
      [--json-out F] [--platform cpu]
"""

from __future__ import annotations

import _bootstrap  # noqa: F401  (repo root onto sys.path)

import argparse
import json
import subprocess
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", type=str, default="128,512,2048")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--json-out", type=str, default=None)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from musicgan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from musicgan_tpu.config import ModelConfig, TrainConfig
    from musicgan_tpu.train import init_train_state
    from musicgan_tpu.train.step import build_chunk_step

    ks = sorted(int(k) for k in args.ks.split(","))
    model_cfg = ModelConfig()
    train_cfg = TrainConfig(batch_size=6)
    stage, size = 0, 4

    # scalar-fetch RTT — the shared repo-wide implementation
    # (utils/timing.py; also used by bench.py and the autotuner)
    from musicgan_tpu.utils.timing import scalar_rtt

    rtt = scalar_rtt(reps=8)

    rng = np.random.default_rng(0)
    out: dict = {"rtt_ms": round(rtt * 1e3, 3), "walls_ms": {}}

    def time_chunk(k: int, reps: int) -> tuple[float, float]:
        """(best wall per dispatch incl. fetch, best async dispatch)."""
        chunk = build_chunk_step(stage, k, model_cfg, train_cfg,
                                 pre_scaled=True)
        state = init_train_state(jax.random.PRNGKey(0), model_cfg,
                                 train_cfg)
        xs = jnp.asarray(
            rng.uniform(-1, 1, (k, 6, 2, size, size)).astype(np.float32)
        )
        alphas = jnp.ones((k,), jnp.float32)
        gen_mask = jnp.asarray(
            [i % train_cfg.n_critic == 0 for i in range(k)]
        )
        state, m = chunk(state, xs, alphas, gen_mask)  # compile+warmup
        np.asarray(m["disc_loss"][-1])

        best_wall = float("inf")
        best_async = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            state, m = chunk(state, xs, alphas, gen_mask)
            t1 = time.perf_counter()          # async: host work + enqueue
            np.asarray(m["disc_loss"][-1])    # completion fence
            t2 = time.perf_counter()
            best_wall = min(best_wall, t2 - t0)
            best_async = min(best_async, t1 - t0)
        return best_wall, best_async

    asyncs = {}
    for k in ks:
        wall, asy = time_chunk(k, args.reps)
        out["walls_ms"][str(k)] = round(wall * 1e3, 3)
        asyncs[k] = asy
        out.setdefault("async_dispatch_ms", {})[str(k)] = round(asy * 1e3, 3)
        out.setdefault("steps_per_sec", {})[str(k)] = round(k / wall, 1)

    # least-squares wall(K) = t_overhead + K * t_dev_step
    kk = np.asarray(ks, np.float64)
    ww = np.asarray([out["walls_ms"][str(k)] / 1e3 for k in ks])
    a = np.vstack([np.ones_like(kk), kk]).T
    (t_over, t_step), res, *_ = np.linalg.lstsq(a, ww, rcond=None)
    pred = a @ np.asarray([t_over, t_step])
    ss_tot = float(np.sum((ww - ww.mean()) ** 2)) or 1.0
    out["fit"] = {
        "t_overhead_ms": round(float(t_over) * 1e3, 3),
        "t_dev_step_us": round(float(t_step) * 1e6, 2),
        "r2": round(1.0 - float(np.sum((ww - pred) ** 2)) / ss_tot, 5),
    }
    k_bench = 512 if 512 in ks else ks[len(ks) // 2]
    wall_bench = out["walls_ms"][str(k_bench)] / 1e3
    host_hidden = max(asyncs[k_bench] - 0.0, 0.0)
    out["attribution_at_bench_k"] = {
        "k": k_bench,
        "overhead_frac_of_wall": round(float(t_over) / wall_bench, 3),
        "async_dispatch_frac_of_wall": round(host_hidden / wall_bench, 3),
        "rtt_frac_of_wall": round(rtt / wall_bench, 3),
        "device_scan_frac_of_wall": round(
            float(t_step) * k_bench / wall_bench, 3
        ),
    }

    # contention probe: a competing spinner on the (single) core can only
    # slow HOST work; the device scan is immune
    spin = subprocess.Popen(
        [sys.executable, "-c", "while True:\n pass"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        time.sleep(0.5)
        wall_c, asy_c = time_chunk(k_bench, max(2, args.reps - 2))
    finally:
        spin.kill()
        spin.wait()
    out["contended"] = {
        "k": k_bench,
        "wall_ms": round(wall_c * 1e3, 3),
        "async_dispatch_ms": round(asy_c * 1e3, 3),
        "steps_per_sec": round(k_bench / wall_c, 1),
        "slowdown_vs_quiet": round(wall_c / wall_bench, 3),
    }

    print(json.dumps(out, indent=1))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
