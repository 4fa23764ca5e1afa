"""Concurrent-load serving measurement (PERF.md r3).

Drives a live ``musicgan_tpu serve`` instance (or starts one in-process)
with concurrent same-signature requests and records:

* solo request latency (buffered and streamed) + time-to-first-byte;
* N-way concurrent throughput — micro-batching should make N concurrent
  requests cost far less than N solo ones (the generator is
  batch-parallel on the MXU);
* /stats before/after, proving the batching actually coalesced.

Usage:
  python scripts/serve_load.py CKPT [--stage 7] [--nb-vec 4]
      [--concurrency 8] [--port 0]
"""

from __future__ import annotations

import _bootstrap  # noqa: F401  (repo root onto sys.path)

import argparse
import json
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from http.server import ThreadingHTTPServer


def fetch(url: str, stream: bool = False) -> dict:
    req = urllib.request.Request(url, method="POST")
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=600) as r:
        first = r.read(4096)
        ttfb = time.perf_counter() - t0
        body = first + r.read()
    return {
        "total_s": time.perf_counter() - t0,
        "ttfb_s": ttfb,
        "bytes": len(body),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--stage", type=int, default=7)
    ap.add_argument("--nb-vec", type=int, default=4)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--window-ms", type=float, default=25.0)
    args = ap.parse_args()

    from musicgan_tpu.config import ModelConfig
    from musicgan_tpu.generate import load_generator_params
    from musicgan_tpu.serve import SynthesisService, _make_handler
    from musicgan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()  # bucket graphs cost minutes through the
    # tunnel; repeat load measurements should only pay once

    params = load_generator_params(args.ckpt, ModelConfig())
    service = SynthesisService(
        params, ModelConfig(), max_batch=args.concurrency,
        window_ms=args.window_ms, default_stage=args.stage,
    )
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(service))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = (f"http://127.0.0.1:{port}/synthesize?nb_vec={args.nb_vec}"
            f"&stage={args.stage}")

    print("[serve_load] warmup (compiles batch buckets)...", flush=True)
    fetch(base + "&seed=0")  # b1 bucket
    with ThreadPoolExecutor(args.concurrency) as ex:  # bN bucket compile
        list(ex.map(lambda i: fetch(base + f"&seed={i}"),
                    range(args.concurrency)))

    solo = fetch(base + "&seed=100")
    solo_stream = fetch(base + "&seed=100&stream=1")

    t0 = time.perf_counter()
    with ThreadPoolExecutor(args.concurrency) as ex:
        results = list(ex.map(
            lambda i: fetch(base + f"&seed={200 + i}"),
            range(args.concurrency),
        ))
    conc_wall = time.perf_counter() - t0

    stats = service.stats_snapshot()
    out = {
        "solo_s": round(solo["total_s"], 3),
        "solo_ttfb_s": round(solo["ttfb_s"], 3),
        "solo_stream_s": round(solo_stream["total_s"], 3),
        "solo_stream_ttfb_s": round(solo_stream["ttfb_s"], 3),
        "concurrency": args.concurrency,
        "concurrent_wall_s": round(conc_wall, 3),
        "concurrent_per_req_s": round(conc_wall / args.concurrency, 3),
        "speedup_vs_serial": round(
            args.concurrency * solo["total_s"] / conc_wall, 2
        ),
        "mean_req_latency_s": round(
            sum(r["total_s"] for r in results) / len(results), 3
        ),
        "stats": stats,
    }
    print(json.dumps(out, indent=1))
    server.shutdown()
    server.server_close()
    service.close()


if __name__ == "__main__":
    main()
