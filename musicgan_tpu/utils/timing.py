"""Shared measurement primitives for every perf harness in the repo.

bench.py, the autotuner (ops/autotune.py), and the close-out scripts
(scripts/vocoder_roofline.py, scripts/profile_stage0.py) all need the
same three measurements; before this module each carried its own copy
and the methodologies had already started to drift (different rep
counts, different RTT clamping).  Cross-script numbers are only
comparable if they share ONE implementation — the same reason bench.py
stamps a same-run measured peak on every MFU row.

Methodology (see bench.py's module docstring for the full rationale):
work runs on-device inside one dispatch returning a single scalar, the
scalar fetch forces execution, and the separately measured scalar
round-trip latency is subtracted — clamped so jitter can never flip a
measurement negative.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["scalar_rtt", "time_dispatch", "measure_peak_tflops"]


def scalar_rtt(reps: int = 5) -> float:
    """Scalar dispatch round-trip latency (host->device->host for a
    trivial graph) — the additive constant every dispatch timing must
    subtract.  ~30 ms through the axon tunnel, ~50 us locally."""
    tiny = jax.jit(lambda x: x + 1.0)
    np.asarray(tiny(jnp.float32(0)))  # compile outside the timed loop
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(tiny(jnp.float32(0)))
    return (time.perf_counter() - t0) / reps


def time_dispatch(fn, *args, reps: int = 3, rtt: float = 0.0) -> float:
    """Best-of-``reps`` wall seconds for one dispatch of ``fn(*args)``,
    RTT-subtracted but clamped to half the raw time (RTT is jittery; the
    correction must never dominate, let alone go negative)."""
    np.asarray(fn(*args))  # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 0.5 * best)


def measure_peak_tflops(
    dtype=jnp.float32,
    rtt: float = 0.0,
    precision=None,
    n: int = 2048,
    depth: int = 64,
    reps: int = 3,
) -> float:
    """Measured matmul peak on this run's (time-sliced) chip: an
    ``n x n`` matmul chained ``depth`` deep in one dispatch — large
    enough to sit on the MXU roofline, small enough to finish in
    milliseconds.  ``precision`` (a ``jax.lax.Precision``) matters on
    TPU: HIGHEST runs f32 through multiple bf16 passes and measures
    ~6x below DEFAULT."""
    b = jnp.full((n, n), 0.001, dtype)
    a = jnp.full((n, n), 0.5, dtype)

    @jax.jit
    def chain(a, b):
        def body(c, _):
            # tanh keeps values bounded across the chain (and is noise
            # next to the n^3 matmul term in both time and FLOPs)
            c = jax.lax.dot_general(
                c, b, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
                precision=precision,
            )
            return jnp.tanh(c), None

        c, _ = jax.lax.scan(body, a, None, length=depth)
        return jnp.sum(c.astype(jnp.float32))

    dt = time_dispatch(chain, a, b, reps=reps, rtt=rtt)
    return 2.0 * n**3 * depth / dt / 1e12
