"""One-time conv-impl autotune: measure, pick, cache.

``ModelConfig.conv_impl="auto"`` means "run each candidate generator
forward once on the real shapes and keep the winner".  The choice is
hardware-dependent — the round-1 study (PERF.md) found XLA's conv near the
lane-limited roofline on a time-sliced chip while the Pallas fused kernel
(ops/conv.py) and the sub-pixel decomposition (models/layers.py) project
5-10x on full-bandwidth parts — so no static default is right everywhere.

Methodology matches bench.py: K forwards inside one ``lax.scan`` dispatch
returning a scalar (forces execution; amortizes host round trips, which on
the tunneled chip would otherwise dominate sub-millisecond forwards).

The result is cached per (backend, stage, z-shape, dtype) for the process
lifetime, and persisted to the JAX compilation-cache dir so later
processes on the same machine skip the measurement too.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..config import ModelConfig

__all__ = ["resolve_conv_impl", "measure_conv_impls"]

_CACHE: dict = {}
_K = 4          # forwards per timed dispatch
_REPS = 2       # dispatches per candidate (best-of)
_CACHE_VERSION = 5  # bump when any impl's kernel changes: invalidates
# persisted winners picked against the old code (v1: pallas tile bug
# disqualified it, freezing 'xla' on disk; v2: bf16 sublane-padding OOM
# disqualified pallas_bf16 at wide shapes)

# Differentiable impls (trainable); the Pallas paths define no VJP.
# "pallas_bf16" streams activations between layers in bf16 (f32 MXU
# accumulation + f32 epilogue) — NOT a precision regression for inference:
# XLA's default matmul precision on TPU already rounds f32 conv/matmul
# operands to bf16, so the default "xla" path sees the same operand
# rounding; bf16 I/O just also halves the HBM traffic (tested: the full
# generator stack agrees with the f32 kernel to bf16 rounding).
TRAINING_IMPLS = ("xla", "subpixel")
# "pallas_up*" additionally fuse each up2x+conv3x3 pair so the 4x
# intermediate never leaves VMEM (ops/conv.py::fused_upconv3x3).
ALL_IMPLS = (
    "xla", "subpixel", "pallas", "pallas_bf16", "pallas_up",
    "pallas_up_bf16",
)


def _persist_path() -> str | None:
    base = os.environ.get("MUSICGAN_AUTOTUNE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "musicgan_tpu"
    )
    try:
        os.makedirs(base, exist_ok=True)
        return os.path.join(base, "conv_autotune.json")
    except OSError:
        return None


def _load_persisted() -> dict:
    p = _persist_path()
    if p and os.path.isfile(p):
        try:
            with open(p) as f:
                return json.load(f)
        except (OSError, ValueError):
            pass
    return {}


def _persist(table: dict) -> None:
    p = _persist_path()
    if not p:
        return
    try:
        with open(p, "w") as f:
            json.dump(table, f, indent=1)
    except OSError:
        pass


def measure_conv_impls(
    cfg: ModelConfig,
    z_shape: tuple,
    stage: int,
    candidates=ALL_IMPLS,
    dtype=jnp.float32,
) -> dict[str, float]:
    """Wall-time per forward (seconds) for each candidate impl on the
    current default backend.  Public so PERF.md studies can tabulate it."""
    from ..models import generator_forward, init_generator

    params = init_generator(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), z_shape, dtype)

    # Scalar round-trip latency, subtracted from each measurement.
    tiny = jax.jit(lambda x: x + 1.0)
    np.asarray(tiny(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(tiny(jnp.float32(0)))
    rtt = (time.perf_counter() - t0) / 3

    times: dict[str, float] = {}
    for impl in candidates:
        icfg = dataclasses.replace(cfg, conv_impl=impl)

        @jax.jit
        def many(params, z, _icfg=icfg):
            def body(carry, i):
                out = generator_forward(
                    params, z + i * 0.0, stage, 1.0, _icfg
                )
                return carry + jnp.sum(out), None

            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(_K))
            return out

        try:
            np.asarray(many(params, z))  # compile + warmup
            best = float("inf")
            for _ in range(_REPS):
                t0 = time.perf_counter()
                np.asarray(many(params, z))
                best = min(best, (time.perf_counter() - t0 - rtt) / _K)
            # rtt jitter can overshoot sub-ms forwards; clamp for display
            # (ranking is unaffected: the same rtt was subtracted from all)
            times[impl] = max(best, 0.0)
        except Exception as e:  # noqa: BLE001 — a failing impl just loses
            print(f"[autotune] {impl} failed ({type(e).__name__}); skipped")
            times[impl] = float("inf")
    return times


def resolve_conv_impl(
    cfg: ModelConfig,
    z_shape: tuple,
    stage: int,
    for_training: bool = False,
) -> ModelConfig:
    """Return ``cfg`` with ``conv_impl="auto"`` replaced by the measured
    winner for (backend, stage, z_shape).  Non-auto configs pass through,
    except that training rejects the non-differentiable Pallas impl."""
    if cfg.conv_impl != "auto":
        if for_training and cfg.conv_impl not in TRAINING_IMPLS:
            raise ValueError(
                f"conv_impl={cfg.conv_impl!r} is inference-only (no VJP); "
                f"use one of {TRAINING_IMPLS} or 'auto' for training"
            )
        return cfg

    backend = jax.default_backend()
    if backend == "cpu":
        # Interpreted Pallas is orders slower and CPU isn't the production
        # target; don't burn startup time measuring it.
        return dataclasses.replace(cfg, conv_impl="xla")

    candidates = TRAINING_IMPLS if for_training else ALL_IMPLS
    key = (
        f"v{_CACHE_VERSION}|{backend}|s{stage}|"
        f"{'x'.join(map(str, z_shape))}|{candidates}"
    )
    if key not in _CACHE:
        persisted = _load_persisted()
        if key in persisted:
            _CACHE[key] = persisted[key]
        else:
            times = measure_conv_impls(cfg, z_shape, stage, candidates)
            winner = min(times, key=times.get)
            print(
                "[autotune] conv_impl -> "
                + winner
                + "  ("
                + ", ".join(f"{k}={v * 1e3:.2f}ms" for k, v in times.items())
                + ")"
            )
            _CACHE[key] = winner
            persisted[key] = winner
            _persist(persisted)
    return dataclasses.replace(cfg, conv_impl=_CACHE[key])
