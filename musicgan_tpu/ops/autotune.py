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

__all__ = [
    "resolve_conv_impl", "measure_conv_impls", "measure_train_impls",
    "resolve_istft_impl", "measure_istft_impls", "VOCODER_IMPLS",
]

_CACHE: dict = {}
_K = 4          # forwards per timed dispatch
_REPS = 2       # dispatches per candidate (best-of)


def _beat_watchdog() -> None:
    """Witness autotune progress to the run's stall watchdog (if any).

    Growth-boundary autotune times several full train graphs — minutes of
    honest device work through a remote-compile tunnel, during which the
    train loop makes no metric fetches.  Without beats the watchdog kills
    a HEALTHY measurement, and since winners persist only after all
    candidates finish, every supervised restart re-enters the same
    boundary until --max-restarts is exhausted."""
    from ..utils.watchdog import beat_active

    beat_active()


def _measure_rtt() -> float:
    """Scalar dispatch round-trip latency, subtracted from measurements
    (the shared repo-wide implementation; utils/timing.py)."""
    from ..utils.timing import scalar_rtt

    return scalar_rtt(reps=3)
_CACHE_VERSION = 5  # bump when any impl's kernel changes: invalidates
# persisted winners picked against the old code (v1: pallas tile bug
# disqualified it, freezing 'xla' on disk; v2: bf16 sublane-padding OOM
# disqualified pallas_bf16 at wide shapes)

# Differentiable impls (trainable).  "pallas_train" is the fused Pallas
# kernel with a custom VJP (ops/conv_vjp.py) — differentiable ONCE, which
# covers every first-order context of the WGAN-GP step; the grad-of-grad
# GP branch is routed to "xla" inside the step (train/step.py).
# "pallas_bf16" streams activations between layers in bf16 (f32 MXU
# accumulation + f32 epilogue) — NOT a precision regression for inference:
# XLA's default matmul precision on TPU already rounds f32 conv/matmul
# operands to bf16, so the default "xla" path sees the same operand
# rounding; bf16 I/O just also halves the HBM traffic (tested: the full
# generator stack agrees with the f32 kernel to bf16 rounding).
# "pallas_gp" = pallas_train + the gradient penalty's inner input-gradient
# unrolled by hand from first-order Pallas convs (models/discriminator.py::
# critic_input_grad_nchw_train) — the whole step runs the fused kernels.
TRAINING_IMPLS = ("xla", "subpixel", "pallas_train", "pallas_gp")
# Impls whose graphs JAX can differentiate twice (the jax.grad-of-grad GP
# formulation requirement; pallas_gp sidesteps it with the explicit
# backward, so it is NOT needed here).
SECOND_ORDER_IMPLS = ("xla", "subpixel")
# "pallas_up*" additionally fuse each up2x+conv3x3 pair so the 4x
# intermediate never leaves VMEM (ops/conv.py::fused_upconv3x3).
ALL_IMPLS = (
    "xla", "subpixel", "pallas", "pallas_bf16", "pallas_up",
    "pallas_up_bf16",
)
# On real TPUs Mosaic rejects the f32 phase-interleave (stack/reshape) in
# fused_upconv3x3, so "pallas_up" can never win there — measuring it only
# burns a doomed compile and prints a failure warning every cold autotune.
# It stays in ALL_IMPLS for interpret-mode (CPU) parity tests.
TPU_INFERENCE_IMPLS = tuple(i for i in ALL_IMPLS if i != "pallas_up")


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

    rtt = _measure_rtt()

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
        _beat_watchdog()
    return times


def measure_train_impls(
    model_cfg: ModelConfig,
    train_cfg,
    stage: int,
    candidates=TRAINING_IMPLS,
) -> dict[str, float]:
    """Wall-time per train ITERATION for each candidate, measured on a real
    K-iteration chunked train-step graph — D forwards + gradient penalty +
    backward + Adam, with one generator update per chunk (the n_critic
    pattern).  This replaces the round-2 proxy of timing the inference
    generator forward, which never runs a backward pass and can rank
    "xla" vs "subpixel" vs "pallas_train" differently than the graph
    training actually executes."""
    from ..train.step import build_chunk_step, init_train_state

    k = 5  # one full n_critic cycle per dispatch
    size = 4 * 2**stage
    rtt = _measure_rtt()

    init_cfg = dataclasses.replace(model_cfg, conv_impl="xla")
    # Single-device measurement proxy: time the PER-DEVICE slice of the
    # global batch.  A sharded run never materializes the global batch on
    # one chip — measuring it here would OOM at large stages and mis-rank.
    local_batch = max(1, train_cfg.batch_size // jax.device_count())
    x = jax.random.normal(
        jax.random.PRNGKey(1),
        (k, local_batch, 2, size, size),
        jnp.float32,
    )
    alphas = jnp.ones((k,), jnp.float32)
    mask = jnp.asarray([True] + [False] * (k - 1))

    times: dict[str, float] = {}
    for impl in candidates:
        mcfg = dataclasses.replace(model_cfg, conv_impl=impl)
        try:
            step = build_chunk_step(
                stage, k, mcfg, train_cfg, pre_scaled=True
            )
            # Fresh state per impl: the step donates its state argument.
            state = init_train_state(
                jax.random.PRNGKey(0), init_cfg, train_cfg
            )
            state, m = step(state, x, alphas, mask)  # compile + warmup
            np.asarray(m["disc_loss"])
            _beat_watchdog()  # the fetch above is real device progress
            best = float("inf")
            for _ in range(_REPS):
                t0 = time.perf_counter()
                state, m = step(state, x, alphas, mask)
                np.asarray(m["disc_loss"])
                best = min(best, (time.perf_counter() - t0 - rtt) / k)
            times[impl] = max(best, 0.0)
        except Exception as e:  # noqa: BLE001 — a failing impl just loses
            print(
                f"[autotune] train impl {impl} failed "
                f"({type(e).__name__}); skipped"
            )
            times[impl] = float("inf")
        _beat_watchdog()
    return times


# Vocoder (iSTFT) lowerings: the XLA matmul-DFT (audio/stft.py) vs the
# fused Pallas kernel (ops/istft_pallas.py — iDFT matmuls + window-folded
# bases + in-VMEM overlap-add).  Same autotune contract as the convs.
VOCODER_IMPLS = ("xla", "pallas")


def measure_istft_impls(
    n_bins: int, t: int, candidates=VOCODER_IMPLS, k: int = 48
) -> dict[str, float]:
    """Wall-time per iSTFT (seconds) for each vocoder lowering at the
    ``(n_bins, t)`` spectrum shape, ``k`` inversions per timed dispatch.

    ``k`` is much deeper than the conv harness's ``_K``: a single iSTFT
    is ~1 ms while the tunneled chip's dispatch RTT is ~30 ms, so a
    shallow dispatch would rank RTT jitter, not the kernels."""
    from ..audio.stft import istft_real_imag
    from .istft_pallas import istft_fused

    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.normal(size=(n_bins, t)).astype(np.float32))
    imag = jnp.asarray(rng.normal(size=(n_bins, t)).astype(np.float32))
    rtt = _measure_rtt()

    fns = {
        "xla": lambda r, i: istft_real_imag(r, i),
        "pallas": lambda r, i: istft_fused(r, i),
    }
    times: dict[str, float] = {}
    for impl in candidates:
        fn = fns[impl]

        @jax.jit
        def many(real, imag, _fn=fn):
            def body(carry, i):
                y = _fn(real + i * 0.0, imag)
                return carry + jnp.sum(y), None

            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(k))
            return out

        try:
            np.asarray(many(real, imag))  # compile + warmup
            best = float("inf")
            for _ in range(_REPS):
                t0 = time.perf_counter()
                np.asarray(many(real, imag))
                best = min(best, (time.perf_counter() - t0 - rtt) / k)
            times[impl] = max(best, 0.0)
        except Exception as e:  # noqa: BLE001 — a failing impl just loses
            print(
                f"[autotune] istft impl {impl} failed "
                f"({type(e).__name__}); skipped"
            )
            times[impl] = float("inf")
        _beat_watchdog()
    return times


def resolve_istft_impl(
    t: int, n_bins: int = 513, allow_measure: bool = True
) -> str:
    """Measured vocoder-lowering winner for a ``(n_bins, t)`` spectrum on
    the current backend — same contract as :func:`resolve_conv_impl`:
    persisted per shape, trace-safe ``allow_measure=False`` mode falls
    back to ``"xla"`` on a cache miss, CPU always gets the XLA lowering
    (interpreted Pallas is orders slower)."""
    backend = jax.default_backend()
    if backend == "cpu":
        return "xla"
    key = (
        f"v{_CACHE_VERSION}|{backend}|istft|{n_bins}x{t}|{VOCODER_IMPLS}"
    )
    if not allow_measure and key not in _CACHE:
        return _load_persisted().get(key) or "xla"
    if key not in _CACHE:
        winner = None
        if jax.process_count() == 1 or jax.process_index() == 0:
            persisted = _load_persisted()
            if key in persisted:
                winner = persisted[key]
            else:
                times = measure_istft_impls(n_bins, t)
                winner = min(times, key=times.get)
                print(
                    "[autotune] istft_impl -> " + winner + "  ("
                    + ", ".join(
                        f"{k}={v * 1e3:.2f}ms" for k, v in times.items()
                    )
                    + ")"
                )
                persisted[key] = winner
                _persist(persisted)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            idx = (
                VOCODER_IMPLS.index(winner)
                if winner in VOCODER_IMPLS else 0
            )
            idx = int(
                multihost_utils.broadcast_one_to_all(
                    np.asarray(idx, np.int32)
                )
            )
            winner = VOCODER_IMPLS[idx]
        _CACHE[key] = winner
    return _CACHE[key]


def _candidates_and_key(
    backend: str, z_shape: tuple, stage: int, for_training: bool, train_cfg
) -> tuple[tuple, str]:
    """Candidate impls and the persisted-cache key for one resolution.
    Training keys carry a ``train`` marker plus batch/compute-dtype, so a
    training winner can never alias an inference winner (they are measured
    on different graphs and rank differently)."""
    if for_training:
        candidates = TRAINING_IMPLS
        if train_cfg is not None and train_cfg.compute_dtype != "float32":
            # pallas_train is an f32 kernel path; mixed-precision training
            # keeps the XLA-lowered candidates.
            candidates = tuple(
                i for i in candidates if i in SECOND_ORDER_IMPLS
            )
        batch = train_cfg.batch_size if train_cfg is not None else z_shape[0]
        cdt = train_cfg.compute_dtype if train_cfg is not None else "float32"
        key = (
            f"v{_CACHE_VERSION}|{backend}|train|s{stage}|"
            f"{'x'.join(map(str, z_shape))}|b{batch}|{cdt}|{candidates}"
        )
    else:
        candidates = TPU_INFERENCE_IMPLS
        key = (
            f"v{_CACHE_VERSION}|{backend}|s{stage}|"
            f"{'x'.join(map(str, z_shape))}|float32|{candidates}"
        )
    return candidates, key


def resolve_conv_impl(
    cfg: ModelConfig,
    z_shape: tuple,
    stage: int,
    for_training: bool = False,
    train_cfg=None,
    allow_measure: bool = True,
) -> ModelConfig:
    """Return ``cfg`` with ``conv_impl="auto"`` replaced by the measured
    winner for (backend, stage, z_shape).  Non-auto configs pass through,
    except that training rejects the VJP-less inference-only Pallas impls.

    With ``for_training`` and a ``train_cfg``, candidates are timed on a
    real chunked train-step graph (:func:`measure_train_impls`); the
    persisted key carries a ``train`` marker plus batch/dtype, so training
    and inference winners never alias.

    ``allow_measure=False`` is the trace-safe mode for callers that may be
    running under an ambient jax trace (e.g. ``synthesize_fn``'s inner
    function wrapped in a caller's outer ``jax.jit`` — nested jits are
    inlined into the outer trace, so the timing harness's eager dispatches
    would become tracers and crash).  It resolves from the in-memory or
    persisted winner tables only and falls back to ``"xla"`` on a miss
    WITHOUT caching, so a later eager call still measures properly."""
    if cfg.conv_impl != "auto":
        if for_training and cfg.conv_impl not in TRAINING_IMPLS:
            raise ValueError(
                f"conv_impl={cfg.conv_impl!r} is inference-only (no VJP); "
                f"use one of {TRAINING_IMPLS} or 'auto' for training"
            )
        if (
            for_training
            and train_cfg is not None
            and train_cfg.compute_dtype != "float32"
            and cfg.conv_impl not in SECOND_ORDER_IMPLS
        ):
            # The NCHW Pallas train paths are f32 kernels that ignore
            # compute_dtype — honoring this combination would silently
            # train in full f32 under a bf16-labelled run.
            raise ValueError(
                f"conv_impl={cfg.conv_impl!r} trains in float32 only; with "
                f"compute_dtype={train_cfg.compute_dtype!r} use one of "
                f"{SECOND_ORDER_IMPLS} or 'auto'"
            )
        return cfg

    backend = jax.default_backend()
    if backend == "cpu":
        # Interpreted Pallas is orders slower and CPU isn't the production
        # target; don't burn startup time measuring it.
        return dataclasses.replace(cfg, conv_impl="xla")

    candidates, key = _candidates_and_key(
        backend, z_shape, stage, for_training, train_cfg
    )
    if not allow_measure and key not in _CACHE:
        winner = _load_persisted().get(key)
        return dataclasses.replace(cfg, conv_impl=winner or "xla")
    if key not in _CACHE:
        num_procs = jax.process_count()
        winner = None
        if num_procs == 1 or jax.process_index() == 0:
            persisted = _load_persisted()
            if key in persisted:
                winner = persisted[key]
            else:
                if for_training and train_cfg is not None:
                    times = measure_train_impls(
                        cfg, train_cfg, stage, candidates
                    )
                    label = "train conv_impl"
                else:
                    times = measure_conv_impls(cfg, z_shape, stage, candidates)
                    label = "conv_impl"
                winner = min(times, key=times.get)
                print(
                    f"[autotune] {label} -> "
                    + winner
                    + "  ("
                    + ", ".join(
                        f"{k}={v * 1e3:.2f}ms" for k, v in times.items()
                    )
                    + ")"
                )
                persisted[key] = winner
                _persist(persisted)
        if num_procs > 1:
            # Timing noise must never let hosts pick different winners:
            # the same jitted step would compile different SPMD programs
            # on different processes and hang on mismatched collectives.
            # The lead measures; every process adopts its choice.
            from jax.experimental import multihost_utils

            idx = candidates.index(winner) if winner in candidates else 0
            idx = int(
                multihost_utils.broadcast_one_to_all(np.asarray(idx, np.int32))
            )
            winner = candidates[idx]
        _CACHE[key] = winner
    return dataclasses.replace(cfg, conv_impl=_CACHE[key])
