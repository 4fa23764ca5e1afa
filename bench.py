"""Headline benchmarks: synthesis, training, and preprocessing throughput.

Covers all three BASELINE.json metrics:

1. ``preproc_stft_frames_per_sec`` — host-side ingest pipeline (scipy
   STFT + the fused native C++ tail, falling back to the numpy mirror of
   the device transform where no compiler exists), measured on an
   in-memory signal, like-for-like with the reference's ``wav_to_stft``
   + ``stft_to_phase_magn`` (``audio/functions.py:38-96``).
2. ``train_steps_per_sec_stage0`` / ``..._stage7`` — full WGAN-GP
   iterations (D update + GP + n_critic-gated G update, reference
   ``train.py:131-214``) at batch 6, timed as K on-device iterations per
   ``lax.scan`` dispatch (the production ``build_chunk_step`` graph).
3. ``gen_audio_sec_per_wall_sec`` — the flagship single-graph pipeline:
   full-grown generator forward + bark unscale + phase prefix-sum + MXU
   iSTFT, as seconds of audio synthesized per wall-clock second per chip.
   This is the LAST line printed (the driver parses the tail line).

Methodology: work runs on-device inside one dispatch returning a single
scalar, which is then fetched.  This forces real execution and amortizes
host<->device round-trip latency (under the axon tunnel,
``block_until_ready`` is a no-op and fetching large outputs measures tunnel
bandwidth, not the chip — both were observed and rejected).  The measured
scalar round-trip latency is subtracted.

``vs_baseline`` denominators: the reference publishes no numbers
(BASELINE.md), so they were measured by driving the reference's own code
on this host's CPU via ``scripts/measure_reference.py`` (torch 2.x, 1
core; the only hardware both codebases can share here — see PERF.md for
the caveats).  Synthesis keeps its absolute north star: 60 s of audio in
<1 s (BASELINE.json), i.e. ``vs_baseline = value / 60``.

Prints one JSON line per metric; the headline synthesis line is last.

Wedge-proofing (the r3 lesson: the device tunnel died at bench time and
erased the round's verified perf record — VERDICT r3 item 1): the
device-bound benches run in a CHILD process with a 600 s init guard; on
failure the parent retries once after a 60 s backoff, and if the device
is still gone it emits the last-known-good value of each device metric
from ``BENCH_CACHE.json`` marked ``"stale": true`` (host-side preproc is
always fresh).  Every successful measurement write-through updates the
cache, so the cache is at worst one healthy bench old.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from musicgan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # stage-7 graphs cost minutes through the
# remote-compile tunnel; repeated bench runs reuse the persisted binaries

from musicgan_tpu.config import AudioConfig, ModelConfig, TrainConfig
from musicgan_tpu.models import init_generator

NB_VEC = 20   # ~59.4 s of audio per synthesis
K_GEN = 8     # on-device synthesis iterations per dispatch
K_TRAIN = {0: 512, 7: 4}  # on-device train iterations per dispatch; stage 0
# needs a big K so the dispatch dwarfs the scalar-RTT jitter (a 32-step
# chunk runs in ~8 ms vs ~35 ms RTT, which once produced a negative rate)
REPS = 3      # dispatches timed

# Reference throughput measured on this host via the reference's own code
# (scripts/measure_reference.py; torch CPU, 1 core).  Re-run that script to
# refresh.  The reference's GPU numbers do not exist anywhere (BASELINE.md).
REFERENCE_CPU = {
    "train_steps_per_sec_stage0": None,   # filled from BASELINE_MEASURED
    "train_steps_per_sec_stage7": None,
    "preproc_stft_frames_per_sec": None,
}
try:
    with open(__file__.replace("bench.py", "BASELINE_MEASURED.json")) as _f:
        REFERENCE_CPU.update(json.load(_f))
except OSError:
    pass


import os as _os

# Env knobs exist for the test suite (tests/test_bench.py) — production
# uses the defaults.
_CACHE_PATH = _os.environ.get(
    "MUSICGAN_BENCH_CACHE", __file__.replace("bench.py", "BENCH_CACHE.json")
)
_RETRY_BACKOFF_S = float(_os.environ.get("MUSICGAN_BENCH_BACKOFF_S", "60"))
_INIT_TIMEOUT_S = float(_os.environ.get("MUSICGAN_BENCH_INIT_TIMEOUT_S", "600"))
# Emission order of the device metrics; the headline synthesis metric is
# LAST (the driver parses the tail line).
_DEVICE_METRICS = (
    "device_peak_tflops_f32",
    "device_peak_tflops_bf16",
    "train_steps_per_sec_stage0",
    "train_steps_per_sec_stage7",
    "gen_audio_sec_per_wall_sec",
)


def _cache_load() -> dict:
    try:
        with open(_CACHE_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _cache_update(rec: dict) -> None:
    """Write-through of one fresh metric record (last-known-good store)."""
    cache = _cache_load()
    cache[rec["metric"]] = {
        **rec,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        # ns-resolution write sequence: freshness detection (main())
        # cannot rely on the 1 s measured_at when a child emits within
        # the same second as the previous cache write
        "seq": time.time_ns(),
    }
    tmp = f"{_CACHE_PATH}.tmp.{time.time_ns()}"
    with open(tmp, "w") as f:
        json.dump(cache, f, indent=1)
    _os.replace(tmp, _CACHE_PATH)


def _emit(
    metric: str, value: float, unit: str, baseline, extra: dict | None = None
) -> None:
    rec = {"metric": metric, "value": round(value, 2), "unit": unit}
    if baseline:
        rec["vs_baseline"] = round(value / baseline, 3)
    else:
        rec["vs_baseline"] = None
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    _cache_update(rec)


def _graph_flops(fn, *args) -> float | None:
    """XLA's own FLOP count for a jitted function's compiled graph.

    The AOT ``lower().compile()`` path re-builds the executable wrapper
    but hits the persistent compilation cache, so this costs seconds, not
    a recompile.  Returns ``None`` when the backend exposes no cost
    analysis (MFU fields are then simply omitted — perf numbers must
    never be blocked on an optional diagnostic)."""
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):  # some backends return one dict per device
            ca = ca[0]
        flops = float(ca["flops"])
        return flops if flops > 0 else None
    except Exception:
        return None


def _mfu_extra(
    flops_per_unit: float | None, units_per_sec: float, peak_tflops
) -> dict:
    """The normalized-perf fields VERDICT r4 item 5 asks for on every
    bench row: achieved TFLOP/s and the fraction of THIS RUN's measured
    peak (host/chip drift muddied the r2-vs-r4 comparison; a same-run
    peak measurement makes rows comparable across rounds)."""
    if flops_per_unit is None:
        return {}
    achieved = flops_per_unit * units_per_sec / 1e12
    out = {"achieved_tflops": round(achieved, 3)}
    if peak_tflops:
        out["mfu_vs_measured_peak"] = round(achieved / peak_tflops, 4)
    return out


# One shared implementation for the whole repo (bench, autotuner,
# close-out scripts) so cross-script numbers stay comparable; re-exported
# here because bench.py is the driver-facing surface.
from musicgan_tpu.utils.timing import (  # noqa: E402
    measure_peak_tflops,
    scalar_rtt as _scalar_rtt,
)


def bench_preproc() -> None:
    """Host ingest pipeline frames/sec (single process; ``create_dataset``
    scales this near-linearly with worker count)."""
    from musicgan_tpu.audio.ingest import process_signal

    cfg = AudioConfig()
    seconds = 60.0
    t = np.arange(int(cfg.sample_rate * seconds)) / cfg.sample_rate
    sig = (0.3 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    n_frames = 1 + len(sig) // cfg.stft_stride

    process_signal(sig, cfg)  # warmup
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        process_signal(sig, cfg)
    dt = time.perf_counter() - t0
    _emit(
        "preproc_stft_frames_per_sec",
        reps * n_frames / dt,
        "frames/s/worker",
        REFERENCE_CPU["preproc_stft_frames_per_sec"],
    )


def bench_train(stage: int, rtt: float, peak_tflops=None) -> None:
    """Full train iterations/sec at ``stage`` (batch 6, reference parity),
    K iterations per dispatch through the production chunked-scan graph."""
    from musicgan_tpu.train import init_train_state
    from musicgan_tpu.train.step import build_chunk_step

    k = K_TRAIN[stage]
    model_cfg = ModelConfig()
    train_cfg = TrainConfig(batch_size=6)
    size = 4 * 2**stage

    state = init_train_state(jax.random.PRNGKey(0), model_cfg, train_cfg)
    chunk = build_chunk_step(stage, k, model_cfg, train_cfg, pre_scaled=True)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.uniform(-1, 1, (k, 6, 2, size, size)).astype(np.float32)
    )
    alphas = jnp.ones((k,), jnp.float32)
    gen_mask = jnp.asarray([i % train_cfg.n_critic == 0 for i in range(k)])

    state, m = chunk(state, xs, alphas, gen_mask)  # warmup / compile
    np.asarray(m["disc_loss"][-1])

    t0 = time.perf_counter()
    for _ in range(REPS):
        state, m = chunk(state, xs, alphas, gen_mask)
        np.asarray(m["disc_loss"][-1])
    elapsed = (time.perf_counter() - t0) / REPS
    # rtt is jittery; never let the correction flip the sign
    per_iter = max(elapsed - rtt, 0.5 * elapsed) / k
    flops = _graph_flops(chunk, state, xs, alphas, gen_mask)
    _emit(
        f"train_steps_per_sec_stage{stage}",
        1.0 / per_iter,
        "steps/s/chip",
        REFERENCE_CPU[f"train_steps_per_sec_stage{stage}"],
        extra=_mfu_extra(
            flops / k if flops else None, 1.0 / per_iter, peak_tflops
        ),
    )


def bench_synthesis(rtt: float, peak_tflops=None) -> None:
    from musicgan_tpu.generate import _synthesize
    from musicgan_tpu.ops.autotune import (
        resolve_conv_impl,
        resolve_istft_impl,
    )

    model_cfg = ModelConfig()
    audio_cfg = AudioConfig()
    z_shape = (
        1, model_cfg.latent_height, model_cfg.latent_width * NB_VEC,
        model_cfg.rand_channels,
    )
    stage = model_cfg.n_stages - 1
    model_cfg = resolve_conv_impl(model_cfg, z_shape, stage=stage)
    # The headline must measure the PRODUCTION synthesis graph: generate
    # routes the vocoder through the autotuned iSTFT winner
    # (generate.py::synthesize_fn), so the bench resolves it the same way
    # instead of hard-coding the XLA lowering.
    istft_impl = resolve_istft_impl(z_shape[2] * 2 ** model_cfg.n_stages)
    params = init_generator(jax.random.PRNGKey(0), model_cfg)

    @jax.jit
    def many(params, key):
        def body(carry, i):
            z = jax.random.normal(jax.random.fold_in(key, i), z_shape)
            # generate.py's jitted _synthesize inlines here, so the timed
            # graph IS the production G-forward + vocoder graph.
            wave = _synthesize(params, z, stage, model_cfg, istft_impl)
            return carry + jnp.sum(wave), None

        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K_GEN))
        return out

    np.asarray(many(params, jax.random.PRNGKey(99)))  # warmup / compile

    t0 = time.perf_counter()
    for r in range(REPS):
        np.asarray(many(params, jax.random.PRNGKey(r)))
    per_synthesis = ((time.perf_counter() - t0) / REPS - rtt) / K_GEN

    audio_seconds = (
        (512 * NB_VEC - 1) * audio_cfg.stft_stride / audio_cfg.sample_rate
    )
    flops = _graph_flops(many, params, jax.random.PRNGKey(99))
    _emit(
        "gen_audio_sec_per_wall_sec",
        audio_seconds / per_synthesis,
        "audio_s/s/chip",
        60.0,
        extra=_mfu_extra(
            flops / K_GEN if flops else None,
            1.0 / per_synthesis,
            peak_tflops,
        ),
    )


def _arm_init_guard(timeout_s: float = _INIT_TIMEOUT_S):
    """Fail fast if device init wedges (dead tunnel) instead of hanging.

    A wedged PJRT tunnel blocks ``jax.devices()`` forever with no
    exception path (observed live twice, VALIDATION.md r3); a bench run
    that hangs records nothing.  The guard thread exits 75 (retryable)
    with a diagnostic line unless disarmed by first device contact.
    """
    import os
    import sys
    import threading

    done = threading.Event()

    def _watch():
        if not done.wait(timeout_s):
            print(
                json.dumps({
                    "metric": "bench_error",
                    "value": None,
                    "unit": f"device init exceeded {timeout_s:.0f}s "
                            "(wedged tunnel?) — retry later",
                }),
                flush=True,
            )
            sys.stderr.write("bench: device init wedged; exiting 75\n")
            os._exit(75)

    threading.Thread(target=_watch, daemon=True, name="bench-init-guard").start()
    return done


def device_phase() -> None:
    """Everything that needs the accelerator (run in a child process so a
    wedged device init can't take the whole bench down)."""
    from musicgan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    guard = _arm_init_guard()
    rtt = _scalar_rtt()
    guard.set()  # device answered; long compiles past here are legitimate
    # Same-run measured peaks: every steps/s row below carries
    # achieved_tflops + mfu_vs_measured_peak against THESE numbers, so
    # perf rows stay comparable across host/chip drift (VERDICT r4 item
    # 5).  Training computes f32 (the default recipe); the synthesis
    # path's fused convs are bf16.
    peak_f32 = measure_peak_tflops(jnp.float32, rtt)
    _emit("device_peak_tflops_f32", peak_f32, "tflops/s/chip", None)
    peak_bf16 = measure_peak_tflops(jnp.bfloat16, rtt)
    _emit("device_peak_tflops_bf16", peak_bf16, "tflops/s/chip", None)
    bench_train(0, rtt, peak_tflops=peak_f32)
    bench_train(7, rtt, peak_tflops=peak_f32)
    # headline: keep LAST (driver parses the tail)
    bench_synthesis(rtt, peak_tflops=peak_bf16)


def _run_device_child() -> int:
    """Run the device phase as a child; its _emit lines stream through to
    our stdout and write-through to the shared cache file."""
    import subprocess
    import sys

    return subprocess.run(
        [sys.executable, "-u", __file__, "--device-phase"]
    ).returncode


def _emit_stale_device_metrics(skip: frozenset = frozenset()) -> bool:
    """Device is gone: replay the last-known-good device metrics marked
    stale (headline last).  ``skip`` holds metrics the child already
    emitted FRESH this run (detected via cache ``measured_at`` deltas) —
    re-printing those as stale would put duplicate, self-contradictory
    records on the stream.  Returns False when the HEADLINE metric (the
    tail line the driver parses) is neither cached nor freshly emitted:
    a partial cache without the headline must fail loudly, not let a
    non-headline record land on the tail line and be misparsed."""
    headline = _DEVICE_METRICS[-1]
    cache = _cache_load()
    if headline not in cache and headline not in skip:
        return False
    for name in _DEVICE_METRICS:
        rec = cache.get(name)
        if rec is None or name in skip:
            continue
        print(json.dumps({**rec, "stale": True}), flush=True)
    return True


def main() -> None:
    import sys

    bench_preproc()  # host-side: fresh regardless of device health
    before = {
        n: (_cache_load().get(n) or {}).get("seq")
        for n in _DEVICE_METRICS
    }
    rc = _run_device_child()
    if rc != 0:
        print(
            f"bench: device phase failed (rc {rc}); retrying once after "
            f"a {_RETRY_BACKOFF_S:.0f} s backoff",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(_RETRY_BACKOFF_S)
        rc = _run_device_child()
    if rc != 0:
        # The device is wedged/dead.  Do NOT erase the perf record: emit
        # the last healthy bench's device metrics marked stale, so the
        # round still records a full (if dated) table plus the fresh
        # host metric above.  Metrics the child DID emit fresh before
        # wedging (their cache timestamps moved) are not replayed.
        fresh = frozenset(
            n for n in _DEVICE_METRICS
            if (_cache_load().get(n) or {}).get("seq") != before[n]
        )
        print(
            json.dumps({
                "metric": "bench_warning",
                "value": None,
                "unit": f"device phase failed twice (rc {rc}); device "
                        "metrics below are the last-known-good values, "
                        "marked stale",
            }),
            flush=True,
        )
        if not _emit_stale_device_metrics(skip=fresh):
            print(
                "bench: device gone and no cached headline metric; "
                "exiting 75",
                file=sys.stderr,
                flush=True,
            )
            raise SystemExit(75)


if __name__ == "__main__":
    import sys
    import time as _time

    if "--device-phase" in sys.argv:
        # The tunneled TPU occasionally reports FAILED_PRECONDITION right
        # after another process released it; retry before giving up.
        for attempt in range(3):
            try:
                device_phase()
                break
            except Exception as e:  # noqa: BLE001
                if attempt == 2:
                    raise
                print(
                    f"bench attempt {attempt + 1} failed ({e!r}); retrying",
                    file=sys.stderr,
                )
                _time.sleep(20)
    else:
        main()
