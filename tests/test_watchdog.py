"""Failure detection + supervised restart (SURVEY §5: failure detection;
musicgan_tpu/utils/{watchdog,supervise}.py).

The scenario these exist for was observed live on the TPU tunnel
(VALIDATION.md r3): a training dispatch that never returns, with the
process parked in a futex wait — only crash-and-resume recovers.  The
reference has no equivalent (its train loop would hang the same way);
this is TPU-production infrastructure.
"""

from __future__ import annotations

import io
import subprocess
import sys
import time

import numpy as np

from musicgan_tpu.utils.supervise import run_supervised
from musicgan_tpu.utils.watchdog import (
    EXIT_STALLED,
    StallWatchdog,
    is_distributed_failure,
)


def test_is_distributed_failure_classification():
    """Only distributed-runtime-flavored errors map to the retryable exit
    (ADVICE r3: followers must exit 75 when the lead dies, but a real
    crash must NOT be retried into a loop)."""
    retryable = [
        RuntimeError(
            "Coordination service agent is in ERROR: heartbeat timeout"
        ),
        RuntimeError("DEADLINE_EXCEEDED: Barrier timed out: shutdown"),
        ConnectionError("UNAVAILABLE: failed to connect to all addresses"),
        OSError("Socket closed"),
        RuntimeError("gRPC channel: connection reset by peer"),
        # seen live: XLA:CPU Gloo collective failing after the lead died
        # mid-run (surfaced from a follower's device_get as
        # JaxRuntimeError rc 1 — the exact un-retried death this
        # classifier exists to prevent)
        RuntimeError(
            "UNKNOWN: Buffer Definition Event: Gloo context "
            "initialization failed: [external/gloo/gloo/transport/tcp/"
            "pair.h:311] Connect timeout [none]"
        ),
        # seen live single-host: the TPU worker died mid-run and the
        # rc-1 exit made the supervisor give up instead of resuming —
        # the mapping now applies regardless of host count
        RuntimeError(
            "UNAVAILABLE: TPU worker process crashed or restarted. "
            "This can be caused by a kernel fault — check the kernel "
            "before re-running."
        ),
    ]
    not_retryable = [
        AssertionError("batch 6 not divisible by 4 devices"),
        ValueError("device_dataset='on' requires a single-host run"),
        FloatingPointError("nan encountered in gradient penalty"),
        KeyError("gen_params"),
    ]
    assert all(is_distributed_failure(e) for e in retryable)
    assert not any(is_distributed_failure(e) for e in not_retryable)


def test_is_runtime_error_gates_single_host_mapping():
    """Single-host retryable mapping requires a real XLA/JAX runtime
    error: a plain exception that merely message-matches a marker (e.g.
    BrokenPipeError contains 'broken pipe') must stay a real crash."""
    from jax.errors import JaxRuntimeError

    from musicgan_tpu.utils.watchdog import is_runtime_error

    assert is_runtime_error(
        JaxRuntimeError("UNAVAILABLE: TPU worker process crashed")
    )
    assert not is_runtime_error(BrokenPipeError("[Errno 32] Broken pipe"))
    assert not is_runtime_error(RuntimeError("unavailable-ish library msg"))


def _wait_for(pred, timeout=5.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.02)
    return pred()


def test_watchdog_fires_after_silence():
    exits = []
    buf = io.StringIO()
    wd = StallWatchdog(0.2, poll_s=0.05, _exit=exits.append, _stream=buf)
    try:
        wd.beat()
        assert _wait_for(lambda: exits, timeout=5.0)
        assert exits[0] == EXIT_STALLED
        out = buf.getvalue()
        assert "no device progress" in out
        # the stack dump must include this (the main) thread's frames
        assert "test_watchdog_fires_after_silence" in out or "Thread" in out
    finally:
        wd.close()


def test_watchdog_beats_prevent_firing_and_close_is_clean():
    exits = []
    wd = StallWatchdog(0.3, poll_s=0.05, _exit=exits.append)
    try:
        for _ in range(10):
            wd.beat()
            time.sleep(0.05)
        assert not exits
    finally:
        wd.close()
    assert wd._thread is None


def test_watchdog_starts_disarmed():
    """Startup (device claim, corpus upload, first compile) must not
    count against the steady-state timeout: no beat => no fire."""
    exits = []
    wd = StallWatchdog(0.1, poll_s=0.02, _exit=exits.append)
    try:
        time.sleep(0.4)
        assert not exits
    finally:
        wd.close()


def test_watchdog_disabled_is_free():
    wd = StallWatchdog(0.0)
    assert wd._thread is None
    wd.beat()
    wd.close()


def test_watchdog_fires_in_real_process(tmp_path):
    """End to end: a subprocess whose 'dispatch' hangs exits 75 with the
    hung thread's stack in stderr."""
    code = """
import threading, time
from musicgan_tpu.utils.watchdog import StallWatchdog
wd = StallWatchdog(0.3, poll_s=0.05)
wd.beat()
def wedged_dispatch():
    time.sleep(3600)  # stands in for a PJRT execute that never returns
wedged_dispatch()
"""
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=60,
    )
    assert p.returncode == EXIT_STALLED
    assert "no device progress" in p.stderr
    assert "wedged_dispatch" in p.stderr  # the stack dump names the culprit


def test_run_supervised_retries_stall_then_succeeds(tmp_path):
    """Child exits 75 until the sentinel exists, then 0: the supervisor
    must restart exactly that many times and return 0."""
    sentinel = tmp_path / "ok"
    code = (
        "import os, sys; "
        f"p = {str(sentinel)!r}; "
        "sys.exit(0) if os.path.exists(p) else "
        f"(open(p, 'w').close(), sys.exit({EXIT_STALLED}))"
    )
    calls = []

    def make_cmd(attempt):
        calls.append(attempt)
        return [sys.executable, "-c", code]

    rc = run_supervised(make_cmd, max_restarts=3, _sleep=lambda s: None)
    assert rc == 0
    assert calls == [0, 1]


def test_run_supervised_does_not_retry_real_crashes():
    calls = []

    def make_cmd(attempt):
        calls.append(attempt)
        return [sys.executable, "-c", "import sys; sys.exit(3)"]

    rc = run_supervised(make_cmd, max_restarts=5, _sleep=lambda s: None)
    assert rc == 3
    assert calls == [0]


def test_run_supervised_respects_budget():
    calls = []

    def make_cmd(attempt):
        calls.append(attempt)
        return [sys.executable, "-c", f"import sys; sys.exit({EXIT_STALLED})"]

    rc = run_supervised(make_cmd, max_restarts=2, _sleep=lambda s: None)
    assert rc == EXIT_STALLED
    assert calls == [0, 1, 2]


def test_run_supervised_retries_signal_death():
    """A child killed by a signal (preempted host / OOM-kill shape)
    retries; with retry_signals=False it does not."""
    code = "import os, signal; os.kill(os.getpid(), signal.SIGKILL)"

    def make_cmd(attempt):
        return [sys.executable, "-c", code]

    rc = run_supervised(make_cmd, max_restarts=1, _sleep=lambda s: None)
    assert rc == -9  # budget exhausted, last failure surfaced
    rc = run_supervised(
        make_cmd, max_restarts=1, retry_signals=False, _sleep=lambda s: None
    )
    assert rc == -9


def test_train_with_watchdog_enabled_completes(tmp_path):
    """A healthy tiny run with the watchdog armed finishes normally (the
    beats keep it quiet) and shuts the detector thread down."""
    import threading

    from tiny_cfg import TINY_MODEL as tiny

    from musicgan_tpu.audio.ingest import ShardWriter
    from musicgan_tpu.config import TrainConfig
    from musicgan_tpu.train import train

    rng = np.random.default_rng(0)
    w = ShardWriter(str(tmp_path / "ds"), samples_per_shard=4)
    w.add(rng.uniform(-1, 1, (4, 2, 8, 8)).astype(np.float32))

    cfg = TrainConfig(
        batch_size=2, save_every=6, log_every=2, chunk_steps=2,
        # generous: a cold-cache grad-of-grad compile on a loaded
        # single-core host exceeded 30 s and the (by-design) hard
        # exit 75 killed the whole pytest process
        stall_timeout_s=300.0, max_stage=1, device_dataset="off",
        fadein_lengths=(1,) * 8, train_lengths=(8,) * 7, nb_epoch=100,
    )
    before = {t.name for t in threading.enumerate()}
    state = train(
        "wd", str(tmp_path / "ds"), str(tmp_path / "out"),
        train_cfg=cfg, model_cfg=tiny, max_iters=8, mesh=None,
    )
    assert int(state.iter_idx) == 8
    after = {t.name for t in threading.enumerate()}
    assert "musicgan-stall-watchdog" not in after - before


def test_cli_supervisor_restarts_via_module(tmp_path, monkeypatch):
    """`train --max-restarts` becomes a supervisor that re-invokes the
    module.  Simulated end to end with a stubbed child command."""
    from musicgan_tpu.utils import supervise

    seen = []

    class R:
        def __init__(self, rc):
            self.returncode = rc

    def fake_run(cmd, env=None):
        seen.append(list(cmd))
        return R(EXIT_STALLED if len(seen) == 1 else 0)

    rc = supervise.run_supervised(
        lambda a: ["prog", "train", "--resume"] if a else ["prog", "train"],
        max_restarts=2, _sleep=lambda s: None, _run=fake_run,
    )
    assert rc == 0
    assert seen[0] == ["prog", "train"]
    assert seen[1] == ["prog", "train", "--resume"]


def test_cli_supervisor_argv_munging(monkeypatch):
    """The CLI supervisor must strip --max-restarts from the child argv,
    default the stall timeout on, and add --resume only from attempt 1."""
    import musicgan_tpu.__main__ as M

    captured = {}

    def fake_supervised(make_cmd, max_restarts, **kw):
        captured["cmds"] = [make_cmd(0), make_cmd(1)]
        captured["max_restarts"] = max_restarts
        return 0

    monkeypatch.setattr(
        "musicgan_tpu.utils.supervise.run_supervised", fake_supervised
    )
    argv = ["musicgan_tpu", "train", "runX", "-o", "/tmp/x", "-i", "/tmp/ds",
            "--max-restarts", "3", "--chunk-steps", "2"]
    monkeypatch.setattr(sys, "argv", argv)
    with np.testing.assert_raises(SystemExit) as cm:
        M.main()
    assert cm.exception.code == 0
    assert captured["max_restarts"] == 3
    first, second = captured["cmds"]
    # child command: same module, --max-restarts stripped, timeout defaulted
    assert first[:3] == [sys.executable, "-m", "musicgan_tpu"]
    assert "--max-restarts" not in first
    assert "--stall-timeout" in first
    assert "--resume" not in first
    assert "--resume" in second
    assert "--chunk-steps" in first  # user flags pass through


def test_autotune_measurement_beats_active_watchdog(monkeypatch):
    """Growth-boundary autotune times several full train graphs — minutes
    of honest work during which the train loop makes no metric fetches.
    The measurement must witness its own progress to the run's watchdog,
    or a healthy autotune is killed as a stall (and the supervised
    restart re-enters the same boundary until --max-restarts burns out)."""
    import dataclasses

    from tiny_cfg import TINY_MODEL

    from musicgan_tpu.config import TrainConfig
    from musicgan_tpu.ops import autotune
    from musicgan_tpu.utils import watchdog

    class _Counting:
        beats = 0

        def beat(self):
            self.beats += 1

    wd = _Counting()
    monkeypatch.setattr(watchdog, "_ACTIVE", wd)
    cfg = dataclasses.replace(TINY_MODEL, conv_impl="auto")
    times = autotune.measure_train_impls(
        cfg, TrainConfig(batch_size=2, chunk_steps=1), stage=0,
        candidates=("xla", "subpixel"),
    )
    assert set(times) == {"xla", "subpixel"}
    # one beat after each candidate's warmup fetch + one per candidate end
    assert wd.beats >= 2
