"""Device-stall failure detection (SURVEY.md §5: failure detection).

A lost accelerator connection — preempted TPU host, dead tunnel, wedged
device server — leaves the dispatching thread blocked inside PJRT
forever: JAX gives Python no way to cancel or time-bound a pending
execution, so the train loop just stops making progress with ~0% CPU.
(Observed live on this project's TPU tunnel: a full-schedule quality
run's dispatch at iter 91,600 never returned and the process sat in a
futex wait for over an hour — VALIDATION.md r3.)

The standard large-scale recovery is crash-and-resume: *detect* the
stall, exit with a retryable status, and let a supervisor restart the
job from its latest checkpoint (training here checkpoints every
``save_every`` iterations and resumes exactly — tests/test_train.py).
This module is the detector; :func:`musicgan_tpu.utils.supervise.
run_supervised` is the supervisor; exit code ``EXIT_STALLED`` (75,
BSD ``EX_TEMPFAIL``) is the contract between them.

The train loop calls :meth:`StallWatchdog.beat` at every point where it
has *evidence of device progress* — after metric fetches and checkpoint
writes, i.e. real device->host materializations.  Dispatch enqueues are
async and would beat even against a dead device, so they don't count.
The timeout must therefore exceed the worst honest beat interval:
``log_every`` x step-time plus one cold stage compile (minutes through a
remote-compile tunnel) — the 900 s default used by the CLI covers both
with margin while still detecting a wedge ~5x faster than a human
watching a quiet log.
"""

from __future__ import annotations

import faulthandler
import os
import sys
import threading
import time

__all__ = [
    "EXIT_STALLED",
    "StallWatchdog",
    "beat_active",
    "is_distributed_failure",
    "is_runtime_error",
]

# BSD sysexits EX_TEMPFAIL: "temporary failure, retry is reasonable".
EXIT_STALLED = 75

# Process-wide handle to the (single) enabled watchdog, so long device
# phases OUTSIDE the train loop — the per-stage autotune measurement at a
# growth boundary times several full train graphs, minutes of honest work
# through a remote-compile tunnel — can witness their own progress.
# Without this, a healthy autotune longer than the timeout is killed as a
# stall, and since the winner persists only after ALL candidates finish,
# the supervised restart re-enters the same boundary and is killed again
# until --max-restarts is exhausted.
_ACTIVE: "StallWatchdog | None" = None


def beat_active() -> None:
    """Beat the process's enabled watchdog, if any (no-op otherwise)."""
    wd = _ACTIVE
    if wd is not None:
        wd.beat()


# When the coordinator (or a peer) dies, surviving processes don't stall
# silently — their next collective/dispatch errors with a gRPC-flavored
# runtime failure.  Those deaths are exactly as retryable as a stall (the
# supervisor relaunches with --resume), but an ordinary rc-1 crash is not,
# so the train CLI maps only exceptions matching these markers to
# EXIT_STALLED.  Markers are substrings of real jaxlib/XLA distributed-
# runtime messages (coordination-service heartbeats, barrier timeouts,
# gRPC channel teardown).
_DIST_FAILURE_MARKERS = (
    "coordination service",
    "coordinationservice",
    "heartbeat",
    "deadline_exceeded",
    "deadline exceeded",
    "unavailable",
    "barrier",
    "socket closed",
    "connection reset",
    "connection refused",
    "failed to connect",
    "broken pipe",
    "shutting down",
    "preempt",
    # XLA:CPU collectives ride Gloo; when a peer dies mid-run the
    # survivor's next collective (or any fetch depending on it) raises
    # "Gloo context initialization failed: ... Connect timeout" — seen
    # live when SIGTERM hit the lead under host load (the follower's
    # log_metrics device_get surfaced it as a JaxRuntimeError).  The
    # prefix alone covers that message; a bare "connect timeout" marker
    # would also swallow unrelated client timeouts (HTTP/MLflow) on the
    # multi-host path, which matches by message only (ADVICE r4).
    "gloo context initialization failed",
)


def is_runtime_error(exc: BaseException) -> bool:
    """Is ``exc`` an XLA/JAX *runtime* error (the class device/tunnel
    deaths surface as), as opposed to an ordinary Python exception whose
    message merely contains a distributed-failure marker?  Single-host
    retryable-exit mapping requires this so e.g. a BrokenPipeError from a
    closed preview stream keeps propagating as a real crash."""
    try:
        from jax.errors import JaxRuntimeError
    except ImportError:  # very old jax
        JaxRuntimeError = ()  # type: ignore[assignment]
    if isinstance(exc, JaxRuntimeError):
        return True
    # XlaRuntimeError is JaxRuntimeError's alias in current jax, but
    # older jaxlibs raise their own class; match by name as a fallback.
    return type(exc).__name__ in ("XlaRuntimeError", "JaxRuntimeError")


def is_distributed_failure(exc: BaseException) -> bool:
    """Heuristic: does ``exc`` look like the distributed runtime dying
    under us (lead/peer death, coordination-service loss) rather than a
    bug in this process?  Used by the train loop on multi-host runs to
    map follower-side collective failures after a lead death to
    :data:`EXIT_STALLED`, so every host's supervisor relaunches —
    without it the relaunched lead blocks forever in
    ``initialize_distributed`` waiting for followers whose supervisors
    gave up on an unretryable rc 1 (ADVICE r3)."""
    s = f"{type(exc).__name__}: {exc}".lower()
    return any(m in s for m in _DIST_FAILURE_MARKERS)


class StallWatchdog:
    """Daemon-thread stall detector.  ``timeout_s <= 0`` disables it
    entirely (no thread is started; ``beat``/``close`` are no-ops).

    Starts DISARMED: the clock only runs after the first ``beat()``
    (arming at construction would count process startup — device claim,
    corpus upload, first compile — against the steady-state timeout).

    On expiry it dumps all thread stacks (so the wedged PJRT frame is
    visible in the log) and ``os._exit``\\ s with :data:`EXIT_STALLED`.
    ``os._exit`` rather than an exception on purpose: the stalled thread
    is *blocked in C* and will never see a Python exception; only the
    process dying releases the device claim so a restart can reclaim it.
    """

    def __init__(
        self,
        timeout_s: float,
        poll_s: float = 5.0,
        _exit=os._exit,  # injectable for tests
        _stream=None,
    ):
        self.timeout_s = float(timeout_s)
        self._poll_s = min(poll_s, max(0.01, self.timeout_s / 4 or poll_s))
        self._exit = _exit
        self._stream = _stream  # default sys.stderr, resolved at fire time
        self._last: float | None = None  # None = disarmed
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        if self.timeout_s > 0:
            global _ACTIVE
            _ACTIVE = self  # latest enabled instance wins (one per run)
            self._thread = threading.Thread(
                target=self._watch, name="musicgan-stall-watchdog", daemon=True
            )
            self._thread.start()

    # -- train-loop surface -------------------------------------------------
    def beat(self) -> None:
        """Record evidence of device progress (arms the clock)."""
        if self._thread is None:
            return
        with self._lock:
            self._last = time.monotonic()

    def disarm(self) -> None:
        """Stop the clock without stopping the thread (e.g. around a
        deliberately long host-only phase)."""
        with self._lock:
            self._last = None

    def close(self) -> None:
        """Shut the detector down (end of training)."""
        global _ACTIVE
        if _ACTIVE is self:
            _ACTIVE = None
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2 * self._poll_s)
            self._thread = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    # -- detector -----------------------------------------------------------
    def _watch(self) -> None:
        while not self._stop.wait(self._poll_s):
            with self._lock:
                last = self._last
            if last is None:
                continue
            age = time.monotonic() - last
            if age > self.timeout_s:
                stream = self._stream or sys.stderr
                print(
                    f"[watchdog] no device progress for {age:.0f}s "
                    f"(timeout {self.timeout_s:.0f}s) — assuming a wedged "
                    f"accelerator dispatch; exiting {EXIT_STALLED} for "
                    "supervised restart from the latest checkpoint. "
                    "Thread stacks follow.",
                    file=stream,
                    flush=True,
                )
                try:
                    faulthandler.dump_traceback(file=stream)
                    stream.flush()
                except Exception:
                    pass
                self._exit(EXIT_STALLED)
                return  # only reached with an injected _exit (tests)
