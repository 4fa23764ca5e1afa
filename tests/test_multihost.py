"""2-process multi-host data-parallel training test (SURVEY.md §2.4).

Spawns two ``jax.distributed`` CPU processes (2 virtual devices each) that
train over the global 4-device mesh, then verifies against an in-process
single-host run:

* final checkpoint state matches (the block host-sharding in
  ``batch_iterator`` makes global batch composition identical; remaining
  differences are cross-device-count reduction order -> allclose);
* only the lead process wrote previews and the metrics CSV.
"""

import os
import socket
import subprocess
import sys

import numpy as np

from tiny_cfg import TINY_MODEL

from musicgan_tpu.config import TrainConfig
from musicgan_tpu.train.checkpoint import CheckpointManager
from musicgan_tpu.train.step import init_train_state

_RUNNER = os.path.join(os.path.dirname(__file__), "_multihost_runner.py")

# Timeouts here look extravagant for 4-iteration runs, deliberately: a
# COLD .jax_cache full-suite run on the 1-core host compiles the train
# graph inside 2 subprocesses at once while other tests also compile
# (observed: suite 1010 s cold vs 716 s warm, and the 540/480 s limits
# flaked exactly twice on cold runs).  Warm runs never wait these out.


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _synth_dataset(tmp_path, n=16):
    from musicgan_tpu.audio.ingest import ShardWriter

    w = ShardWriter(str(tmp_path / "ds"), samples_per_shard=6)
    w.add(
        np.random.default_rng(0)
        .uniform(-1, 1, (n, 2, 512, 512))
        .astype(np.float32)
    )
    w.close()
    return str(tmp_path / "ds")


def test_two_process_training_matches_single_host(tmp_path):
    import jax

    ds = _synth_dataset(tmp_path)
    out_mh = str(tmp_path / "out_mh")
    coord = f"127.0.0.1:{_free_port()}"

    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, _RUNNER, coord, str(pid), ds, out_mh],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(_RUNNER)),
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"runner failed:\n{o[-3000:]}"

    # ---- lead-only observability artifacts -------------------------------
    pngs = [f for f in os.listdir(out_mh) if f.endswith(".png")]
    assert sorted(pngs) == ["magn_0_ID0.png", "phase_0_ID0.png"]
    with open(os.path.join(out_mh, "metrics.csv")) as f:
        mh_rows = f.readlines()

    # ---- single-host comparison run (same seed/schedule, 8-dev mesh) -----
    cfg = TrainConfig(
        batch_size=8, save_every=4, log_every=2, nb_preview=1,
        chunk_steps=1, seed=0,
    )
    out_1 = str(tmp_path / "out_single")
    from musicgan_tpu.train import train

    train("single", ds, out_1, cfg, TINY_MODEL, max_iters=4)
    with open(os.path.join(out_1, "metrics.csv")) as f:
        single_rows = f.readlines()
    assert len(mh_rows) == len(single_rows)  # no duplicated writers

    template = init_train_state(jax.random.PRNGKey(0), TINY_MODEL, cfg)
    mh_state, mh_meta = CheckpointManager(
        os.path.join(out_mh, "checkpoints")
    ).restore(0, template)
    s1_state, s1_meta = CheckpointManager(
        os.path.join(out_1, "checkpoints")
    ).restore(0, template)
    assert mh_meta["iter_idx"] == s1_meta["iter_idx"]

    for a, b in zip(
        jax.tree_util.tree_leaves((mh_state.gen_params, mh_state.disc_params)),
        jax.tree_util.tree_leaves((s1_state.gen_params, s1_state.disc_params)),
    ):
        # Absolute tolerance only: cross-device-count reduction order shifts
        # near-zero Adam-updated params by ~1e-5 over a few steps, which
        # makes any rtol meaningless for those elements.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=0
        )


def test_two_process_preemption_agrees_collectively(tmp_path):
    """SIGUSR1 delivered to ONE of two processes: the per-boundary
    collective agreement must propagate the preemption to the other, both
    flush one off-cadence checkpoint together (orbax saves are
    collective — a one-sided flush would deadlock), and both exit 0."""
    import signal
    import time

    import jax

    ds = _synth_dataset(tmp_path)
    out_mh = str(tmp_path / "out_pre")
    coord = f"127.0.0.1:{_free_port()}"

    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, _RUNNER, coord, str(pid), ds, out_mh, "preempt"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(_RUNNER)),
        )
        for pid in range(2)
    ]
    # wait for real training progress (lead flushes metrics.csv per row)
    csv_path = os.path.join(out_mh, "metrics.csv")
    deadline = time.time() + 900
    while time.time() < deadline:
        try:
            if os.path.getsize(csv_path) > 0:
                break
        except OSError:
            pass
        if any(p.poll() is not None for p in procs):
            break  # crashed early; surfaced below
        time.sleep(0.5)
    else:
        raise AssertionError("no training progress before deadline")

    procs[1].send_signal(signal.SIGUSR1)  # the NON-lead process only
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"runner failed:\n{o[-3000:]}"
    assert all("preempted at iter" in o for o in outs)

    # exactly one collectively-written off-cadence checkpoint
    ckpt = CheckpointManager(os.path.join(out_mh, "checkpoints"))
    assert ckpt.saved_indices() == [0]
    cfg = TrainConfig(
        batch_size=8, save_every=10**6, log_every=1, nb_preview=1,
        chunk_steps=1, seed=0,
    )
    template = init_train_state(jax.random.PRNGKey(0), TINY_MODEL, cfg)
    state, meta = ckpt.restore(0, template)
    assert int(meta["iter_idx"]) >= 1
    assert np.isfinite(
        np.asarray(jax.tree_util.tree_leaves(state.gen_params)[0])
    ).all()


def test_two_process_streaming_ingest_agrees_on_snapshot(tmp_path):
    """Streaming ingest composes with multi-host DP (round-4 VERDICT item
    3): each host's copy of the dataset grows at a DIFFERENT time mid-run,
    and the per-epoch allgathered-min agreement must keep every host's
    visible sample count — hence the (seed+epoch)-deterministic batch
    composition — identical across hosts at every epoch."""
    import time

    from musicgan_tpu.audio.ingest import ShardWriter

    rng = np.random.default_rng(0)
    first = rng.uniform(-1, 1, (16, 2, 512, 512)).astype(np.float32)
    second = rng.uniform(-1, 1, (16, 2, 512, 512)).astype(np.float32)

    ds_root = tmp_path / "ds"
    writers = []
    for pid in range(2):
        w = ShardWriter(str(ds_root / str(pid)), samples_per_shard=8)
        w.add(first)  # two full shards flushed; index stays complete=false
        writers.append(w)

    out_mh = str(tmp_path / "out_stream")
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = _launch_pair(
        f"127.0.0.1:{_free_port()}", str(ds_root), out_mh, "stream:200", env
    )

    # wait for real training progress, then grow the two copies at
    # deliberately different times — the skew window is what the
    # agreement protocol exists for
    csv_path = os.path.join(out_mh, "metrics.csv")
    deadline = time.time() + 900
    while time.time() < deadline:
        try:
            if os.path.getsize(csv_path) > 0:
                break
        except OSError:
            pass
        if any(p.poll() is not None for p in procs):
            break
        time.sleep(0.5)
    else:
        raise AssertionError("no training progress before deadline")

    writers[0].add(second)
    writers[0].close()
    time.sleep(3.0)  # host 1's copy lags: its peers must clamp to 16
    writers[1].add(second)
    writers[1].close()

    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"runner failed:\n{o[-3000:]}"

    logs = []
    for pid in range(2):
        with open(os.path.join(out_mh, f"sizes_{pid}.log")) as f:
            logs.append([int(x) for x in f.read().split()])
    assert logs[0] == logs[1], (
        f"hosts observed different dataset snapshots:\n{logs[0]}\n{logs[1]}"
    )
    assert logs[0][-1] == 32, f"growth never observed: {logs[0]}"
    assert logs[0][0] < logs[0][-1]


def test_two_process_divergent_open_sizes_converge(tmp_path):
    """Hosts that OPEN their dataset copies at different mid-ingest
    snapshot sizes must still converge on the agreed count at the very
    first epoch (dataset.refresh(limit=) can SHRINK an oversized view):
    without the shrink, the ahead host would compose more batches per
    epoch than its peer and the pod would deadlock on mismatched
    collectives."""
    import time

    from musicgan_tpu.audio.ingest import ShardWriter

    rng = np.random.default_rng(0)
    first = rng.uniform(-1, 1, (24, 2, 512, 512)).astype(np.float32)
    second = rng.uniform(-1, 1, (8, 2, 512, 512)).astype(np.float32)

    ds_root = tmp_path / "ds"
    writers = []
    # host 0 opens AHEAD at 24 rows; host 1 opens at 16 (same prefix)
    w0 = ShardWriter(str(ds_root / "0"), samples_per_shard=8)
    w0.add(first)
    writers.append(w0)
    w1 = ShardWriter(str(ds_root / "1"), samples_per_shard=8)
    w1.add(first[:16])
    writers.append(w1)

    out_mh = str(tmp_path / "out_diverge")
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = _launch_pair(
        f"127.0.0.1:{_free_port()}", str(ds_root), out_mh, "stream:200", env
    )

    csv_path = os.path.join(out_mh, "metrics.csv")
    deadline = time.time() + 900
    while time.time() < deadline:
        try:
            if os.path.getsize(csv_path) > 0:
                break
        except OSError:
            pass
        if any(p.poll() is not None for p in procs):
            break
        time.sleep(0.5)
    else:
        raise AssertionError("no training progress before deadline")

    # let the lagging host catch up and both finish at 32
    writers[1].add(first[16:])
    writers[0].add(second)
    writers[0].close()
    writers[1].add(second)
    writers[1].close()

    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"runner failed:\n{o[-3000:]}"

    logs = []
    for pid in range(2):
        with open(os.path.join(out_mh, f"sizes_{pid}.log")) as f:
            logs.append([int(x) for x in f.read().split()])
    assert logs[0] == logs[1], (
        f"hosts observed different dataset snapshots:\n{logs[0]}\n{logs[1]}"
    )
    # the ahead host must have been CLAMPED to the agreed 16 at epoch 0
    assert logs[0][0] == 16, f"first agreement should clamp to 16: {logs[0]}"
    assert logs[0][-1] == 32, f"growth never observed: {logs[0]}"


def _launch_pair(coord, ds, out, mode, env):
    return [
        subprocess.Popen(
            [sys.executable, _RUNNER, coord, str(pid), ds, out, mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(_RUNNER)),
        )
        for pid in range(2)
    ]


def test_two_process_sigterm_exit75_then_bitexact_resume(tmp_path):
    """The full production failure contract on a 2-host pod (VERDICT r3
    item 5): SIGTERM lands on the LEAD mid-run -> the collective
    preemption agreement flushes ONE common checkpoint and EVERY host
    exits 75 (the supervisor retry code) -> a relaunch with resume
    continues and finishes BIT-EXACTLY where an uninterrupted run lands."""
    import signal
    import time

    import jax

    from musicgan_tpu.utils.watchdog import EXIT_STALLED

    ds = _synth_dataset(tmp_path)
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }

    # --- phase 1: run, SIGTERM the lead, both exit 75 ----------------------
    out_a = str(tmp_path / "out_resumed")
    procs = _launch_pair(f"127.0.0.1:{_free_port()}", ds, out_a,
                         "preempt75", env)
    csv_path = os.path.join(out_a, "metrics.csv")
    deadline = time.time() + 900
    while time.time() < deadline:
        try:
            if os.path.getsize(csv_path) > 0:
                break
        except OSError:
            pass
        if any(p.poll() is not None for p in procs):
            break
        time.sleep(0.5)
    else:
        raise AssertionError("no training progress before deadline")

    procs[0].send_signal(signal.SIGTERM)  # the LEAD process
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == EXIT_STALLED, (
            f"expected retryable exit {EXIT_STALLED}, got "
            f"{p.returncode}:\n{o[-3000:]}"
        )

    ckpt = CheckpointManager(os.path.join(out_a, "checkpoints"))
    assert ckpt.saved_indices() == [0]  # one common flushed checkpoint
    cfg = TrainConfig(
        batch_size=8, save_every=10**6, log_every=1, nb_preview=1,
        chunk_steps=1, seed=0,
    )
    template = init_train_state(jax.random.PRNGKey(0), TINY_MODEL, cfg)
    _, meta = ckpt.restore(0, template)
    k = int(meta["iter_idx"])
    assert k >= 1
    target = k + 3

    # --- phase 2: supervised-style relaunch with resume --------------------
    procs = _launch_pair(f"127.0.0.1:{_free_port()}", ds, out_a,
                         f"resume:{target}", env)
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"resume failed:\n{o[-3000:]}"

    # --- phase 3: uninterrupted control run to the same iteration ----------
    # One bounded retry: on a heavily oversubscribed host (1-core CI with a
    # concurrent training run) the coordination-service SHUTDOWN barrier can
    # time out in an otherwise-successful control run (observed live:
    # "Shutdown barrier in coordination service has failed ... 1/2").  The
    # control run is side-effect free, so a fresh re-run is sound; any
    # non-environmental failure still fails the second attempt.
    out_b = str(tmp_path / "out_control")
    for attempt in (1, 2):
        procs = _launch_pair(f"127.0.0.1:{_free_port()}", ds, out_b,
                             f"full:{target}", env)
        outs = [p.communicate(timeout=900)[0] for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
        envish = any(
            m in o.lower()
            for o in outs
            for m in ("barrier", "coordination", "deadline_exceeded",
                      "unavailable")
        )
        if attempt == 2 or not envish:
            for p, o in zip(procs, outs):
                assert p.returncode == 0, f"control failed:\n{o[-3000:]}"
        import shutil

        shutil.rmtree(out_b, ignore_errors=True)

    resumed = np.load(os.path.join(out_a, "final_params.npz"))
    control = np.load(os.path.join(out_b, "final_params.npz"))
    assert set(resumed.files) == set(control.files)
    for name in resumed.files:
        # same device topology + deterministic batch replay from the
        # intra-epoch cursor => the resumed run is numerically IDENTICAL
        np.testing.assert_array_equal(resumed[name], control[name])
