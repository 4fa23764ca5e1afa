"""Subprocess entry for the 2-process multi-host test (NOT a pytest file).

Each process provisions 2 virtual CPU devices, joins the jax.distributed
cluster, and runs a few train iterations over the global 4-device mesh —
executing the real multi-host paths: ``initialize_distributed``
(parallel/mesh.py), the host-divisibility assert and
``jax.make_array_from_process_local_data`` batch assembly (train/loop.py),
and the collective orbax checkpoint with lead-only meta/preview/CSV writes.

Usage: python _multihost_runner.py COORD PID DATASET_DIR OUT_DIR [MODE] [ARG]

MODE "train" (default): 4 iterations to a cadence checkpoint.
MODE "preempt": a long run with an unreachable save cadence; the parent
test SIGUSR1s ONE process mid-run and both must agree collectively,
flush one off-cadence checkpoint together, and exit cleanly.
MODE "preempt75": like "preempt" but mirrors the CLI's retry contract —
exits EXIT_STALLED (75) on every host after the collective flush, and
dumps nothing (the flushed checkpoint is the artifact).
MODE "resume:N" / "full:N": run to max_iters=N with/without --resume
semantics, then the LEAD dumps the final generator+discriminator params
to OUT_DIR/final_params.npz for bit-exactness comparison across runs.
MODE "stream:N": streaming-ingest-while-training; each process opens its
OWN copy of a still-growing dataset (DATASET_DIR/{pid}) that the parent
appends to at different times, and logs len(dataset) after every
per-epoch refresh to OUT_DIR/sizes_{pid}.log — the parent asserts the
logs are IDENTICAL across hosts (the allgathered-min agreement).
"""

import sys


def main() -> None:
    coord, pid, ds, out = (
        sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4],
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "train"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    import os as _os

    # Same cache policy and knob as tests/conftest.py: enabled by
    # default (two green full-suite runs with per-module clears), with
    # MUSICGAN_TEST_NO_COMPILE_CACHE as the opt-out.
    if not _os.environ.get("MUSICGAN_TEST_NO_COMPILE_CACHE"):
        jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.join(
                _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                ".jax_cache",
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import os

    tests_dir = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(tests_dir))  # repo root
    from tiny_cfg import TINY_MODEL

    from musicgan_tpu.config import TrainConfig
    from musicgan_tpu.parallel import initialize_distributed
    from musicgan_tpu.train import train

    initialize_distributed(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4

    if mode in ("preempt", "preempt75"):
        cfg = TrainConfig(
            batch_size=8, save_every=10**6, log_every=1, nb_preview=1,
            chunk_steps=1, seed=0,
        )
        state = train("mh", ds, out, cfg, TINY_MODEL, max_iters=10**6)
        from musicgan_tpu.train.loop import PREEMPTED

        # the collective agreement must have propagated the one-process
        # signal to EVERY process before the loop stopped
        # Align BEFORE the assert: if the assert fires on one process,
        # a peer already parked at the barrier would otherwise bury the
        # assertion under a slow cross-process barrier timeout.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("pre_shutdown")  # see below
        assert PREEMPTED.is_set(), "non-signaled process stopped w/o flag"
        print(
            f"[runner] process {pid} preempted at iter "
            f"{int(state.iter_idx)} OK",
            flush=True,
        )
        if mode == "preempt75":
            # The CLI contract (musicgan_tpu/__main__.py): a preempted
            # run exits EX_TEMPFAIL on EVERY host so each host's
            # supervisor relaunches with --resume.
            from musicgan_tpu.utils.watchdog import EXIT_STALLED

            sys.stdout.flush()
            raise SystemExit(EXIT_STALLED)
        return

    if mode.startswith("stream:"):
        from musicgan_tpu.audio.dataset import SpectrogramDataset

        sizes_path = os.path.join(out, f"sizes_{pid}.log")
        orig_refresh = SpectrogramDataset.refresh

        def logging_refresh(self, limit=None):
            grew = orig_refresh(self, limit=limit)
            with open(sizes_path, "a") as f:
                f.write(f"{len(self)}\n")
            return grew

        SpectrogramDataset.refresh = logging_refresh
        cfg = TrainConfig(
            batch_size=8, save_every=10**6, log_every=1, nb_preview=1,
            chunk_steps=1, seed=0,
        )
        train(
            "mh", os.path.join(ds, str(pid)), out, cfg, TINY_MODEL,
            max_iters=int(mode.split(":")[1]),
        )
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("pre_shutdown")
        print(f"[runner] process {pid} streamed OK", flush=True)
        return

    if mode.startswith(("resume:", "full:")):
        import numpy as np

        max_iters = int(mode.split(":")[1])
        cfg = TrainConfig(
            batch_size=8, save_every=10**6, log_every=1, nb_preview=1,
            chunk_steps=1, seed=0,
        )
        state = train(
            "mh", ds, out, cfg, TINY_MODEL,
            resume=mode.startswith("resume:"), max_iters=max_iters,
        )
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("pre_dump")
        if pid == 0:  # params are replicated; one dump suffices
            leaves = jax.tree_util.tree_leaves(
                (state.gen_params, state.disc_params)
            )
            np.savez(
                os.path.join(out, "final_params.npz"),
                **{f"p{i}": np.asarray(x) for i, x in enumerate(leaves)},
            )
        multihost_utils.sync_global_devices("pre_shutdown")
        print(f"[runner] process {pid} reached iter "
              f"{int(state.iter_idx)} OK", flush=True)
        return

    cfg = TrainConfig(
        batch_size=8, save_every=4, log_every=2, nb_preview=1,
        chunk_steps=1, seed=0,
    )
    train("mh", ds, out, cfg, TINY_MODEL, max_iters=4)
    # The lead process does post-train host work (meta/preview/CSV) the
    # follower doesn't; on a loaded single-core host that skew can exceed
    # the distributed client's shutdown-barrier timeout (~30 s observed).
    # Align both processes before interpreter exit triggers the barrier.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("pre_shutdown")
    print(f"[runner] process {pid} finished OK", flush=True)


if __name__ == "__main__":
    main()
