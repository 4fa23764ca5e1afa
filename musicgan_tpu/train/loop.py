"""The training workflow: progressive-growing WGAN-GP on a device mesh.

TPU-native re-design of reference ``train.py:18-278``:

* one compiled step graph per (stage, with-G) pair, selected on the host by
  the static n_critic schedule;
* raw full-res batches stream to the device once, all per-stage scaling
  happens on-chip inside the step;
* data parallelism over a ``jax.sharding.Mesh`` when more than one device
  is visible (batch sharded on the data axis, state replicated, XLA inserts
  the gradient all-reduces);
* full-state checkpoints every ``save_every`` iterations WITH resume
  (the reference cannot resume — SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import signal
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.dataset import SpectrogramDataset, batch_indices, batch_iterator
from ..config import ModelConfig, TrainConfig
from ..parallel.mesh import data_sharding, make_mesh
from ..utils.metrics import MetricLogger
from .grower import Grower
from .saver import Saver
from .step import TrainState, build_chunk_step, build_step, init_train_state

__all__ = ["train", "PREEMPTED"]

# Preemption-aware checkpointing (SURVEY §5: failure recovery).  TPU pods
# announce maintenance/preemption with a signal and a grace window; the
# production pattern is: catch it, flush a checkpoint at the next iteration
# boundary, exit retryable, and let the scheduler resume elsewhere.  The
# train loop polls this event once per iteration; the CLI exits
# ``EXIT_STALLED`` (75, EX_TEMPFAIL — the same retry contract the stall
# watchdog uses) when it is set after ``train`` returns.
PREEMPTED = threading.Event()
_PREEMPT_SIGNALS = (signal.SIGTERM, signal.SIGUSR1)


def _install_preemption_handlers():
    """Arm SIGTERM/SIGUSR1 -> PREEMPTED for the duration of a run.

    Returns the previous handlers for restoration (``None`` when not on
    the main thread, where CPython forbids ``signal.signal``)."""
    PREEMPTED.clear()  # a stale flag from an earlier run must not stop
    # this one — cleared even off the main thread, where no handlers can
    # be installed (CPython restricts signal.signal to the main thread).
    if threading.current_thread() is not threading.main_thread():
        return None

    def _on_signal(signum, frame):
        PREEMPTED.set()
        print(
            f"[preempt] caught {signal.Signals(signum).name}; will "
            "checkpoint at the next iteration boundary and stop",
            flush=True,
        )

    return {s: signal.signal(s, _on_signal) for s in _PREEMPT_SIGNALS}


def _restore_preemption_handlers(prev) -> None:
    if prev is not None:
        for s, h in prev.items():
            signal.signal(s, h)


def train(
    run_name: str,
    input_dataset_path: str,
    output_dir: str,
    train_cfg: TrainConfig = TrainConfig(),
    model_cfg: ModelConfig = ModelConfig(),
    resume: bool = False,
    max_iters: Optional[int] = None,
    mesh="auto",
) -> TrainState:
    """Run (or resume) progressive WGAN-GP training; returns final state.

    ``mesh``: ``"auto"`` (default) builds a data-parallel mesh over all
    visible devices; ``None`` forces single-device; or pass an explicit
    ``jax.sharding.Mesh``.
    """
    dataset = SpectrogramDataset(input_dataset_path)
    assert len(dataset) >= train_cfg.batch_size, (
        f"dataset has {len(dataset)} samples < batch {train_cfg.batch_size}"
    )

    if isinstance(mesh, str) and mesh == "auto":
        mesh = make_mesh(axis=train_cfg.data_axis)
    n_dev = mesh.size if mesh is not None else 1
    assert train_cfg.batch_size % max(n_dev, 1) == 0, (
        f"batch {train_cfg.batch_size} not divisible by {n_dev} devices"
    )
    assert train_cfg.batch_size % jax.process_count() == 0, (
        f"batch {train_cfg.batch_size} not divisible by "
        f"{jax.process_count()} hosts"
    )
    x_sharding = data_sharding(mesh, train_cfg.data_axis) if mesh else None

    # Device-resident dataset mode: corpus in HBM once, indices per step
    # (see TrainConfig.device_dataset).  Composes with a single-host mesh:
    # the corpus is sharded N/n_dev rows per device along the data axis
    # and each step's gather costs one batch-sized all-reduce (the GSPMD
    # lowering — see build_step's device_data branch).  Multi-host stays
    # gated: assembling a globally-sharded resident corpus from per-host
    # row ranges needs process-ordered addressable-shard plumbing that the
    # streaming path already covers.
    dev_dtype = jnp.dtype(train_cfg.device_dataset_dtype)
    if dev_dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        raise ValueError(
            f"device_dataset_dtype must be float32 or bfloat16, got "
            f"{train_cfg.device_dataset_dtype}"
        )
    # bf16 residency halves HBM bytes; budget-check the RESIDENT size —
    # per DEVICE: a mesh shards the corpus, so each chip holds 1/n_dev.
    _dev_bytes = dataset.nbytes() // (
        2 if dev_dtype == jnp.dtype(jnp.bfloat16) else 1
    ) // max(n_dev, 1)
    use_dev_data = train_cfg.device_dataset == "on" or (
        train_cfg.device_dataset == "auto"
        and mesh is None
        and jax.process_count() == 1
        and _dev_bytes <= train_cfg.device_dataset_budget_bytes
    )
    if use_dev_data and jax.process_count() > 1:
        raise ValueError("device_dataset='on' requires a single-host run")

    # Cast on HOST, then ship exactly the resident bytes: jnp.asarray(f32,
    # bfloat16) would upload the float32 bytes and cast on device — a 2x
    # HBM spike that OOMs once the f32 corpus alone exceeds HBM (the r4
    # 10x corpus is 17.4 GB f32 vs 16 GB on a v5e).
    data_dev = None
    resident_n = 0  # LOGICAL sample count of the resident corpus (the
    # shipped array may carry up to n_dev-1 pad rows for even sharding;
    # the epoch index stream never draws them)

    def ship_corpus():
        """(Re-)ship the corpus to HBM; frees any prior resident buffer
        FIRST (HBM can't hold two copies — it is rebuilt from host data,
        so nothing is lost on a failed upload)."""
        nonlocal data_dev, resident_n
        pad = ((-len(dataset)) % n_dev) if mesh is not None else 0
        staged = dataset.as_array(dev_dtype, pad_rows=pad)
        if data_dev is not None:
            data_dev.delete()
        data_dev = (
            jax.device_put(staged, data_sharding(mesh, train_cfg.data_axis))
            if mesh is not None
            else jax.device_put(staged)
        )
        resident_n = len(dataset)

    if use_dev_data:
        ship_corpus()

    def to_global(local_np, sharding):
        """Assemble the global batch from this host's shard.  Single-host:
        a plain device_put; multi-host: each process contributes its local
        rows of the globally-sharded array."""
        if jax.process_count() == 1:
            return jax.device_put(jnp.asarray(local_np), sharding)
        return jax.make_array_from_process_local_data(sharding, local_np)

    state = init_train_state(
        jax.random.PRNGKey(train_cfg.seed), model_cfg, train_cfg
    )
    grower = Grower(
        fadein_lengths=train_cfg.fadein_lengths,
        train_lengths=train_cfg.train_lengths,
        max_stage=train_cfg.max_stage,
    )
    saver = Saver(output_dir, train_cfg, model_cfg)
    # Observability is per-run, not per-process: only the lead process
    # writes the CSV / previews and prints (checkpointing stays collective).
    lead = jax.process_index() == 0
    logger = (
        MetricLogger(
            output_dir,
            train_cfg.metric_window,
            tb_dir=train_cfg.tb_dir,
            mlflow_uri=train_cfg.mlflow_uri,
            run_name=run_name,
            params=dataclasses.asdict(train_cfg),
        )
        if lead
        else None
    )

    # Failure detection (SURVEY §5): a wedged device dispatch never
    # returns (PJRT gives Python no cancellation), so progress is
    # witnessed through real device->host fetches — metric
    # materialization and checkpoint writes — and their absence past the
    # timeout exits 75 for a supervised restart (utils/watchdog.py).
    # EVERY host runs the detector: followers materialize the cadence
    # metrics too (log_metrics below), so a lead death that leaves them
    # blocked in a collective is detected and exits 75 on every process —
    # a lead-only watchdog strands followers in a hang (or an unretryable
    # rc-1 crash) and the supervised relaunch deadlocks waiting for them
    # (ADVICE r3).  Collective failures that DO error are mapped to the
    # same retryable exit at the bottom of this function.
    from ..utils.watchdog import StallWatchdog, is_distributed_failure

    watchdog = StallWatchdog(train_cfg.stall_timeout_s)
    preempted = PREEMPTED
    _prev_sig = _install_preemption_handlers()

    start_epoch = 0
    # Bit-exact resume: the checkpoint records how many batches of the
    # interrupted epoch were consumed, so the resumed run replays the
    # remainder of that epoch's (seed+epoch)-deterministic order instead
    # of restarting it.  With a static corpus the resumed run is then
    # numerically identical to an uninterrupted one (tested); a corpus
    # still growing via streaming ingest naturally re-shuffles.
    resume_skip_batches = 0
    if resume:
        latest = saver.ckpt.latest()
        if latest is not None:
            state, meta = saver.ckpt.restore(latest, state)
            if train_cfg.ema_decay == 0 and state.gen_ema is not None:
                # Resumed WITHOUT --ema-decay from an EMA-carrying run: a
                # kept-but-never-updated EMA would silently freeze every
                # later preview/generate/export at the resume point
                # (eval prefers gen_ema when present) — drop it instead.
                if lead:
                    print(
                        "[resume] checkpoint carries generator EMA but "
                        "ema_decay=0; discarding it (pass --ema-decay to "
                        "keep updating it)"
                    )
                state = state._replace(gen_ema=None)
            grower.load_state_dict(meta["grower"])
            saver.counter = int(meta["saver_counter"])
            saver.curr_save = latest + 1
            start_epoch = int(meta.get("epoch", 0))
            resume_skip_batches = int(meta.get("epoch_batch_pos", 0))
            if lead:
                print(
                    f"[resume] save_{latest}: iter={int(state.iter_idx)} "
                    f"stage={grower.curr_grow} epoch={start_epoch}"
                    + (
                        f" (+{resume_skip_batches} batches into the epoch)"
                        if resume_skip_batches
                        else ""
                    )
                )

    max_stage = (
        train_cfg.max_stage
        if train_cfg.max_stage is not None
        else model_cfg.n_stages - 1
    )

    steps: dict = {}

    def get_step(stage: int, with_gen: bool):
        key = (stage, with_gen)
        if key not in steps:
            steps[key] = build_step(
                stage, with_gen, model_cfg, train_cfg,
                mesh=mesh, data_axis=train_cfg.data_axis,
                pre_scaled=train_cfg.host_pipeline and not use_dev_data,
                device_data=use_dev_data,
            )
        return steps[key]

    chunk_steps: dict = {}

    def get_chunk_step(stage: int):
        if stage not in chunk_steps:
            chunk_steps[stage] = build_chunk_step(
                stage, train_cfg.chunk_steps, model_cfg, train_cfg,
                mesh=mesh, data_axis=train_cfg.data_axis,
                pre_scaled=train_cfg.host_pipeline and not use_dev_data,
                device_data=use_dev_data,
            )
        return chunk_steps[stage]

    def steps_until_boundary() -> int:
        """How many iterations can run before a stage switch, a checkpoint
        firing, or max_iters — a chunk must not straddle any of them
        (except as its final iteration)."""
        out = []
        to_grow = grower.samples_to_next_stage()
        if to_grow is not None:
            out.append(to_grow // train_cfg.batch_size + 1)
        out.append(
            train_cfg.save_every - (saver.counter % train_cfg.save_every)
        )
        if max_iters is not None:
            out.append(max_iters - iter_idx)
        return max(1, min(out))

    host_id = jax.process_index()
    num_hosts = jax.process_count()
    iter_idx = int(state.iter_idx)
    epoch_batch_pos = resume_skip_batches  # batches consumed of the current epoch
    t_start = time.perf_counter()
    done = False

    if lead:
        print(
            f"[train:{run_name}] {len(dataset)} samples, batch "
            f"{train_cfg.batch_size}, {n_dev} device(s), "
            f"{num_hosts} host(s), start stage {grower.curr_grow}"
        )

    def log_metrics(epoch, m_iter, m_stage, m, m_gen, alpha, row_idx=None):
        # Every host materializes the cadence metrics — the device_get is
        # a real device->host fetch, the watchdog's progress evidence.  A
        # follower that fetched nothing could witness progress only on
        # the (much sparser) checkpoint cadence, making its stall clock
        # useless; the cost is a handful of scalars per log_every iters.
        # One batched transfer (not a float() per metric): on a
        # tunnel-attached chip each scalar fetch is a full network RTT.
        host_m = jax.device_get(
            {k: (v if row_idx is None else v[row_idx]) for k, v in m.items()}
        )
        host_m = {k: float(v) for k, v in host_m.items()}
        watchdog.beat()  # the device_get above materialized device results
        if logger is None:
            return
        if not m_gen:
            host_m.pop("gen_loss", None)
            host_m.pop("e_gen", None)
        logger.push(host_m)
        row = logger.log_row(m_iter, m_stage, extra={"alpha": alpha})
        elapsed = time.perf_counter() - t_start
        print(
            f"e{epoch:03d} it{m_iter:07d} s{m_stage} "
            + " ".join(
                f"{k}={v:.4f}" for k, v in row.items()
                if k not in ("step", "stage", "wall_s")
            )
            + f" [{elapsed:.1f}s]",
            flush=True,
        )

    def meta_dict(epoch):
        return {
            "grower": grower.state_dict(),
            "epoch": epoch,
            "epoch_batch_pos": epoch_batch_pos,
            "iter_idx": iter_idx + 1,
            "run_name": run_name,
            "train_cfg": dataclasses.asdict(train_cfg),
        }

    def preempt_agreed() -> bool:
        """Collective preemption decision.  Signals land on different
        hosts at different times, while both the flush (orbax save) and
        the early loop exit are collective — every host must observe the
        same decision at the same iteration boundary, or the pod
        deadlocks on mismatched collectives.  Multi-host: a bool
        all-gather (every host calls this at the same deterministic
        boundaries, so the collective always matches up); any host's
        signal preempts the whole run."""
        if num_hosts == 1:
            return preempted.is_set()
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(preempted.is_set())
        )
        if bool(np.any(flags)):
            preempted.set()  # consistent exit-75 on every host
            return True
        return False

    def post_iteration(epoch, stage, alpha, at_boundary=True):
        """Bookkeeping after each iteration: save cadence, counters, growth
        (reference train.py:248-272 order).

        ``at_boundary`` is False for all but the last iteration of a
        chunked dispatch: ``state`` already reflects the whole chunk, so a
        preemption flush mid-chunk would checkpoint meta (iter_idx,
        grower) that lags the device state — the flush waits for the
        chunk's final bookkeeping call."""
        nonlocal iter_idx, done, epoch_batch_pos
        epoch_batch_pos += 1  # this iteration's batch is now consumed
        stopping = at_boundary and preempt_agreed()
        if saver.request_save(state, stage, alpha, meta=meta_dict(epoch)):
            watchdog.beat()  # checkpoint write materialized device state
        elif stopping:
            # Preemption warning (SIGTERM/SIGUSR1): flush a checkpoint at
            # this iteration boundary even off the save cadence, so the
            # relaunch loses zero iterations.
            saver.save_now(state, stage, alpha, meta=meta_dict(epoch))
        iter_idx += 1
        if stopping:
            done = True
            return
        if max_iters is not None and iter_idx >= max_iters:
            done = True
            return
        # ProGAN growth: counters advance by the *global* batch.
        if grower.grow(train_cfg.batch_size) and grower.curr_grow <= max_stage:
            if lead:
                print(
                    f"[grow] stage -> {grower.curr_grow} "
                    f"(size {grower.image_size}x{grower.image_size}), "
                    f"curr_save = {saver.curr_save - 1}",
                    flush=True,
                )

    # --- deferred metric flush (1-chunk-deep pipeline) -------------------
    # jit dispatch is asynchronous: the chunk call returns futures and the
    # device starts crunching; the ONLY forced sync in steady state is the
    # cadence metric fetch.  Fetching chunk k's scalars BEFORE dispatching
    # chunk k+1 leaves the device idle for the whole fetch-RTT + host
    # bookkeeping + dispatch-RTT window — on a tunnel-attached chip that
    # is real idle time every 100-step dispatch.  Instead, cadence rows
    # are queued here and materialized right AFTER the next chunk is
    # dispatched, so the fetch overlaps device compute and the device
    # never waits on the tunnel.  Costs: log lines / watchdog beats lag by
    # at most one chunk (<= a minute at stage 7, vs a 900 s stall budget).
    pending_logs: list = []

    def flush_logs():
        while pending_logs:
            log_metrics(*pending_logs.pop(0))

    def run_single(epoch, x_raw):
        nonlocal state
        flush_logs()
        stage = min(grower.curr_grow, max_stage)
        alpha = grower.alpha
        with_gen = iter_idx % train_cfg.n_critic == 0

        if use_dev_data:  # x_raw is an index batch
            state, metrics = get_step(stage, with_gen)(
                state, data_dev, jnp.asarray(x_raw), jnp.float32(alpha)
            )
        else:
            if train_cfg.host_pipeline:
                from ..audio.host_pipeline import prepare_batch

                x_raw = prepare_batch(x_raw, 4 * 2**stage)
            if x_sharding is not None:
                x = to_global(x_raw, x_sharding)
            else:
                x = jnp.asarray(x_raw)

            state, metrics = get_step(stage, with_gen)(
                state, x, jnp.float32(alpha)
            )
        # Materialize metrics on the cadence only (no per-step device sync).
        if iter_idx % train_cfg.log_every == 0:
            log_metrics(epoch, iter_idx, stage, metrics, with_gen, alpha)
        post_iteration(epoch, stage, alpha)

    def run_chunk(epoch, items):
        """K iterations in one dispatch; preconditions guaranteed by
        steps_until_boundary: no stage switch and no checkpoint firing
        except at the chunk's final iteration."""
        nonlocal state
        k = len(items)
        stage = min(grower.curr_grow, max_stage)
        alphas = np.array(
            grower.alphas_for_next(k, train_cfg.batch_size), np.float32
        )
        gen_mask = np.array(
            [(iter_idx + i) % train_cfg.n_critic == 0 for i in range(k)]
        )
        if use_dev_data:  # items are index batches
            state, mstack = get_chunk_step(stage)(
                state, data_dev, jnp.asarray(np.stack(items)),
                jnp.asarray(alphas), jnp.asarray(gen_mask),
            )
        else:
            if train_cfg.host_pipeline:
                from ..audio.host_pipeline import prepare_batch

                items = [prepare_batch(b, 4 * 2**stage) for b in items]
            if x_sharding is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                x_stack = to_global(
                    np.stack(items),
                    NamedSharding(mesh, P(None, train_cfg.data_axis)),
                )
            else:
                x_stack = jnp.asarray(np.stack(items))

            state, mstack = get_chunk_step(stage)(
                state, x_stack, jnp.asarray(alphas), jnp.asarray(gen_mask)
            )
        # The new chunk is in flight — NOW materialize the previous
        # chunk's cadence rows (its results are long since complete; the
        # fetch RTT rides under this chunk's device time).
        flush_logs()
        base_iter = iter_idx
        for i in range(k):
            if (base_iter + i) % train_cfg.log_every == 0:
                pending_logs.append((
                    epoch, base_iter + i, stage, mstack,
                    bool(gen_mask[i]), float(alphas[i]), i,
                ))
            post_iteration(
                epoch, stage, float(alphas[i]), at_boundary=(i == k - 1)
            )
            if done:
                break

    chunk_n = max(1, train_cfg.chunk_steps)
    buf: list = []

    def run_epochs():
        nonlocal buf, data_dev
        for epoch in range(start_epoch, train_cfg.nb_epoch):
            if done:
                break
            run_one_epoch(epoch)

    def run_one_epoch(epoch):
        nonlocal buf, data_dev, epoch_batch_pos, resume_skip_batches
        # Bit-exact resume: fast-forward the resumed epoch's deterministic
        # (seed+epoch) order past the batches the interrupted run consumed.
        skip = resume_skip_batches if epoch == start_epoch else 0
        resume_skip_batches = 0
        epoch_batch_pos = skip
        # Streaming ingest: pick up shards a concurrent create_dataset has
        # appended since the last epoch.  Multi-host batch composition
        # derives from len(dataset), so hosts must not observe different
        # snapshots of a still-growing index: every process offers what its
        # index holds (peek_total), the run allgathers the min, and every
        # host refreshes to exactly that agreed count (rows past it stay
        # invisible until a later epoch's agreement catches up).  Every
        # host reaches this point once per epoch, so the collective always
        # matches up — same pattern as preempt_agreed.
        if num_hosts == 1:
            grew = dataset.refresh()
        else:
            from jax.experimental import multihost_utils

            agreed = int(
                multihost_utils.process_allgather(
                    np.asarray(dataset.peek_total())
                ).min()
            )
            grew = dataset.refresh(limit=agreed)
            # Convergence guard: refresh(limit=) leaves len(dataset) ==
            # agreed except when this host's index file was transiently
            # unreadable mid-rewrite (it keeps its old, smaller view).
            # Re-agree on the realized min and shrink everyone to it —
            # shrinking is in-memory and always succeeds, so after this
            # every host provably composes identical batches.
            realized = int(
                multihost_utils.process_allgather(
                    np.asarray(len(dataset))
                ).min()
            )
            if realized != len(dataset):
                dataset.refresh(limit=realized)
                grew = False
        if grew:
            if lead:
                print(f"[dataset] grew to {len(dataset)} samples", flush=True)
            if use_dev_data:
                # The budget was checked at startup; a still-growing corpus
                # can outgrow it mid-run.  Stop re-shipping rather than OOM
                # the device — training continues on the resident snapshot.
                if (
                    dataset.nbytes()
                    // (2 if dev_dtype == jnp.dtype(jnp.bfloat16) else 1)
                    // max(n_dev, 1)
                    <= train_cfg.device_dataset_budget_bytes
                ):
                    # Re-ship once.  A grown resident corpus is a multi-GB
                    # H2D upload (slow through a tunnel) with no metric
                    # fetch in sight; beat on both sides so the upload gets
                    # a full stall window of its own (instead of whatever
                    # was left since the last metric fetch) and the
                    # steady-state clock doesn't inherit its duration.  A
                    # wedged upload is still detected one timeout later.
                    watchdog.beat()
                    ship_corpus()
                    data_dev.block_until_ready()
                    watchdog.beat()
                elif lead:
                    print(
                        "[dataset] grown corpus exceeds "
                        "device_dataset_budget_bytes; keeping the resident "
                        f"{resident_n}-sample snapshot",
                        flush=True,
                    )
        epoch_batches = (
            batch_indices(
                # Index into the RESIDENT corpus' LOGICAL rows: it may lag
                # len(dataset) when a grown corpus stopped fitting the
                # budget above, and never includes mesh pad rows.
                resident_n,
                train_cfg.batch_size,
                seed=train_cfg.seed + epoch,
                skip=skip,  # index-level: no data touched for skipped batches
            )
            if use_dev_data
            else batch_iterator(
                dataset,
                train_cfg.batch_size // num_hosts,
                seed=train_cfg.seed + epoch,
                host_id=host_id,
                num_hosts=num_hosts,
                skip=skip,
            )
        )
        for x_raw in epoch_batches:
            if chunk_n == 1:
                run_single(epoch, x_raw)
            else:
                buf.append(x_raw)
                if len(buf) < chunk_n:
                    continue
                if steps_until_boundary() >= chunk_n:
                    run_chunk(epoch, buf)
                    buf = []
                else:  # near a boundary: drain one-by-one
                    run_single(epoch, buf.pop(0))
            if done:
                break
        # epoch remainder drains as single steps
        while buf and not done:
            run_single(epoch, buf.pop(0))

    try:
        run_epochs()
        flush_logs()  # cadence rows deferred past the final dispatch
    except Exception as e:
        # A dying runtime under us is exactly as retryable as a stall.
        # Multi-host: a dead lead/coordinator surfaces on the survivors
        # as a gRPC-flavored runtime error from the next collective; an
        # unmapped rc-1 makes the follower's supervisor give up and the
        # relaunched lead then blocks forever in initialize_distributed
        # (ADVICE r3).  Single-host: a device/tunnel death surfaces the
        # same way ("UNAVAILABLE: TPU worker process crashed or
        # restarted" — seen live mid-run at iter ~212k; the rc-1 made
        # run_supervised give up 4.5 h early instead of resuming from
        # the cadence checkpoint).  The supervisor's --max-restarts
        # budget bounds retry loops on genuinely fatal errors.
        #
        # Single-host additionally requires the exception to BE a
        # device-runtime error (JaxRuntimeError/XlaRuntimeError), not
        # just message-match the substring markers — a BrokenPipeError
        # from a closed preview stream, or any library error mentioning
        # "unavailable", must keep propagating as a real crash rather
        # than burn the restart budget.  Multi-host keeps the broader
        # match: collective/coordination deaths can surface through
        # non-XLA gRPC channels.
        from ..utils.watchdog import is_runtime_error

        retryable = is_distributed_failure(e) and (
            num_hosts > 1 or is_runtime_error(e)
        )
        if retryable:
            from ..utils.watchdog import EXIT_STALLED

            print(
                f"[train] retryable runtime failure "
                f"({type(e).__name__}: {e}); exiting {EXIT_STALLED} "
                "for supervised restart from the latest checkpoint",
                flush=True,
            )
            if num_hosts > 1:
                # NOT SystemExit on a pod: unwinding through interpreter
                # teardown gives the distributed client's error-polling
                # thread (and the atexit shutdown barrier, already doomed
                # with a dead peer) a window to abort the process with a
                # generic rc — observed live: the 75 intent printed, then
                # "Terminating process because the JAX distributed
                # service detected fatal errors" exited 1 and the
                # supervisor gave up.  Tear down what the finally would,
                # then exit with the contract code immediately, exactly
                # like the stall watchdog does.  Single-host runs have no
                # distributed client (no abort race) and keep SystemExit
                # so in-process callers can observe the code.
                import os as _os
                import sys as _sys

                try:
                    # best-effort teardown: an exception here (e.g. a
                    # logger flush to the same dead runtime) must NOT
                    # skip the os._exit and reopen the rc-1 abort race
                    watchdog.close()
                    _restore_preemption_handlers(_prev_sig)
                    if logger is not None:
                        logger.close()
                    _sys.stdout.flush()
                    _sys.stderr.flush()
                finally:
                    _os._exit(EXIT_STALLED)
            raise SystemExit(EXIT_STALLED) from e
        raise
    finally:
        watchdog.close()
        _restore_preemption_handlers(_prev_sig)
        if logger is not None:
            logger.close()
    if preempted.is_set() and lead:
        print(
            f"[preempt] stopped at iter {iter_idx} with a flushed "
            "checkpoint; exit retryable and resume with --resume",
            flush=True,
        )
    return state
