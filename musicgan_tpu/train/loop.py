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
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.dataset import SpectrogramDataset, batch_iterator
from ..config import ModelConfig, TrainConfig
from ..parallel.mesh import data_sharding, make_mesh
from ..utils.metrics import MetricLogger
from .grower import Grower
from .saver import Saver
from .step import TrainState, build_step, init_train_state

__all__ = ["train"]


def train(
    run_name: str,
    input_dataset_path: str,
    output_dir: str,
    train_cfg: TrainConfig = TrainConfig(),
    model_cfg: ModelConfig = ModelConfig(),
    resume: bool = False,
    max_iters: Optional[int] = None,
    mesh=None,
) -> TrainState:
    """Run (or resume) progressive WGAN-GP training; returns final state."""
    dataset = SpectrogramDataset(input_dataset_path)
    assert len(dataset) >= train_cfg.batch_size, (
        f"dataset has {len(dataset)} samples < batch {train_cfg.batch_size}"
    )

    if mesh is None:
        mesh = make_mesh(axis=train_cfg.data_axis)
    n_dev = mesh.size if mesh is not None else 1
    assert train_cfg.batch_size % max(n_dev, 1) == 0, (
        f"batch {train_cfg.batch_size} not divisible by {n_dev} devices"
    )
    x_sharding = data_sharding(mesh, train_cfg.data_axis) if mesh else None

    state = init_train_state(
        jax.random.PRNGKey(train_cfg.seed), model_cfg, train_cfg
    )
    grower = Grower(
        fadein_lengths=train_cfg.fadein_lengths,
        train_lengths=train_cfg.train_lengths,
    )
    saver = Saver(output_dir, train_cfg, model_cfg)
    logger = MetricLogger(output_dir, train_cfg.metric_window)

    start_epoch = 0
    if resume:
        latest = saver.ckpt.latest()
        if latest is not None:
            state, meta = saver.ckpt.restore(latest, state)
            grower.load_state_dict(meta["grower"])
            saver.counter = int(meta["saver_counter"])
            saver.curr_save = latest + 1
            start_epoch = int(meta.get("epoch", 0))
            print(
                f"[resume] save_{latest}: iter={int(state.iter_idx)} "
                f"stage={grower.curr_grow} epoch={start_epoch}"
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
                pre_scaled=train_cfg.host_pipeline,
            )
        return steps[key]

    host_id = jax.process_index()
    num_hosts = jax.process_count()
    iter_idx = int(state.iter_idx)
    t_start = time.perf_counter()
    pending_metrics = None
    done = False

    print(
        f"[train:{run_name}] {len(dataset)} samples, batch "
        f"{train_cfg.batch_size}, {n_dev} device(s), start stage "
        f"{grower.curr_grow}"
    )

    for epoch in range(start_epoch, train_cfg.nb_epoch):
        if done:
            break
        for x_raw in batch_iterator(
            dataset,
            train_cfg.batch_size // num_hosts,
            seed=train_cfg.seed + epoch,
            host_id=host_id,
            num_hosts=num_hosts,
        ):
            stage = min(grower.curr_grow, max_stage)
            alpha = grower.alpha
            with_gen = iter_idx % train_cfg.n_critic == 0

            if train_cfg.host_pipeline:
                from ..audio.host_pipeline import prepare_batch

                x_raw = prepare_batch(x_raw, 4 * 2**stage)
            x = jnp.asarray(x_raw)
            if x_sharding is not None:
                x = jax.device_put(x, x_sharding)

            state, metrics = get_step(stage, with_gen)(
                state, x, jnp.float32(alpha)
            )
            pending_metrics = (iter_idx, stage, metrics, with_gen)

            # Materialize metrics on the window cadence only (no per-step
            # device sync; metrics lag one step behind at most).
            if iter_idx % train_cfg.log_every == 0 and pending_metrics:
                m_iter, m_stage, m, m_gen = pending_metrics
                host_m = {k: float(v) for k, v in m.items()}
                if not m_gen:
                    host_m.pop("gen_loss", None)
                    host_m.pop("e_gen", None)
                logger.push(host_m)
                row = logger.log_row(
                    m_iter, m_stage, extra={"alpha": alpha}
                )
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

            saver.request_save(
                state,
                stage,
                alpha,
                meta={
                    "grower": grower.state_dict(),
                    "epoch": epoch,
                    "iter_idx": iter_idx + 1,
                    "run_name": run_name,
                    "train_cfg": dataclasses.asdict(train_cfg),
                },
            )

            iter_idx += 1
            if max_iters is not None and iter_idx >= max_iters:
                done = True
                break

            # ProGAN growth (reference train.py:258-272): counters advance
            # by the *global* batch each iteration.
            if grower.grow(train_cfg.batch_size) and grower.curr_grow <= max_stage:
                print(
                    f"[grow] stage -> {grower.curr_grow} "
                    f"(size {grower.image_size}x{grower.image_size}), "
                    f"curr_save = {saver.curr_save - 1}",
                    flush=True,
                )

    logger.close()
    return state
