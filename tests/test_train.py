"""Train-step, growth-schedule, and end-to-end loop tests (8-device CPU mesh)."""

import csv
import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from musicgan_tpu.config import ModelConfig, TrainConfig
from musicgan_tpu.parallel import make_mesh
from musicgan_tpu.train import Grower, build_step, init_train_state
from musicgan_tpu.train.checkpoint import CheckpointManager

MODEL_CFG = ModelConfig()
# Tiny channel tables (shared with the multi-host test): loop/step
# MECHANICS don't need the full-size model — see tests/tiny_cfg.py.
from tiny_cfg import TINY_MODEL as TINY_CFG  # noqa: E402
FAST_CFG = TrainConfig(batch_size=8, save_every=5, log_every=2, nb_preview=1)


def _leaf_equal(a, b):
    return all(
        np.array_equal(x, y)
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


# ---------------------------------------------------------------- grower ---

def test_grower_schedule_matches_reference():
    g = Grower()
    batch = 6
    stages_seen = {0}
    # run past full growth (1.4M samples cumulative)
    switches = []
    while g.sample_idx < 1_500_000:
        if g.grow(batch):
            switches.append((g.sample_idx, g.curr_grow))
        stages_seen.add(g.curr_grow)
    assert [s for _, s in switches] == [1, 2, 3, 4, 5, 6, 7]
    # switch points: first sample count strictly above the cumulative bound
    bounds = [50_000, 150_000, 300_000, 500_000, 750_000, 1_050_000, 1_400_000]
    for (samples, _), bound in zip(switches, bounds):
        assert bound < samples <= bound + batch
    # no growth past stage 7
    assert g.curr_grow == 7 and not g.grow(batch)


def test_grower_alpha_semantics():
    g = Grower()
    assert g.alpha == 1.0  # stage-0 fade-in length is 1 => alpha==1
    g.grow(50_001)  # force switch to stage 1
    assert g.curr_grow == 1 and g.step_sample_idx == 0
    assert g.alpha == pytest.approx(1.0 / 25_000)
    g.grow(12_499)
    assert g.alpha == pytest.approx(12_500 / 25_000)
    g.grow(50_000)  # still inside stage 1 (bound 150k): alpha clamps at 1
    assert g.curr_grow == 1 and g.alpha == 1.0
    g.grow(40_000)  # crosses 150k: stage 2, fade restarts
    assert g.curr_grow == 2 and g.alpha == pytest.approx(1.0 / 37_500)


def test_grower_alphas_for_next_matches_sequential():
    """alphas_for_next(k, b)[i] == alpha after i grow(b) calls, at every
    point of a mid-fade trajectory (chunk boundaries never straddle a
    stage switch, which the loop guarantees via samples_to_next_stage)."""
    batch, k = 6, 8
    g = Grower()
    g.grow(50_001)  # enter stage 1 mid-fade
    while g.samples_to_next_stage() is not None:
        left = g.samples_to_next_stage()
        kk = min(k, left // batch)  # stay inside the stage, like the loop
        if kk < 1:
            g.grow(batch)
            continue
        predicted = g.alphas_for_next(kk, batch)
        for i in range(kk):
            assert predicted[i] == pytest.approx(g.alpha)
            g.grow(batch)


def test_grower_image_size():
    g = Grower()
    assert g.image_size == 4
    g.curr_grow = 7
    assert g.image_size == 512


# ------------------------------------------------------------ train step ---

@pytest.fixture()
def state0():
    # function-scoped: build_step donates the input state, so each test
    # needs a fresh (deterministic) state
    return init_train_state(jax.random.PRNGKey(0), TINY_CFG, FAST_CFG)


def _snapshot(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def _raw_batch(batch=8):
    return jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (batch, 2, 512, 512)),
        jnp.float32,
    )


def test_d_step_updates_disc_only(state0):
    step = build_step(0, with_gen=False, model_cfg=TINY_CFG, train_cfg=FAST_CFG)
    before = _snapshot(state0)
    state1, metrics = step(state0, _raw_batch(), jnp.float32(1.0))
    assert not _leaf_equal(before.disc_params, state1.disc_params)
    assert _leaf_equal(before.gen_params, state1.gen_params)
    m = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(list(m.values())).all()
    assert m["grad_pen"] >= 0.0
    assert int(state1.iter_idx) == 1


def test_dg_step_updates_both(state0):
    step = build_step(0, with_gen=True, model_cfg=TINY_CFG, train_cfg=FAST_CFG)
    before = _snapshot(state0)
    state1, metrics = step(state0, _raw_batch(), jnp.float32(1.0))
    assert not _leaf_equal(before.disc_params, state1.disc_params)
    assert not _leaf_equal(before.gen_params, state1.gen_params)
    assert np.isfinite(float(metrics["gen_loss"]))


def test_device_dataset_mode_matches_streaming(tmp_path):
    """Device-resident dataset mode (corpus in HBM, indices per dispatch)
    trains identically to the streaming path: same permutation, same
    in-graph pipeline, same updates."""
    from musicgan_tpu.train import train

    ds = _synth_dataset(tmp_path)
    base = dataclasses.replace(
        FAST_CFG, nb_epoch=50, save_every=100, nb_preview=1,
        chunk_steps=3, host_pipeline=False,
    )
    out_a = str(tmp_path / "stream")
    out_b = str(tmp_path / "devdata")
    s_a = train(
        "a", ds, out_a,
        dataclasses.replace(base, device_dataset="off"),
        TINY_CFG, max_iters=8, mesh=None,
    )
    s_b = train(
        "b", ds, out_b,
        dataclasses.replace(base, device_dataset="on"),
        TINY_CFG, max_iters=8, mesh=None,
    )
    for x, y in zip(
        jax.tree_util.tree_leaves(s_a), jax.tree_util.tree_leaves(s_b)
    ):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32),
            rtol=2e-5, atol=2e-5,
        )


def test_drift_eps_anchors_critic_scale(state0):
    """With the ProGAN eps-drift penalty on, repeated critic steps on fixed
    data keep E[D(real)] anchored near zero; the penalty must also change
    the loss relative to the reference-faithful drift_eps=0 graph."""
    cfg = dataclasses.replace(FAST_CFG, drift_eps=1e-2)
    step = build_step(0, with_gen=False, model_cfg=TINY_CFG, train_cfg=cfg)
    step0 = build_step(0, with_gen=False, model_cfg=TINY_CFG,
                       train_cfg=FAST_CFG)
    x = _raw_batch()
    # the step donates its state buffers: give each graph its own copy
    s_a, m_a = step(
        jax.tree_util.tree_map(jnp.copy, state0), x, jnp.float32(1.0)
    )
    s_b, m_b = step0(
        jax.tree_util.tree_map(jnp.copy, state0), x, jnp.float32(1.0)
    )
    # same wasserstein metrics at the first step (penalty only adds to the
    # LOSS; metrics report the raw terms)...
    np.testing.assert_allclose(
        float(m_a["e_tp"]), float(m_b["e_tp"]), rtol=1e-5
    )
    # ...but different parameter updates
    assert not _leaf_equal(s_a.disc_params, s_b.disc_params)
    for _ in range(30):
        s_a, m_a = step(s_a, x, jnp.float32(1.0))
    assert np.isfinite(float(m_a["e_tp"]))
    assert abs(float(m_a["e_tp"])) < 50.0  # anchored, not wandering


def test_bf16_step_runs_and_is_finite(state0):
    """compute_dtype=bfloat16 must trace and run the FULL step — including
    the WGAN-GP input-gradient, whose conv-transpose rule rejects mixed
    f32/bf16 operands (the regression this test pins: bf16 was 'plumbed
    but unvalidated' until it crashed on first real use)."""
    cfg = dataclasses.replace(FAST_CFG, compute_dtype="bfloat16")
    step = build_step(1, with_gen=True, model_cfg=TINY_CFG, train_cfg=cfg)
    before = _snapshot(state0)
    state1, metrics = step(state0, _raw_batch(), jnp.float32(0.5))
    assert not _leaf_equal(before.disc_params, state1.disc_params)
    assert not _leaf_equal(before.gen_params, state1.gen_params)
    m = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(list(m.values())).all()
    assert m["grad_pen"] >= 0.0
    # params/opt state remain f32 regardless of compute dtype
    for leaf in jax.tree_util.tree_leaves(state1.gen_params):
        assert leaf.dtype == jnp.float32


def test_step_decreases_d_loss_over_iters():
    """A few critic steps on fixed data should reduce the critic loss.

    Runs at FULL size (the suite's one full-size train-graph smoke): the
    tiny critic's GP term dominates its weak Wasserstein signal and the
    property doesn't hold at toy scale."""
    state = init_train_state(jax.random.PRNGKey(0), MODEL_CFG, FAST_CFG)
    step = build_step(0, with_gen=False, model_cfg=MODEL_CFG, train_cfg=FAST_CFG)
    x = _raw_batch()
    losses = []
    for _ in range(8):
        state, m = step(state, x, jnp.float32(1.0))
        losses.append(float(m["disc_loss"]))
    assert losses[-1] < losses[0]


def test_step_sharded_matches_semantics(state0):
    """Mesh-sharded step runs and yields finite, scalar-replicated metrics."""
    mesh = make_mesh()
    assert mesh is not None and mesh.size == 8
    step = build_step(
        0, with_gen=True, model_cfg=TINY_CFG, train_cfg=FAST_CFG,
        mesh=mesh, data_axis="data",
    )
    from musicgan_tpu.parallel import data_sharding

    x = jax.device_put(_raw_batch(8), data_sharding(mesh))
    state1, metrics = step(state0, x, jnp.float32(0.5))
    assert np.isfinite(float(metrics["disc_loss"]))
    assert np.isfinite(float(metrics["gen_loss"]))


def test_gradient_penalty_unit_norm_property():
    """The penalty is 10 * (||grad|| - 1)^2: V-shaped in the critic's input
    gradient norm.  At init the norm is tiny (penalty ~ 10); scaling the
    final layer up moves the norm toward 1 (penalty drops), and scaling it
    enormously pushes the norm far past 1 (penalty explodes)."""
    step = build_step(0, with_gen=False, model_cfg=TINY_CFG, train_cfg=FAST_CFG)

    def gp_with_clf_scale(scale):
        s = init_train_state(jax.random.PRNGKey(0), TINY_CFG, FAST_CFG)
        dp = dict(s.disc_params)
        dp["clf"] = jax.tree_util.tree_map(lambda w: w * scale, dp["clf"])
        _, m = step(s._replace(disc_params=dp), _raw_batch(), jnp.float32(1.0))
        return float(m["grad_pen"])

    gp_base = gp_with_clf_scale(1.0)
    assert gp_base == pytest.approx(10.0, rel=0.05)  # norm ~ 0 at init
    assert gp_with_clf_scale(100.0) < gp_base        # norm moved toward 1
    assert gp_with_clf_scale(1e6) > 100.0            # norm far above 1


# ------------------------------------------------------------- full loop ---

def _synth_dataset(tmp_path, n=16):
    from musicgan_tpu.audio.ingest import ShardWriter

    w = ShardWriter(str(tmp_path / "ds"), samples_per_shard=6)
    rng = np.random.default_rng(0)
    w.add(rng.uniform(-1, 1, (n, 2, 512, 512)).astype(np.float32))
    w.close()
    return str(tmp_path / "ds")


def test_train_loop_end_to_end_with_resume(tmp_path):
    from musicgan_tpu.train import train

    ds = _synth_dataset(tmp_path)
    out = str(tmp_path / "out")
    cfg = dataclasses.replace(
        FAST_CFG, nb_epoch=50, save_every=4, log_every=3, nb_preview=1,
        chunk_steps=1,  # single-step dispatch; chunking is covered below
    )
    state = train("t", ds, out, cfg, TINY_CFG, max_iters=6, mesh=None)
    assert int(state.iter_idx) == 6
    # checkpoint fired at iter 4
    ckpt = CheckpointManager(os.path.join(out, "checkpoints"))
    assert ckpt.latest() == 0
    # preview PNGs written
    assert any(f.startswith("magn_0_") for f in os.listdir(out))
    assert os.path.isfile(os.path.join(out, "metrics.csv"))

    # resume: picks up from iter 4 and continues to 10
    state2 = train("t", ds, out, cfg, TINY_CFG, resume=True, max_iters=10,
                   mesh=None)
    assert int(state2.iter_idx) == 10


def test_train_with_tensorboard_sink(tmp_path):
    """--tb-dir writes cadence-batched scalars to a TensorBoard event log
    (the optional queryable-store sink, reference train.py:238-244);
    mlflow_uri without the package must fail with a clear error."""
    from musicgan_tpu.train import train
    from musicgan_tpu.utils.metrics import MetricLogger

    ds = _synth_dataset(tmp_path)
    out = str(tmp_path / "out_tb")
    tb = str(tmp_path / "tb")
    cfg = dataclasses.replace(
        FAST_CFG, nb_epoch=50, save_every=100, log_every=2, nb_preview=1,
        chunk_steps=1, tb_dir=tb,
    )
    train("t", ds, out, cfg, TINY_CFG, max_iters=5, mesh=None)

    from tensorboard.backend.event_processing import event_accumulator

    files = os.listdir(tb)
    assert any(f.startswith("events.out.tfevents") for f in files)
    acc = event_accumulator.EventAccumulator(tb)
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    assert {"train/disc_loss", "train/grad_pen", "train/stage"} <= tags
    steps = [e.step for e in acc.Scalars("train/disc_loss")]
    assert steps == [0, 2, 4]  # the log cadence, nothing per-step

    try:
        import mlflow  # noqa: F401

        pytest.skip("mlflow installed here; gating path not reachable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="mlflow"):
        MetricLogger(str(tmp_path / "m"), mlflow_uri="file:///tmp/mlruns")


def test_checkpoint_roundtrip(tmp_path, state0):
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    before = _snapshot(state0)
    ckpt.save(3, state0, {"grower": Grower().state_dict(), "epoch": 1})
    state, meta = ckpt.restore(3, state0)
    assert meta["epoch"] == 1
    assert _leaf_equal(state.gen_params, before.gen_params)
    assert _leaf_equal(state.opt_disc, before.opt_disc)
    assert ckpt.latest() == 3


def test_chunk_step_bit_identical_to_single_steps(state0):
    """K chunked iterations == K single iterations: identical RNG stream
    and update sequence (metrics match exactly; parameters to float-
    rounding tolerance, since scan vs unrolled graphs fuse differently)."""
    from musicgan_tpu.train.step import build_chunk_step

    k = 5
    rng = np.random.default_rng(7)
    xs = rng.uniform(-1, 1, (k, 8, 2, 16, 16)).astype(np.float32)
    alphas = np.linspace(0.2, 1.0, k).astype(np.float32)
    gen_mask = np.array([i % 5 == 0 for i in range(k)])

    cfg = dataclasses.replace(FAST_CFG, host_pipeline=True)

    state_a = init_train_state(jax.random.PRNGKey(3), TINY_CFG, cfg)
    for i in range(k):
        step = build_step(2, bool(gen_mask[i]), TINY_CFG, cfg,
                          pre_scaled=True)
        state_a, m = step(state_a, jnp.asarray(xs[i]), jnp.float32(alphas[i]))
    a_leaves = jax.tree_util.tree_map(np.asarray, state_a)

    state_b = init_train_state(jax.random.PRNGKey(3), TINY_CFG, cfg)
    chunk = build_chunk_step(2, k, TINY_CFG, cfg, pre_scaled=True)
    state_b, mstack = chunk(
        state_b, jnp.asarray(xs), jnp.asarray(alphas), jnp.asarray(gen_mask)
    )
    assert mstack["disc_loss"].shape == (k,)
    for x, y in zip(
        jax.tree_util.tree_leaves(a_leaves),
        jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, state_b)),
    ):
        np.testing.assert_allclose(x, y, rtol=1e-4, atol=1e-4)


def test_train_loop_chunked_matches_iteration_count(tmp_path):
    from musicgan_tpu.train import train

    ds = _synth_dataset(tmp_path)
    out = str(tmp_path / "out_chunk")
    cfg = dataclasses.replace(
        FAST_CFG, nb_epoch=50, save_every=7, log_every=4, nb_preview=1,
        chunk_steps=3,
    )
    state = train("t", ds, out, cfg, TINY_CFG, max_iters=13, mesh=None)
    assert int(state.iter_idx) == 13
    ckpt = CheckpointManager(os.path.join(out, "checkpoints"))
    assert ckpt.latest() == 0  # fired at iter 7 despite chunking
    # Every cadence row must land in metrics.csv despite the deferred
    # (pipelined) metric flush — step 12 is logged inside the run's final
    # dispatch, so it only appears if the end-of-run flush_logs() runs.
    with open(os.path.join(out, "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    assert [int(r["step"]) for r in rows] == [0, 4, 8, 12]


def test_grower_max_stage_cap():
    """Growth must STOP at the cap — phantom grows past it would reset the
    fade-in (alpha -> ~0) against a stale previous-stage head."""
    g = Grower(max_stage=2)
    for _ in range(200_000):
        g.grow(6)
        if g.sample_idx > 400_000:
            break
    assert g.curr_grow == 2
    assert g.alpha == 1.0  # fully faded, never reset
    assert g.samples_to_next_stage() is None


def test_per_leaf_adam_matches_torch_lazy_state():
    """A leaf inactive for N steps gets a FRESH first update when it
    activates (torch per-param lazy state), not a stale-bias-corrected one."""
    import optax

    from musicgan_tpu.train.optim import adam_per_leaf

    lr, b1, b2 = 1e-3, 0.0, 0.9
    opt = adam_per_leaf(lr, b1, b2)
    params = {"a": jnp.ones(3), "b": jnp.ones(3)}
    state = opt.init(params)

    # 10 steps where only 'a' is active
    g_a = {"a": jnp.full(3, 0.5), "b": jnp.zeros(3)}
    for _ in range(10):
        updates, state = opt.update(g_a, state)
        np.testing.assert_array_equal(np.asarray(updates["b"]), 0.0)

    # 'b' activates: its update must equal a fresh optimizer's first update
    g_both = {"a": jnp.full(3, 0.5), "b": jnp.full(3, 0.7)}
    updates, state = opt.update(g_both, state)

    fresh = adam_per_leaf(lr, b1, b2)
    fstate = fresh.init({"b": params["b"]})
    fupd, _ = fresh.update({"b": jnp.full(3, 0.7)}, fstate)
    np.testing.assert_allclose(
        np.asarray(updates["b"]), np.asarray(fupd["b"]), rtol=1e-6
    )
    # and also matches optax.adam's first step for that leaf
    oa = optax.adam(lr, b1=b1, b2=b2)
    ostate = oa.init({"b": params["b"]})
    oupd, _ = oa.update({"b": jnp.full(3, 0.7)}, ostate)
    np.testing.assert_allclose(
        np.asarray(updates["b"]), np.asarray(oupd["b"]), rtol=1e-5
    )


def test_per_leaf_adam_matches_optax_when_always_active(rng):
    import optax

    from musicgan_tpu.train.optim import adam_per_leaf

    lr, b1, b2 = 1e-3, 0.0, 0.9
    ours, ref = adam_per_leaf(lr, b1, b2), optax.adam(lr, b1=b1, b2=b2)
    p = {"w": jnp.asarray(rng.standard_normal(8), jnp.float32)}
    s1, s2 = ours.init(p), ref.init(p)
    for i in range(5):
        g = {"w": jnp.asarray(rng.standard_normal(8), jnp.float32)}
        u1, s1 = ours.update(g, s1)
        u2, s2 = ref.update(g, s2)
        np.testing.assert_allclose(
            np.asarray(u1["w"]), np.asarray(u2["w"]), rtol=2e-5, atol=1e-8
        )


# ------------------------------------------------------------------ EMA ---


def test_ema_updates_on_g_iterations_only():
    """TrainConfig.ema_decay > 0 carries an EMA generator copy: seeded from
    the init weights, blended by `d*ema + (1-d)*params` after each G
    update, untouched on critic-only iterations (ProGAN §A.1 semantics)."""
    ema_cfg = dataclasses.replace(FAST_CFG, ema_decay=0.5)
    state = init_train_state(jax.random.PRNGKey(0), TINY_CFG, ema_cfg)
    assert state.gen_ema is not None
    assert _leaf_equal(state.gen_ema, state.gen_params)

    # Critic-only iteration: EMA (and gen) unchanged.
    step_d = build_step(0, with_gen=False, model_cfg=TINY_CFG,
                        train_cfg=ema_cfg)
    before = _snapshot(state)
    state, _ = step_d(state, _raw_batch(), jnp.float32(1.0))
    assert _leaf_equal(before.gen_ema, state.gen_ema)

    # G iteration: ema' = 0.5 * ema + 0.5 * gen_params'.
    step_g = build_step(0, with_gen=True, model_cfg=TINY_CFG,
                        train_cfg=ema_cfg)
    prev_ema = _snapshot(state.gen_ema)
    state, _ = step_g(state, _raw_batch(), jnp.float32(1.0))
    expect = jax.tree_util.tree_map(
        lambda e, p: 0.5 * e + 0.5 * np.asarray(p),
        prev_ema, _snapshot(state.gen_params),
    )
    for a, b in zip(jax.tree_util.tree_leaves(expect),
                    jax.tree_util.tree_leaves(_snapshot(state.gen_ema))):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_ema_checkpoint_roundtrip_and_eval_selection(tmp_path):
    """EMA-on checkpoints restore into both EMA-on and EMA-off templates
    (generate/export load path prefers the EMA weights), and EMA-off
    checkpoints restore into an EMA-on template with a seeded EMA."""
    ema_cfg = dataclasses.replace(FAST_CFG, ema_decay=0.9)
    state = init_train_state(jax.random.PRNGKey(1), TINY_CFG, ema_cfg)
    step_g = build_step(0, with_gen=True, model_cfg=TINY_CFG,
                        train_cfg=ema_cfg)
    state, _ = step_g(state, _raw_batch(), jnp.float32(1.0))
    ema_snap = _snapshot(state.gen_ema)

    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(0, state, {"grower": {}, "iter_idx": 1})

    # EMA-on template: exact roundtrip.
    t_on = init_train_state(jax.random.PRNGKey(2), TINY_CFG, ema_cfg)
    back, _ = mgr.restore(0, t_on)
    assert _leaf_equal(ema_snap, back.gen_ema)

    # EMA-off template (the generate/export path): EMA recovered too.
    t_off = init_train_state(jax.random.PRNGKey(2), TINY_CFG, FAST_CFG)
    back_off, _ = mgr.restore(0, t_off)
    assert back_off.gen_ema is not None
    assert _leaf_equal(ema_snap, back_off.gen_ema)

    # Reverse: EMA-off checkpoint into an EMA-on template seeds ema=params.
    state_off = init_train_state(jax.random.PRNGKey(3), TINY_CFG, FAST_CFG)
    mgr2 = CheckpointManager(str(tmp_path / "ck2"))
    mgr2.save(0, state_off, {"grower": {}, "iter_idx": 0})
    back2, _ = mgr2.restore(0, t_on)
    assert _leaf_equal(back2.gen_ema, back2.gen_params)


def test_device_dataset_budget_guard_on_refresh(tmp_path, monkeypatch, capsys):
    """A streaming-ingest refresh that outgrows device_dataset_budget_bytes
    must NOT re-ship the corpus to HBM (round-2 advisor finding): training
    continues on the resident snapshot and batch indices stay bounded by
    the resident row count."""
    from musicgan_tpu.audio import ingest as ing
    from musicgan_tpu.train import loop as L

    out = str(tmp_path / "ds")
    w = ing.ShardWriter(out, samples_per_shard=2)
    rng = np.random.default_rng(0)
    w.add(rng.uniform(-1, 1, (2, 2, 8, 8)).astype(np.float32))  # 2 samples

    class GrowingDS(L.SpectrogramDataset):
        """refresh() that grows the corpus past the budget mid-run."""

        def refresh(self):
            if len(self) == 2:
                w.add(rng.uniform(-1, 1, (6, 2, 8, 8)).astype(np.float32))
            return super().refresh()

    monkeypatch.setattr(L, "SpectrogramDataset", GrowingDS)
    budget = 2 * 2 * 8 * 8 * 4 + 16  # fits exactly the initial 2 samples
    cfg = dataclasses.replace(
        FAST_CFG, batch_size=2, device_dataset="on",
        device_dataset_budget_bytes=budget, chunk_steps=1, max_stage=0,
        save_every=10**9, log_every=10**9,
        fadein_lengths=(1,) * 8, train_lengths=(10**9,) * 7, nb_epoch=4,
    )
    state = L.train(
        "budget_guard", out, str(tmp_path / "run"), train_cfg=cfg,
        model_cfg=TINY_CFG, max_iters=3, mesh=None,
    )
    assert int(state.iter_idx) == 3
    text = capsys.readouterr().out
    assert "grew to 8 samples" in text
    assert "keeping the resident" in text


# ------------------------------------------- preemption / bit-exact resume ---

def test_preemption_signal_sets_event():
    """SIGTERM/SIGUSR1 arm the PREEMPTED event while handlers are
    installed; prior handlers are restored afterwards."""
    import signal

    from musicgan_tpu.train import loop as L

    prev = L._install_preemption_handlers()
    try:
        assert not L.PREEMPTED.is_set()
        signal.raise_signal(signal.SIGUSR1)
        assert L.PREEMPTED.is_set()
    finally:
        L.PREEMPTED.clear()
        L._restore_preemption_handlers(prev)
    assert signal.getsignal(signal.SIGUSR1) is not None


def test_preemption_flushes_checkpoint_and_resume_is_bit_exact(
    tmp_path, monkeypatch
):
    """A pending preemption stops training after ONE iteration with an
    off-cadence checkpoint flush; --resume then replays the remainder of
    the interrupted epoch's deterministic order, so the resumed run is
    numerically identical to an uninterrupted one."""
    from musicgan_tpu.train import loop as L
    from musicgan_tpu.train import train

    ds = _synth_dataset(tmp_path)
    cfg = dataclasses.replace(
        FAST_CFG, nb_epoch=50, save_every=100, log_every=100, nb_preview=1,
        chunk_steps=1,
    )
    s_ctrl = train(
        "ctrl", ds, str(tmp_path / "ctrl"), cfg, TINY_CFG, max_iters=5,
        mesh=None,
    )

    out = str(tmp_path / "out")
    # Simulate the signal landing before the first iteration boundary.
    monkeypatch.setattr(L, "_install_preemption_handlers", lambda: None)
    L.PREEMPTED.set()
    try:
        s1 = train("t", ds, out, cfg, TINY_CFG, max_iters=5, mesh=None)
    finally:
        L.PREEMPTED.clear()
    monkeypatch.undo()
    assert int(s1.iter_idx) == 1
    ckpt = CheckpointManager(os.path.join(out, "checkpoints"))
    assert ckpt.latest() == 0  # flushed despite save_every=100
    import json
    with open(os.path.join(out, "checkpoints", "save_0", "meta.json")) as f:
        meta = json.load(f)
    assert meta["epoch_batch_pos"] == 1 and meta["iter_idx"] == 1

    s2 = train("t", ds, out, cfg, TINY_CFG, resume=True, max_iters=5,
               mesh=None)
    assert int(s2.iter_idx) == 5
    for x, y in zip(
        jax.tree_util.tree_leaves(s_ctrl), jax.tree_util.tree_leaves(s2)
    ):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_cadence_save_resume_is_bit_exact_chunked(tmp_path):
    """Resuming from an ordinary CADENCE checkpoint (not a preemption
    flush) is just as bit-exact, including under chunked dispatch: the
    save meta carries the same epoch batch cursor, so the resumed run
    replays the remainder of the epoch identically.  (The live r4
    continuation run surfaced an apparent post-resume metric jump; this
    pins that it is a logging-WINDOW artifact — the windowed means lose
    their pre-resume history — not a trajectory divergence.)"""
    from musicgan_tpu.train import train

    ds = _synth_dataset(tmp_path)
    cfg = dataclasses.replace(
        FAST_CFG, nb_epoch=50, save_every=6, log_every=3, nb_preview=1,
        chunk_steps=3,
    )
    s_ctrl = train(
        "ctrl", ds, str(tmp_path / "ctrl"), cfg, TINY_CFG, max_iters=12,
        mesh=None,
    )

    out = str(tmp_path / "out")
    train("t", ds, out, cfg, TINY_CFG, max_iters=9, mesh=None)
    ckpt = CheckpointManager(os.path.join(out, "checkpoints"))
    assert ckpt.latest() == 0  # the iter-6 cadence save
    s2 = train("t", ds, out, cfg, TINY_CFG, resume=True, max_iters=12,
               mesh=None)
    assert int(s2.iter_idx) == 12
    for x, y in zip(
        jax.tree_util.tree_leaves(s_ctrl), jax.tree_util.tree_leaves(s2)
    ):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_preemption_mid_chunk_defers_flush_to_chunk_end(
    tmp_path, monkeypatch
):
    """With chunked dispatch, the device state already reflects the whole
    chunk when the signal is observed — the flush must happen at the
    chunk's LAST bookkeeping call so checkpoint meta (iter/grower/epoch
    cursor) matches the saved state.  Resume stays bit-exact."""
    from musicgan_tpu.train import loop as L
    from musicgan_tpu.train import train

    ds = _synth_dataset(tmp_path, n=32)  # 4 batches/epoch at batch 8
    cfg = dataclasses.replace(
        FAST_CFG, nb_epoch=50, save_every=100, log_every=100, nb_preview=1,
        chunk_steps=3,
    )
    s_ctrl = train(
        "ctrl", ds, str(tmp_path / "ctrl"), cfg, TINY_CFG, max_iters=6,
        mesh=None,
    )

    out = str(tmp_path / "out")
    monkeypatch.setattr(L, "_install_preemption_handlers", lambda: None)
    L.PREEMPTED.set()
    try:
        s1 = train("t", ds, out, cfg, TINY_CFG, max_iters=6, mesh=None)
    finally:
        L.PREEMPTED.clear()
    monkeypatch.undo()
    # the first 3-iteration chunk completes, then flush+stop
    assert int(s1.iter_idx) == 3
    ckpt = CheckpointManager(os.path.join(out, "checkpoints"))
    assert ckpt.latest() == 0
    import json
    with open(os.path.join(out, "checkpoints", "save_0", "meta.json")) as f:
        meta = json.load(f)
    assert meta["epoch_batch_pos"] == 3 and meta["iter_idx"] == 3

    s2 = train("t", ds, out, cfg, TINY_CFG, resume=True, max_iters=6,
               mesh=None)
    assert int(s2.iter_idx) == 6
    for x, y in zip(
        jax.tree_util.tree_leaves(s_ctrl), jax.tree_util.tree_leaves(s2)
    ):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_resume_with_ema_off_drops_stale_ema(tmp_path, capsys):
    """Resuming WITHOUT --ema-decay from an EMA-carrying checkpoint must
    not keep a frozen gen_ema (eval prefers gen_ema when present, so a
    kept-but-never-updated copy would silently pin every later
    preview/generate/export to the resume point)."""
    from musicgan_tpu.train import train

    ds = _synth_dataset(tmp_path)
    out = str(tmp_path / "out")
    cfg = dataclasses.replace(
        FAST_CFG, nb_epoch=50, save_every=2, log_every=10, nb_preview=1,
        chunk_steps=1, ema_decay=0.9,
    )
    s1 = train("t", ds, out, cfg, TINY_CFG, max_iters=2, mesh=None)
    assert s1.gen_ema is not None

    cfg_off = dataclasses.replace(cfg, ema_decay=0.0)
    s2 = train("t", ds, out, cfg_off, TINY_CFG, resume=True, max_iters=4,
               mesh=None)
    assert s2.gen_ema is None
    assert "discarding it" in capsys.readouterr().out


def test_explicit_pallas_train_rejects_bf16():
    """conv_impl='pallas_train' is an f32 kernel path; configuring it
    together with a bf16 compute dtype must error, not silently train in
    full f32 under a bf16-labelled run."""
    from musicgan_tpu.config import ModelConfig, TrainConfig
    from musicgan_tpu.ops.autotune import resolve_conv_impl

    cfg = dataclasses.replace(ModelConfig(), conv_impl="pallas_train")
    for dtype in ("bfloat16", "bfloat16_f32gp"):
        with pytest.raises(ValueError, match="float32 only"):
            resolve_conv_impl(
                cfg, (1, 2, 32, 32), 0, for_training=True,
                train_cfg=TrainConfig(compute_dtype=dtype),
            )


def test_device_dataset_bf16_resident(tmp_path):
    """bf16-resident corpus (device_dataset_dtype='bfloat16'): half the
    HBM, compute still f32 (upcast at the per-batch gather).  The inputs
    are min-max-normalized images, so bf16 residency is a ~4e-3 input
    quantization — a short run must track the f32-resident run closely
    and stay finite; the resident array itself must be bf16."""
    from musicgan_tpu.train import train

    ds = _synth_dataset(tmp_path)
    base = dataclasses.replace(
        FAST_CFG, nb_epoch=50, save_every=100, nb_preview=1,
        chunk_steps=2, host_pipeline=False, device_dataset="on",  # chunked
        # dispatch so the lax.scan-body gather upcast is exercised too
    )
    s_f32 = train(
        "f32", ds, str(tmp_path / "f32"), base, TINY_CFG,
        max_iters=4, mesh=None,
    )
    s_bf16 = train(
        "bf16", ds, str(tmp_path / "bf16"),
        dataclasses.replace(base, device_dataset_dtype="bfloat16"),
        TINY_CFG, max_iters=4, mesh=None,
    )
    # Same permutation, same graphs; only the inputs are quantized.
    for x, y in zip(
        jax.tree_util.tree_leaves(s_f32), jax.tree_util.tree_leaves(s_bf16)
    ):
        x = np.asarray(x, np.float32)
        y = np.asarray(y, np.float32)
        assert np.isfinite(y).all()
        np.testing.assert_allclose(
            x, y, rtol=0.1, atol=0.05 * max(1.0, float(np.abs(x).max()))
        )


def test_device_dataset_bf16_halves_budget_requirement(tmp_path):
    """A corpus that exceeds the budget at f32 but fits at bf16 must be
    shipped resident under device_dataset='auto' + bf16 dtype."""
    import dataclasses as dc

    from musicgan_tpu.audio.dataset import SpectrogramDataset
    from musicgan_tpu.train import train

    ds = _synth_dataset(tmp_path)
    nbytes = SpectrogramDataset(ds).nbytes()
    budget = nbytes // 2 + 16  # too small for f32, enough for bf16
    base = dataclasses.replace(
        FAST_CFG, nb_epoch=50, save_every=100, nb_preview=1,
        chunk_steps=1, host_pipeline=False, device_dataset="auto",
        device_dataset_budget_bytes=budget,
    )
    # f32: falls back to streaming (just runs); bf16: resident.
    train("a", ds, str(tmp_path / "a"), base, TINY_CFG, max_iters=2,
          mesh=None)
    s = train(
        "b", ds, str(tmp_path / "b"),
        dc.replace(base, device_dataset_dtype="bfloat16"),
        TINY_CFG, max_iters=2, mesh=None,
    )
    for leaf in jax.tree_util.tree_leaves(s):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()


def test_single_host_device_loss_maps_to_retryable_exit(tmp_path, monkeypatch):
    """A dying device runtime mid-run (e.g. "UNAVAILABLE: TPU worker
    process crashed or restarted", seen live) must exit with the
    supervisor's retry code on a SINGLE-host run too — the mapping used to
    be gated to multi-host, so the rc-1 crash made run_supervised give up
    instead of resuming from the cadence checkpoint."""
    import pytest

    from musicgan_tpu.train import loop as loop_mod
    from musicgan_tpu.train import train
    from musicgan_tpu.utils.watchdog import EXIT_STALLED

    ds = _synth_dataset(tmp_path)
    cfg = dataclasses.replace(
        FAST_CFG, chunk_steps=1, save_every=10**6, log_every=1,
        nb_preview=1,
    )

    real_build = loop_mod.build_step
    calls = {"n": 0}

    def failing_build(*a, **k):
        step = real_build(*a, **k)

        def wrapped(*sa, **sk):
            calls["n"] += 1
            if calls["n"] > 3:
                # the real class device deaths surface as — single-host
                # mapping requires it (a marker-matching plain exception
                # must keep propagating as an ordinary crash)
                from jax.errors import JaxRuntimeError

                raise JaxRuntimeError(
                    "UNAVAILABLE: TPU worker process crashed or restarted."
                )
            return step(*sa, **sk)

        return wrapped

    monkeypatch.setattr(loop_mod, "build_step", failing_build)
    with pytest.raises(SystemExit) as ei:
        train("devloss", ds, str(tmp_path / "out_devloss"), cfg, TINY_CFG,
              max_iters=50, mesh=None)
    assert ei.value.code == EXIT_STALLED
    assert calls["n"] > 3  # the run really trained before the injected loss
