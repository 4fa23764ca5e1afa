"""Parallelism tests on the virtual 8-device CPU mesh: DP equivalence and
time-sharded long-clip generation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from musicgan_tpu.config import ModelConfig
from musicgan_tpu.generate import synthesize_fn
from musicgan_tpu.models import init_generator
from musicgan_tpu.parallel import make_mesh
from musicgan_tpu.parallel.longclip import sharded_synthesize_fn

CFG = ModelConfig()


@pytest.fixture(scope="module")
def mesh():
    m = make_mesh()
    assert m is not None and m.size == 8
    return m


@pytest.fixture(scope="module")
def gen_params():
    return init_generator(jax.random.PRNGKey(0), CFG)


def test_longclip_sharded_matches_single_device(mesh, gen_params):
    """The time-sharded graph must produce the same waveform as the
    unsharded flagship graph (XLA halo exchange correctness)."""
    nb_vec = 8  # width 16 over 8 devices -> 2 latent columns per device
    z = jax.random.normal(
        jax.random.PRNGKey(3), (1, 2, 2 * nb_vec, CFG.rand_channels)
    )

    ref = np.asarray(synthesize_fn(CFG, 7)(gen_params, z))[0]
    sharded = sharded_synthesize_fn(mesh, CFG, 7)
    out = np.asarray(sharded(gen_params, z))

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_longclip_output_is_sharded(mesh, gen_params):
    nb_vec = 8
    z = jax.random.normal(
        jax.random.PRNGKey(4), (1, 2, 2 * nb_vec, CFG.rand_channels)
    )
    out = sharded_synthesize_fn(mesh, CFG, 7)(gen_params, z)
    # output lives distributed over the mesh, one contiguous slice each
    assert len(out.sharding.device_set) == 8


def test_device_resident_mesh_matches_streaming(mesh, tmp_path):
    """The device-resident corpus mode composes with the mesh (round-4
    VERDICT item 2): corpus sharded N/n_dev rows per device along the data
    axis, index batches dispatched globally — and trains numerically
    identically to the streaming-sharded path (same epoch permutation,
    same in-graph pipeline).  The corpus size (35) is deliberately NOT
    divisible by 8 devices, so the pad-rows path is exercised too; 4
    batches per epoch ensure the chunked (lax.scan) dispatch runs."""
    import dataclasses

    from musicgan_tpu.audio.ingest import ShardWriter
    from musicgan_tpu.config import TrainConfig
    from musicgan_tpu.train import train
    from tiny_cfg import TINY_MODEL

    w = ShardWriter(str(tmp_path / "ds"), samples_per_shard=6)
    w.add(
        np.random.default_rng(0)
        .uniform(-1, 1, (35, 2, 512, 512))
        .astype(np.float32)
    )
    w.close()
    ds = str(tmp_path / "ds")

    base = TrainConfig(
        batch_size=8, save_every=100, log_every=4, nb_preview=1,
        nb_epoch=50, chunk_steps=3, host_pipeline=False,
    )
    s_stream = train(
        "stream", ds, str(tmp_path / "out_stream"),
        dataclasses.replace(base, device_dataset="off"),
        TINY_MODEL, max_iters=7, mesh=mesh,
    )
    s_dev = train(
        "dev", ds, str(tmp_path / "out_dev"),
        dataclasses.replace(base, device_dataset="on"),
        TINY_MODEL, max_iters=7, mesh=mesh,
    )
    for x, y in zip(
        jax.tree_util.tree_leaves(s_stream), jax.tree_util.tree_leaves(s_dev)
    ):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32),
            rtol=2e-5, atol=2e-5,
        )


def test_device_resident_mesh_corpus_is_sharded(mesh):
    """The resident corpus actually lives sharded (one row-range shard per
    device), and a sharded-gather step runs on it."""
    import dataclasses

    from musicgan_tpu.config import TrainConfig
    from musicgan_tpu.train import build_step, init_train_state
    from tiny_cfg import TINY_MODEL

    tcfg = TrainConfig(batch_size=8, chunk_steps=1)
    state = init_train_state(jax.random.PRNGKey(0), TINY_MODEL, tcfg)
    data = jax.device_put(
        np.random.default_rng(1)
        .uniform(-1, 1, (24, 2, 512, 512))
        .astype(np.float32),
        NamedSharding(mesh, P("data")),
    )
    # one contiguous 3-row shard per device, not a replicated copy
    assert len(data.sharding.device_set) == 8
    assert data.addressable_shards[0].data.shape[0] == 3

    step = build_step(
        0, with_gen=True, model_cfg=TINY_MODEL, train_cfg=tcfg,
        mesh=mesh, data_axis="data", device_data=True,
    )
    idx = np.asarray([0, 23, 7, 11, 3, 18, 9, 14], np.int32)
    state, metrics = step(state, data, idx, jnp.float32(1.0))
    assert np.isfinite(float(metrics["disc_loss"]))


def test_data_parallel_grads_match_single_device(mesh):
    """DP mean-gradient over a sharded batch == single-device gradient."""
    from musicgan_tpu.models import (
        discriminator_forward,
        init_discriminator,
    )

    params = init_discriminator(jax.random.PRNGKey(1), CFG)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 4, 4, 2))

    def loss(p, xb):
        return jnp.mean(discriminator_forward(p, xb, 7, 1.0, CFG))

    g_single = jax.jit(jax.grad(loss))(params, x)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    g_sharded = jax.jit(
        jax.grad(loss), in_shardings=(repl, data), out_shardings=repl
    )(params, jax.device_put(x, data))

    for a, b in zip(
        jax.tree_util.tree_leaves(g_single), jax.tree_util.tree_leaves(g_sharded)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
