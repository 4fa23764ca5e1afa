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
