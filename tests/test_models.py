"""Shape, growth-schedule, and parameter-count tests for the networks.

Assertive version of the reference's manual smoke script
(reference ``networks/test_networks.py:4-38``), plus golden parameter
counts measured from the reference in the survey (SURVEY.md §0:
G = 902,132 / D = 1,647,089 fully grown).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from musicgan_tpu.config import ModelConfig
from musicgan_tpu.models import (
    discriminator_forward,
    discriminator_param_count,
    generator_forward,
    generator_param_count,
    init_discriminator,
    init_generator,
)

CFG = ModelConfig()


def _count(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


@pytest.fixture(scope="module")
def gen_params():
    return init_generator(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def disc_params():
    return init_discriminator(jax.random.PRNGKey(1), CFG)


def test_generator_progression(gen_params):
    """4x4 -> 512x512 over 8 stages (verified against the reference)."""
    z = jnp.asarray(np.random.default_rng(0).standard_normal((2, 2, 2, 32)), jnp.float32)
    for stage in range(8):
        out = generator_forward(gen_params, z, stage, 0.5, CFG)
        size = 4 * 2**stage
        assert out.shape == (2, size, size, 2), f"stage {stage}"
        out = np.asarray(out)
        assert np.isfinite(out).all()
        assert out.min() >= -1.0 and out.max() <= 1.0  # tanh'd (and lerped)


def test_discriminator_progression(disc_params):
    rng = np.random.default_rng(0)
    for stage in range(7, -1, -1):
        size = 4 * 2 ** (7 - stage)
        x = jnp.asarray(rng.standard_normal((2, size, size, 2)), jnp.float32)
        out = discriminator_forward(disc_params, x, stage, 0.5, CFG)
        assert out.shape == (2, 1), f"stage {stage}"
        assert np.isfinite(np.asarray(out)).all()


def test_generator_wide_latent(gen_params):
    """Fully-conv: a width-extended latent scales output width
    (reference ``generate.py:47-54``)."""
    z = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 2, 2 * 3, 32)), jnp.float32
    )
    out = generator_forward(gen_params, z, 7, 1.0, CFG)
    assert out.shape == (1, 512, 512 * 3, 2)


def test_gen_param_count_matches_reference(gen_params):
    assert generator_param_count(CFG, stage=7) == 902_132
    # All-heads-allocated total = blocks + every per-stage head.
    heads_total = sum(cout * 2 + 2 for _, cout in CFG.gen_channels)
    assert _count(gen_params) == 902_132 - (34 + 66) + heads_total


def test_disc_param_count_matches_reference(disc_params):
    assert discriminator_param_count(CFG, stage=0) == 1_647_089
    heads_total = sum(2 * cin + cin for cin, _ in CFG.disc_channels)
    assert _count(disc_params) == 1_647_089 - (48 + 96) + heads_total


def test_fade_in_lerp_endpoints(gen_params):
    """alpha=1 -> pure new head; alpha=0 -> pure upsampled old head."""
    z = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 2, 32)), jnp.float32)
    out1 = generator_forward(gen_params, z, 3, 1.0, CFG)
    out0 = generator_forward(gen_params, z, 3, 0.0, CFG)
    outh = generator_forward(gen_params, z, 3, 0.5, CFG)
    np.testing.assert_allclose(
        np.asarray(outh), (np.asarray(out1) + np.asarray(out0)) / 2, atol=1e-6
    )
    # alpha=0 must equal the nearest-upsampled stage-2 output's head path:
    # its 2x2 blocks are constant.
    o0 = np.asarray(out0)
    assert np.allclose(o0[:, ::2, ::2, :], o0[:, 1::2, 1::2, :], atol=1e-6)


def test_pixel_norm_unit_power():
    from musicgan_tpu.models.layers import pixel_norm

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 4, 16)), jnp.float32)
    out = np.asarray(pixel_norm(x))
    power = (out**2).mean(axis=-1)
    np.testing.assert_allclose(power, np.ones_like(power), rtol=1e-4)


def test_init_distribution_matches_torch_default(gen_params):
    """Conv weights ~ U(+-1/sqrt(fan_in)) like torch's kaiming_uniform(a=sqrt(5))."""
    w = np.asarray(gen_params["blocks"][0]["conv1"]["w"])  # 3x3, cin=32
    bound = 1.0 / np.sqrt(32 * 9)
    assert np.abs(w).max() <= bound + 1e-7
    assert np.abs(w).max() > bound * 0.95  # actually fills the range
    assert abs(w.mean()) < bound * 0.05


def test_jit_per_stage_cache(gen_params):
    """Static stage => separate compiled graphs, traced shapes only."""
    import functools

    traces = []

    @functools.partial(jax.jit, static_argnums=(2,))
    def fwd(params, z, stage, alpha):
        traces.append(stage)
        return generator_forward(params, z, stage, alpha, CFG)

    z = jnp.zeros((1, 2, 2, 32))
    for stage in (0, 1, 0, 1):
        fwd(gen_params, z, stage, 0.7)
    assert traces == [0, 1]  # retrace only per distinct stage


def test_subpixel_upsample_conv_exactness():
    """conv3x3_on_nearest_up2x == conv3x3(upsample_nearest_2x(x)) exactly
    (sub-pixel decomposition; kept as an optional op, see PERF.md)."""
    from musicgan_tpu.models.layers import (
        conv2d,
        conv3x3_on_nearest_up2x,
        upsample_nearest_2x,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 10, 24)), jnp.float32)
    p = {
        "w": jnp.asarray(rng.standard_normal((3, 3, 24, 16)) * 0.1, jnp.float32),
        "b": jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32),
    }
    ref = conv2d(upsample_nearest_2x(x), p)
    got = conv3x3_on_nearest_up2x(x, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


# ------------------------------------------------------- conv_impl paths ---

def test_generator_forward_subpixel_matches_xla(gen_params):
    """The subpixel conv stack is numerically equal to the XLA lowering,
    at a mid-fade stage and the full-grown stage."""
    import dataclasses

    z = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 2, 2, 32)), jnp.float32
    )
    sub = dataclasses.replace(CFG, conv_impl="subpixel")
    xla = dataclasses.replace(CFG, conv_impl="xla")
    for stage, alpha in ((0, 1.0), (3, 0.4), (7, 1.0)):
        a = generator_forward(gen_params, z, stage, alpha, xla)
        b = generator_forward(gen_params, z, stage, alpha, sub)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-5, rtol=1e-5,
            err_msg=f"stage {stage}",
        )


def test_generator_forward_pallas_matches_xla(gen_params):
    """The NCHW Pallas fast path (interpret mode on CPU) equals the NHWC
    XLA forward, including the fade-in head mix."""
    import dataclasses

    z = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, 2, 2, 32)), jnp.float32
    )
    pls = dataclasses.replace(CFG, conv_impl="pallas")
    xla = dataclasses.replace(CFG, conv_impl="xla")
    for stage, alpha in ((0, 1.0), (2, 0.3)):
        a = generator_forward(gen_params, z, stage, alpha, xla)
        b = generator_forward(gen_params, z, stage, alpha, pls)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-5, rtol=1e-5,
            err_msg=f"stage {stage}",
        )


def test_resolve_conv_impl_semantics():
    """auto -> concrete on CPU; explicit impls pass through; training
    rejects the VJP-less Pallas impl."""
    import dataclasses

    from musicgan_tpu.ops.autotune import resolve_conv_impl

    z_shape = (1, 2, 2, 32)
    got = resolve_conv_impl(CFG, z_shape, stage=0)
    assert got.conv_impl == "xla"  # CPU: no measurement, safe default

    sub = dataclasses.replace(CFG, conv_impl="subpixel")
    assert resolve_conv_impl(sub, z_shape, 0).conv_impl == "subpixel"
    assert resolve_conv_impl(sub, z_shape, 0, for_training=True).conv_impl \
        == "subpixel"

    pls = dataclasses.replace(CFG, conv_impl="pallas")
    assert resolve_conv_impl(pls, z_shape, 0).conv_impl == "pallas"
    with pytest.raises(ValueError, match="inference-only"):
        resolve_conv_impl(pls, z_shape, 0, for_training=True)
