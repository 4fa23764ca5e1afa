"""Host-side input pipeline must match the device pipeline exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from musicgan_tpu.audio.host_pipeline import prepare_batch, resize_operator
from musicgan_tpu.audio.transforms import grower_transform


@pytest.mark.parametrize("dst", [4, 8, 32, 256, 512])
def test_resize_operator_matches_jax(rng, dst):
    x = rng.standard_normal((512,)).astype(np.float32)
    golden = np.asarray(
        jax.image.resize(
            jnp.asarray(x), (dst,), method="bilinear", antialias=False
        )
    )
    ours = resize_operator(512, dst) @ x
    np.testing.assert_allclose(ours, golden, atol=1e-5)


@pytest.mark.parametrize("size", [4, 64, 512])
def test_prepare_batch_matches_device_pipeline(rng, size):
    x = rng.standard_normal((3, 2, 512, 512)).astype(np.float32) * 3 + 1
    host = prepare_batch(x, size)
    device = np.asarray(grower_transform(jnp.asarray(x), size))
    assert host.shape == device.shape == (3, 2, size, size)
    np.testing.assert_allclose(host, device, atol=2e-5)


def test_prepare_batch_dtype():
    x = np.random.default_rng(0).standard_normal((1, 2, 512, 512))
    out = prepare_batch(x, 4, out_dtype=np.float32)
    assert out.dtype == np.float32 and out.flags.c_contiguous
