"""Pallas fused-conv kernel parity tests (interpreter mode on CPU).

On-TPU parity was additionally verified manually (maxerr ~1e-6 vs
lax.conv on the real chip); these tests pin the kernel's semantics
hermetically.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from musicgan_tpu.ops.conv import (
    fused_conv3x3,
    fused_upconv3x3,
    pack_weights,
)


def _ref_conv(x, wt, bias, slope=None, pixel_norm=False, eps=1e-8):
    y = jax.lax.conv_general_dilated(
        x, wt, (1, 1), "SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    y = y + bias[None, :, None, None]
    if slope is not None:
        y = jnp.where(y >= 0, y, slope * y)
    if pixel_norm:
        ms = jnp.mean(y**2, axis=1, keepdims=True)
        y = y * jax.lax.rsqrt(ms + eps)
    return y


@pytest.mark.parametrize(
    "b,cin,cout,h,w",
    [(1, 16, 32, 8, 256), (2, 32, 16, 16, 300), (1, 8, 8, 4, 128),
     (1, 128, 112, 8, 160)],
)
def test_fused_conv3x3_parity(rng, b, cin, cout, h, w):
    x = jnp.asarray(rng.standard_normal((b, cin, h, w)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32)
    got = fused_conv3x3(
        x, wt, bias, slope=0.2, pixel_norm=True, interpret=True
    )
    ref = _ref_conv(x, wt, bias, slope=0.2, pixel_norm=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_fused_conv3x3_no_epilogue(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 8, 128)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, 16, 16)) * 0.1, jnp.float32)
    bias = jnp.zeros(16)
    got = fused_conv3x3(x, wt, bias, interpret=True)
    ref = _ref_conv(x, wt, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def _up2x_nchw(x):
    b, c, h, w = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None], (b, c, h, 2, w, 2))
    return x.reshape(b, c, 2 * h, 2 * w)


@pytest.mark.parametrize(
    "b,cin,cout,h,w",
    [(1, 16, 32, 8, 256), (2, 32, 16, 10, 200), (1, 8, 8, 4, 128)],
)
def test_fused_upconv3x3_parity(rng, b, cin, cout, h, w):
    """conv3x3(up2x(x)) fused in VMEM == the materialized reference."""
    x = jnp.asarray(rng.standard_normal((b, cin, h, w)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32)
    got = fused_upconv3x3(
        x, wt, bias, slope=0.2, pixel_norm=True, interpret=True
    )
    ref = _ref_conv(_up2x_nchw(x), wt, bias, slope=0.2, pixel_norm=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_fused_upconv3x3_bf16_io(rng):
    x32 = jnp.asarray(rng.standard_normal((1, 16, 8, 128)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, 16, 16)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)
    got = fused_upconv3x3(
        x32.astype(jnp.bfloat16), wt, bias, slope=0.2, pixel_norm=True,
        out_dtype=jnp.bfloat16, interpret=True,
    )
    assert got.dtype == jnp.bfloat16
    ref = _ref_conv(_up2x_nchw(x32), wt, bias, slope=0.2, pixel_norm=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=0.06
    )


def test_fused_conv3x3_bf16_io(rng):
    """bf16 activations/weights with f32 MXU accumulation + f32 epilogue:
    result within bf16 rounding of the f32 reference, output dtype bf16."""
    x32 = jnp.asarray(rng.standard_normal((1, 16, 8, 256)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, 16, 32)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(32) * 0.1, jnp.float32)
    got = fused_conv3x3(
        x32.astype(jnp.bfloat16), wt, bias, slope=0.2, pixel_norm=True,
        out_dtype=jnp.bfloat16, interpret=True,
    )
    assert got.dtype == jnp.bfloat16
    ref = _ref_conv(x32, wt, bias, slope=0.2, pixel_norm=True)
    # pixel-norm output is O(1); bf16 has ~2-3 decimal digits
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=0.06
    )


def test_generator_pallas_bf16_close_to_f32(rng):
    """The full bf16 Pallas generator stack stays within bf16 accumulation
    noise of the f32 XLA path — the parity bound for pallas_bf16 synthesis
    (final tanh output lives in [-1, 1])."""
    import dataclasses

    from musicgan_tpu.models import generator_forward, init_generator
    from tiny_cfg import TINY_MODEL

    params = init_generator(jax.random.PRNGKey(0), TINY_MODEL)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2, 8))
    f32 = generator_forward(params, z, 3, 1.0, TINY_MODEL)
    cfg = dataclasses.replace(TINY_MODEL, conv_impl="pallas_bf16")
    bf16 = generator_forward(params, z, 3, 1.0, cfg)
    assert bf16.dtype == jnp.float32  # heads/fade-in stay f32
    np.testing.assert_allclose(
        np.asarray(bf16), np.asarray(f32), atol=0.08
    )


@pytest.mark.parametrize("b,cin,cmid,cout,h,w",
                         [(1, 16, 24, 32, 8, 256), (2, 8, 8, 8, 4, 128)])
def test_fused_block_parity(rng, b, cin, cmid, cout, h, w):
    """The whole-block kernel == conv1+pn then up2x+conv2+pn composed."""
    from musicgan_tpu.ops.conv import fused_block

    x = jnp.asarray(rng.standard_normal((b, cin, h, w)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, cin, cmid)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(cmid) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, cmid, cout)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32)
    got = fused_block(x, w1, b1, w2, b2, slope=0.2, interpret=True)
    mid = _ref_conv(x, w1, b1, slope=0.2, pixel_norm=True)
    ref = _ref_conv(_up2x_nchw(mid), w2, b2, slope=0.2, pixel_norm=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_generator_pallas_up_close_to_f32(rng):
    """The fused up+conv generator stack (both dtypes) matches the XLA
    path within the respective rounding budget."""
    import dataclasses

    from musicgan_tpu.models import generator_forward, init_generator
    from tiny_cfg import TINY_MODEL

    params = init_generator(jax.random.PRNGKey(0), TINY_MODEL)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2, 8))
    f32 = generator_forward(params, z, 3, 1.0, TINY_MODEL)
    for impl, atol in (("pallas_up", 1e-4), ("pallas_up_bf16", 0.08),
                       ("pallas_block", 1e-4), ("pallas_block_bf16", 0.08)):
        cfg = dataclasses.replace(TINY_MODEL, conv_impl=impl)
        out = generator_forward(params, z, 3, 1.0, cfg)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(f32), atol=atol,
            err_msg=impl,
        )


def test_pack_weights_order(rng):
    wt = jnp.asarray(rng.standard_normal((3, 3, 4, 5)), jnp.float32)
    packed = np.asarray(pack_weights(wt))
    assert packed.shape == (5, 36)
    # K index (dy*3 + dx)*cin + c
    assert packed[2, (1 * 3 + 2) * 4 + 3] == pytest.approx(
        float(wt[1, 2, 3, 2])
    )


def test_choose_tiles_lane_multiple_invariant():
    """Mosaic requires the output block's last dim to be a multiple of 128:
    regression for the halving bug where w=320 -> wc=384 -> 192 (not a
    lane multiple), which broke wide-latent (nb_vec=20) stage-7 synthesis
    on TPU."""
    from musicgan_tpu.ops.conv import _choose_tiles

    for cin in (16, 32, 48, 96, 128, 144):
        for w in (4, 80, 160, 320, 640, 5120, 10240):
            hb, wc = _choose_tiles(cin, 512, w, 4)
            assert wc % 128 == 0, (cin, w, wc)
            assert hb % 8 == 0
            assert 9 * cin * hb * wc * 4 <= 6 * 2**20 or wc == 128


# ------------------------------------------------------------ fused iSTFT ---


@pytest.mark.parametrize("t", [512, 300, 257])
def test_istft_fused_matches_xla(rng, t):
    """The fused Pallas iSTFT (iDFT matmuls + window-folded bases +
    in-VMEM overlap-add) must match istft_real_imag bit-for-bit up to
    matmul association (interpret mode; on-TPU parity verified on the
    real chip, maxerr ~3e-6)."""
    from musicgan_tpu.audio.stft import istft_real_imag
    from musicgan_tpu.ops.istft_pallas import istft_fused

    real = jnp.asarray(rng.normal(size=(513, t)).astype(np.float32))
    imag = jnp.asarray(rng.normal(size=(513, t)).astype(np.float32))
    ref = np.asarray(istft_real_imag(real, imag))
    out = np.asarray(istft_fused(real, imag, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_istft_fused_batched_matches_per_example(rng):
    from musicgan_tpu.audio.stft import istft_real_imag
    from musicgan_tpu.ops.istft_pallas import istft_fused

    real = jnp.asarray(rng.normal(size=(3, 513, 128)).astype(np.float32))
    imag = jnp.asarray(rng.normal(size=(3, 513, 128)).astype(np.float32))
    ref = np.stack([
        np.asarray(istft_real_imag(real[b], imag[b])) for b in range(3)
    ])
    out = np.asarray(istft_fused(real, imag, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4)
