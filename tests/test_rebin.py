"""Frequency re-binning tests (the reference notebook's scatter-mean
exploration, as matmul operators)."""

import numpy as np
import pytest

import jax.numpy as jnp

from musicgan_tpu.audio.rebin import (
    rebin,
    rebin_operator,
    scale_frequencies,
    unbin,
)


def test_rebin_equals_scatter_mean(rng):
    n_freqs, n_bins, t = 513, 64, 32
    spec = rng.standard_normal((n_freqs, t)).astype(np.float32)
    got = np.asarray(rebin(jnp.asarray(spec), "mel", n_bins))

    # naive scatter-mean golden
    s = scale_frequencies("mel", n_freqs)
    edges = np.linspace(s[0], s[-1], n_bins + 1)
    bucket = np.clip(np.searchsorted(edges, s, "right") - 1, 0, n_bins - 1)
    want = np.zeros((n_bins, t))
    for b in range(n_bins):
        members = spec[bucket == b]
        if len(members):
            want[b] = members.mean(axis=0)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("scale", ["mel", "bark", "erb", "linear"])
def test_roundtrip_is_bucket_constant(rng, scale):
    n_freqs, n_bins = 513, 128
    spec = rng.uniform(0, 1, (n_freqs, 8)).astype(np.float32)
    back = np.asarray(
        unbin(rebin(jnp.asarray(spec), scale, n_bins), n_freqs, scale)
    )
    assert back.shape == spec.shape
    # a second round trip is the identity (projection property)
    back2 = np.asarray(
        unbin(rebin(jnp.asarray(back), scale, n_bins), n_freqs, scale)
    )
    np.testing.assert_allclose(back2, back, atol=1e-5)


def test_scale_monotonic():
    for scale in ("mel", "bark", "erb", "linear"):
        s = scale_frequencies(scale, 513)
        assert (np.diff(s) > 0).all()


def test_every_row_has_a_bucket():
    a, a_inv = rebin_operator("bark", 513, 64)
    assert a.shape == (64, 513)
    assert float(a.sum()) == pytest.approx(64, abs=1e-4)  # rows sum to 1 each
    assert (a_inv.sum(axis=1) == 1).all()  # each row maps to exactly 1 bucket
