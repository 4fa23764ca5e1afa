"""Unit tests for the GANSynth-style magn/phase transforms.

Golden values come from numpy (``np.unwrap``), from the reference formulas
re-derived independently, and from round-trip properties
(reference ``audio/functions.py:13-139``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from musicgan_tpu.audio import functions as fn
from musicgan_tpu.audio import transforms as tr
from musicgan_tpu.config import AudioConfig

CFG = AudioConfig()


def test_unwrap_matches_numpy(rng):
    phi = rng.uniform(-np.pi, np.pi, size=(8, 300)).astype(np.float32)
    ours = np.asarray(fn.unwrap(jnp.asarray(phi), axis=1))
    golden = np.unwrap(phi.astype(np.float64), axis=1)
    np.testing.assert_allclose(ours, golden, atol=1e-3)


def test_bark_scale_formula():
    got = np.asarray(fn.bark_scale_vector(512, 44100))
    freqs = np.linspace(20.0, 22050.0, 512)
    want = 6.0 * np.arcsinh(freqs / 600.0)
    want = want / np.linalg.norm(want)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bark_scale_roundtrip(rng):
    magn = rng.uniform(0.1, 1.0, size=(512, 64)).astype(np.float32)
    scaled = fn.bark_magn_scale(jnp.asarray(magn))
    back = fn.bark_magn_scale(scaled, unscale=True)
    np.testing.assert_allclose(np.asarray(back), magn, rtol=1e-5)


def test_stft_to_phase_magn_shapes_and_range(rng):
    t = 512 * 2 + 100  # forces the leading-frame trim path
    z = (
        rng.standard_normal((512, t)) + 1j * rng.standard_normal((512, t))
    ).astype(np.complex64)
    magn, phase = fn.stft_to_phase_magn(jnp.asarray(z), nb_vec=512)
    assert magn.shape == (2, 512, 512)
    assert phase.shape == (2, 512, 512)
    for arr in (np.asarray(magn), np.asarray(phase)):
        assert arr.min() >= -1.0 - 1e-6 and arr.max() <= 1.0 + 1e-6
        # global min-max normalization hits both extremes across the track
        assert arr.max() > 0.99 and arr.min() < -0.99


def test_stft_to_phase_magn_track_global_normalization(rng):
    # Normalization must be per-track (all chunks jointly), NOT per-chunk
    # (reference audio/functions.py:79-87).
    t = 512 * 3
    z = (
        rng.standard_normal((512, t)) + 1j * rng.standard_normal((512, t))
    ).astype(np.complex64)
    # Scale the final 512 frames (they survive the leading-frame trim,
    # which removes 511 frames here after the drop-first-frame step).
    z[:, -512:] *= 100.0
    magn, _ = fn.stft_to_phase_magn(jnp.asarray(z), nb_vec=512)
    magn = np.asarray(magn)
    assert magn.shape[0] == 2
    assert magn[1].max() > 0.99
    assert magn[0].max() < 0.5  # other chunks are small on the shared scale


def test_magn_phase_to_signal_shape(rng):
    mp = rng.uniform(-1, 1, size=(2, 2, 512, 512)).astype(np.float32)
    sig = np.asarray(fn.magn_phase_to_signal(jnp.asarray(mp)))
    assert sig.shape == ((2 * 512 - 1) * 256,)
    assert np.isfinite(sig).all()


def test_phase_cumsum_equals_serial_loop(rng):
    # The reference accumulates phase with a serial Python loop
    # (audio/functions.py:117-118); our cumsum must agree exactly.
    phase = rng.uniform(-np.pi, np.pi, size=(16, 64)).astype(np.float64)
    serial = phase.copy()
    for i in range(serial.shape[1] - 1):
        serial[:, i + 1] = serial[:, i] + serial[:, i + 1]
    ours = np.cumsum(phase, axis=1)
    np.testing.assert_allclose(ours, serial, rtol=1e-12)


def test_audio_roundtrip_preserves_spectral_peak(rng):
    """wav -> stft -> magn/phase -> signal keeps the dominant frequency."""
    sr = CFG.sample_rate
    n = 512 * 256 + 300 * 256  # > one chunk after trim
    tgrid = np.arange(n) / sr
    x = (0.4 * np.sin(2 * np.pi * 880.0 * tgrid)).astype(np.float32)
    z = fn.signal_to_stft(jnp.asarray(x))
    magn, phase = fn.stft_to_phase_magn(z)
    mp = jnp.stack([magn, phase], axis=1)  # (N, 2, 512, 512)
    y = np.asarray(fn.magn_phase_to_signal(mp))
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    freqs = np.fft.rfftfreq(len(y), 1 / sr)
    peak = freqs[np.argmax(spec)]
    assert abs(peak - 880.0) < 25.0, f"peak drifted to {peak} Hz"


def test_channel_min_max_norm(rng):
    x = rng.standard_normal((3, 2, 16, 16)).astype(np.float32) * 7 + 3
    out = np.asarray(tr.channel_min_max_norm(jnp.asarray(x)))
    assert out.min() >= 0.0 and out.max() <= 1.0
    for b in range(3):
        for c in range(2):
            assert out[b, c].max() == pytest.approx(1.0, abs=1e-5)
            assert out[b, c].min() == pytest.approx(0.0, abs=1e-5)


def test_change_range():
    x = jnp.asarray(np.linspace(0, 1, 11, dtype=np.float32).reshape(1, 1, 1, 11))
    out = np.asarray(tr.change_range(x, -1.0, 1.0))
    np.testing.assert_allclose(out.ravel(), np.linspace(-1, 1, 11), atol=1e-6)


def test_grower_transform_sizes(rng):
    x = rng.standard_normal((2, 2, 512, 512)).astype(np.float32)
    for size in (4, 32, 512):
        out = tr.grower_transform(jnp.asarray(x), size)
        assert out.shape == (2, 2, size, size)


def test_magn_phase_to_wav_end_to_end_golden(rng):
    """The ENTIRE inverse pipeline matches a torch reimplementation of the
    reference's ``magn_phase_to_wav`` (``audio/functions.py:97-137``) on a
    broadband fixture — one test that fails if ANY stage drifts (bark
    unscale, re-norm, phase accumulate, mod, complex assembly, Nyquist row,
    normalized iSTFT).  The compositional tests above cover each stage;
    this covers their composition."""
    import torch as th

    n_fft, hop, n_bins = 1024, 256, 512
    mp_np = rng.uniform(-1.0, 1.0, (2, 2, n_bins, 64)).astype(np.float32)

    # --- torch reimplementation of the reference inverse -----------------
    mp = th.from_numpy(mp_np)
    flat = mp.permute(1, 2, 0, 3).flatten(2, 3)
    magn, phase = flat[0], flat[1]

    magn = (magn + 1.0) / 2.0
    scale = 6.0 * th.arcsinh(th.linspace(20.0, 22050.0, n_bins) / 600.0)
    magn = magn / (scale / scale.norm())[:, None]          # bark unscale
    magn = magn / (magn.max() - magn.min())

    phase = (phase + 1.0) / 2.0 * 2.0 * np.pi - np.pi
    for i in range(phase.size(1) - 1):                      # serial loop,
        phase[:, i + 1] = phase[:, i] + phase[:, i + 1]     # as the reference
    phase = phase % (2.0 * np.pi)

    real = th.cat([magn * th.cos(phase), th.zeros(1, magn.size(1))], dim=0)
    imag = th.cat([magn * th.sin(phase), th.zeros(1, magn.size(1))], dim=0)
    z = real + 1j * imag

    # torchaudio.inverse_spectrogram(normalized=True) == un-normalize by the
    # window norm, then centered th.istft.
    win = th.hann_window(n_fft)
    golden = th.istft(
        z * win.pow(2.0).sum().sqrt(), n_fft=n_fft, hop_length=hop,
        win_length=n_fft, window=win, center=True,
    ).numpy()

    ours = np.asarray(fn.magn_phase_to_signal(jnp.asarray(mp_np)))

    assert ours.shape == golden.shape
    scale_ref = np.abs(golden).max()
    np.testing.assert_allclose(ours, golden, atol=5e-5 * scale_ref, rtol=0)
