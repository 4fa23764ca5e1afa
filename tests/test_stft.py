"""Golden-parity tests for the MXU matmul-DFT STFT/iSTFT.

Goldens come from ``torch.stft`` / ``torch.istft`` (CPU), configured exactly
as the reference's torchaudio calls resolve to them
(reference ``audio/functions.py:53-62`` and ``:130-137``):
center=True, reflect padding, Hann window, then the torchaudio
``normalized=True`` scaling of 1/sqrt(sum(window^2)).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import musicgan_tpu.audio.stft
import sys
stft_lib = sys.modules['musicgan_tpu.audio.stft']

N_FFT, HOP = 1024, 256


def _torch_spectrogram(x: np.ndarray) -> np.ndarray:
    win = torch.hann_window(N_FFT)
    z = torch.stft(
        torch.from_numpy(x),
        n_fft=N_FFT,
        hop_length=HOP,
        win_length=N_FFT,
        window=win,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    return (z / win.pow(2).sum().sqrt()).numpy()


def _torch_istft(z: np.ndarray) -> np.ndarray:
    win = torch.hann_window(N_FFT)
    zt = torch.from_numpy(z) * win.pow(2).sum().sqrt()
    return torch.istft(
        zt,
        n_fft=N_FFT,
        hop_length=HOP,
        win_length=N_FFT,
        window=win,
        center=True,
        normalized=False,
        onesided=True,
    ).numpy()


def test_hann_window_matches_torch():
    ours = stft_lib.hann_window(N_FFT)
    theirs = torch.hann_window(N_FFT).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("length", [44100, 44100 * 2 + 123])
def test_stft_matches_torch(rng, length):
    x = rng.standard_normal(length).astype(np.float32)
    golden = _torch_spectrogram(x)
    ours = np.asarray(stft_lib.stft(jnp.asarray(x), N_FFT, HOP))
    assert ours.shape == golden.shape
    scale = np.abs(golden).max()
    np.testing.assert_allclose(ours, golden, atol=2e-5 * scale, rtol=0)


def test_stft_frame_count_convention(rng):
    x = rng.standard_normal(HOP * 100).astype(np.float32)
    ours = np.asarray(stft_lib.stft(jnp.asarray(x), N_FFT, HOP))
    assert ours.shape == (N_FFT // 2 + 1, 101)


def test_istft_matches_torch(rng):
    t = 200
    z = (
        rng.standard_normal((N_FFT // 2 + 1, t))
        + 1j * rng.standard_normal((N_FFT // 2 + 1, t))
    ).astype(np.complex64) * 0.1
    # torch.istft requires a spectrogram consistent with a real signal for an
    # exact inverse, but both implementations apply the same least-squares
    # projection, so arbitrary complex input is a valid comparison.
    golden = _torch_istft(z)
    ours = np.asarray(stft_lib.istft(jnp.asarray(z), N_FFT, HOP))
    assert ours.shape == golden.shape
    scale = np.abs(golden).max()
    np.testing.assert_allclose(ours, golden, atol=3e-5 * scale, rtol=0)


def test_roundtrip_sine(rng):
    sr = 44100
    n = sr
    tgrid = np.arange(n) / sr
    x = (0.5 * np.sin(2 * np.pi * 440.0 * tgrid)).astype(np.float32)
    z = stft_lib.stft(jnp.asarray(x), N_FFT, HOP)
    y = np.asarray(stft_lib.istft(z, N_FFT, HOP))
    m = min(len(x), len(y))
    # Interior samples should reconstruct nearly exactly (COLA condition).
    np.testing.assert_allclose(y[N_FFT : m - N_FFT], x[N_FFT : m - N_FFT], atol=1e-4)


def test_overlap_add_matches_naive(rng):
    frames = rng.standard_normal((7, N_FFT)).astype(np.float32)
    got = np.asarray(stft_lib.overlap_add(jnp.asarray(frames), HOP))
    want = np.zeros(6 * HOP + N_FFT, np.float32)
    for i, f in enumerate(frames):
        want[i * HOP : i * HOP + N_FFT] += f
    np.testing.assert_allclose(got, want, atol=1e-5)
