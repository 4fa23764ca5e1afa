"""GANSynth-style magnitude / instantaneous-frequency transforms in JAX.

TPU-native re-implementations of the reference's audio pipeline
(reference ``audio/functions.py:13-139``):

* ``unwrap``       — numpy-style phase unwrap along time (cumsum-based);
* ``bark_magn_scale`` — per-frequency-bin multiplicative bark weight;
* ``stft_to_phase_magn`` — complex STFT -> 2x(N, 512, 512) image chunks;
* ``magn_phase_to_signal`` — the inverse, ending in a waveform.  The
  reference's serial Python phase-accumulation loop
  (``audio/functions.py:117-118``, O(T) host-side) becomes a single
  ``jnp.cumsum`` that XLA lowers to a parallel scan on device.

Everything here is jit-compatible; host I/O (WAV read/write) lives in
``musicgan_tpu.audio.io``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AudioConfig
from . import stft as stft_lib

_DEFAULT = AudioConfig()

__all__ = [
    "unwrap",
    "bark_scale_vector",
    "bark_magn_scale",
    "stft_to_phase_magn",
    "mp_to_real_imag",
    "magn_phase_to_signal",
    "signal_to_stft",
    "wav_to_stft",
]


def unwrap(phi: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Phase unwrap along ``axis`` (reference ``audio/functions.py:17-23``).

    Standard numpy unwrap: wrap the first difference into (-pi, pi], fix the
    -pi/+pi boundary, zero corrections below the pi threshold, cumsum.
    """
    nd = phi.ndim
    pad_cfg = [(0, 0)] * nd
    pad_cfg[axis] = (1, 0)

    sl_hi = [slice(None)] * nd
    sl_lo = [slice(None)] * nd
    sl_hi[axis] = slice(1, None)
    sl_lo[axis] = slice(None, -1)
    dphi = jnp.pad(phi[tuple(sl_hi)] - phi[tuple(sl_lo)], pad_cfg)

    dphi_m = ((dphi + jnp.pi) % (2 * jnp.pi)) - jnp.pi
    dphi_m = jnp.where((dphi_m == -jnp.pi) & (dphi > 0), jnp.pi, dphi_m)
    phi_adj = dphi_m - dphi
    phi_adj = jnp.where(jnp.abs(dphi) < jnp.pi, 0.0, phi_adj)
    return phi + jnp.cumsum(phi_adj, axis=axis)


@functools.lru_cache(maxsize=4)
def _bark_scale_np(n_bins: int, sample_rate: int) -> np.ndarray:
    """L2-normalized ``6 * arcsinh(f / 600)`` weight over 20 Hz .. Nyquist
    (reference ``audio/functions.py:26-35``)."""
    min_hz, max_hz = 20.0, sample_rate // 2
    freqs = np.linspace(min_hz, max_hz, n_bins)
    scale = 6.0 * np.arcsinh(freqs / 600.0)
    scale = scale / np.linalg.norm(scale)
    return scale.astype(np.float32)


def bark_scale_vector(
    n_bins: int = _DEFAULT.n_bins, sample_rate: int = _DEFAULT.sample_rate
) -> jnp.ndarray:
    return jnp.asarray(_bark_scale_np(n_bins, sample_rate))


def bark_magn_scale(magn: jnp.ndarray, unscale: bool = False) -> jnp.ndarray:
    """Multiply (or divide) magnitude rows by the bark weight.

    ``magn``: ``(n_bins, T)`` — a per-bin scalar weight, NOT a re-binning
    (reference ``audio/functions.py:26-35``).
    """
    assert magn.ndim == 2, f"(STFT, TIME), actual = {magn.shape}"
    scale = bark_scale_vector(magn.shape[0])[:, None]
    return magn / scale if unscale else magn * scale


def signal_to_stft(
    signal: jnp.ndarray, cfg: AudioConfig = _DEFAULT
) -> jnp.ndarray:
    """Mono signal -> complex ``(n_bins, T)`` STFT, Nyquist row dropped
    (reference ``audio/functions.py:38-62``)."""
    z = stft_lib.stft(signal, n_fft=cfg.n_fft, hop=cfg.stft_stride)
    return z[:-1, :]


def wav_to_stft(wav_path: str, cfg: AudioConfig = _DEFAULT) -> jnp.ndarray:
    """Host WAV decode + device STFT (reference ``audio/functions.py:38-62``):
    assert 44.1 kHz, mono via channel mean, normalized Hann spectrogram,
    Nyquist row dropped -> complex ``(n_bins, T)``."""
    from .io import load_wav

    signal, _ = load_wav(wav_path, expected_sample_rate=cfg.sample_rate)
    return signal_to_stft(jnp.asarray(signal), cfg)


def stft_to_phase_magn(
    complex_values: jnp.ndarray, nb_vec: int = _DEFAULT.n_vec
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Complex STFT ``(n_bins, T)`` -> ``(N, n_bins, nb_vec)`` magn & phase.

    Mirrors reference ``audio/functions.py:65-94``: bark-weighted magnitude,
    unwrapped-phase first difference (instantaneous frequency), track-global
    min-max to [-1, 1], leading-frame trim to a multiple of ``nb_vec``,
    then a chunk split along time.
    """
    magn = jnp.abs(complex_values)
    phase = jnp.angle(complex_values)

    magn = bark_magn_scale(magn, unscale=False)
    phase = unwrap(phase)

    phase = phase[:, 1:] - phase[:, :-1]
    magn = magn[:, 1:]

    magn = (magn - magn.min()) / (magn.max() - magn.min())
    phase = (phase - phase.min()) / (phase.max() - phase.min())
    magn, phase = magn * 2.0 - 1.0, phase * 2.0 - 1.0

    t = magn.shape[1]
    magn = magn[:, t % nb_vec :]
    phase = phase[:, t % nb_vec :]
    n = magn.shape[1] // nb_vec
    n_bins = magn.shape[0]
    # (n_bins, N * nb_vec) -> (N, n_bins, nb_vec)
    magn = magn.reshape(n_bins, n, nb_vec).transpose(1, 0, 2)
    phase = phase.reshape(n_bins, n, nb_vec).transpose(1, 0, 2)
    return magn, phase


def mp_to_real_imag(
    magn_phase: jnp.ndarray, cfg: AudioConfig = _DEFAULT
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``(N, 2, n_bins, W)`` magn/phase chunks -> complex-spectrum parts
    ``(n_fft//2+1, N*W)`` ready for any iSTFT backend (the elementwise
    front half of :func:`magn_phase_to_signal`; reference
    ``audio/functions.py:108-128``)."""
    assert magn_phase.ndim == 4, f"(N, 2, H, W), actual = {magn_phase.shape}"
    assert magn_phase.shape[1] == 2
    assert magn_phase.shape[2] == cfg.n_bins

    # (N, 2, H, W) -> (2, H, N * W): chunks concatenated along time.
    mp = magn_phase.transpose(1, 2, 0, 3).reshape(
        2, cfg.n_bins, -1
    )
    magn, phase = mp[0], mp[1]

    magn = (magn + 1.0) / 2.0
    magn = bark_magn_scale(magn, unscale=True)
    magn = magn / (magn.max() - magn.min())

    phase = (phase + 1.0) / 2.0 * 2.0 * jnp.pi - jnp.pi
    # Instantaneous frequency -> absolute phase: prefix sum over time.
    phase = jnp.cumsum(phase, axis=1)
    phase = phase % (2 * jnp.pi)

    real = magn * jnp.cos(phase)
    imag = magn * jnp.sin(phase)

    # Re-append the zero Nyquist row dropped in signal_to_stft.
    zrow = jnp.zeros((1, real.shape[1]), real.dtype)
    real = jnp.concatenate([real, zrow], axis=0)
    imag = jnp.concatenate([imag, zrow], axis=0)
    return real, imag


def magn_phase_to_signal(
    magn_phase: jnp.ndarray, cfg: AudioConfig = _DEFAULT
) -> jnp.ndarray:
    """Invert ``(N, 2, n_bins, W)`` magn/phase chunks to a 1-D waveform.

    Mirrors reference ``audio/functions.py:97-137`` with two TPU-native
    upgrades: the serial Python phase-accumulation loop becomes a
    ``jnp.cumsum`` (parallel scan), and the complex iSTFT is the MXU
    matmul-DFT from ``stft.py``.  Fully jit-compatible, so the generate
    path can fuse G-forward + this vocoder into one compiled graph.
    (The generate path may instead route the iSTFT through the fused
    Pallas kernel — ``ops/istft_pallas.py`` — selected by autotune.)
    """
    real, imag = mp_to_real_imag(magn_phase, cfg)
    return stft_lib.istft_real_imag(
        real, imag, n_fft=cfg.n_fft, hop=cfg.stft_stride
    )
