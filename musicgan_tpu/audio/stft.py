"""MXU-native STFT / iSTFT via matmul-DFT.

TPU-first replacement for the reference's ``torchaudio.functional.spectrogram``
/ ``inverse_spectrogram`` calls (reference ``audio/functions.py:53-62`` and
``audio/functions.py:130-137``).  Instead of an FFT (which maps poorly onto
the TPU's systolic array), the DFT is expressed as two real matrix products
against precomputed cosine/sine bases — the framed signal ``(T, n_fft)``
matmuls a ``(n_fft, n_bins)`` basis, which is exactly the shape of work the
128x128 MXU is built for.  Framing and overlap-add are expressed as static
pad/reshape/add patterns so XLA fuses everything into a handful of kernels:
no gathers, no scatters, no dynamic shapes.

Semantics match ``torch.stft(center=True, pad_mode="reflect",
normalized=False)`` followed by division by ``sqrt(sum(window**2))`` — which
is what ``torchaudio.functional.spectrogram(..., normalized=True)`` computes —
and the corresponding ``torch.istft`` inverse.  Golden-parity tests live in
``tests/test_stft.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "hann_window",
    "stft",
    "istft",
    "num_frames",
    "signal_length",
]


def hann_window(n: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window, identical to ``torch.hann_window(n)``."""
    k = np.arange(n, dtype=np.float64)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * k / n))
    return w.astype(dtype)


@functools.lru_cache(maxsize=8)
def _dft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag rfft bases: ``X[f] = sum_k x[k] * exp(-2i*pi*f*k/n)``.

    Returns ``(cos_basis, sin_basis)`` of shape ``(n_fft, n_fft//2 + 1)`` with
    ``real = x @ cos_basis`` and ``imag = -(x @ sin_basis)``.
    Computed in float64 then cast to float32 so basis error stays below
    matmul rounding error.
    """
    n_bins = n_fft // 2 + 1
    k = np.arange(n_fft, dtype=np.float64)[:, None]
    f = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * f / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _idft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse rfft bases mapping ``(n_bins,)`` spectra to ``(n_fft,)`` frames.

    ``x = real @ cos_ib + imag @ sin_ib`` where interior bins carry weight
    ``2/n`` (conjugate-symmetric pair) and the DC/Nyquist bins weight ``1/n``.
    """
    n_bins = n_fft // 2 + 1
    f = np.arange(n_bins, dtype=np.float64)[:, None]
    k = np.arange(n_fft, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * f * k / n_fft
    weight = np.full((n_bins, 1), 2.0 / n_fft)
    weight[0, 0] = 1.0 / n_fft
    weight[-1, 0] = 1.0 / n_fft
    cos_ib = (np.cos(ang) * weight).astype(np.float32)
    sin_ib = (-np.sin(ang) * weight).astype(np.float32)
    return cos_ib, sin_ib


def num_frames(signal_len: int, hop: int) -> int:
    """Frame count of a centered STFT (``torch.stft`` convention)."""
    return 1 + signal_len // hop


def signal_length(n_frames: int, hop: int) -> int:
    """Output length of a centered iSTFT with ``length=None``."""
    return (n_frames - 1) * hop


def frame_signal(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Center-pad (reflect) and frame a 1-D signal into ``(T, n_fft)``.

    ``n_fft`` must be an integer multiple of ``hop``; the framing is then a
    static stack of ``r = n_fft // hop`` shifted reshapes — no gather ops.
    """
    assert n_fft % hop == 0, "n_fft must be a multiple of hop for TPU framing"
    r = n_fft // hop
    pad = n_fft // 2
    t = num_frames(x.shape[0], hop)

    x = jnp.pad(x, (pad, pad), mode="reflect")
    # Zero-pad up to a whole number of hop blocks covering the last frame.
    total = (t + r - 1) * hop
    x = jnp.pad(x, (0, max(0, total - x.shape[0])))[:total]
    blocks = x.reshape(t + r - 1, hop)
    # frame[i] = concat(blocks[i], blocks[i+1], ..., blocks[i+r-1])
    return jnp.concatenate([blocks[i : i + t] for i in range(r)], axis=1)


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Overlap-add ``(T, n_fft)`` frames at stride ``hop`` -> 1-D signal.

    Static pad-and-sum over ``r = n_fft // hop`` shifted chunk grids; XLA
    fuses this into a few vector adds (no scatter).
    """
    t, n_fft = frames.shape
    assert n_fft % hop == 0
    r = n_fft // hop
    chunks = frames.reshape(t, r, hop)
    acc = jnp.zeros((t + r - 1, hop), frames.dtype)
    for j in range(r):
        acc = acc + jnp.pad(chunks[:, j, :], ((j, r - 1 - j), (0, 0)))
    return acc.reshape(-1)


def stft(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 256,
    window: jnp.ndarray | None = None,
    normalized: bool = True,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Centered STFT of a 1-D signal -> complex ``(n_fft//2 + 1, T)``.

    Matches ``torchaudio.functional.spectrogram(power=None, normalized=True)``
    (reference ``audio/functions.py:53-59``): Hann window, reflect-centered,
    output divided by ``sqrt(sum(window**2))``.
    """
    if window is None:
        window = jnp.asarray(hann_window(n_fft))
    frames = frame_signal(x.astype(jnp.float32), n_fft, hop) * window[None, :]
    cos_b, sin_b = (jnp.asarray(b) for b in _dft_bases(n_fft))
    real = jnp.matmul(frames, cos_b, precision=precision)
    imag = -jnp.matmul(frames, sin_b, precision=precision)
    if normalized:
        scale = jax.lax.rsqrt(jnp.sum(window.astype(jnp.float32) ** 2))
        real = real * scale
        imag = imag * scale
    return jax.lax.complex(real, imag).T  # (n_bins, T)


def istft_real_imag(
    real: jnp.ndarray,
    imag: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 256,
    window: jnp.ndarray | None = None,
    normalized: bool = True,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Inverse STFT from real/imag parts of shape ``(n_bins, T)``.

    Matches ``torch.istft(center=True, length=None)`` after the
    ``normalized=True`` rescale that ``torchaudio.functional
    .inverse_spectrogram`` applies (reference ``audio/functions.py:130-137``).
    Returns a 1-D signal of length ``(T - 1) * hop``.
    """
    if window is None:
        window = jnp.asarray(hann_window(n_fft))
    window = window.astype(jnp.float32)
    if normalized:
        scale = jnp.sqrt(jnp.sum(window**2))
        real = real * scale
        imag = imag * scale

    cos_ib, sin_ib = (jnp.asarray(b) for b in _idft_bases(n_fft))
    # (T, n_bins) @ (n_bins, n_fft) -> (T, n_fft) time frames, on the MXU.
    frames = jnp.matmul(real.T, cos_ib, precision=precision) + jnp.matmul(
        imag.T, sin_ib, precision=precision
    )
    frames = frames * window[None, :]
    y = overlap_add(frames, hop)

    # Window-square envelope for COLA normalization (identical per frame).
    t = real.shape[1]
    w2 = (window**2).reshape(1, -1)
    env = overlap_add(jnp.broadcast_to(w2, (t, n_fft)), hop)
    y = y / jnp.maximum(env, 1e-11)

    pad = n_fft // 2
    return y[pad : pad + signal_length(t, hop)]


def istft(
    z: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 256,
    window: jnp.ndarray | None = None,
    normalized: bool = True,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Inverse STFT from a complex ``(n_bins, T)`` spectrogram."""
    return istft_real_imag(
        jnp.real(z), jnp.imag(z), n_fft, hop, window, normalized, precision
    )
