"""Host-side audio I/O (replaces the reference's torchaudio load/save calls).

The reference decodes audio with ``torchaudio.load`` and writes with
``torchaudio.save`` (reference ``audio/functions.py:43,139``) — which gives
it every format its torchaudio backend decodes, not just WAV.  Here, the
zero-dependency path goes through ``scipy.io.wavfile`` with
torchaudio-compatible normalization (integer PCM scaled to [-1, 1)); for
non-WAV files (mp3/flac/ogg/...) :func:`load_wav` falls back to
``soundfile`` or ``torchaudio`` WHEN INSTALLED, matching the reference's
format breadth without adding a hard dependency.  Device compute never
touches this module.
"""

from __future__ import annotations

import numpy as np
from scipy.io import wavfile

__all__ = ["load_wav", "save_wav"]


def _decode_via_optional_backends(path: str):
    """Best-effort decode through optional libraries: ``soundfile`` first
    (lighter), then ``torchaudio`` (the reference's own decoder — also the
    fallback when soundfile is installed but its libsndfile lacks the
    codec, e.g. mp3 before libsndfile 1.2).  Returns ``(mono_float32,
    sample_rate)``, None when neither is importable, or raises when an
    installed decoder failed on a real decode error."""
    first_error: Exception | None = None
    try:
        import soundfile  # type: ignore

        data, sr = soundfile.read(path, dtype="float32", always_2d=True)
        return data.mean(axis=1).astype(np.float32), int(sr)
    except ImportError:
        pass
    except Exception as e:  # importable but failed: try torchaudio first
        first_error = e
    try:
        import torchaudio  # type: ignore

        wav, sr = torchaudio.load(path)  # (channels, n), float32 [-1, 1]
        return wav.mean(0).numpy().astype(np.float32), int(sr)
    except ImportError:
        if first_error is not None:
            raise ValueError(
                f"soundfile could not decode {path!r}: {first_error}"
            ) from first_error
        return None
    except Exception as e:
        raise ValueError(
            f"no installed decoder could read {path!r}: "
            f"torchaudio: {e}"
            + (f"; soundfile: {first_error}" if first_error else "")
        ) from e

_PCM_SCALE = {
    np.dtype(np.int16): 1 << 15,
    np.dtype(np.int32): 1 << 31,
    np.dtype(np.uint8): 1 << 7,
}


def load_wav(path: str, expected_sample_rate: int | None = None):
    """Read a WAV file -> (mono float32 signal in [-1, 1], sample_rate).

    Multi-channel audio is averaged to mono, matching reference
    ``audio/functions.py:49``.  Non-WAV formats decode through soundfile
    or torchaudio when installed (see module docstring).
    """
    try:
        sr, data = wavfile.read(path)
    except ValueError as e:
        # Not RIFF/WAV: try the optional decoders the reference relies on.
        decoded = _decode_via_optional_backends(path)
        if decoded is None:
            raise ValueError(
                f"{path!r} is not a WAV file and no optional audio decoder "
                "is installed — `pip install soundfile` (or torchaudio) "
                "for mp3/flac/ogg support, matching the reference's "
                "torchaudio.load breadth"
            ) from e
        data, sr = decoded  # already mono float32; shared checks below
    if expected_sample_rate is not None and sr != expected_sample_rate:
        raise ValueError(
            f"Audio sample rate must be {expected_sample_rate}Hz, "
            f'file "{path}" is {sr}Hz'
        )
    if data.dtype in _PCM_SCALE:
        scale = _PCM_SCALE[np.dtype(data.dtype)]
        if data.dtype == np.uint8:  # 8-bit WAV is unsigned, offset binary
            data = data.astype(np.float32) - 128.0
        data = data.astype(np.float32) / scale
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1)
    return data, sr


def save_wav(path: str, signal: np.ndarray, sample_rate: int) -> None:
    """Write a mono float waveform as a 32-bit float WAV."""
    wavfile.write(path, sample_rate, np.asarray(signal, dtype=np.float32))
