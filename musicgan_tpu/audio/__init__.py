"""Audio subsystem: STFT <-> magn/phase transforms, WAV I/O, batch transforms.

Mirrors the reference's ``music_gan/audio`` public surface
(reference ``audio/__init__.py:1-12``) with TPU-native internals.
"""

from ..config import AudioConfig
from .functions import (
    bark_magn_scale,
    bark_scale_vector,
    magn_phase_to_signal,
    mp_to_real_imag,
    signal_to_stft,
    stft_to_phase_magn,
    unwrap,
    wav_to_stft,
)
from .io import load_wav, save_wav
from .rebin import rebin, rebin_operator, scale_frequencies, unbin
from .stft import hann_window, istft, istft_real_imag, stft
from .transforms import (
    change_range,
    channel_min_max_norm,
    grower_transform,
    resize_batch,
)

_cfg = AudioConfig()
N_FFT = _cfg.n_fft
N_VEC = _cfg.n_vec
STFT_STRIDE = _cfg.stft_stride
SAMPLE_RATE = _cfg.sample_rate

__all__ = [
    "AudioConfig",
    "N_FFT",
    "N_VEC",
    "STFT_STRIDE",
    "SAMPLE_RATE",
    "bark_magn_scale",
    "bark_scale_vector",
    "change_range",
    "channel_min_max_norm",
    "grower_transform",
    "hann_window",
    "istft",
    "istft_real_imag",
    "load_wav",
    "magn_phase_to_signal",
    "mp_to_real_imag",
    "rebin",
    "rebin_operator",
    "resize_batch",
    "save_wav",
    "scale_frequencies",
    "signal_to_stft",
    "stft",
    "stft_to_phase_magn",
    "unbin",
    "unwrap",
    "wav_to_stft",
]
