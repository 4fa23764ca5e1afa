"""Unit tests for the corpus-referenced spectral metric (scripts/eval_quality.py).

The metric exists because spectral flatness is confounded across growth
stages (VALIDATION.md r3); these tests pin the two properties the
write-up relies on: gain invariance and frequency discrimination.
"""

import importlib.util
import os

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "eval_quality",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "eval_quality.py"),
)
eval_quality = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(eval_quality)

SR = 44100


def _tone(freq, seconds=1.0, amp=0.5, phase=0.0):
    t = np.arange(int(SR * seconds)) / SR
    return amp * np.sin(2 * np.pi * freq * t + phase)


def test_band_profile_gain_invariant():
    w = _tone(440.0) + 0.01 * np.random.default_rng(0).normal(size=SR)
    a = eval_quality.band_profile(w, SR)
    b = eval_quality.band_profile(w * 10.0, SR)
    np.testing.assert_allclose(a, b, atol=1e-9)
    assert a.shape == (eval_quality.N_BANDS,)
    assert np.isfinite(a).all()


def test_band_profile_discriminates_pitch():
    a1 = eval_quality.band_profile(_tone(440.0), SR)
    a2 = eval_quality.band_profile(_tone(440.0, amp=0.2, phase=1.3), SR)
    b = eval_quality.band_profile(_tone(1320.0), SR)

    def dist(x, y):
        return float(np.sqrt(((x - y) ** 2).mean()))

    assert dist(a1, a2) < 0.1 * dist(a1, b)


def test_band_profile_low_band_interpolation_finite():
    # Low log-spaced bands are narrower than one FFT bin; the interp
    # fallback must keep every band finite even for lowpass content.
    w = _tone(50.0)
    prof = eval_quality.band_profile(w, SR)
    assert np.isfinite(prof).all()


def test_inter_sample_dist_detects_mode_collapse():
    """The diversity axis (VERDICT r3 item 4): identical samples score ~0,
    spectrally distinct samples score high — so a checkpoint can't win
    'most corpus-like' by rendering one corpus track from every seed."""
    freqs = [220.0, 440.0, 880.0, 1760.0]
    diverse = np.stack(
        [eval_quality.band_profile(_tone(f), SR) for f in freqs]
    )
    collapsed = np.stack(
        [eval_quality.band_profile(_tone(440.0, phase=p), SR)
         for p in (0.0, 0.5, 1.0, 1.5)]
    )
    d_div = eval_quality.inter_sample_dist(diverse)
    d_col = eval_quality.inter_sample_dist(collapsed)
    assert d_col < 0.1 * d_div
    # degenerate input: a single sample has no pairwise distance
    assert np.isnan(eval_quality.inter_sample_dist(diverse[:1]))
