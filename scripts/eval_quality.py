"""Corpus-referenced spectral quality metric for audition outputs.

Spectral flatness (the VALIDATION.md tonality proxy) is confounded
across growth stages: partial-growth checkpoints synthesize through the
upsampling vocoder, which smooths spectra and reads as "tonal" no matter
what the generator learned.  This script measures something flatness
cannot: **how close each checkpoint's output spectra are to the training
corpus's own spectra** (the quantity WGAN training actually optimizes —
the reference's goal is corpus-like audio, `README.md:5`).

Metric: long-term average log-magnitude profile on a log-frequency band
grid (gain-normalized), compared per generated sample against every
corpus track's profile; a sample's score is its distance to the NEAREST
corpus track (the corpus spans many keys/timbres — matching any one of
them is success), and a checkpoint's score is the mean over samples.
Lower = closer to the corpus.  Also reports the checkpoint-mean profile
distance to the corpus-mean profile (a mode-coverage-insensitive
variant).

Diversity axis (guards the corpus-likeness claim against mode collapse —
nearest-track distance can be WON by collapsing onto one corpus track):

* ``inter_sample_dist``: mean pairwise RMS distance between the
  checkpoint's own sample profiles — ~0 means every seed renders the
  same spectrum.  For calibration the script prints the corpus's own
  inter-track distance: a healthy model sits well above 0 and below or
  near the corpus spread.
* ``nearest_track_coverage``: fraction of distinct corpus tracks chosen
  as "nearest" across the samples — collapse shows up as every seed
  matching the SAME track.  Meaningful from ~8 seeds up.

Usage:
  python scripts/eval_quality.py AUDITION_DIR --corpus /root/corpus_r3/wav
"""

from __future__ import annotations

# Runnable from any cwd: put the repo root (this file's parent's parent)
# on sys.path so `musicgan_tpu` imports without installation.
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import argparse
import glob
import json
import os
import re
from collections import defaultdict

import numpy as np


N_BANDS = 48
F_LO, F_HI = 40.0, 10000.0
N_FFT = 2048


def band_profile(wav: np.ndarray, sr: int) -> np.ndarray:
    """Gain-normalized log-power profile over log-spaced bands."""
    wav = np.asarray(wav, np.float64)
    if len(wav) < N_FFT:
        raise ValueError(
            f"waveform too short for a spectral profile: {len(wav)} "
            f"samples < N_FFT={N_FFT} (truncated/corrupt WAV?)"
        )
    n = (len(wav) // N_FFT) * N_FFT
    frames = wav[:n].reshape(-1, N_FFT) * np.hanning(N_FFT)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    power = spec.mean(axis=0)  # long-term average spectrum
    freqs = np.fft.rfftfreq(N_FFT, 1.0 / sr)
    edges = np.geomspace(F_LO, F_HI, N_BANDS + 1)
    centers = np.sqrt(edges[:-1] * edges[1:])
    logp = np.log10(power + 1e-20)
    prof = np.empty(N_BANDS)
    for i in range(N_BANDS):
        sel = (freqs >= edges[i]) & (freqs < edges[i + 1])
        # low bands can be narrower than one FFT bin — interpolate there
        prof[i] = (np.log10(power[sel].mean() + 1e-20) if sel.any()
                   else float(np.interp(centers[i], freqs, logp)))
    return prof - prof.mean()  # gain-invariant


def inter_sample_dist(profiles: np.ndarray) -> float:
    """Mean pairwise RMS distance between band profiles ``(S, B)`` — the
    mode-collapse detector: ~0 when every sample has the same spectrum."""
    s = len(profiles)
    if s < 2:
        return float("nan")
    d = np.sqrt(
        ((profiles[:, None, :] - profiles[None, :, :]) ** 2).mean(axis=2)
    )
    return float(d[np.triu_indices(s, k=1)].mean())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("audition_dir")
    ap.add_argument("--corpus", required=True,
                    help="directory of corpus WAV tracks")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from musicgan_tpu.audio.io import load_wav

    corpus_profiles = []
    for p in sorted(glob.glob(os.path.join(args.corpus, "*.wav"))):
        wav, sr = load_wav(p)
        corpus_profiles.append(band_profile(wav, sr))
    corpus = np.stack(corpus_profiles)  # (T, B)
    corpus_mean = corpus.mean(axis=0)
    corpus_spread = inter_sample_dist(corpus)
    print(f"corpus: {len(corpus)} tracks, {N_BANDS} bands "
          f"{F_LO:.0f}-{F_HI:.0f} Hz, inter-track dist "
          f"{corpus_spread:.4f} (diversity calibration)")

    per_save: dict[int, list[np.ndarray]] = defaultdict(list)
    for p in sorted(glob.glob(os.path.join(args.audition_dir, "*.wav"))):
        m = re.match(r"save(\d+)_", os.path.basename(p))
        if not m:
            continue
        wav, sr = load_wav(p)
        per_save[int(m.group(1))].append(band_profile(wav, sr))

    results = {"corpus_inter_track_dist": corpus_spread}
    print(f"\n{'save':>5} {'nearest-track dist':>19} {'mean-profile dist':>18}"
          f" {'inter-sample dist':>18} {'coverage':>9}")
    for k in sorted(per_save):
        gen = np.stack(per_save[k])  # (S, B)
        # per-sample RMS distance to the nearest corpus track
        dists = np.sqrt(((gen[:, None, :] - corpus[None, :, :]) ** 2)
                        .mean(axis=2))
        d = dists.min(axis=1)
        nearest = float(d.mean())
        mean_d = float(np.sqrt(((gen.mean(axis=0) - corpus_mean) ** 2)
                               .mean()))
        diversity = inter_sample_dist(gen)
        coverage = float(
            len(set(dists.argmin(axis=1).tolist())) / len(gen)
        )
        results[k] = {"nearest_track_dist": nearest,
                      "mean_profile_dist": mean_d,
                      "inter_sample_dist": diversity,
                      "nearest_track_coverage": coverage,
                      "n_samples": len(gen)}
        print(f"{k:>5} {nearest:>19.4f} {mean_d:>18.4f} "
              f"{diversity:>18.4f} {coverage:>9.2f}")

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
