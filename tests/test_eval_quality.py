"""Tests for the evaluation subsystem (musicgan_tpu/evaluate.py and its
script/CLI wrappers).

The corpus-referenced metric exists because spectral flatness is
confounded across growth stages (VALIDATION.md r3); the unit tests pin
the two properties the write-up relies on: gain invariance and frequency
discrimination.  The end-to-end test drives the full eval surface
(train -> audition -> score) the way ``musicgan_tpu eval`` does.
"""

import importlib.util
import json
import os
import sys

import numpy as np

from musicgan_tpu import evaluate as eval_quality  # metric under test

# the script wrapper must keep re-exporting the metric symbols (notebooks
# and older tooling import them from there)
_SCRIPTS = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "scripts")
)
_spec = importlib.util.spec_from_file_location(
    "eval_quality_script", os.path.join(_SCRIPTS, "eval_quality.py")
)
_script = importlib.util.module_from_spec(_spec)
# scripts/ rely on python's run-as-script contract (sys.path[0] = script
# dir) for their shared `import _bootstrap`; emulate it for exec_module
sys.path.insert(0, _SCRIPTS)
try:
    _spec.loader.exec_module(_script)
finally:
    sys.path.remove(_SCRIPTS)
assert _script.band_profile is eval_quality.band_profile
assert _script.inter_sample_dist is eval_quality.inter_sample_dist

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


def test_audition_and_score_end_to_end(tmp_path):
    """The `musicgan_tpu eval` surface: a tiny training run's checkpoints
    are auditioned (WAVs + summary JSONs at each save's recorded stage)
    and scored against a corpus — exercising restore, EMA selection,
    synthesis, save_wav, and the score table in one pass."""
    from tiny_cfg import TINY_MODEL

    from musicgan_tpu.audio.ingest import ShardWriter
    from musicgan_tpu.audio.io import save_wav
    from musicgan_tpu.config import TrainConfig
    from musicgan_tpu.evaluate import audition_run, score_auditions
    from musicgan_tpu.train import train

    w = ShardWriter(str(tmp_path / "ds"), samples_per_shard=6)
    w.add(np.random.default_rng(0)
          .uniform(-1, 1, (12, 2, 512, 512)).astype(np.float32))
    w.close()
    cfg = TrainConfig(batch_size=4, save_every=3, log_every=10,
                      nb_preview=1, chunk_steps=1, ema_decay=0.99)
    run_dir = str(tmp_path / "run")
    train("eval_e2e", str(tmp_path / "ds"), run_dir, cfg, TINY_MODEL,
          max_iters=4, mesh=None)

    out = audition_run(run_dir, seeds=2, nb_vec=1, model_cfg=TINY_MODEL,
                       verbose=False)
    wavs = sorted(f for f in os.listdir(out) if f.endswith(".wav"))
    assert len(wavs) >= 2  # >=1 save x 2 seeds
    with open(os.path.join(
            out, sorted(f for f in os.listdir(out)
                        if f.endswith(".json"))[0])) as f:
        summary = json.load(f)
    assert summary["ema"] is True  # EMA weights picked when present
    assert len(summary["flatness"]) == 2

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    t = np.arange(SR) / SR
    for i, f0 in enumerate((220.0, 880.0)):
        save_wav(str(corpus / f"tone{i}.wav"),
                 (0.4 * np.sin(2 * np.pi * f0 * t)).astype(np.float32), SR)

    res = score_auditions(out, str(corpus),
                          json_out=str(tmp_path / "scores.json"),
                          verbose=False)
    assert np.isfinite(res["corpus_inter_track_dist"])
    save_keys = [k for k in res if isinstance(k, int)]
    assert save_keys, "no per-save scores produced"
    row = res[save_keys[0]]
    assert set(row) == {"nearest_track_dist", "mean_profile_dist",
                        "inter_sample_dist", "nearest_track_coverage",
                        "n_samples", "nearest_temporal_dist",
                        "temporal_inter_sample_dist"}
    assert row["n_samples"] == 2
    assert np.isfinite(row["nearest_track_dist"])
    assert np.isfinite(row["nearest_temporal_dist"])
    assert np.isfinite(res["corpus_temporal_spread"])
    with open(tmp_path / "scores.json") as f:
        assert json.load(f)  # table persisted

    # --- head-to-head artifact comparison over the same latents ---------
    from musicgan_tpu.evaluate import compare_artifacts

    cmp_res = compare_artifacts(
        [run_dir, run_dir], str(corpus), seeds=2, nb_vec=1,
        json_out=str(tmp_path / "cmp.json"), model_cfg=TINY_MODEL,
        verbose=False,
    )
    assert cmp_res["artifacts"] == {"0": run_dir, "1": run_dir}
    # identical weights + identical latents => identical scores
    assert (cmp_res[0]["nearest_track_dist"]
            == cmp_res[1]["nearest_track_dist"])
    with open(tmp_path / "cmp.json") as f:
        assert "artifacts" in json.load(f)


def _click_train(rate_hz, seconds=20.0, amp=0.8, offset=0.0):
    """Decaying-noise clicks at a fixed rate: same long-term spectrum for
    any rate (same click timbre), different rhythm."""
    n = int(SR * seconds)
    sig = np.zeros(n)
    rng = np.random.default_rng(3)
    click = rng.standard_normal(2048) * np.exp(-np.linspace(0, 8, 2048))
    pos = offset
    while pos < seconds:
        i0 = int(pos * SR)
        i1 = min(i0 + len(click), n)
        sig[i0:i1] += click[: i1 - i0]
        pos += 1.0 / rate_hz
    return amp * sig / np.abs(sig).max()


def test_temporal_profile_gain_invariant():
    w = _click_train(2.0)
    a = eval_quality.temporal_profile(w, SR)
    b = eval_quality.temporal_profile(w * 10.0, SR)
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_temporal_profile_discriminates_tempo_not_phase():
    """The axis the spectral profile is blind to: 2 Hz vs 5 Hz click
    trains share a long-term spectrum (same click) but must be far apart
    temporally, while a time-shifted same-tempo train stays close."""
    a = eval_quality.temporal_profile(_click_train(2.0), SR)
    a_shift = eval_quality.temporal_profile(_click_train(2.0, offset=0.21),
                                            SR)
    b = eval_quality.temporal_profile(_click_train(5.0), SR)

    def rms(x, y):
        return float(np.sqrt(((x - y) ** 2).mean()))

    assert rms(a, a_shift) * 3 < rms(a, b)

    # ...and the SPECTRAL profile indeed cannot separate them (the blind
    # spot this axis exists for)
    sa = eval_quality.band_profile(_click_train(2.0), SR)
    sb = eval_quality.band_profile(_click_train(5.0), SR)
    assert rms(sa, sb) < 0.5 * rms(a, b)


def test_temporal_profile_short_input_is_flat_not_crash():
    w = np.random.default_rng(0).uniform(-1, 1, 4096)  # 4 frames
    prof = eval_quality.temporal_profile(w, SR)
    assert prof.shape == (eval_quality.M_BANDS,)
    np.testing.assert_array_equal(prof, 0.0)


# ---------------------------------------------------------------- holdout ---


def _make_tone_dir(path, freqs, seconds=1.0):
    from musicgan_tpu.audio.io import save_wav

    os.makedirs(path, exist_ok=True)
    for i, f0 in enumerate(freqs):
        # a per-track noise floor keeps the log-band profile off the
        # silence floor (a PURE tone's empty bands sit at log10(1e-20),
        # where any perturbation dominates every distance)
        w = _tone(f0, seconds=seconds) + 0.01 * np.random.default_rng(
            100 + i
        ).normal(size=int(SR * seconds))
        save_wav(os.path.join(path, f"tone{i}.wav"),
                 w.astype(np.float32), SR)


def test_split_holdout_deterministic_and_disjoint(tmp_path):
    freqs = [200.0 * 1.3**k for k in range(8)]
    _make_tone_dir(str(tmp_path / "corpus"), freqs)
    a = eval_quality.split_holdout(str(tmp_path / "corpus"), 0.25, 17)
    b = eval_quality.split_holdout(str(tmp_path / "corpus"), 0.25, 17)
    assert a == b  # same flag value names the same split, always
    train, hold = a
    assert len(hold) == 2 and len(train) == 6
    assert not set(train) & set(hold)
    c_train, c_hold = eval_quality.split_holdout(
        str(tmp_path / "corpus"), 0.25, 18
    )
    assert (c_train, c_hold) != a  # seed actually selects the split


def test_holdout_gap_separates_memorization_from_generalization(tmp_path):
    """The axis VERDICT r4 item 4 asks for: a 'generator' that replays
    TRAIN tracks shows a large positive holdout_gap (memorization), one
    that replays HELD-OUT tracks shows a negative gap — from the same
    score_auditions call."""
    freqs = [200.0 * 1.3**k for k in range(8)]
    corpus = str(tmp_path / "corpus")
    _make_tone_dir(corpus, freqs)
    train_files, hold_files = eval_quality.split_holdout(corpus, 0.25, 17)

    audit = tmp_path / "audit"
    audit.mkdir()
    import shutil

    # save 0 "memorizes": exact replays of two TRAIN tracks
    for s, src in enumerate(train_files[:2]):
        shutil.copy(src, str(audit / f"save000_ID{s}.wav"))
    # save 1 "generalizes past the train set": replays of HELD-OUT tracks
    for s, src in enumerate(hold_files[:2]):
        shutil.copy(src, str(audit / f"save001_ID{s}.wav"))

    res = eval_quality.score_auditions(
        str(audit), corpus, verbose=False, holdout_frac=0.25,
        holdout_seed=17,
    )
    assert np.isfinite(res["holdout_to_train_dist"])
    assert res["n_holdout_tracks"] == 2
    memo, gen = res[0], res[1]
    assert memo["nearest_track_dist"] < 1e-9      # sits ON a train track
    assert memo["holdout_gap"] > 0.1              # far from held-out ones
    assert gen["nearest_holdout_dist"] < 1e-9     # sits ON a held-out track
    assert gen["holdout_gap"] < -0.1
    # the memorizer is closer to the train set than ANY real unseen track
    # gets — the calibration read the docstring describes
    assert memo["nearest_track_dist"] < res["holdout_to_train_dist"]

    # --- explicit --holdout-dir variant: same numbers, same semantics ----
    hold_dir = str(tmp_path / "held")
    os.makedirs(hold_dir)
    import shutil

    train_dir = str(tmp_path / "train_only")
    os.makedirs(train_dir)
    for f in hold_files:
        shutil.copy(f, hold_dir)
    for f in train_files:
        shutil.copy(f, train_dir)
    res2 = eval_quality.score_auditions(
        str(audit), train_dir, verbose=False, holdout_dir=hold_dir,
    )
    np.testing.assert_allclose(
        res2[0]["holdout_gap"], memo["holdout_gap"], atol=1e-12
    )

    # both flags together is a user error, not a silent choice
    import pytest

    with pytest.raises(ValueError, match="either holdout_frac or"):
        eval_quality.score_auditions(
            str(audit), corpus, verbose=False,
            holdout_frac=0.25, holdout_dir=hold_dir,
        )
