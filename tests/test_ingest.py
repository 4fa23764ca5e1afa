"""Ingest pipeline tests: numpy mirror == JAX device path, shard round-trip,
loader sharding."""

import os

import numpy as np

import jax.numpy as jnp

from musicgan_tpu.audio import functions as fn
from musicgan_tpu.audio import ingest
from musicgan_tpu.audio.dataset import SpectrogramDataset, batch_iterator
from musicgan_tpu.audio.io import save_wav
from musicgan_tpu.config import AudioConfig

CFG = AudioConfig()


def _make_wav(path, seconds=3.2, freq=440.0):
    sr = CFG.sample_rate
    t = np.arange(int(sr * seconds)) / sr
    sig = (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    save_wav(path, sig, sr)
    return sig


def test_numpy_pipeline_matches_jax(tmp_path, rng):
    # Broadband noise: every STFT bin carries real energy, so phases are
    # numerically well-defined.  (For near-silent bins the STFT value is
    # rounding noise and its angle is implementation-defined garbage — in
    # the torch reference just as much as here.)
    p = str(tmp_path / "a.wav")
    sr = CFG.sample_rate
    sig = (rng.standard_normal(int(sr * 3.5)) * 0.3).astype(np.float32)
    save_wav(p, sig, sr)
    chunks_np = ingest.process_wav(p)

    z = fn.signal_to_stft(jnp.asarray(np.asarray(load_back(p))))
    magn, phase = fn.stft_to_phase_magn(z)
    chunks_jax = np.asarray(jnp.stack([magn, phase], axis=1))

    assert chunks_np.shape == chunks_jax.shape
    np.testing.assert_allclose(chunks_np, chunks_jax, atol=2e-3)


def load_back(path):
    from musicgan_tpu.audio.io import load_wav

    return load_wav(path)[0]


def test_short_track_skipped(tmp_path):
    p = str(tmp_path / "short.wav")
    _make_wav(p, seconds=0.5)
    assert ingest.process_wav(p) is None


def test_create_dataset_and_loader(tmp_path):
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    for i in range(3):
        _make_wav(str(wav_dir / f"t{i}.wav"), seconds=3.2, freq=220.0 * (i + 1))
    out = str(tmp_path / "ds")
    index = ingest.create_dataset(
        str(wav_dir / "*.wav"), out, num_workers=2, samples_per_shard=2,
        progress=False,
    )
    assert index["errors"] == []
    assert index["total_samples"] == 3  # one 512-frame chunk per 3.2s track
    assert os.path.isfile(os.path.join(out, "index.json"))

    ds = SpectrogramDataset(out)
    assert len(ds) == 3
    s = ds[0]
    assert s.shape == (2, 512, 512) and s.dtype == np.float32
    assert -1.0 - 1e-5 <= s.min() and s.max() <= 1.0 + 1e-5

    batches = list(batch_iterator(ds, 2, seed=0))
    assert len(batches) == 1 and batches[0].shape == (2, 2, 512, 512)


def test_create_dataset_bare_directory_recursive_case_insensitive(tmp_path):
    """A bare corpus directory expands recursively and case-insensitively
    (CD rippers write TRACK01.WAV; albums live in subdirectories) -- the
    glob form stays untouched."""
    wav_dir = tmp_path / "corpus"
    (wav_dir / "album1").mkdir(parents=True)
    _make_wav(str(wav_dir / "TRACK01.WAV"), seconds=3.2, freq=220.0)
    _make_wav(str(wav_dir / "album1" / "t2.wav"), seconds=3.2, freq=330.0)
    (wav_dir / "notes.txt").write_text("not audio")
    out = str(tmp_path / "ds")
    index = ingest.create_dataset(
        str(wav_dir), out, num_workers=1, samples_per_shard=2,
        progress=False,
    )
    assert index["errors"] == []
    assert index["total_samples"] == 2


def test_batch_iterator_producer_exits_when_abandoned():
    """An abandoned mid-epoch iterator (e.g. a ``max_iters`` break) must not
    leak its producer thread blocked on a full queue."""
    import threading
    import time

    class Slow:
        def __len__(self):
            return 64

        def gather(self, idx):
            return np.zeros((len(idx), 1), np.float32)

    before = threading.active_count()
    it = batch_iterator(Slow(), 2, seed=0, prefetch=1)
    next(it)  # producer is now running and ahead
    it.close()  # abandon mid-epoch -> stop event fires in the finally
    deadline = time.monotonic() + 5.0
    while threading.active_count() > before and time.monotonic() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_batch_iterator_host_sharding(tmp_path):
    """Hosts see disjoint per-batch blocks of one global permutation, and
    interleaving host batches reconstructs the single-host batch stream
    exactly (the invariant the multi-host equality test relies on)."""
    wav_dir = tmp_path / "w"
    wav_dir.mkdir()
    _make_wav(str(wav_dir / "long.wav"), seconds=3.05 * 8)
    out = str(tmp_path / "ds")
    ingest.create_dataset(str(wav_dir / "*.wav"), out, num_workers=1,
                          progress=False)
    ds = SpectrogramDataset(out)
    n = len(ds)
    assert n >= 4

    def collect(host, hosts, batch):
        return list(batch_iterator(ds, batch, seed=7, host_id=host,
                                   num_hosts=hosts))

    a = collect(0, 2, 1)
    b = collect(1, 2, 1)
    single = collect(0, 1, 2)
    assert len(a) == len(b) == len(single) == n // 2
    # disjoint: no identical sample arrays between the two hosts
    for x in a:
        for y in b:
            assert not np.array_equal(x, y)
    # global-batch parity: [host0 block; host1 block] == single-host batch
    for x, y, s in zip(a, b, single):
        np.testing.assert_array_equal(np.concatenate([x, y], axis=0), s)


def test_reference_pt_directory_compat(tmp_path):
    import torch

    d = tmp_path / "ptds"
    d.mkdir()
    for i in range(3):
        torch.save(
            torch.rand(2, 512, 512, dtype=torch.float64) * 2 - 1,
            str(d / f"magn_phase_{i}.pt"),
        )
    ds = SpectrogramDataset(str(d))
    assert len(ds) == 3
    x = ds[1]
    assert x.shape == (2, 512, 512) and x.dtype == np.float32
    # device-dataset mode materializes .pt dirs through the same loader
    full = ds.as_array()
    assert full.shape == (3, 2, 512, 512) and full.dtype == np.float32
    np.testing.assert_array_equal(full[1], x)


def test_load_uint8_wav(tmp_path):
    from scipy.io import wavfile

    from musicgan_tpu.audio.io import load_wav

    sig8 = (np.sin(2 * np.pi * 440 * np.arange(4410) / 44100) * 100 + 128)
    wavfile.write(str(tmp_path / "u8.wav"), 44100, sig8.astype(np.uint8))
    sig, sr = load_wav(str(tmp_path / "u8.wav"))
    assert sr == 44100 and sig.dtype == np.float32
    assert 0.7 < np.abs(sig).max() <= 1.0  # 100/128 scaled into [-1, 1]


def test_phase_diff_equals_unwrap_then_diff(rng):
    """The elementwise wrapped difference == diff(unwrap(phase)) — the
    cumsum in unwrap cancels under the diff, so the ingest pipeline can
    skip it (and its float accumulation) entirely."""
    ph = rng.uniform(-np.pi, np.pi, (64, 400)).astype(np.float32)
    # Near-real bins produce EXACT +-float32(pi) angles whose diff exceeds
    # true pi — the parity-critical edge case (sign of the wrap flips).
    ph[0, ::2], ph[0, 1::2] = np.float32(np.pi), 0.0
    ph[1, ::2], ph[1, 1::2] = 0.0, np.float32(-np.pi)
    want = np.diff(np.unwrap(ph.astype(np.float64), axis=1), axis=1)
    got = ingest._phase_diff_np(ph)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_process_signal_torch_tail_matches_numpy(rng):
    """The ATen-kernel post-FFT tail is numerically equal to the numpy
    default (kept for hosts where ATen wins)."""
    sr = 44100
    sig = (
        0.2 * np.sin(2 * np.pi * 330 * np.arange(sr * 4) / sr)
        + 0.05 * rng.standard_normal(sr * 4)
    ).astype(np.float32)
    a = ingest.process_signal(sig, backend="numpy")
    b = ingest.process_signal(sig, backend="torch")
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_view_audio_workflow(tmp_path):
    """WAV -> magnitude/phase PNG pair, headless (reference
    ``view_audio.py:6-26``)."""
    from musicgan_tpu.view_audio import view_audio

    p = str(tmp_path / "v.wav")
    _make_wav(p, seconds=3.2, freq=440.0)
    out = str(tmp_path / "imgs")
    paths = view_audio(p, 0, save=True, output_dir=out)
    assert len(paths) == 2
    for f in paths:
        assert os.path.isfile(f) and os.path.getsize(f) > 1000
        assert f.endswith(".png")


def test_streaming_ingest_refresh(tmp_path):
    """A trainer opened mid-ingest sees a consistent prefix and picks up
    appended shards via refresh(); close() marks the index complete."""
    out = str(tmp_path / "ds")
    w = ingest.ShardWriter(out, samples_per_shard=2)
    sample = np.zeros((2, 4, 4), np.float32)

    w.add(np.stack([sample, sample + 1]))  # flush #1 (2 samples)
    ds = SpectrogramDataset(out)
    assert len(ds) == 2 and not ds.complete

    w.add(np.stack([sample + 2, sample + 3]))  # flush #2
    assert ds.refresh() and len(ds) == 4
    np.testing.assert_array_equal(ds[3], sample + 3)

    w.add(sample[None] + 4)  # buffered, not flushed yet
    assert not ds.refresh() and len(ds) == 4

    index = w.close()  # flushes the remainder + marks complete
    assert index["complete"] and index["total_samples"] == 5
    assert ds.refresh() and len(ds) == 5 and ds.complete
    assert not ds.refresh()  # complete: further refreshes are no-ops


def _native_or_skip():
    import pytest

    from musicgan_tpu import native

    if not native.is_available():
        pytest.skip("no C++ toolchain on this host")
    return native


def test_native_tail_matches_numpy(rng):
    """The fused C++ ingest tail (native/host_ops.cpp) == the numpy mirror
    on a broadband music-like signal, to float32 tolerance."""
    _native_or_skip()
    sr = 44100
    sig = (
        0.2 * np.sin(2 * np.pi * 330 * np.arange(sr * 4) / sr)
        + 0.1 * np.sin(2 * np.pi * 991 * np.arange(sr * 4) / sr)
        + 0.05 * rng.standard_normal(sr * 4)
    ).astype(np.float32)
    a = ingest.process_signal(sig, backend="numpy")
    b = ingest.process_signal(sig, backend="native")
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_native_tail_pure_tone():
    """A pure tone leaves most STFT bins at exact (0, 0) and some at
    negative-zero real parts — atan2's IEEE edge cases.  The native tail
    must match numpy's conventions (arctan2(0,0)=0, arctan2(+-0,-0)=+-pi),
    not produce NaNs."""
    _native_or_skip()
    sr = 44100
    t = np.arange(int(sr * 3.2)) / sr
    sig = (0.4 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    a = ingest.process_signal(sig, backend="numpy")
    b = ingest.process_signal(sig, backend="native")
    assert np.isfinite(b).all()
    assert b.min() >= -1.0 - 1e-5 and b.max() <= 1.0 + 1e-5
    # magnitude channel: exact parity everywhere
    np.testing.assert_allclose(a[:, 0], b[:, 0], atol=2e-6)
    # phase channel: exact parity on carrying bins.  Silent bins have
    # rounding-noise phases whose diffs land within float error of +-pi,
    # where the wrap branch is genuinely ambiguous between any two atan2
    # implementations (numpy vs torch included) — allow a tiny count of
    # branch flips there, nowhere else.
    carrying = a[:, 0] > -0.9
    np.testing.assert_allclose(a[:, 1][carrying], b[:, 1][carrying],
                               atol=2e-6)
    flips = np.abs(a[:, 1] - b[:, 1]) > 1e-4
    assert flips.mean() < 5e-4 and not (flips & carrying).any()


def test_native_tail_sign_flip_edge():
    """Near-real sign-flipping bins hit the exact-±pi wrap edge; the C++
    kernel must take the same branch as the numpy mirror (f64 wrap with the
    positive-jump rule)."""
    native = _native_or_skip()
    from musicgan_tpu.audio.ingest import _bark_scale_np

    n_bins, t, n_vec = 8, 65, 16
    rng = np.random.default_rng(3)
    z = (
        rng.standard_normal((n_bins, t)) + 1j * rng.standard_normal((n_bins, t))
    ).astype(np.complex64)
    # row 0: alternating-sign pure-real values -> angle alternates 0, pi
    z[0] = np.where(np.arange(t) % 2 == 0, 1.0, -1.0).astype(np.complex64)
    bark = _bark_scale_np(n_bins, 44100)

    # the native API takes the frame-major (T, ld) rfft layout
    got = native.magn_phase_pack(np.ascontiguousarray(z.T), bark, n_vec)

    magn = np.abs(z) * bark[:, None]
    phase = ingest._phase_diff_np(np.angle(z))
    magn = magn[:, 1:]
    for a in (magn, phase):
        mn, mx = a.min(), a.max()
        a -= mn
        a *= np.float32(2.0 / (mx - mn))
        a -= np.float32(1.0)
    trim = magn.shape[1] % n_vec
    magn, phase = magn[:, trim:], phase[:, trim:]
    n = magn.shape[1] // n_vec
    want = np.stack(
        [
            magn.reshape(n_bins, n, n_vec).transpose(1, 0, 2),
            phase.reshape(n_bins, n, n_vec).transpose(1, 0, 2),
        ],
        axis=1,
    )
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_native_stream_block_invariance():
    """The streaming kernel API (PackStream) is bit-exact vs the one-shot
    entry for ANY block split — the one-shot IS a single-block stream, so
    this pins the carried state (phase, min/max lanes, staging block)
    across block boundaries."""
    native = _native_or_skip()
    from musicgan_tpu.audio.ingest import _bark_scale_np

    rng = np.random.default_rng(7)
    t, ld, n_bins, n_vec = 131, 17, 16, 32
    z = (
        rng.standard_normal((t, ld)) + 1j * rng.standard_normal((t, ld))
    ).astype(np.complex64)
    bark = _bark_scale_np(n_bins, 44100)
    want = native.magn_phase_pack(z, bark, n_vec)

    for split in (1, 3, 16, 50, t):
        stream = native.PackStream(t, ld, bark, n_vec)
        i = 0
        while i < t:
            nb = min(split, t - i)
            stream.feed(z[i:i + nb])
            i += nb
        got = stream.finish()
        np.testing.assert_array_equal(got, want, err_msg=f"split={split}")


def test_blocked_process_signal_crosses_block_boundaries(rng, monkeypatch):
    """process_signal's blocked native pipeline (window+rfft+pack per
    block) == the numpy mirror when a track spans MANY blocks — the
    whole-track parity tests above fit in one block and would not catch a
    boundary bug in the window/rfft block recycling."""
    import pytest

    _native_or_skip()
    pytest.importorskip("torch")
    monkeypatch.setattr(ingest, "_BLOCK_FRAMES", 97)  # force many blocks
    sr = 44100
    sig = (0.1 * rng.standard_normal(sr * 4)).astype(np.float32)
    a = ingest.process_signal(sig, backend="numpy")
    b = ingest.process_signal(sig, backend="native")
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_pack_stream_guards():
    """Real exceptions (not asserts): misuse must not reach the C layer —
    under ``python -O`` a NULL handle would segfault and an ld mismatch
    would read out of bounds."""
    import pytest

    native = _native_or_skip()
    from musicgan_tpu.audio.ingest import _bark_scale_np

    bark = _bark_scale_np(8, 44100)
    rng = np.random.default_rng(0)
    z = (rng.standard_normal((33, 9)) + 1j * rng.standard_normal((33, 9))
         ).astype(np.complex64)
    stream = native.PackStream(33, 9, bark, 16)
    with pytest.raises(ValueError, match="ld"):
        stream.feed(z[:, :5])
    stream.feed(z)
    with pytest.raises(ValueError, match="overfeed"):
        stream.feed(z[:1])
    stream.finish()
    with pytest.raises(ValueError, match="finished"):
        stream.feed(z)
    with pytest.raises(ValueError, match="finished"):
        stream.finish()
    short = native.PackStream(33, 9, bark, 16)
    short.feed(z[:10])
    with pytest.raises(ValueError, match="fed 10 of 33"):
        short.finish()


def test_one_chunk_boundary_consistent_across_backends():
    """A track with exactly n_vec STFT frames is shorter than one chunk
    (the first-difference drops a frame) — every backend must agree on
    None, not an empty array (the numpy guard previously disagreed)."""
    cfg = AudioConfig()
    # len // stride == n_vec - 1  =>  t == n_vec exactly
    sig = np.zeros((cfg.n_vec - 1) * cfg.stft_stride, np.float32)
    for backend in ("numpy", "torch"):
        assert ingest.process_signal(sig, cfg, backend=backend) is None, backend
    _native_or_skip()  # skips only the native leg on toolchain-less hosts
    assert ingest.process_signal(sig, cfg, backend="native") is None


def test_load_non_wav_without_optional_decoder_raises(tmp_path, monkeypatch):
    """A non-WAV file with neither soundfile nor torchaudio importable must
    fail with an actionable message, not scipy's opaque RIFF error.
    (sys.modules[name] = None forces ImportError even where the backends
    ARE installed, so this holds on any dev machine.)"""
    import sys

    import pytest

    from musicgan_tpu.audio.io import load_wav

    monkeypatch.setitem(sys.modules, "soundfile", None)
    monkeypatch.setitem(sys.modules, "torchaudio", None)
    p = tmp_path / "song.mp3"
    p.write_bytes(b"\xff\xfb\x90\x00" + b"\x00" * 64)  # mp3-ish header
    with pytest.raises(ValueError, match="optional audio decoder"):
        load_wav(str(p))


def test_load_non_wav_soundfile_failure_falls_through_to_torchaudio(
    tmp_path, monkeypatch
):
    """soundfile installed but lacking the codec (libsndfile < 1.2 has no
    mp3) must not end the search — torchaudio, the reference's own
    decoder, is tried next."""
    import sys
    import types

    import torch as th

    from musicgan_tpu.audio.io import load_wav

    bad = types.ModuleType("soundfile")

    def failing_read(path, dtype="float32", always_2d=True):
        raise RuntimeError("Format not recognised")

    bad.read = failing_read
    monkeypatch.setitem(sys.modules, "soundfile", bad)

    mono = np.linspace(-0.5, 0.5, 80, dtype=np.float32)
    fake_ta = types.ModuleType("torchaudio")
    fake_ta.load = lambda path: (th.from_numpy(mono[None, :]), 22050)
    monkeypatch.setitem(sys.modules, "torchaudio", fake_ta)

    p = tmp_path / "song.mp3"
    p.write_bytes(b"\xff\xfb\x90\x00" + b"\x00" * 64)
    sig, sr = load_wav(str(p))
    assert sr == 22050
    np.testing.assert_allclose(sig, mono, atol=1e-7)


def test_load_non_wav_via_optional_soundfile(tmp_path, monkeypatch):
    """When an optional decoder IS importable, non-WAV files decode through
    it (mono-averaged float32 + sample rate), matching the reference's
    torchaudio.load breadth (reference audio/functions.py:43-49)."""
    import sys
    import types

    from musicgan_tpu.audio.io import load_wav

    stereo = np.stack(
        [np.linspace(-1, 1, 100, dtype=np.float32),
         np.zeros(100, dtype=np.float32)], axis=1
    )

    fake = types.ModuleType("soundfile")

    def read(path, dtype="float32", always_2d=True):
        assert path.endswith(".flac")
        return stereo.copy(), 44100

    fake.read = read
    monkeypatch.setitem(sys.modules, "soundfile", fake)

    p = tmp_path / "song.flac"
    p.write_bytes(b"fLaC" + b"\x00" * 16)
    sig, sr = load_wav(str(p))
    assert sr == 44100
    np.testing.assert_allclose(sig, stereo.mean(axis=1), atol=1e-7)

    # sample-rate contract is enforced on the optional path too
    import pytest

    with pytest.raises(ValueError, match="must be 48000"):
        load_wav(str(p), expected_sample_rate=48000)
