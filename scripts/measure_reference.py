"""Measure the reference (Ipsedo/MusicGAN) train-step + preproc throughput.

BASELINE.md's first benchmarking task: the reference publishes no numbers,
so the denominators for ``bench.py``'s ``vs_baseline`` fields are measured
here by driving the REFERENCE'S OWN code (imported from /root/reference —
called, not copied) on this host, with the single substitution of
``device="cpu"`` for its hardcoded ``.cuda()`` calls (no CUDA in this
environment; no GPU number is derivable anywhere, see BASELINE.md).

Workload mirrors reference ``train.py:131-214`` exactly: scale-transform,
G forward, two D forwards, W-loss, gradient penalty (double backward),
optimizer step, the 6 ``.item()`` metric syncs, and a G update every 5th
iteration.

Usage: python scripts/measure_reference.py [--stage7-iters N]
Writes results to stdout as JSON (one line) — paste into BASELINE_MEASURED
in bench.py / PERF.md.
"""

from __future__ import annotations

import _bootstrap  # noqa: F401  (repo root onto sys.path)

import argparse
import json
import sys
import time

import numpy as np
import torch as th


def _import_reference_subpackage(name: str):
    """Import ``music_gan.<name>`` without executing the package
    ``__init__`` (which pulls in mlflow/torchvision, absent here)."""
    import importlib
    import importlib.util

    if "music_gan" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "music_gan",
            "/root/reference/music_gan/__init__.py",
            submodule_search_locations=["/root/reference/music_gan"],
        )
        pkg = importlib.util.module_from_spec(spec)
        sys.modules["music_gan"] = pkg  # registered, NOT executed
    return importlib.import_module(f"music_gan.{name}")


networks = _import_reference_subpackage("networks")


def measure_train(stage: int, iters: int, warmup: int = 1) -> float:
    """Reference iterations/sec at growth ``stage`` (CPU), n_critic=5."""
    th.manual_seed(0)
    batch_size, rand_channels, height, width = 6, 32, 2, 2

    gen = networks.Generator(rand_channels, end_layer=stage)
    disc = networks.Discriminator(start_layer=7 - stage)
    optim_gen = th.optim.Adam(gen.parameters(), lr=1e-3, betas=(0.0, 0.9))
    optim_disc = th.optim.Adam(disc.parameters(), lr=1e-3, betas=(0.0, 0.9))

    size = 4 * 2**stage
    alpha = 1.0

    def one_iter(iter_idx: int):
        x_real = th.rand(batch_size, 2, size, size) * 2.0 - 1.0
        z = th.randn(batch_size, rand_channels, height, width)
        x_fake = gen(z, alpha)
        out_real = disc(x_real, alpha)
        out_fake = disc(x_fake, alpha)
        disc_loss = networks.wasserstein_discriminator_loss(out_real, out_fake)
        grad_pen = disc.gradient_penalty(x_real, x_fake, alpha)
        gen.zero_grad()
        disc.zero_grad()
        (disc_loss + grad_pen).backward()
        optim_disc.step()
        # the reference's per-iteration metric syncs (train.py:180-186)
        _ = (out_real.mean().item(), out_fake.mean().item(),
             disc_loss.item(), grad_pen.item())
        if iter_idx % 5 == 0:
            z = th.randn(batch_size, rand_channels, height, width)
            x_fake = gen(z, alpha)
            out_fake = disc(x_fake, alpha)
            gen_loss = networks.wasserstein_generator_loss(out_fake)
            gen.zero_grad()
            disc.zero_grad()
            gen_loss.backward()
            optim_gen.step()
            _ = (gen_loss.item(), out_fake.mean().item())

    for i in range(warmup):
        one_iter(i)
    t0 = time.perf_counter()
    for i in range(iters):
        one_iter(i)
    dt = time.perf_counter() - t0
    return iters / dt


def _stub_torchaudio(signal: th.Tensor, sample_rate: int) -> None:
    """torchaudio is not installed here; stub the two entry points the
    reference's ``audio/functions.py`` uses so its own preproc code runs.
    ``spectrogram`` performs the same ``th.stft`` call torchaudio makes
    internally (center-reflect pad + window-norm normalization), so the
    measured work is the reference's."""
    import types

    ta = types.ModuleType("torchaudio")
    taf = types.ModuleType("torchaudio.functional")

    def load(path):
        return signal[None, :], sample_rate

    def spectrogram(x, pad, window, n_fft, hop_length, win_length, power,
                    normalized, return_complex=True):
        z = th.stft(
            x, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
            window=window, center=True, pad_mode="reflect",
            return_complex=True,
        )
        if normalized:
            z = z / window.pow(2.0).sum().sqrt()
        return z

    ta.load = load
    taf.spectrogram = spectrogram
    ta.functional = taf
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.functional"] = taf


def measure_preproc(seconds: float = 60.0, reps: int = 3) -> float:
    """Reference ``create_dataset`` STFT preproc throughput in frames/sec
    (its per-WAV pipeline from ``audio/functions.py``: torch.stft ->
    magn/phase -> unwrap -> bark scale -> min-max), on an in-memory signal.
    """
    sr = 44100
    t = np.arange(int(sr * seconds)) / sr
    sig = th.from_numpy(
        (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    )
    _stub_torchaudio(sig, sr)
    ref_audio = _import_reference_subpackage("audio")

    z = ref_audio.wav_to_stft("unused.wav")  # warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        z = ref_audio.wav_to_stft("unused.wav")
        _ = ref_audio.stft_to_phase_magn(z)
    dt = time.perf_counter() - t0
    return reps * z.shape[-1] / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage0-iters", type=int, default=20)
    ap.add_argument("--stage7-iters", type=int, default=2)
    ap.add_argument("--skip-preproc", action="store_true")
    args = ap.parse_args()

    out = {"host": "tpu-host cpu (1 core)", "torch": th.__version__}
    out["train_steps_per_sec_stage0"] = round(
        measure_train(0, args.stage0_iters), 4
    )
    out["train_steps_per_sec_stage7"] = round(
        measure_train(7, args.stage7_iters, warmup=1), 4
    )
    if not args.skip_preproc:
        try:
            out["preproc_stft_frames_per_sec"] = round(measure_preproc(), 1)
        except Exception as e:  # soundfile/torchaudio may be absent
            out["preproc_error"] = repr(e)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
