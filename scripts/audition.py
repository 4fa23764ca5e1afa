"""Audition a training run: render WAVs (+ optional spectrogram PNGs) from
every checkpoint, to hear/see the generator evolve across growth stages.

Each ``save_k`` checkpoint stores the stage it was taken at (meta.json);
synthesis runs at that stage (the vocoder upsamples partial-growth images
to full 512-bin resolution, so every stage is audible — the reference can
only generate from fully-grown checkpoints).

Usage:
  python scripts/audition.py RUN_DIR [-o OUT_DIR] [--seeds 3] [--nb-vec 2]
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
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("-o", "--out-dir", default=None)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--nb-vec", type=int, default=2)
    ap.add_argument("--saves", type=str, default=None,
                    help="comma-separated save indices (default: all)")
    ap.add_argument("--raw-weights", action="store_true",
                    help="audition the raw generator weights even when the "
                         "checkpoint carries an EMA copy")
    args = ap.parse_args()

    import numpy as np

    import jax

    from musicgan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()  # per-stage synth graphs cost 30-120 s
    # through the tunnel; repeat auditions should only pay once

    from musicgan_tpu.audio.io import save_wav
    from musicgan_tpu.config import AudioConfig, ModelConfig
    from musicgan_tpu.generate import synthesize_fn
    from musicgan_tpu.train.checkpoint import CheckpointManager
    from musicgan_tpu.train.step import init_train_state

    ckpt_dir = os.path.join(args.run_dir, "checkpoints")
    mgr = CheckpointManager(ckpt_dir)
    saves = (
        [int(s) for s in args.saves.split(",")]
        if args.saves
        else mgr.saved_indices()
    )
    out_dir = args.out_dir or os.path.join(args.run_dir, "audition")
    os.makedirs(out_dir, exist_ok=True)

    cfg = ModelConfig()
    audio_cfg = AudioConfig()
    template = init_train_state(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(
        jax.random.PRNGKey(1234),
        (args.seeds, cfg.latent_height, cfg.latent_width * args.nb_vec,
         cfg.rand_channels),
    )

    def flatness(w):
        """Geometric/arithmetic spectral-mean ratio over 50 Hz-5 kHz
        (the VALIDATION.md tonality metric: ~0 = tonal, ~1 = white)."""
        spec = np.abs(np.fft.rfft(np.asarray(w, np.float64)))
        freqs = np.fft.rfftfreq(len(w), 1.0 / audio_cfg.sample_rate)
        band = spec[(freqs >= 50) & (freqs <= 5000)] + 1e-12
        return float(np.exp(np.mean(np.log(band))) / np.mean(band))

    for k in saves:
        state, meta = mgr.restore(k, template)
        stage = int(meta["grower"]["curr_grow"])
        stage = min(stage, cfg.n_stages - 1)
        gen_params = (
            state.gen_params
            if args.raw_weights or state.gen_ema is None
            else state.gen_ema
        )
        waves = np.asarray(synthesize_fn(cfg, stage)(gen_params, z))
        flats = []
        for s, w in enumerate(waves):
            p = os.path.join(out_dir, f"save{k:03d}_s{stage}_seed{s}.wav")
            save_wav(p, w, audio_cfg.sample_rate)
            rms = float(np.sqrt(np.mean(np.square(w, dtype=np.float64))))
            flats.append(flatness(w))
            print(f"{p}  iter={meta.get('iter_idx')} stage={stage} "
                  f"len={len(w) / audio_cfg.sample_rate:.1f}s rms={rms:.4f} "
                  f"flatness={flats[-1]:.3f}",
                  flush=True)
        with open(os.path.join(out_dir, f"save{k:03d}.json"), "w") as f:
            json.dump({"save": k, "stage": stage,
                       "iter": int(meta.get("iter_idx", -1)),
                       "flatness": flats,
                       "ema": bool(state.gen_ema is not None
                                   and not args.raw_weights)}, f)


if __name__ == "__main__":
    main()
