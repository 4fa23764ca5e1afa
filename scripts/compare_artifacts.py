"""Head-to-head scoring of trained generator artifacts.

Thin CLI over :func:`musicgan_tpu.evaluate.compare_artifacts`: renders the
SAME latents through each artifact (a reference-format ``gen_*.pt`` or any
of our checkpoint/run dirs) and scores them against a corpus with the full
eval table (spectral nearest-track distance, diversity, coverage, and the
temporal/rhythm axis) — the tool for questions like "did training past the
schedule end actually improve the artifact?" (reference bar: its
419k-iteration ``gen_419.pt`` vs the schedule end at ~268k).

Usage:
  python scripts/compare_artifacts.py CKPT [CKPT ...] \
      --corpus WAV_DIR [--seeds 8] [--nb-vec 2] [--platform cpu] \
      [--json-out scores.json]

The printed table's ``save`` column is the artifact's position on the
command line (0-based); the legend above it maps indices to paths.
"""

from __future__ import annotations

import _bootstrap  # noqa: F401  (repo root onto sys.path)

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpts", nargs="+",
                    help="two or more artifacts: reference gen_*.pt files "
                         "or our checkpoint/run dirs")
    ap.add_argument("--corpus", required=True,
                    help="directory of corpus WAVs to score against")
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--nb-vec", type=int, default=2)
    ap.add_argument("--latent-seed", "--seed", dest="latent_seed",
                    type=int, default=1234,
                    help="latent RNG seed (same latents for every artifact; "
                         "same flag name as the CLI subcommand)")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("-o", "--out-dir", type=str, default=None,
                    help="keep the rendered WAVs here (default: temp dir)")
    ap.add_argument("--json-out", type=str, default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from musicgan_tpu.evaluate import compare_artifacts
    from musicgan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    compare_artifacts(
        args.ckpts, args.corpus, seeds=args.seeds, nb_vec=args.nb_vec,
        seed=args.latent_seed, out_dir=args.out_dir,
        json_out=args.json_out,
    )


if __name__ == "__main__":
    main()
