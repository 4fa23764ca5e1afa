"""Corpus-referenced spectral quality metric for audition outputs.

Thin CLI wrapper over :func:`musicgan_tpu.evaluate.score_auditions`
(see that module's docstring for the metric definition and the
mode-collapse/diversity axis; the same surface is also available as
``python -m musicgan_tpu eval``).

Usage:
  python scripts/eval_quality.py AUDITION_DIR --corpus /root/corpus_r3/wav
"""

from __future__ import annotations

import _bootstrap  # noqa: F401  (repo root onto sys.path)

import argparse

from musicgan_tpu.evaluate import (  # noqa: F401  (re-exported: tests and
    N_BANDS,                         # notebooks import these from here)
    F_HI,
    F_LO,
    band_profile,
    inter_sample_dist,
    score_auditions,
    temporal_profile,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("audition_dir")
    ap.add_argument("--corpus", required=True,
                    help="directory of corpus WAV tracks")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    score_auditions(args.audition_dir, args.corpus, json_out=args.json_out)


if __name__ == "__main__":
    main()
