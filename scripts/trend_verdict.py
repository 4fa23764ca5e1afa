"""Post-growth quality-trend verdict (round-4 VERDICT item 1).

The judge's requirement: "an explicit verdict on the post-growth quality
trend — if the final checkpoint is no longer the best, ship the best and
document when the curve turned."  This renders that verdict unattended
from the eval JSONs the pilot/finalize chain already produces:

- the subsampled audition curve (``audition/scores.json``: ~10 saves
  from early growth through the final iteration), and
- the head-to-head compare vs the committed 298.4k artifact
  (``compare_r5/compare.json``), when present.

Decision rule (ROADMAP round-5 item 0, VALIDATION session-4):

1. collapse guard — a save whose ``inter_sample_dist`` falls below the
   corpus's own inter-track spread has started mode-collapsing and is
   disqualified;
2. among non-collapsed saves, lower ``nearest_track_dist`` (corpus
   likeness) wins;
3. when holdout columns exist, a widening train-vs-holdout gap flags
   memorization rather than generalization (reported, not used to
   disqualify: the corpus is synthetic and 64 fresh-draw tracks bound
   the axis loosely).

Writes TREND_VERDICT.md (markdown) and prints the winning save index on
the last stdout line so shell callers can stage that artifact.

Usage:
  python scripts/trend_verdict.py --audition A.json [--compare C.json]
      [--write TREND_VERDICT.md]
"""

from __future__ import annotations

import argparse
import json


def _saves(scores: dict) -> dict[int, dict]:
    return {
        int(k): v
        for k, v in scores.items()
        if k.isdigit() and isinstance(v, dict)
    }


def render(audition: dict, compare: dict | None) -> tuple[str, int]:
    corpus_spread = audition.get("corpus_inter_track_dist")
    saves = _saves(audition)
    ks = sorted(saves)

    lines = [
        "# Post-growth quality-trend verdict",
        "",
        f"Corpus inter-track spread (collapse floor): "
        f"{corpus_spread:.4f}" if corpus_spread is not None else
        "Corpus inter-track spread: (missing)",
        "",
        "| save | iters (x4000) | nearest_track ↓ | inter_sample | "
        "collapsed? | nearest_holdout | gap |",
        "|---|---|---|---|---|---|---|",
    ]
    eligible: list[tuple[float, int]] = []
    for k in ks:
        row = saves[k]
        near = row.get("nearest_track_dist")
        div = row.get("inter_sample_dist")
        collapsed = (
            corpus_spread is not None
            and div is not None
            and div < corpus_spread
        )
        hold = row.get("nearest_holdout_dist")
        gap = row.get("holdout_gap")
        lines.append(
            f"| {k} | {k * 4000} | "
            f"{near:.4f} | {div:.4f} | "
            f"{'YES' if collapsed else 'no'} | "
            f"{f'{hold:.4f}' if hold is not None else '—'} | "
            f"{f'{gap:.4f}' if gap is not None else '—'} |"
        )
        if near is not None and not collapsed:
            eligible.append((near, k))

    if not eligible:
        lines += ["", "**Every save trips the collapse floor — judge by "
                  "ear/curve manually; shipping the final save.**"]
        winner = ks[-1] if ks else -1
    else:
        winner = min(eligible)[1]
        final = ks[-1]
        if winner == final:
            lines += [
                "",
                f"**Verdict: the FINAL save ({winner}, iter "
                f"{winner * 4000}) is the best non-collapsed artifact — "
                "post-growth training kept improving corpus likeness "
                "without tripping the collapse floor. Ship it.**",
            ]
        else:
            # locate where the curve turned: the last save at least as
            # good as its predecessor before the winner's score degrades
            lines += [
                "",
                f"**Verdict: the curve TURNED — save {winner} (iter "
                f"{winner * 4000}) beats the final save {final} (iter "
                f"{final * 4000}) on corpus likeness among non-collapsed "
                "saves. Ship save "
                f"{winner} as gen_best.pt beside the final artifact.**",
            ]
            after = [k for k in ks if k > winner]
            if after:
                lines.append(
                    f"The degradation begins at save {after[0]} "
                    f"(iter {after[0] * 4000})."
                )

    if compare:
        lines += ["", "## Head-to-head vs committed 298.4k artifact", ""]
        legend = compare.get("artifacts", {})
        cs = _saves(compare)
        lines += [
            "| artifact | nearest_track ↓ | inter_sample | "
            "nearest_holdout | gap |",
            "|---|---|---|---|---|",
        ]
        for i in sorted(cs):
            row = cs[i]
            name = legend.get(str(i), str(i))
            hold = row.get("nearest_holdout_dist")
            gap = row.get("holdout_gap")
            lines.append(
                f"| {name} | {row.get('nearest_track_dist'):.4f} | "
                f"{row.get('inter_sample_dist'):.4f} | "
                f"{f'{hold:.4f}' if hold is not None else '—'} | "
                f"{f'{gap:.4f}' if gap is not None else '—'} |"
            )
        floor = compare.get("corpus_inter_track_dist")
        if floor is not None:
            lines.append(
                f"\nCompare-run collapse floor: {floor:.4f}; "
                "memorization baseline (holdout→train corpus distance): "
                + (
                    f"{compare['holdout_to_train_dist']:.4f}"
                    if "holdout_to_train_dist" in compare
                    else "—"
                )
            )

    return "\n".join(lines) + "\n", winner


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--audition", required=True)
    ap.add_argument("--compare", default=None)
    ap.add_argument("--write", default=None)
    args = ap.parse_args()

    with open(args.audition) as f:
        audition = json.load(f)
    compare = None
    if args.compare:
        try:
            with open(args.compare) as f:
                compare = json.load(f)
        except (OSError, ValueError):
            compare = None

    doc, winner = render(audition, compare)
    if args.write:
        with open(args.write, "w") as f:
            f.write(doc)
    print(doc)
    print(winner)


if __name__ == "__main__":
    main()
