#!/bin/bash
# Unattended round-5 finalize (VERDICT r4 items 1 + 4): wait for the
# pilot to finish the 419k-iteration run + audition/export/staging, then
#
#   1. head-to-head compare of the 419k artifact vs the committed r4
#      298.4k-iteration gen_final.pt (same latents, 8 seeds), with the
#      held-out axis on both — the post-growth-trend verdict the round-4
#      VERDICT asks for;
#   2. an 8-seed held-out eval of the final save (nearest-train AND
#      nearest-held-out columns, fresh-draw corpus_holdout tracks);
#   3. stage everything as saved_models/quality_r5/ (artifact, scores,
#      demos, metrics, resume_ckpt) and restore saved_models/quality_r4/
#      to its committed state (the pilot's cp -f overwrote its staging).
#
# Exists because interactive sessions this round have repeatedly died on
# gateway 529s mid-flight; like r4_pilot.sh this keeps VERDICT item 1
# shippable with zero session turns.  Commit from a session turn; if none
# survives, the driver's end-of-round auto-commit picks up the staging.
#
# Detach with:
#   nohup setsid bash scripts/r5_finalize.sh >> /root/runs/r5_finalize.log 2>&1 &
set -u

REPO=/root/repo
OUT=/root/runs/quality_r4
BASE298=/root/runs/r4_baseline_artifact/gen_final_298k.pt
HOLDOUT=/root/corpus_holdout/wav
ROUND_END=${ROUND_END:-1787217287}
EVAL_STOP=$((ROUND_END - 1500))

cd "$REPO"
log() { echo "[finalize $(date -u +%H:%M:%S)] $*"; }

# The committed 298.4k artifact: the pilot overwrites its working-tree
# copy during staging, so materialize it from git if the session's early
# snapshot is gone (idempotent either way).
# -s (not -f) + write-to-temp: a failed `git show` still creates the
# redirect target, and a relaunch (the script's whole reason to exist)
# must not mistake that empty file for the artifact.
if [ ! -s "$BASE298" ]; then
    mkdir -p "$(dirname "$BASE298")"
    if git show HEAD:saved_models/quality_r4/gen_final.pt > "$BASE298.tmp" \
            && [ -s "$BASE298.tmp" ]; then
        mv "$BASE298.tmp" "$BASE298"
    else
        rm -f "$BASE298.tmp" "$BASE298"
        log "FATAL: no 298k baseline artifact"; exit 1
    fi
fi

# --- wait for the pilot (it stages $REPO/saved_models/quality_r4) ---
# PILOT_PID is looked up once by the launcher (no pattern-kill footguns);
# the log marker is the fallback if the pid was recycled.
PILOT_PID=${PILOT_PID:?set PILOT_PID to the running r4_pilot.sh pid}
while kill -0 "$PILOT_PID" 2>/dev/null; do
    if grep -q "pilot done" /root/runs/quality_r4_pilot.log 2>/dev/null; then
        break
    fi
    if [ "$(date +%s)" -ge "$EVAL_STOP" ]; then
        log "eval deadline passed while pilot still running; bailing"
        exit 1
    fi
    sleep 60
done
log "pilot finished"

if ! ls "$OUT"/checkpoints/save_*/meta.json >/dev/null 2>&1; then
    log "FATAL: no complete checkpoints under $OUT"
    exit 1
fi
FINAL=$(for d in "$OUT"/checkpoints/save_*/; do
    [ -f "$d/meta.json" ] && basename "$d"
done | sed 's/save_//' | sort -n | tail -1)
log "final save index: $FINAL"

budget() { echo $(( EVAL_STOP - $(date +%s) )); }

# --- 1. head-to-head: 419k artifact vs the committed 298.4k one ---
if [ "$(budget)" -gt 300 ]; then
    timeout "$(budget)" python -m musicgan_tpu compare \
        "$OUT" "$BASE298" \
        --corpus /root/corpus_r4/wav --seeds 8 --nb-vec 2 \
        --holdout-dir "$HOLDOUT" \
        -o "$OUT/compare_r5" --json-out "$OUT/compare_r5/compare.json"
    log "compare rc=$?"
else
    log "skipping compare (no budget)"
fi

# --- 2. held-out 8-seed eval of the final save ---
if [ "$(budget)" -gt 300 ]; then
    timeout "$(budget)" python -m musicgan_tpu eval "$OUT" \
        --corpus /root/corpus_r4/wav --saves "$FINAL" --seeds 8 --nb-vec 2 \
        --holdout-dir "$HOLDOUT" \
        -o "$OUT/audition_holdout" \
        --json-out "$OUT/audition_holdout/scores.json"
    log "holdout eval rc=$?"
else
    log "skipping holdout eval (no budget)"
fi

# --- 2b. unattended post-growth trend verdict (VERDICT r4 item 1) ---
DEST="$REPO/saved_models/quality_r5"
mkdir -p "$DEST"
if [ -f "$OUT/audition/scores.json" ]; then
    WINNER=$(python scripts/trend_verdict.py \
        --audition "$OUT/audition/scores.json" \
        --compare "$OUT/compare_r5/compare.json" \
        --write "$DEST/TREND_VERDICT.md" 2>/dev/null | tail -1)
    log "trend verdict written (winning save: ${WINNER:-?})"
    # if the curve turned, ship the winning save as gen_best.pt too
    # (only possible when its full checkpoint is still on disk — the
    # reboot reseed keeps just the newest one from before this round)
    if [ -n "$WINNER" ] && [ "$WINNER" != "$FINAL" ] \
            && [ -f "$OUT/checkpoints/save_$WINNER/meta.json" ]; then
        timeout 900 python -m musicgan_tpu export \
            "$OUT/checkpoints/save_$WINNER" -o "$DEST/gen_best.pt" \
            >> /root/runs/quality_r4_eval.log 2>&1
        log "gen_best.pt (save $WINNER) export rc=$?"
    fi
fi

# --- 3. stage saved_models/quality_r5 + restore quality_r4 ---
cp -f "$OUT/gen_final.pt" "$DEST/" 2>/dev/null
cp -f "$OUT/audition/scores.json" "$DEST/scores.json" 2>/dev/null
cp -f "$OUT/audition_final/scores.json" "$DEST/scores_final_8seed.json" 2>/dev/null
cp -f "$OUT/audition_holdout/scores.json" "$DEST/scores_holdout_8seed.json" 2>/dev/null
cp -f "$OUT/compare_r5/compare.json" "$DEST/compare_vs_298k.json" 2>/dev/null
cp -f "$OUT/metrics.csv" "$DEST/metrics.csv" 2>/dev/null
i=0
for w in "$OUT"/audition_holdout/*.wav; do
    [ -e "$w" ] || break
    cp -f "$w" "$DEST/demo_$i.wav"
    i=$((i + 1))
    [ "$i" -ge 2 ] && break
done
rm -rf "$DEST/resume_ckpt"
mkdir -p "$DEST/resume_ckpt"
cp -r "$OUT/checkpoints/save_$FINAL" "$DEST/resume_ckpt/"
log "staged $DEST ($(du -sh "$DEST" | cut -f1))"

# Put quality_r4's committed files back (pilot staging overwrote them);
# quality_r5 above is the shipping location for the new artifact.
git checkout -- saved_models/quality_r4/ 2>/dev/null \
    && log "saved_models/quality_r4 restored to committed state"

log "finalize done — commit saved_models/quality_r5 from a session turn"
