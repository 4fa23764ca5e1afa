#!/bin/bash
# Unattended round-4 quality-run pilot (ROADMAP "Candidate work" item 0).
#
# Detach with:
#   nohup setsid bash scripts/r4_pilot.sh >> /root/runs/quality_r4_pilot.log 2>&1 &
#
# Waits for the corpus ingest to finish, launches the full-reference-schedule
# (schedule-div 1) quality run on the 10x corpus under supervision
# (--max-restarts, resume-on-75), group-kills it at a hard deadline so the
# chip is free for the driver's end-of-round bench, then auditions a
# subsample of checkpoints + the final one and stages artifacts into the
# repo working tree (saved_models/quality_r4/) for a later commit.
#
# Idempotent: safe to relaunch after a host reboot — it resumes from the
# newest checkpoint in $OUT/checkpoints.
set -u

REPO=/root/repo
CORPUS=/root/corpus_r4
OUT=/root/runs/quality_r4
ROUND_END=${ROUND_END:-1787099285}     # round-4 start (PROGRESS.jsonl) + 12h
TRAIN_STOP=$((ROUND_END - 5400))       # leave 90 min for eval + driver bench
EVAL_STOP=$((ROUND_END - 1500))        # everything device-bound dead by then

cd "$REPO"
mkdir -p /root/runs

log() { echo "[pilot $(date -u +%H:%M:%S)] $*"; }

# --- 1. wait for the ingest (if one is running) and sanity-check the ds ---
if [ -f /tmp/ingest_r4.pid ]; then
    IPID=$(cat /tmp/ingest_r4.pid)
    while kill -0 "$IPID" 2>/dev/null; do
        log "waiting for ingest (pid $IPID)"
        sleep 30
    done
fi
N=$(python -c "import json; print(json.load(open('/root/corpus_r4/ds/index.json'))['total_samples'])")
log "dataset ready: $N samples"
if [ "${N:-0}" -lt 8000 ]; then
    log "FATAL: expected ~8320 samples, got $N — aborting"
    exit 1
fi

# --- 2. launch the supervised quality run in its own process group ---
RESUME=""
if ls "$OUT"/checkpoints/* >/dev/null 2>&1; then
    RESUME="--resume"
    log "existing checkpoints found — resuming"
fi
NOW=$(date +%s)
if [ "$NOW" -ge "$TRAIN_STOP" ]; then
    log "past the training deadline; skipping straight to eval"
else
    # Optional MAX_ITERS env raises the iteration cap past the schedule end
    # (e.g. MAX_ITERS=419000 to train straight through to the reference
    # artifact's demonstrated budget in a single run).
    EXTRA=""
    if [ -n "${MAX_ITERS:-}" ]; then
        EXTRA="--max-iters $MAX_ITERS"
        log "iteration cap raised to $MAX_ITERS"
    fi
    setsid python scripts/quality_run.py \
        --dataset "$CORPUS/ds" --out "$OUT" \
        --schedule-div 1 --drift-eps 1e-3 --ema-decay 0.999 \
        --device-dtype bfloat16 --device-budget-gb 12 \
        --save-every 4000 --chunk-steps 100 \
        --run-name quality_r4 --max-restarts 8 $RESUME $EXTRA \
        >> /root/runs/quality_r4_train.log 2>&1 &
    TPID=$!
    log "training launched (pgid $TPID), hard stop at $(date -u -d @$TRAIN_STOP +%H:%M:%S)Z"
    while kill -0 "$TPID" 2>/dev/null; do
        if [ "$(date +%s)" -ge "$TRAIN_STOP" ]; then
            log "deadline: SIGTERM to training group (checkpoint flush)"
            kill -TERM -- "-$TPID" 2>/dev/null
            for _ in $(seq 24); do
                kill -0 "$TPID" 2>/dev/null || break
                sleep 10
            done
            if kill -0 "$TPID" 2>/dev/null; then
                log "group still alive 240s after TERM; SIGKILL"
                kill -KILL -- "-$TPID" 2>/dev/null
            fi
            break
        fi
        sleep 60
    done
    wait "$TPID" 2>/dev/null
    log "training finished (rc $?)"
fi

# --- 3. audition a subsample of saves + the final checkpoint ---
if ! ls "$OUT"/checkpoints/* >/dev/null 2>&1; then
    log "no checkpoints produced; nothing to eval"
    exit 1
fi
SAVES=$(python - <<EOF
from musicgan_tpu.train.checkpoint import CheckpointManager
ks = CheckpointManager("$OUT/checkpoints").saved_indices()
pick = ks[:: max(1, len(ks) // 10)]
if ks and ks[-1] not in pick:
    pick.append(ks[-1])
print(",".join(map(str, pick)))
EOF
)
log "auditioning saves: $SAVES"
timeout $((EVAL_STOP - $(date +%s))) \
    python -m musicgan_tpu eval "$OUT" --corpus "$CORPUS/wav" \
    --saves "$SAVES" --seeds 4 --nb-vec 2 \
    --json-out "$OUT/audition/scores.json" \
    >> /root/runs/quality_r4_eval.log 2>&1
log "subsampled eval rc=$?"
FINAL=$(echo "$SAVES" | awk -F, '{print $NF}')
timeout $((EVAL_STOP - $(date +%s))) \
    python -m musicgan_tpu eval "$OUT" --corpus "$CORPUS/wav" \
    --saves "$FINAL" --seeds 8 --nb-vec 2 -o "$OUT/audition_final" \
    --json-out "$OUT/audition_final/scores.json" \
    >> /root/runs/quality_r4_eval.log 2>&1
log "final 8-seed eval rc=$?"

# --- 4. export the final checkpoint to the reference .pt format ---
timeout 900 python -m musicgan_tpu export "$OUT/checkpoints/save_$FINAL" \
    -o "$OUT/gen_final.pt" >> /root/runs/quality_r4_eval.log 2>&1
log "export rc=$?"

# --- 5. stage artifacts into the repo working tree (no git ops here) ---
DEST="$REPO/saved_models/quality_r4"
mkdir -p "$DEST"
cp -f "$OUT/gen_final.pt" "$DEST/" 2>/dev/null
cp -f "$OUT/audition/scores.json" "$DEST/scores.json" 2>/dev/null
cp -f "$OUT/audition_final/scores.json" "$DEST/scores_final_8seed.json" 2>/dev/null
i=0
for w in "$OUT"/audition_final/*.wav; do
    [ -e "$w" ] || break
    cp -f "$w" "$DEST/demo_$i.wav"
    i=$((i + 1))
    [ "$i" -ge 2 ] && break
done
cp -f "$OUT"/metrics.csv "$DEST/metrics.csv" 2>/dev/null

# Ship the newest FULL train-state checkpoint (gen+disc+Adam+EMA+grower
# counters + epoch cursor), not just the weights-only .pt export: host
# reboots wipe /root/runs, so this committed copy is what lets the NEXT
# round resume the run (round_boot.sh step 2b reseeds from it) instead of
# retraining from iter 0.  Only complete saves count (meta.json present).
LATEST=$(for d in "$OUT"/checkpoints/save_*/; do
    [ -f "$d/meta.json" ] && basename "$d"
done | sed 's/save_//' | sort -n | tail -1)
if [ -n "$LATEST" ]; then
    rm -rf "$DEST/resume_ckpt"
    mkdir -p "$DEST/resume_ckpt"
    cp -r "$OUT/checkpoints/save_$LATEST" "$DEST/resume_ckpt/"
    log "resume checkpoint save_$LATEST staged ($(du -sh "$DEST/resume_ckpt" | cut -f1))"
fi
log "artifacts staged in $DEST — commit from a session turn"
log "pilot done"
