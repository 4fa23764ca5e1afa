#!/bin/bash
# Round-start bootstrap: bring the quality run back up regardless of what
# a host reboot wiped (/tmp, /root/runs, /root/corpus_r4 are all volatile;
# only /root/repo persists). One detached invocation replaces the manual
# recover-corpus / wait-for-device / relaunch-pilot sequence that cost
# ~75 min of chip time at the 2026-08-19 round start.
#
# Detach with:
#   nohup setsid bash scripts/round_boot.sh >> /root/runs/quality_r4_pilot.log 2>&1 &
#
# Steps (all idempotent):
#   1. derive the driver round clock (ROUND_END env > PROGRESS.jsonl
#      heartbeat + 12h > now + 11h)
#   2. rebuild the r4 corpus if missing — EXACT recipe of the corpus the
#      quality_r4 checkpoints were trained on (640x45s seed 7 -> 9,600
#      samples); a different corpus size would break the bit-exact resume
#      cursor, so never change these numbers mid-run
#   3. wait for a live accelerator (tunnel outages at round start are the
#      norm, and the supervisor's restart budget must not be burned on a
#      dead tunnel), giving up only when <3h of train time would remain
#   4. hand off to scripts/r4_pilot.sh (resume-aware supervised training
#      to the reference's 419k-iteration budget, deadline kill, audition,
#      reference-format export, artifact staging)
set -u

REPO=/root/repo
CORPUS=/root/corpus_r4
cd "$REPO"
mkdir -p /root/runs

log() { echo "[boot $(date -u +%H:%M:%S)] $*"; }

# --- 1. round clock ---
if [ -z "${ROUND_END:-}" ]; then
    ROUND_END=$(python - <<'EOF'
import json, time
end = time.time() + 11 * 3600          # conservative fallback
try:
    *_, last = open("/root/repo/PROGRESS.jsonl")
    row = json.loads(last)
    derived = row["ts"] - row["wall_s"] + 12 * 3600
    # A heartbeat from a FINISHED round derives an end in the past (or
    # nearly so); only trust it when it leaves a usable window.
    if derived > time.time() + 3600:
        end = derived
except Exception:
    pass
print(int(end))
EOF
)
fi
export ROUND_END
log "round end assumed $(date -u -d @"$ROUND_END" +%H:%M:%S)Z"

# --- 2. corpus (recipe pinned to the in-flight run's checkpoints) ---
if [ ! -f "$CORPUS/ds/index.json" ]; then
    log "corpus missing — rebuilding (640 tracks x 45 s, seed 7)"
    python scripts/make_corpus.py "$CORPUS/wav" \
        --tracks 640 --seconds 45 --seed 7 \
        >> /root/runs/corpus_build.log 2>&1 || { log "FATAL: make_corpus failed"; exit 1; }
    setsid python -m musicgan_tpu create_dataset --platform cpu \
        "$CORPUS/wav" -o "$CORPUS/ds" \
        >> /root/runs/corpus_build.log 2>&1 &
    echo $! > /tmp/ingest_r4.pid
    log "ingest launched (pid $(cat /tmp/ingest_r4.pid)); the pilot will wait on it"
fi

# --- 2b. reseed checkpoints from the repo if the reboot wiped /root/runs ---
# The pilot/finalize scripts ship the newest complete train-state
# checkpoint into saved_models/quality_r*/resume_ckpt/ (the only
# persistent filesystem); restoring it here turns a from-scratch retrain
# into a resume.  Scan EVERY staged resume_ckpt and take the globally
# newest save index (r5 stages quality_r5/ beside quality_r4/).  Safe
# because the corpus recipe above is pinned (sorted glob + order-preserving
# imap make the rebuilt dataset byte-identical), so the checkpoint's
# epoch/batch cursor still addresses the same samples.
OUT=/root/runs/quality_r4
if ! ls "$OUT"/checkpoints/save_* >/dev/null 2>&1; then
    # numeric sort: lexicographic `tail -1` would pick save_9 over save_80
    SEED_DIR=$(for d in "$REPO"/saved_models/quality_r*/resume_ckpt/save_*/; do
        [ -f "$d/meta.json" ] && echo "$(basename "$d" | sed 's/save_//') $d"
    done | sort -n | tail -1 | cut -d' ' -f2)
    if [ -n "$SEED_DIR" ]; then
        mkdir -p "$OUT/checkpoints"
        cp -r "$SEED_DIR" "$OUT/checkpoints/$(basename "$SEED_DIR")"
        log "reseeded $(basename "$SEED_DIR") from $SEED_DIR — pilot resumes instead of retraining"
    fi
fi

# --- 3. wait for a live accelerator ---
until timeout 180 python -c \
    "import jax; d = jax.devices()[0]; assert d.platform != 'cpu', d" \
    2>/dev/null
do
    if [ $(( $(date +%s) + 3 * 3600 )) -ge "$ROUND_END" ]; then
        log "device never answered and <3h of round left — giving up (75)"
        exit 75
    fi
    log "device not answering; retry in 300 s"
    sleep 300
done
log "device live"

# --- 3b. periodic resume-checkpoint stager (round-5 reboot lesson) ---
# stages the newest cadence save into the repo every 20 min so a host
# reboot mid-run costs <= 20 min + cadence replay, not the whole segment
if ! pgrep -x -f "bash scripts/ckpt_stager.sh" >/dev/null 2>&1; then
    nohup setsid bash scripts/ckpt_stager.sh >> /root/runs/ckpt_stager.log 2>&1 &
    log "checkpoint stager launched"
fi

# --- 4. hand off ---
export MAX_ITERS=${MAX_ITERS:-419000}
exec bash scripts/r4_pilot.sh
