#!/bin/bash
# Post-growth continuation of the round-4 quality run toward the
# reference's demonstrated budget.
#
# The r4 run completed the full reference growth schedule (268,333 iters
# = 1.61M samples).  The reference's bundled artifact trained well PAST
# full growth: save index 419 => ~419,000 iterations ~= 2.51M samples
# (reference saved_models/electronic_gems/, cadence train.py:112).  This
# script resumes the finished run with the max-iters cap raised to that
# budget, under supervision (resume-on-75), and group-kills it at a hard
# deadline so the chip is free for the driver's end-of-round bench.
#
# Idempotent across rounds: relaunch any time; it resumes from the newest
# checkpoint in $OUT/checkpoints and exits immediately once 419k is hit.
#
# Detach with:
#   nohup setsid bash scripts/r4_continue.sh >> /root/runs/quality_r4_pilot.log 2>&1 &
set -u

REPO=/root/repo
OUT=/root/runs/quality_r4
ROUND_END=${ROUND_END:-1787099285}
TRAIN_STOP=$((ROUND_END - 1800))       # 30 min buffer: flush + driver bench
PIDFILE=/tmp/r4cont.pid

cd "$REPO"
log() { echo "[cont $(date -u +%H:%M:%S)] $*"; }

if ! ls "$OUT"/checkpoints/* >/dev/null 2>&1; then
    log "FATAL: no checkpoints to continue from in $OUT"
    exit 1
fi
if [ "$(date +%s)" -ge "$TRAIN_STOP" ]; then
    log "past the continuation deadline; nothing to do"
    exit 0
fi

# setsid may FORK when already a pgrp leader, so $! can be a short-lived
# wrapper; have the session leader record its own pid (VALIDATION.md r4
# ops note) and signal the group through the pidfile.
setsid bash -c "echo \$\$ > $PIDFILE; exec python scripts/quality_run.py \
    --dataset /root/corpus_r4/ds --out $OUT \
    --schedule-div 1 --drift-eps 1e-3 --ema-decay 0.999 \
    --device-dtype bfloat16 --device-budget-gb 12 \
    --save-every 4000 --chunk-steps 100 \
    --run-name quality_r4 --max-restarts 4 --resume \
    --max-iters 419000" >> /root/runs/quality_r4_train.log 2>&1 &
sleep 2
TPID=$(cat "$PIDFILE")
log "continuation launched (pgid $TPID), hard stop at $(date -u -d @$TRAIN_STOP +%H:%M:%S)Z"

while kill -0 "$TPID" 2>/dev/null; do
    if [ "$(date +%s)" -ge "$TRAIN_STOP" ]; then
        log "deadline: SIGTERM to continuation group (checkpoint flush)"
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
LATEST=$(ls "$OUT"/checkpoints 2>/dev/null | sed -n 's/^save_//p' | sort -n | tail -1)
log "continuation stopped; newest checkpoint: save_${LATEST:-none}"
log "continue done"
