#!/bin/bash
# Unattended round-5 chip-window measurements (VERDICT r4 items 6+8 +
# the MFU bench validation): wait for the finalize stage to release the
# chip, then run
#
#   1. scripts/vocoder_roofline.py  — the Pallas-iSTFT north-star
#      close-out data (kernel vs XLA vs light-speed bound);
#   2. scripts/profile_stage0.py    — stage-0 host-vs-device throughput
#      attribution (replaces PERF.md's asserted host explanation);
#   3. bench.py                     — a full fresh bench so the new
#      MFU fields and the production-graph synthesis headline are
#      validated live before the driver's end-of-round run.
#
# Outputs land in bench_artifacts/r5/ inside the repo working tree so
# the driver's end-of-round auto-commit ships them even if no session
# survives to write the PERF.md prose.  Sessions this round keep dying
# on gateway 529s; like r4_pilot.sh/r5_finalize.sh this keeps the
# deliverables independent of session luck.
#
# Detach with:
#   nohup setsid bash scripts/r5_chip_window.sh >> /root/runs/r5_chip.log 2>&1 &
set -u

REPO=/root/repo
OUT="$REPO/bench_artifacts/r5"
FINLOG=/root/runs/r5_finalize.log
ROUND_END=${ROUND_END:-1787239717}
# leave ~25 min of chip for the driver's own bench after we stop
STOP_BY=$((ROUND_END - 1500))
# if the finalize never prints its done marker, start anyway once its
# eval budget has clearly lapsed (finalize bails 1500 s before round
# end, so by -2400 s the chip is either free or wedged — both mean go)
START_LATEST=$((ROUND_END - 2400))

cd "$REPO"
log() { echo "[chip-window $(date -u +%H:%M:%S)] $*"; }
mkdir -p "$OUT"

while :; do
    if grep -q "finalize done\|FATAL\|deadline passed" "$FINLOG" 2>/dev/null; then
        log "finalize finished (marker seen)"
        break
    fi
    if [ "$(date +%s)" -ge "$START_LATEST" ]; then
        log "start-latest deadline reached; proceeding anyway"
        break
    fi
    sleep 60
done

budget() { echo $(( STOP_BY - $(date +%s) )); }

if [ "$(budget)" -gt 600 ]; then
    log "vocoder roofline starting (budget $(budget)s)"
    timeout "$(budget)" python scripts/vocoder_roofline.py \
        --json-out "$OUT/vocoder_roofline.json" \
        > "$OUT/vocoder_roofline.txt" 2>&1
    log "roofline rc=$?"
else
    log "skipping roofline (no budget)"
fi

if [ "$(budget)" -gt 600 ]; then
    log "stage-0 attribution starting (budget $(budget)s)"
    timeout "$(budget)" python scripts/profile_stage0.py \
        --json-out "$OUT/profile_stage0.json" \
        > "$OUT/profile_stage0.txt" 2>&1
    log "profile rc=$?"
else
    log "skipping stage-0 profile (no budget)"
fi

if [ "$(budget)" -gt 300 ]; then
    log "full bench starting (budget $(budget)s)"
    timeout "$(budget)" python bench.py > "$OUT/bench_r5_session.jsonl" 2>&1
    log "bench rc=$?"
else
    log "skipping bench (no budget)"
fi

# Render the artifacts into the PERF.md close-out section (idempotent
# marker splice) so the driver auto-commit ships interpretation, not
# just JSON, even when no session survives to the round tail.
python scripts/perf_appendix.py --artifacts "$OUT" --write PERF.md \
    > /dev/null 2>&1 && log "PERF.md close-out section updated"

log "chip window done — artifacts in $OUT"
