#!/bin/bash
# Periodic resume-checkpoint stager.
#
# Round-5 lesson: the pilot stages resume_ckpt into the repo only when
# it FINISHES, so the host reboot at ~07:3xZ threw away everything an
# earlier round-5 segment had trained past 298,400 (the run was mid-
# flight; /root/runs is volatile, /root/repo persists).  This watcher
# closes that hole: every $PERIOD seconds it copies the newest COMPLETE
# cadence save (meta.json present) from the run dir into
# saved_models/quality_r5/resume_ckpt — atomically (rsync to a temp dir
# + rename) so round_boot.sh's reseed scan never sees a torn copy.  A
# reboot now costs at most $PERIOD + the ≤4k-iteration cadence replay.
#
# No git operations here (sessions commit; the driver auto-commits at
# round end) — surviving a REBOOT only needs the working tree.
#
# Detach with:
#   nohup setsid bash scripts/ckpt_stager.sh >> /root/runs/ckpt_stager.log 2>&1 &
set -u

REPO=/root/repo
OUT=${OUT:-/root/runs/quality_r4}
DEST="$REPO/saved_models/quality_r5/resume_ckpt"
PERIOD=${PERIOD:-1200}

log() { echo "[stager $(date -u +%H:%M:%S)] $*"; }
cd "$REPO"
mkdir -p "$(dirname "$DEST")"
LAST_STAGED=-1

while :; do
    NEWEST=$(for d in "$OUT"/checkpoints/save_*/; do
        [ -f "$d/meta.json" ] && basename "$d"
    done 2>/dev/null | sed 's/save_//' | sort -n | tail -1)
    if [ -n "${NEWEST:-}" ] && [ "$NEWEST" -gt "$LAST_STAGED" ]; then
        TMP="$DEST.staging"
        rm -rf "$TMP"
        mkdir -p "$TMP"
        if cp -r "$OUT/checkpoints/save_$NEWEST" "$TMP/save_$NEWEST" \
                && [ -f "$TMP/save_$NEWEST/meta.json" ]; then
            # re-check the source wasn't replaced mid-copy (saver writes
            # meta.json last, so presence at both ends == complete)
            rm -rf "$DEST.old"
            [ -d "$DEST" ] && mv "$DEST" "$DEST.old"
            mv "$TMP" "$DEST"
            rm -rf "$DEST.old"
            LAST_STAGED=$NEWEST
            log "staged save_$NEWEST ($(du -sh "$DEST" | cut -f1))"
        else
            rm -rf "$TMP"
            log "copy of save_$NEWEST failed; will retry"
        fi
    fi
    sleep "$PERIOD"
done
