#!/bin/bash
# Staging backstop for the cross-round COCO stage-1 continuation
# (recipes/coco_resume.sh; execution history in docs/DESIGN.md
# "Full-recipe execution: COCO").
#
# Every 10 min, copy the newest COMPLETE orbax snapshot from the live
# run into artifacts/coco_stage1_resume/ (git-tracked), so the resume
# point survives even if every session dies: the driver's end-of-round
# auto-commit picks up whatever is staged. Appends each staged
# checkpoint to artifacts/coco_stage1_resume/PROGRESS for the DESIGN.md
# per-round table.
#
# The watchdog does NOT kill the trainer: bench.py's _release_tpu()
# stops it (by the PID recorded in /tmp/coco_s1.pid) the moment the
# round-end bench needs the TPU. The watchdog exits once the trainer is
# gone, after one final staging pass.
#
#   setsid nohup bash recipes/coco_watchdog.sh > /tmp/coco_watchdog.log 2>&1 &
SNAPDIR=${SNAPDIR:-/root/repo/snapshots/coco_synthetic/stage1}
DEST=${DEST:-/root/repo/artifacts/coco_stage1_resume}
PIDFILE=${PIDFILE:-/tmp/coco_s1.pid}

copy_newest() {
  # Committed checkpoints only (orbax writes _CHECKPOINT_METADATA on
  # commit; in-progress tmp dirs lack it / have suffixed names), picked
  # by NUMERIC iteration, not lexical ls order.
  # Sort BASENAMES so a '-' in SNAPDIR itself cannot break the numeric
  # iteration ordering.
  tag=$(for d in "$SNAPDIR"/model-*; do
    case "$d" in *orbax-checkpoint-tmp*) continue;; esac
    [ -f "$d/_CHECKPOINT_METADATA" ] || continue
    basename "$d"
  done | sort -t- -k2 -n | tail -1)
  [ -z "$tag" ] && return 0
  if [ ! -d "$DEST/$tag" ]; then
    progress=$(cat "$DEST/PROGRESS" 2>/dev/null)
    rm -rf "$DEST.tmp" "$DEST.old"; mkdir -p "$DEST.tmp"
    # Never touch the previous good staging until the copy has fully
    # SUCCEEDED (a failed cp — disk full, I/O error — must not destroy
    # the last committed resume point).
    if ! cp -r "$SNAPDIR/$tag" "$DEST.tmp/$tag"; then
      echo "$(date -u +%H:%M:%S) cp of $tag FAILED; keeping previous staging"
      rm -rf "$DEST.tmp"
      return 1
    fi
    cp "$SNAPDIR/config.yaml" "$DEST.tmp/config.yaml" 2>/dev/null
    printf '%s\n%s %s staged\n' "$progress" "$(date -u +%Y-%m-%dT%H:%M:%SZ)" \
      "$tag" | sed '/^$/d' > "$DEST.tmp/PROGRESS"
    # Swap via two renames (instant) instead of rm-then-mv, so there is
    # no multi-second window where $DEST does not exist for a concurrent
    # end-of-round auto-commit to observe.
    mv "$DEST" "$DEST.old" 2>/dev/null
    mv "$DEST.tmp" "$DEST"
    rm -rf "$DEST.old"
    echo "$(date -u +%H:%M:%S) staged $tag"
  fi
}

trainer_alive() {
  [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null
}

# Record our own PID so the guard can check/restart the watchdog
# without pattern-matching process names.
echo $$ > /tmp/coco_watchdog.pid

# Give the trainer time to write its PID file on a cold start — a
# relaunch may first regenerate the dataset, which takes minutes.
for _ in $(seq 30); do
  [ -f "$PIDFILE" ] && break
  sleep 30
done
# 120 s poll: cheap (copies only when a NEW complete snapshot exists)
# and fast enough that the SIGTERM-save written when bench.py takes the
# chip is staged before the driver's end-of-round commit.
while trainer_alive; do
  sleep 120
  copy_newest
done
copy_newest
echo "$(date -u +%H:%M:%S) trainer gone; final staging done"
