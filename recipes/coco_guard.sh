#!/bin/bash
# Supervisor for the cross-round COCO stage-1 continuation
# (recipes/coco_resume.sh): keeps the run alive across the two failure
# modes this environment actually exhibits —
#   1. session churn killing the detached trainer's ancestors (handled
#      by setsid in the launch command), and
#   2. TPU-tunnel stalls: the tunnel keeps answering control RPCs but a
#      compute RPC never returns, so the trainer sleeps forever without
#      crashing (observed 2026-08-19: ~55 min of silence, 1 s of CPU).
#
# Loop: while the trainer is alive, watch its log's write age; past
# STALL_SECS (snapshot writes and resume-time scan compiles legitimately
# take many minutes — see docs/DESIGN.md) the trainer is declared
# wedged, killed (SIGTERM then SIGKILL), and relaunched once the tunnel
# answers a small matmul probe again. While it is dead: probe, relaunch
# when healthy.
#
# Exits when (a) the run is COMPLETE (model-350000 exists), or (b) the
# trainer is gone AND /tmp/coco_s1.pid was removed — bench.py's
# _release_tpu() unlinks it when the round-end bench takes the chip, so
# a missing pidfile means "stop training, the round is over".
#
#   setsid nohup bash recipes/coco_guard.sh > /tmp/coco_guard.log 2>&1 &
cd "$(dirname "$0")/.."

SNAPDIR=${SNAPDIR:-snapshots/coco_synthetic/stage1}
PIDFILE=${PIDFILE:-/tmp/coco_s1.pid}
TRAINLOG=${TRAINLOG:-/tmp/coco_s1.log}
STALL_SECS=${STALL_SECS:-1500}
POLL=${POLL:-120}

log() { echo "$(date -u +%H:%M:%S) $*"; }

trainer_pid() { cat "$PIDFILE" 2>/dev/null; }

trainer_alive() {
  pid=$(trainer_pid)
  [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null
}

tunnel_healthy() {
  # Device listing alone is NOT health (it kept working through the
  # observed stall) — require a round-tripped compute RPC.
  timeout 300 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()) == 128.0**3
print('tunnel ok')" >/dev/null 2>&1
}

kill_trainer() {
  pid=$(trainer_pid)
  [ -z "$pid" ] && return 0
  kill -TERM "$pid" 2>/dev/null
  for _ in $(seq 30); do kill -0 "$pid" 2>/dev/null || return 0; sleep 1; done
  kill -KILL "$pid" 2>/dev/null
  sleep 3
}

relaunch() {
  log "relaunching trainer"
  setsid nohup bash recipes/coco_resume.sh > "$TRAINLOG" 2>&1 < /dev/null &
  sleep 5
}

while :; do
  if [ -d "$SNAPDIR/model-350000" ]; then
    log "stage-1 complete (model-350000 exists); chaining into coco_finish"
    # Idempotent + flock-single-instance; runs stage-2 then the eval
    # protocol, with every chip-holding child registered in the pidfile
    # so the round-end bench can still claim the TPU.
    setsid nohup bash recipes/coco_finish.sh > /tmp/coco_finish.log 2>&1 \
      < /dev/null &
    exit 0
  fi
  if trainer_alive; then
    age=$(( $(date +%s) - $(stat -c %Y "$TRAINLOG" 2>/dev/null || date +%s) ))
    if [ "$age" -gt "$STALL_SECS" ]; then
      log "trainer silent ${age}s (> ${STALL_SECS}s): declaring wedged"
      kill_trainer
      # fall through to the dead-trainer branch next loop
    fi
  else
    if [ ! -f "$PIDFILE" ]; then
      log "pidfile gone (bench took the chip); guard exiting"
      exit 0
    fi
    if tunnel_healthy; then
      # The probe can take minutes — the round-end bench may have
      # claimed the chip meanwhile (it unlinks the pidfile). Re-check
      # before grabbing the tunnel back from it.
      if [ ! -f "$PIDFILE" ]; then
        log "pidfile gone during probe (bench took the chip); guard exiting"
        exit 0
      fi
      relaunch
    else
      log "tunnel unhealthy; retrying in ${POLL}s"
    fi
  fi
  sleep "$POLL"
done
