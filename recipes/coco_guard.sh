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
# wedged, killed (SIGTERM, generous grace for the graceful snapshot
# save, then SIGKILL), and relaunched once the tunnel answers a small
# matmul probe again. While it is dead: probe, relaunch when healthy.
#
# Coexistence with the round-end bench (single-client TPU tunnel):
# bench.py advertises its lifetime in /tmp/hsg_bench.pid and unlinks the
# trainer pidfile when it claims the chip. The guard (a) never launches
# anything while the bench PID is alive, and (b) exits for the round
# when a previously-seen pidfile disappears. A missing pidfile at
# STARTUP is a fresh round (coco_resume.sh writes it only after dataset
# regeneration), not a bench takeover.
#
# When stage-1 is COMPLETE (model-350000 exists) the guard chains into
# recipes/coco_finish.sh (stage-2 + eval protocol) and exits.
#
#   setsid nohup bash recipes/coco_guard.sh > /tmp/coco_guard.log 2>&1 &
cd "$(dirname "$0")/.."

SNAPDIR=${SNAPDIR:-snapshots/coco_synthetic/stage1}
PIDFILE=${PIDFILE:-/tmp/coco_s1.pid}
BENCHPID=${BENCHPID:-/tmp/hsg_bench.pid}
TRAINLOG=${TRAINLOG:-/tmp/coco_s1.log}
STALL_SECS=${STALL_SECS:-1500}
TERM_GRACE=${TERM_GRACE:-120}
POLL=${POLL:-120}
# Collaborators, overridable so tests/test_guard_behavior.py can drive
# the stall->kill->probe->relaunch loop against a fake trainer. Defaults
# are the production wiring.
RESUME_SCRIPT=${RESUME_SCRIPT:-recipes/coco_resume.sh}
PROBE_CMD=${PROBE_CMD:-}          # empty -> real TPU matmul probe
WATCHDOG_PIDFILE=${WATCHDOG_PIDFILE:-/tmp/coco_watchdog.pid}
WATCHDOG_SCRIPT=${WATCHDOG_SCRIPT:-recipes/coco_watchdog.sh}

RESUME_PID=""        # the relaunched coco_resume.sh shell (== trainer
                     # after its exec); covers the window before the
                     # pidfile is (re)written
SEEN_PIDFILE=0       # only a pidfile that EXISTED and then vanished
                     # means "the bench took the chip"

log() { echo "$(date -u +%H:%M:%S) $*"; }

is_continuation_job() {
  # PID-reuse safe: the PID must be live AND running a pyscripts/ job.
  [ -n "$1" ] && kill -0 "$1" 2>/dev/null \
    && grep -q "pyscripts/" "/proc/$1/cmdline" 2>/dev/null
}

trainer_alive() {
  pid=$(cat "$PIDFILE" 2>/dev/null)
  if is_continuation_job "$pid"; then
    return 0
  fi
  # Pre-pidfile window of a relaunch (dataset regeneration etc).
  [ -n "$RESUME_PID" ] && kill -0 "$RESUME_PID" 2>/dev/null
}

bench_running() {
  bp=$(cat "$BENCHPID" 2>/dev/null)
  [ -n "$bp" ] && kill -0 "$bp" 2>/dev/null
}

tunnel_healthy() {
  if [ -n "$PROBE_CMD" ]; then
    eval "$PROBE_CMD"
    return $?
  fi
  # Device listing alone is NOT health (it kept working through the
  # observed stall) — require a round-tripped compute RPC.
  timeout 300 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()) == 128.0**3
print('tunnel ok')" >/dev/null 2>&1
}

kill_trainer() {
  pid=$(cat "$PIDFILE" 2>/dev/null)
  [ -n "$RESUME_PID" ] && [ "$pid" != "$RESUME_PID" ] \
    && kill -TERM "$RESUME_PID" 2>/dev/null
  is_continuation_job "$pid" || return 0
  kill -TERM "$pid" 2>/dev/null
  # Generous grace: a trainer that un-wedges right after the SIGTERM
  # needs time for its graceful snapshot-then-exit save.
  for _ in $(seq "$TERM_GRACE"); do
    kill -0 "$pid" 2>/dev/null || return 0
    sleep 1
  done
  kill -KILL "$pid" 2>/dev/null
  sleep 3
}

relaunch() {
  log "relaunching trainer"
  setsid nohup bash "$RESUME_SCRIPT" > "$TRAINLOG" 2>&1 < /dev/null &
  RESUME_PID=$!
  sleep 5
  # The staging watchdog exits when a trainer dies; give the new trainer
  # one (it checks liveness via the watchdog's own pidfile — no
  # process-name pattern matching).
  wpid=$(cat "$WATCHDOG_PIDFILE" 2>/dev/null)
  if [ -z "$wpid" ] || ! kill -0 "$wpid" 2>/dev/null; then
    log "restarting staging watchdog"
    setsid nohup bash "$WATCHDOG_SCRIPT" \
      >> /tmp/coco_watchdog.log 2>&1 < /dev/null &
  fi
}

while :; do
  [ -f "$PIDFILE" ] && SEEN_PIDFILE=1

  # Stand-down checks FIRST: never touch the chip while the bench has
  # it or after it cleared the pidfile for the round.
  if bench_running; then
    log "bench holds the chip; waiting"
    sleep "$POLL"
    continue
  fi
  if [ "$SEEN_PIDFILE" = 1 ] && [ ! -f "$PIDFILE" ] && ! trainer_alive; then
    log "pidfile gone (bench took the chip); guard exiting"
    exit 0
  fi

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
    if tunnel_healthy; then
      # The probe can take minutes — re-check the bench takeover signals
      # before grabbing the tunnel.
      if bench_running || { [ "$SEEN_PIDFILE" = 1 ] && [ ! -f "$PIDFILE" ]; }
      then
        log "bench claimed the chip during probe; guard exiting"
        exit 0
      fi
      relaunch
    else
      log "tunnel unhealthy; retrying in ${POLL}s"
    fi
  fi
  sleep "$POLL"
done
