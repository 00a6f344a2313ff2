#!/bin/bash
# Round-5 training-MFU A/B session (VERDICT r4 item 4): one chip
# NOTE: runs are UNCHAINED — the 10-step scan wrapper explodes the
# tunnel-side compile (>45 min vs 71 s bare, measured this round);
# the ~4 ms/step dispatch inflation is identical across variants so
# the A/B deltas are clean. Absolute MFU quotes use chained stage
# numbers from r4 where available.
# takeover that profiles stage-2 and measures the named candidates —
#   stage2:    baseline (no remat) + xplane trace -> per-HLO buckets
#   stage2:    HSG_BN_LOWP=1 (bf16 BN normalize/apply, f32 moments)
#   cityscapes_full: full remat (r4 baseline 225.1 ms/step)
#   cityscapes_full: selective remat res2,res3
#   cityscapes_full: no remat (r4: 193.9 ms/step, 14.0 GB temps)
#   cityscapes_full: selective remat + BN_LOWP
#
# Chip coordination: same takeover protocol as the milestone eval —
# claim /tmp/hsg_bench.pid (guard stands down), SIGTERM the trainer
# (graceful snapshot), run, resume trainer, release.
set -e
cd "$(dirname "$0")/.."

OUT=${OUT:-artifacts/mfu_ab_r5}
PIDFILE=${PIDFILE:-/tmp/coco_s1.pid}
BENCHPID=${BENCHPID:-/tmp/hsg_bench.pid}
STEPS=${STEPS:-43}
mkdir -p "${OUT}"

echo $$ > "${BENCHPID}"
finish() {
  if [ "${RESUME_AFTER:-1}" = 1 ]; then
    setsid nohup bash recipes/coco_resume.sh > /tmp/coco_s1.log 2>&1 \
      < /dev/null &
    sleep 5
  fi
  rm -f "${BENCHPID}"
}
trap finish EXIT

pid=$(cat "${PIDFILE}" 2>/dev/null || true)
if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null \
   && grep -q "pyscripts/" "/proc/$pid/cmdline" 2>/dev/null; then
  echo "pausing trainer pid $pid for MFU A/B session"
  kill -TERM "$pid"
  for _ in $(seq 180); do kill -0 "$pid" 2>/dev/null || break; sleep 1; done
  kill -0 "$pid" 2>/dev/null && { kill -KILL "$pid"; sleep 3; }
  sleep 3
fi

run() {  # name stage [env pairs...]
  local name=$1 stage=$2; shift 2
  echo "=== ${name}" | tee -a "${OUT}/LOG"
  env "$@" \
    timeout 1500 python tools/rehearse_recipes.py --stage "${stage}" \
    --steps "${STEPS}" 2>>"${OUT}/LOG" \
    | tail -1 | tee "${OUT}/${name}.json" | tee -a "${OUT}/LOG"
  # An empty record means the run died (backend init, OOM). A dead
  # BASELINE means the session itself is broken -> abort; a dead
  # candidate (e.g. legitimate OOM of a no-remat variant) is itself a
  # result -> record and continue.
  if [ ! -s "${OUT}/${name}.json" ]; then
    echo "FAILED: ${name} produced no record" | tee -a "${OUT}/LOG"
    case "${name}" in *_base) exit 1;; esac
  fi
}

# 1. stage-2 baseline + trace (trace run separate so timing stays clean)
run stage2_base stage2
timeout 1500 python tools/rehearse_recipes.py --stage stage2 \
  --steps 12 --profile_dir "${OUT}/trace_stage2" >> "${OUT}/LOG" 2>&1
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
  python tools/analyze_profile.py "${OUT}/trace_stage2" --top 40 \
  > "${OUT}/stage2_hlo_breakdown.txt" 2>&1 || true

# 2. stage-2 BN lowp apply
run stage2_bnlowp stage2 HSG_BN_LOWP=1

# 3-6. cityscapes_full remat variants
run cs_full_remat cityscapes_full HSG_REMAT=1
run cs_full_res23 cityscapes_full HSG_REMAT=res2,res3
run cs_full_noremat cityscapes_full HSG_REMAT=0
run cs_full_res23_bnlowp cityscapes_full HSG_REMAT=res2,res3 HSG_BN_LOWP=1

# 7-9. production stage-2 shape (96 view rows, remat true in config)
run stage2_full_remat stage2_full HSG_REMAT=1
run stage2_full_res23 stage2_full HSG_REMAT=res2,res3
run stage2_full_res23_bnlowp stage2_full HSG_REMAT=res2,res3 HSG_BN_LOWP=1

# 7. stage-2 profile with BN_LOWP if it helped (cheap extra trace)
echo "MFU A/B session complete; resuming training" | tee -a "${OUT}/LOG"
