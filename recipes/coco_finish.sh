#!/bin/bash
# Finish the full-scale COCO recipe once the cross-round stage-1 350k
# continuation (recipes/coco_resume.sh + coco_guard.sh) is COMPLETE:
# run the full 20k-iteration stage-2 (all five losses, 448², warm-started
# from the stage-1 snapshot — reference bashscripts/coco/train.sh:182-260),
# then the eval protocol (prototype -> inference -> benchmark), and
# record everything under artifacts/coco_final/.
#
# Idempotent: stage-2 auto-resumes from its newest snapshot; eval steps
# use --skip_existing; safe to relaunch after any interruption.
#
#   setsid nohup bash recipes/coco_finish.sh > /tmp/coco_finish.log 2>&1 &
set -e
cd "$(dirname "$0")/.."

DATAROOT=${DATAROOT:-/tmp/syn_coco}
BASE=${BASE:-snapshots/coco_synthetic}
OUT=${OUT:-artifacts/coco_final}
PIDFILE=${PIDFILE:-/tmp/coco_s1.pid}
BENCHPID=${BENCHPID:-/tmp/hsg_bench.pid}

# Single instance only (the guard may relaunch this after a restart
# while an earlier launch is still running).
exec 9>/tmp/coco_finish.lock
flock -n 9 || { echo "another coco_finish is running; exiting"; exit 0; }

# Run a chip-holding child with its PID in $PIDFILE so bench.py's
# _release_tpu() can stop it when the round-end bench needs the TPU
# (it unlinks the pidfile afterwards — treat that as "stand down now";
# this script is idempotent, so the next round just relaunches it).
run_on_chip() {
  local status=0
  # Single-client tunnel: if the round-end bench is running (it
  # advertises its PID for its whole lifetime), wait it out rather than
  # attaching a second client; once it exits the chip is free and the
  # finish continues.
  while bp=$(cat "$BENCHPID" 2>/dev/null) && [ -n "$bp" ] \
        && kill -0 "$bp" 2>/dev/null; do
    echo "bench (pid $bp) holds the chip; waiting 60s"
    sleep 60
  done
  "$@" &
  echo $! > "$PIDFILE"
  wait $! || status=$?
  # On a nonzero exit, give bench.py's kill loop a moment to unlink the
  # pidfile (it confirms death in 1 s polls before unlinking) so a
  # bench-initiated stop is classified as such, not as a crash.
  [ $status -ne 0 ] && sleep 5
  if [ ! -f "$PIDFILE" ]; then
    echo "bench took the chip; coco_finish pausing (relaunch to continue)"
    exit 0
  fi
  return $status
}

if [ ! -f "${DATAROOT}/train.txt" ]; then
  python tools/make_synthetic_dataset.py --root "${DATAROOT}" \
      --train 4000 --train_size 256,256 --val 500 --val_size 500,500 \
      --classes 21 --sp_grid 8,8 --seed 7
fi

# Stage-1 must be complete (locally or via the committed resume point).
if [ ! -d "${BASE}/stage1/model-350000" ]; then
  if [ -d "artifacts/coco_stage1_resume/model-350000" ]; then
    mkdir -p "${BASE}/stage1"
    cp -r artifacts/coco_stage1_resume/model-350000 "${BASE}/stage1/"
    cp artifacts/coco_stage1_resume/config.yaml "${BASE}/stage1/" \
      2>/dev/null || true  # tolerated under set -e; stage-2 has its own
  else
    echo "stage-1 350k not complete yet (no model-350000); run" \
         "recipes/coco_guard.sh first" >&2
    exit 1
  fi
fi

mkdir -p ${BASE}/stage2
if [ ! -f ${BASE}/stage2/config.yaml ]; then
  cp configs/coco_synthetic_stage2.yaml ${BASE}/stage2/config.yaml
  python - ${BASE}/stage2/config.yaml <<'EOF'
import sys, yaml
path = sys.argv[1]
cfg = yaml.safe_load(open(path))
cfg['train']['max_iteration'] = 20000   # reference train.sh:214
cfg['train']['snapshot_step'] = 2500
yaml.safe_dump(cfg, open(path, 'w'))
print(f'{path}: full 20000 stage-2 iterations')
EOF
fi

run_on_chip python pyscripts/train.py \
  --data_dir ${DATAROOT} \
  --data_list ${DATAROOT}/train.txt \
  --snapshot_dir ${BASE}/stage2 \
  --cfg_path ${BASE}/stage2/config.yaml

run_on_chip python pyscripts/prototype.py \
  --data_dir ${DATAROOT} \
  --data_list ${DATAROOT}/train.txt \
  --snapshot_dir ${BASE}/stage2 \
  --save_dir ${BASE}/stage2/results/train \
  --kmeans_num_clusters 6,6 \
  --label_divisor 2048 \
  --skip_existing \
  --cfg_path ${BASE}/stage2/config.yaml

run_on_chip python pyscripts/inference.py \
  --data_dir ${DATAROOT} \
  --data_list ${DATAROOT}/val.txt \
  --snapshot_dir ${BASE}/stage2 \
  --save_dir ${BASE}/stage2/results/val \
  --semantic_memory_dir ${BASE}/stage2/results/train/semantic_prototype \
  --kmeans_num_clusters 6,6 \
  --label_divisor 2048 \
  --skip_existing \
  --cfg_path ${BASE}/stage2/config.yaml

mkdir -p "${OUT}"
python pyscripts/benchmark.py \
  --pred_dir ${BASE}/stage2/results/val/semantic_gray \
  --gt_dir ${DATAROOT}/val/segcls \
  --num_classes 21 | tee "${OUT}/EVAL.txt"

# Preserve the final stage-2 model + the run report for the record.
# COMMITTED checkpoints only (same filter as coco_watchdog.sh): an
# interrupted save leaves an orbax tmp dir that must never be archived
# as the final model.
newest=$(for d in ${BASE}/stage2/model-*; do
  case "$d" in *orbax-checkpoint-tmp*) continue;; esac
  [ -f "$d/_CHECKPOINT_METADATA" ] || continue
  basename "$d"
done | sort -t- -k2 -n | tail -1)
if [ -n "$newest" ]; then
  cp -r "${BASE}/stage2/$newest" "${OUT}/"
  cp ${BASE}/stage2/config.yaml "${OUT}/"
fi
python tools/recipe_report.py ${BASE}/stage2 > "${OUT}/STAGE2_REPORT.txt" || true
python tools/recipe_report.py ${BASE}/stage1 > "${OUT}/STAGE1_REPORT.txt" || true
echo "coco_finish: complete; results in ${OUT}/"
