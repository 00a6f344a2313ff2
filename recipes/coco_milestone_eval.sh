#!/bin/bash
# Milestone eval for the COCO stage-1 continuation (VERDICT r4, item 2):
# pause the trainer, run the eval protocol (prototype -> retrieval
# inference -> mIoU benchmark; reference bashscripts/coco/train.sh
# eval stages) on snapshot model-$1, record mIoU per milestone under
# artifacts/coco_milestones/, then resume training.
#
# Chip coordination (single-client TPU tunnel): this script claims the
# chip through the same takeover protocol bench.py uses — it holds
# /tmp/hsg_bench.pid for its lifetime, which makes recipes/coco_guard.sh
# idle (never stall-kill the silent trainer log, never relaunch) until
# the eval is done. On ANY exit the trap relaunches the trainer first,
# then releases the claim; if the script dies uncleanly the guard's
# dead-trainer branch relaunches instead.
#
#   bash recipes/coco_milestone_eval.sh 100000 [N_PROTO] [N_VAL]
#
# N_PROTO bounds the training-split prototype pass (fixed across
# milestones so the retrieval bank is comparable); N_VAL the val images.
set -e
cd "$(dirname "$0")/.."

M=${1:?usage: coco_milestone_eval.sh ITER [N_PROTO] [N_VAL]}
NPROTO=${2:-1000}
NVAL=${3:-500}
DATAROOT=${DATAROOT:-/tmp/syn_coco}
SNAPDIR=${SNAPDIR:-snapshots/coco_synthetic/stage1}
OUT=artifacts/coco_milestones/iter-${M}
PIDFILE=${PIDFILE:-/tmp/coco_s1.pid}
BENCHPID=${BENCHPID:-/tmp/hsg_bench.pid}
EVALSNAP=/tmp/eval_snap_${M}

[ -f "${SNAPDIR}/model-${M}/_CHECKPOINT_METADATA" ] \
  || { echo "no committed snapshot ${SNAPDIR}/model-${M}" >&2; exit 1; }
[ -f "${DATAROOT}/train.txt" ] || python tools/make_synthetic_dataset.py \
  --root "${DATAROOT}" --train 4000 --train_size 256,256 \
  --val 500 --val_size 500,500 --classes 21 --sp_grid 8,8 --seed 7

echo $$ > "${BENCHPID}"
finish() {
  # Resume training BEFORE dropping the chip claim so the guard sees a
  # live trainer pidfile again rather than a takeover.
  if [ "${RESUME_AFTER:-1}" = 1 ]; then
    setsid nohup bash recipes/coco_resume.sh > /tmp/coco_s1.log 2>&1 \
      < /dev/null &
    sleep 5
    # The staging watchdog exits when it sees the paused trainer gone
    # (its final-staging pass); restart it alongside the resumed
    # trainer so resume points keep staging between guard relaunches.
    wpid=$(cat /tmp/coco_watchdog.pid 2>/dev/null)
    if [ -z "$wpid" ] || ! kill -0 "$wpid" 2>/dev/null; then
      setsid nohup bash recipes/coco_watchdog.sh \
        >> /tmp/coco_watchdog.log 2>&1 < /dev/null &
    fi
  fi
  rm -f "${BENCHPID}"
}
trap finish EXIT

# Stop the trainer gracefully (SIGTERM -> snapshot-then-exit save).
pid=$(cat "${PIDFILE}" 2>/dev/null || true)
if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null \
   && grep -q "pyscripts/" "/proc/$pid/cmdline" 2>/dev/null; then
  echo "pausing trainer pid $pid for milestone-${M} eval"
  kill -TERM "$pid"
  for _ in $(seq 180); do kill -0 "$pid" 2>/dev/null || break; sleep 1; done
  kill -0 "$pid" 2>/dev/null && { kill -KILL "$pid"; sleep 3; }
  sleep 3  # let the tunnel drop the old client
fi

# Isolated snapshot dir so the eval scripts' latest_step() resolves to
# exactly model-$M regardless of newer snapshots.
mkdir -p "${EVALSNAP}"
[ -e "${EVALSNAP}/model-${M}" ] \
  || ln -s "$(pwd)/${SNAPDIR}/model-${M}" "${EVALSNAP}/model-${M}"
cp -f "${SNAPDIR}/config.yaml" "${EVALSNAP}/config.yaml"

t0=$(date +%s)
python pyscripts/prototype.py \
  --data_dir "${DATAROOT}" \
  --data_list "${DATAROOT}/train.txt" \
  --snapshot_dir "${EVALSNAP}" \
  --save_dir "${EVALSNAP}/results/train" \
  --kmeans_num_clusters 6,6 \
  --label_divisor 2048 \
  --num_images "${NPROTO}" \
  --skip_existing \
  --cfg_path "${EVALSNAP}/config.yaml"

python pyscripts/inference.py \
  --data_dir "${DATAROOT}" \
  --data_list "${DATAROOT}/val.txt" \
  --snapshot_dir "${EVALSNAP}" \
  --save_dir "${EVALSNAP}/results/val" \
  --semantic_memory_dir "${EVALSNAP}/results/train/semantic_prototype" \
  --kmeans_num_clusters 6,6 \
  --label_divisor 2048 \
  --num_images "${NVAL}" \
  --skip_existing \
  --cfg_path "${EVALSNAP}/config.yaml"

mkdir -p "${OUT}"
python pyscripts/benchmark.py \
  --pred_dir "${EVALSNAP}/results/val/semantic_gray" \
  --gt_dir "${DATAROOT}/val/segcls" \
  --num_classes 21 | tee "${OUT}/EVAL.txt"

python - "${OUT}" "${M}" "${NPROTO}" "${NVAL}" "$t0" <<'EOF'
import json, re, sys, time
out, m, nproto, nval, t0 = sys.argv[1:6]
txt = open(f'{out}/EVAL.txt').read()
miou = float(re.search(r'mean IoU: ([\d.]+)%', txt).group(1))
acc = float(re.search(r'mean Pixel Acc: ([\d.]+)%', txt).group(1))
rec = {'milestone': int(m), 'miou': miou, 'pixel_acc': acc,
       'n_proto_images': int(nproto), 'n_val_images': int(nval),
       'eval_wall_s': int(time.time()) - int(t0)}
with open(f'{out}/QUALITY.json', 'w') as f:
    json.dump(rec, f)
print(json.dumps(rec))
EOF

echo "milestone-${M} eval complete; resuming training"
