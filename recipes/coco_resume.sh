#!/bin/bash
# Resume the cross-round COCO stage-1 350k continuation run
# (reference: bashscripts/coco/train.sh:88-180; execution history in
# docs/DESIGN.md "Full-recipe execution: COCO").
#
# The environment wipes /tmp and snapshots/ between rounds, so the
# resume point travels in-repo under artifacts/coco_stage1_resume/
# (newest orbax model-{iter} + the exact config.yaml of the run).
# This script rebuilds whatever is missing and continues training:
#
#   bash recipes/coco_resume.sh          # foreground
#   setsid nohup bash recipes/coco_resume.sh > /tmp/coco_s1.log 2>&1 &
#                                        # detached (survives the caller)
#
# At the end of a round, copy the newest snapshots/coco_synthetic/stage1/
# model-{iter} back into artifacts/coco_stage1_resume/ and commit it.
set -e
cd "$(dirname "$0")/.."

DATAROOT=${DATAROOT:-/tmp/syn_coco}
SNAPDIR=${SNAPDIR:-snapshots/coco_synthetic/stage1}
RESUME=${RESUME:-artifacts/coco_stage1_resume}

if [ ! -f "${DATAROOT}/train.txt" ]; then
  # Identical generator settings to every prior leg of the run — the
  # dataset is a deterministic function of the seed, so a regenerated
  # copy is the SAME dataset the earlier iterations trained on.
  python tools/make_synthetic_dataset.py --root "${DATAROOT}" \
      --train 4000 --train_size 256,256 --val 500 --val_size 500,500 \
      --classes 21 --sp_grid 8,8 --seed 7
fi

mkdir -p "${SNAPDIR}"
if [ -d "${RESUME}" ] && ! ls "${SNAPDIR}"/model-* >/dev/null 2>&1; then
  cp -r "${RESUME}"/* "${SNAPDIR}/"
  echo "restored resume point: $(ls -d "${SNAPDIR}"/model-* | tail -1)"
fi
if [ ! -f "${SNAPDIR}/config.yaml" ]; then
  cp configs/coco_synthetic_stage1.yaml "${SNAPDIR}/config.yaml"
  python - "${SNAPDIR}/config.yaml" <<'EOF'
import sys, yaml
path = sys.argv[1]
cfg = yaml.safe_load(open(path))
cfg['train']['max_iteration'] = 350000
cfg['train']['snapshot_step'] = 5000
yaml.safe_dump(cfg, open(path, 'w'))
print(f'{path}: 350000 iterations, snapshot every 5000')
EOF
fi

# Record the trainer PID (exec below keeps $$) so round-end automation —
# bench.py's _release_tpu() guard in particular — can stop exactly this
# process and take over the single-client TPU tunnel.
echo $$ > /tmp/coco_s1.pid

exec python pyscripts/train.py \
  --data_dir "${DATAROOT}" \
  --data_list "${DATAROOT}/train.txt" \
  --snapshot_dir "${SNAPDIR}" \
  --cfg_path "${SNAPDIR}/config.yaml"
