#!/bin/bash
# MSCOCO 2-stage HSG recipe: train on COCO (no labels), evaluate on VOC
# 2012 val by prototype retrieval. Equivalent of the reference's
# bashscripts/coco/train.sh, driving the four pipeline scripts per stage.
#
# Usage: DATAROOT=/path/to/data bash recipes/coco_train.sh
set -e

DATAROOT=${DATAROOT:-/data}
SNAPSHOT_DIR=${SNAPSHOT_DIR:-snapshots/coco/fcn_res50_hsg}
TRAIN_DATA_LIST=${TRAIN_DATA_LIST:-datasets/coco/train_rf.txt}
TEST_DATA_LIST=${TEST_DATA_LIST:-datasets/voc12/val.txt}
MEMORY_DATA_LIST=${MEMORY_DATA_LIST:-datasets/voc12/train+_rf.txt}
VOC_ROOT=${VOC_ROOT:-${DATAROOT}/VOCdevkit}

run_stage () {
  local STAGE_DIR=$1 CFG=$2 PRETRAINED=$3
  mkdir -p ${STAGE_DIR}
  if [ -n "${PRETRAINED}" ]; then
    python - "$CFG" "${STAGE_DIR}/config.yaml" "$PRETRAINED" <<'EOF'
import sys, yaml
cfg = yaml.safe_load(open(sys.argv[1]))
cfg['network']['pretrained'] = sys.argv[3]
yaml.safe_dump(cfg, open(sys.argv[2], 'w'))
EOF
  else
    cp ${CFG} ${STAGE_DIR}/config.yaml
  fi

  python pyscripts/train.py \
    --data_dir ${DATAROOT} \
    --data_list ${TRAIN_DATA_LIST} \
    --snapshot_dir ${STAGE_DIR} \
    --cfg_path ${STAGE_DIR}/config.yaml

  python pyscripts/prototype.py \
    --data_dir ${VOC_ROOT} \
    --data_list ${MEMORY_DATA_LIST} \
    --snapshot_dir ${STAGE_DIR} \
    --save_dir ${STAGE_DIR}/results/train \
    --kmeans_num_clusters 6,6 \
    --label_divisor 2048 \
    --cfg_path ${STAGE_DIR}/config.yaml

  python pyscripts/inference.py \
    --data_dir ${VOC_ROOT} \
    --data_list ${TEST_DATA_LIST} \
    --snapshot_dir ${STAGE_DIR} \
    --save_dir ${STAGE_DIR}/results/val \
    --semantic_memory_dir ${STAGE_DIR}/results/train/semantic_prototype \
    --kmeans_num_clusters 6,6 \
    --label_divisor 2048 \
    --cfg_path ${STAGE_DIR}/config.yaml

  python pyscripts/benchmark.py \
    --pred_dir ${STAGE_DIR}/results/val/semantic_gray \
    --gt_dir ${VOC_ROOT}/VOC2012/segcls \
    --num_classes 21
}

run_stage ${SNAPSHOT_DIR}/stage1 configs/coco_stage1.yaml ""
run_stage ${SNAPSHOT_DIR}/stage2 configs/coco_stage2.yaml ${SNAPSHOT_DIR}/stage1
