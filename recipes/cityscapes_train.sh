#!/bin/bash
# Cityscapes 1-stage HSG recipe. Equivalent of the reference's
# bashscripts/cityscapes/train.sh.
#
# Usage: DATAROOT=/path/to/Cityscapes bash recipes/cityscapes_train.sh
set -e

DATAROOT=${DATAROOT:-/data/Cityscapes}
SNAPSHOT_DIR=${SNAPSHOT_DIR:-snapshots/cityscapes/fcn_res50_hsg}/stage1
TRAIN_DATA_LIST=${TRAIN_DATA_LIST:-datasets/cityscapes/train_pmi.txt}
TEST_DATA_LIST=${TEST_DATA_LIST:-datasets/cityscapes/val.txt}

mkdir -p ${SNAPSHOT_DIR}
cp configs/cityscapes.yaml ${SNAPSHOT_DIR}/config.yaml

python pyscripts/train.py \
  --data_dir ${DATAROOT} \
  --data_list ${TRAIN_DATA_LIST} \
  --snapshot_dir ${SNAPSHOT_DIR} \
  --cfg_path ${SNAPSHOT_DIR}/config.yaml

python pyscripts/prototype.py \
  --data_dir ${DATAROOT} \
  --data_list ${TRAIN_DATA_LIST} \
  --snapshot_dir ${SNAPSHOT_DIR} \
  --save_dir ${SNAPSHOT_DIR}/results/train \
  --kmeans_num_clusters 12,24 \
  --label_divisor 2048 \
  --cfg_path ${SNAPSHOT_DIR}/config.yaml

python pyscripts/inference.py \
  --data_dir ${DATAROOT} \
  --data_list ${TEST_DATA_LIST} \
  --snapshot_dir ${SNAPSHOT_DIR} \
  --save_dir ${SNAPSHOT_DIR}/results/val \
  --semantic_memory_dir ${SNAPSHOT_DIR}/results/train/semantic_prototype \
  --kmeans_num_clusters 12,24 \
  --label_divisor 2048 \
  --cfg_path ${SNAPSHOT_DIR}/config.yaml

python pyscripts/benchmark.py \
  --pred_dir ${SNAPSHOT_DIR}/results/val/semantic_gray \
  --gt_dir ${DATAROOT}/gtFineId/val/all \
  --string_replace leftImg8bit,gtFineId_labelIds \
  --num_classes 19
