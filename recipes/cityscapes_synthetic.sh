#!/bin/bash
# Cityscapes recipe at FULL reference scale (38,000 iterations, global
# batch 32 images = 64 view rows @448²) on ONE chip, driven end-to-end
# on the synthetic dataset — the environment ships no real datasets.
# See configs/cityscapes_synthetic.yaml for the (documented) deltas vs
# the real-data recipe; reference bashscripts/cityscapes/train.sh:13-53.
#
# Usage:
#   python tools/make_synthetic_dataset.py --root /tmp/syn_cs \
#       --train 2975 --train_size 256,512 --val 500 --val_size 1024,2048 \
#       --classes 19 --sp_grid 8,16
#   DATAROOT=/tmp/syn_cs bash recipes/cityscapes_synthetic.sh
set -e

DATAROOT=${DATAROOT:-/tmp/syn_cs}
SNAPSHOT_DIR=${SNAPSHOT_DIR:-snapshots/cityscapes_synthetic/fcn_res50_hsg_cs}

mkdir -p ${SNAPSHOT_DIR}
cp configs/cityscapes_synthetic.yaml ${SNAPSHOT_DIR}/config.yaml

# train.resume: true in the config: a restart (preemption, SIGKILL)
# resumes from the newest snapshot automatically.
python pyscripts/train.py \
  --data_dir ${DATAROOT} \
  --data_list ${DATAROOT}/train.txt \
  --snapshot_dir ${SNAPSHOT_DIR} \
  --cfg_path ${SNAPSHOT_DIR}/config.yaml

python pyscripts/prototype.py \
  --data_dir ${DATAROOT} \
  --data_list ${DATAROOT}/train.txt \
  --snapshot_dir ${SNAPSHOT_DIR} \
  --save_dir ${SNAPSHOT_DIR}/results/train \
  --kmeans_num_clusters 12,24 \
  --label_divisor 2048 \
  --cfg_path ${SNAPSHOT_DIR}/config.yaml

python pyscripts/inference.py \
  --data_dir ${DATAROOT} \
  --data_list ${DATAROOT}/val.txt \
  --snapshot_dir ${SNAPSHOT_DIR} \
  --save_dir ${SNAPSHOT_DIR}/results/val \
  --semantic_memory_dir ${SNAPSHOT_DIR}/results/train/semantic_prototype \
  --kmeans_num_clusters 12,24 \
  --label_divisor 2048 \
  --cfg_path ${SNAPSHOT_DIR}/config.yaml

python pyscripts/benchmark.py \
  --pred_dir ${SNAPSHOT_DIR}/results/val/semantic_gray \
  --gt_dir ${DATAROOT}/val/segcls \
  --num_classes 19
