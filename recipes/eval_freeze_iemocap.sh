#!/bin/bash
# Linear probe on iemocap (reference shell/downtream/freeze defaults:
# lr 2e-3, bs 1024, n_last_blocks 12; multi-fold datasets loop folds).
CKPT=${1:?usage: eval_freeze_iemocap.sh CKPT DATA_DIR [clip|frame]}
DATA=${2:?}
TYPE=${3:-clip}
python -m audiossl_tpu.downstream.train_freeze \
  --pretrained_ckpt_path "$CKPT" --data_path "$DATA" \
  --dataset_name iemocap --model_type "$TYPE" \
  --learning_rate 2e-3 --batch_size 1024 --n_last_blocks 12
