#!/bin/bash
# ATST-C2F distillation on AudioSet-2M (reference train_distill.py:
# frozen finetuned clip teacher -> FrameAST student, layer decay 0.75,
# class-balanced sampling).
TEACHER=${1:?usage: distill_c2f.sh TEACHER_CKPT STUDENT_CKPT DATA_DIR}
STUDENT=${2:?}
DATA=${3:?}
python -m audiossl_tpu.methods.distill.train \
  --teacher_ckpt_path "$TEACHER" --student_ckpt_path "$STUDENT" \
  --data_path "$DATA" --balanced_sampling --layer_wise_lr 0.75
