"""Clip→frame distillation for single-label downstream tasks (reference
``methods/atstframe/train_distill_other.py`` +
``module_distill_other.py:1-520``): distill a frozen finetuned
ATST-Clip classifier into a FrameAST student on a registered dataset
(spcv2 / nsynth / voxceleb1 / ...), with a CentralCrop(12 s) transform,
CE (single-label) or BCE (multilabel) distill+supervised losses mixed
by ``lambda_d``, grad clip 3.0 and the lr·bs/256 scaling rule.
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from audiossl_tpu.datasets import get_dataset
from audiossl_tpu.datasets.pipeline import BatchLoader
from audiossl_tpu.downstream.metrics import Metric
from audiossl_tpu.methods.distill.method import DistillConfig, DistillMethod
from audiossl_tpu.training.checkpoint import CheckpointManager


def build_parser():
    p = argparse.ArgumentParser("train_distill_other")
    p.add_argument("--dataset_name", required=True)
    p.add_argument("--data_path", required=True)
    p.add_argument("--teacher_ckpt_path", required=True,
                   help="finetuned clip classifier (encoder+LinearHead)")
    p.add_argument("--student_ckpt_path", required=True,
                   help="pretrained FrameAST checkpoint")
    p.add_argument("--save_path", default=None)
    p.add_argument("--arch", default="base",
                   choices=["tiny", "small", "base"])
    p.add_argument("--lambda_d", type=float, default=0.5)
    p.add_argument("--learning_rate", type=float, default=5e-4)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--max_epochs", type=int, default=40)
    p.add_argument("--warmup_epochs", type=int, default=2)
    p.add_argument("--layer_wise_lr", type=float, default=0.75)
    p.add_argument("--max_len", type=float, default=12.0,
                   help="CentralCrop seconds (DistillATSTTrainTransform)")
    return p


def main(argv=None):
    # pod-slice bootstrap (no-op single-host; AUDIOSSL_MULTIHOST=1
    # or JAX_COORDINATOR_ADDRESS opt in) - before any backend use
    from audiossl_tpu.parallel.mesh import init_multihost
    init_multihost()
    args = build_parser().parse_args(argv)
    from audiossl_tpu.methods.distill.train import load_teacher_student

    info = get_dataset(args.dataset_name)
    teacher_params, t_head_params, t_head_stats, student_params = \
        load_teacher_student(args.teacher_ckpt_path,
                             args.student_ckpt_path)

    train_ds = info.creator(args.data_path, split="train")
    val_ds = info.creator(args.data_path, split="valid")
    test_ds = info.creator(args.data_path, split="test")

    pad = int(args.max_len * 16000)
    steps_per_epoch = max(len(train_ds) // args.batch_size, 1)
    cfg = DistillConfig(
        arch=args.arch,
        num_labels=info.num_labels, lambda_d=args.lambda_d,
        learning_rate=args.learning_rate * args.batch_size / 256.0,
        max_epochs=args.max_epochs,
        steps_per_epoch=steps_per_epoch,
        warmup_epochs=args.warmup_epochs,
        layer_wise_lr=args.layer_wise_lr,
        max_len=args.max_len,
        multi_label=info.multi_label,
        crop="central")
    method = DistillMethod(cfg, teacher_params, t_head_params,
                           t_head_stats)
    state = method.init_state(jax.random.PRNGKey(0), student_params)
    from audiossl_tpu.parallel.mesh import downstream_spmd

    par = downstream_spmd(state)
    mesh, state, shard = par
    step = jax.jit(method.make_step(), donate_argnums=0)
    evaluate = jax.jit(method.make_eval_fn())

    def eval_split(state, ds):
        m = Metric("mAP" if info.multi_label else "ACC")
        loader = BatchLoader(ds, args.batch_size, pad_samples=pad,
                             shuffle=False, drop_last=False)
        for batch in loader:
            logits = np.asarray(evaluate(state, par.shard_eval(batch)))
            if info.multi_label:
                logits = 1.0 / (1.0 + np.exp(-logits))
            m.update(logits, batch["label"])
        return m.compute()

    mgr = CheckpointManager(f"{args.save_path}/ckpt") \
        if args.save_path and par.is_main else None
    gstep, last_val = 0, float("nan")
    for epoch in range(args.max_epochs):
        loader = BatchLoader(train_ds, args.batch_size, pad_samples=pad,
                             shuffle=True, epoch=epoch)
        for batch in loader:
            state, metrics = step(state, shard(batch))
            gstep += 1
        last_val = eval_split(state, val_ds)
        print(f"epoch {epoch}: val={last_val:.4f} " + " ".join(
            f"{k}={float(v):.5g}" for k, v in sorted(metrics.items())),
            flush=True)
        if mgr is not None:
            mgr.save(gstep, jax.device_get(state))
    # reference tests from last.ckpt (train_distill_other.py:104-106)
    test = eval_split(state, test_ds)
    result = {"dataset": args.dataset_name, "val": last_val,
              "test": test}
    print(json.dumps(result))
    if mgr is not None:
        mgr.wait()
        mgr.close()
    if args.save_path and par.is_main:
        os.makedirs(args.save_path, exist_ok=True)
        with open(os.path.join(args.save_path, "result.json"), "w") as f:
            json.dump(result, f)
    return result


if __name__ == "__main__":
    main()
