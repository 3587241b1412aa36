"""ATST-C2F distillation CLI (reference
``methods/atstframe/train_distill.py:28-86``): distill a frozen
finetuned clip classifier into a FrameAST student on AudioSet, with a
class-balanced weighted sampler.
"""
from __future__ import annotations

import argparse

import jax
import numpy as np

from audiossl_tpu.datasets.packed import PackedAudioDataset
from audiossl_tpu.datasets.pipeline import BatchLoader
from audiossl_tpu.methods.distill.method import DistillConfig, DistillMethod
from audiossl_tpu.training.checkpoint import CheckpointManager


def class_balance_weights(dataset, num_labels: int) -> np.ndarray:
    """Per-sample weights 1/sqrt(class frequency) summed over active
    labels (reference test_sampler.py weights_labels construction)."""
    counts = np.zeros(num_labels)
    labels = []
    for i in range(len(dataset)):
        _, y = dataset[i][:2]
        y = np.asarray(y)
        labels.append(y)
        counts += y
    counts = np.maximum(counts, 1.0)
    w = np.array([(y / np.sqrt(counts)).sum() for y in labels])
    return np.maximum(w, 1e-8)


def build_parser():
    p = argparse.ArgumentParser("train_distill")
    p.add_argument("--data_path", required=True)
    p.add_argument("--teacher_ckpt_path", required=True,
                   help="finetuned clip classifier (encoder+LinearHead)")
    p.add_argument("--student_ckpt_path", required=True,
                   help="pretrained FrameAST checkpoint")
    p.add_argument("--save_path", default=None)
    p.add_argument("--num_labels", type=int, default=527)
    p.add_argument("--lambda_d", type=float, default=1.0)
    p.add_argument("--learning_rate", type=float, default=1e-1)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--max_epochs", type=int, default=40)
    p.add_argument("--warmup_epochs", type=int, default=2)
    p.add_argument("--layer_wise_lr", type=float, default=0.75)
    p.add_argument("--balanced_sampling", action="store_true")
    return p


def load_teacher_student(teacher_ckpt_path: str,
                         student_ckpt_path: str):
    """Load the frozen finetuned clip-classifier teacher (encoder +
    LinearHead) and the pretrained FrameAST student params from torch
    or orbax checkpoints (reference train_distill.py:40-56 prefix
    handling)."""
    from audiossl_tpu.compat.torch_import import (
        encoder_params_from_torch,
        linear_head_from_torch,
        load_pretrain_checkpoint,
        strip_prefixes,
        subtree,
    )
    import torch

    ckpt = torch.load(teacher_ckpt_path, map_location="cpu",
                      weights_only=False)
    sd = strip_prefixes(ckpt.get("state_dict", ckpt))
    enc_sd = subtree(sd, "encoder.encoder.") or subtree(sd, "encoder.")
    teacher_params = encoder_params_from_torch(enc_sd)
    head_sd = subtree(sd, "head.")
    t_head_params, t_head_stats = linear_head_from_torch(head_sd)
    if student_ckpt_path.endswith(".ckpt"):
        student_params, _ = load_pretrain_checkpoint(student_ckpt_path,
                                                     which="teacher")
    else:  # orbax params dir
        from audiossl_tpu.training.checkpoint import restore_params

        student_params = restore_params(student_ckpt_path)
    return teacher_params, t_head_params, t_head_stats, student_params


def main(argv=None):
    # pod-slice bootstrap (no-op single-host; AUDIOSSL_MULTIHOST=1
    # or JAX_COORDINATOR_ADDRESS opt in) - before any backend use
    from audiossl_tpu.parallel.mesh import init_multihost
    init_multihost()
    args = build_parser().parse_args(argv)

    teacher_params, t_head_params, t_head_stats, student_params = \
        load_teacher_student(args.teacher_ckpt_path,
                             args.student_ckpt_path)

    dataset = PackedAudioDataset(args.data_path, "train")
    weights = None
    if args.balanced_sampling:
        weights = class_balance_weights(dataset, args.num_labels)

    cfg = DistillConfig(
        num_labels=args.num_labels, lambda_d=args.lambda_d,
        learning_rate=args.learning_rate * args.batch_size / 256.0,
        max_epochs=args.max_epochs,
        steps_per_epoch=max(len(dataset) // args.batch_size, 1),
        warmup_epochs=args.warmup_epochs,
        layer_wise_lr=args.layer_wise_lr)
    method = DistillMethod(cfg, teacher_params, t_head_params,
                           t_head_stats)
    state = method.init_state(jax.random.PRNGKey(0), student_params)
    from audiossl_tpu.parallel.mesh import downstream_spmd

    par = downstream_spmd(state)
    mesh, state, shard = par
    step = jax.jit(method.make_step(), donate_argnums=0)

    mgr = CheckpointManager(f"{args.save_path}/ckpt") \
        if args.save_path and par.is_main else None
    gstep = 0
    for epoch in range(args.max_epochs):
        loader = BatchLoader(dataset, args.batch_size,
                             pad_samples=cfg.out_samples, shuffle=True,
                             epoch=epoch, weights=weights)
        for batch in loader:
            state, metrics = step(state, shard(batch))
            gstep += 1
            if gstep % 50 == 0:
                print(f"step {gstep} " + " ".join(
                    f"{k}={float(v):.5g}"
                    for k, v in sorted(metrics.items())), flush=True)
        if mgr is not None:
            mgr.save(gstep, jax.device_get(state))
    if mgr is not None:
        mgr.wait()
        mgr.close()
    return state


if __name__ == "__main__":
    main()
