"""Finetuning driver (reference ``atst_downstream_train_finetune``,
``methods/atst/downstream/train_finetune.py:48-201``): joint
encoder+head training with per-step cosine LR, layer-wise LR decay,
on-device mixup target smoothing, grad clip 3.0; evaluates the best
checkpoint by val metric.
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from audiossl_tpu.datasets import get_dataset
from audiossl_tpu.datasets.pipeline import BatchLoader
from audiossl_tpu.downstream.finetune import FinetuneConfig, FinetuneTask
from audiossl_tpu.downstream.metrics import Metric
from audiossl_tpu.downstream.train_freeze import load_encoder


def build_parser():
    p = argparse.ArgumentParser("atst_downstream_train_finetune")
    p.add_argument("--pretrained_ckpt_path", required=True)
    p.add_argument("--data_path", required=True)
    p.add_argument("--dataset_name", required=True)
    p.add_argument("--save_path", default=None)
    p.add_argument("--model_type", default="clip",
                   choices=["clip", "frame"])
    p.add_argument("--arch", default="small",
                   choices=["tiny", "small", "base"])
    p.add_argument("--learning_rate", type=float, default=5e-4)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--max_epochs", type=int, default=50)
    p.add_argument("--warmup_epochs", type=int, default=5)
    p.add_argument("--layer_wise_lr", type=float, default=0.75)
    p.add_argument("--mixup", action="store_true", default=True)
    p.add_argument("--no-mixup", dest="mixup", action="store_false")
    # per-dataset finetune knobs from the reference shell recipes
    # (shell/downtream/finetune/eval_func.sh args 9-17)
    p.add_argument("--alpha", type=float, default=0.5,
                   help="mixup beta parameter")
    p.add_argument("--mixup_ratio", type=float, default=1.0,
                   help="probability of mixing each sample")
    p.add_argument("--mask_aug", action="store_true",
                   help="SpecAugment-style freq/time masking")
    p.add_argument("--rrc", action="store_true",
                   help="RandomResizeCrop on the training mel")
    p.add_argument("--freeze_embed", action="store_true",
                   help="zero LR on patch/pos/mask embeddings")
    p.add_argument("--use_encoder", default="teacher",
                   choices=["teacher", "student"],
                   help="branch to load from distilled checkpoints")
    p.add_argument("--n_last_blocks", type=int, default=12)
    p.add_argument("--train_len", type=float, default=12.0)
    p.add_argument("--fold", type=int, default=0)
    return p


def main(argv=None):
    # pod-slice bootstrap (no-op single-host) - before any backend use
    from audiossl_tpu.parallel.mesh import downstream_spmd, init_multihost
    init_multihost()
    args = build_parser().parse_args(argv)
    info = get_dataset(args.dataset_name)
    enc, params = load_encoder(args.pretrained_ckpt_path, args.model_type,
                               args.arch, which=args.use_encoder)

    def make_loader(split, shuffle):
        kw = dict(fold=args.fold) if info.num_folds > 1 else {}
        ds = info.creator(args.data_path, split=split, **kw)
        weights = None
        if shuffle and args.dataset_name.startswith("audioset"):
            # class-balanced sampling for AudioSet finetuning
            # (reference WeightedRandomSampler, train_finetune.py:48-110)
            from audiossl_tpu.methods.distill.train import (
                class_balance_weights,
            )

            weights = class_balance_weights(ds, info.num_labels)
        return BatchLoader(ds, args.batch_size,
                           pad_samples=int(args.train_len * 16000),
                           shuffle=shuffle, drop_last=shuffle,
                           weights=weights)

    train_loader = make_loader("train", True)
    steps_per_epoch = max(len(train_loader), 1)
    n_blocks = args.n_last_blocks
    embed_dim = enc.embed_dim * n_blocks * (
        2 if args.model_type == "clip" else 1)
    cfg = FinetuneConfig(
        learning_rate=args.learning_rate * args.batch_size / 256.0,
        max_epochs=args.max_epochs,
        steps_per_epoch=steps_per_epoch,
        warmup_steps=args.warmup_epochs * steps_per_epoch,
        layer_wise_lr=args.layer_wise_lr,
        multi_label=info.multi_label,
        num_labels=info.num_labels,
        n_blocks=n_blocks,
        crop_len_s=args.train_len,
        mixup=args.mixup,
        mixup_alpha=args.alpha,
        mixup_ratio=args.mixup_ratio,
        specaug=args.mask_aug,
        rrc=args.rrc,
        freeze_embed=args.freeze_embed,
    )
    task = FinetuneTask(enc, cfg, embed_dim)
    state = task.init_state(jax.random.PRNGKey(0), params)
    # data-parallel over all devices — local, or the full pod slice
    # when launched under jax.distributed (reference: Lightning DDP
    # multi-GPU finetune, sync-BN; here: replicated state + sharded
    # global batches under one jitted SPMD step)
    par = downstream_spmd(state)
    mesh, state, shard = par
    step = jax.jit(task.make_train_step(), donate_argnums=0)
    evaluate = jax.jit(task.make_eval_fn())

    def eval_split(state, split):
        m = Metric("mAP" if info.multi_label else "ACC")
        for batch in make_loader(split, False):
            logits = np.asarray(evaluate(state, par.shard_eval(batch)))
            if info.multi_label:
                logits = 1.0 / (1.0 + np.exp(-logits))
            m.update(logits, batch["label"])
        return m.compute()

    # reference persists save_top_k=10 for audioset else 1
    # (train_finetune.py:122), monitored max on the val metric
    if args.save_path and par.is_main:  # one writer per pod slice
        from audiossl_tpu.training.checkpoint import TopKKeeper

        k = 10 if "audioset" in args.dataset_name else 1
        keeper = TopKKeeper(args.save_path, k=k)
    else:
        keeper = None
    best_val, best_state = -1.0, None
    for epoch in range(args.max_epochs):
        train_loader.set_epoch(epoch)
        for batch in train_loader:
            state, metrics = step(state, shard(batch))
        v = eval_split(state, "valid")
        print(f"epoch {epoch}: val={v:.4f} "
              f"loss={float(metrics['loss']):.4f}", flush=True)
        if v > best_val:
            best_val, best_state = v, jax.device_get(state)
        if keeper is not None:
            keeper.update(v, epoch, jax.device_get(state))

    if keeper is not None:
        restored = keeper.restore_best(best_state)
        if restored is not None:
            best_state = restored
    test = eval_split(best_state, "test")
    result = {"dataset": args.dataset_name, "val": best_val, "test": test}
    print(json.dumps(result))
    if args.save_path and par.is_main:
        os.makedirs(args.save_path, exist_ok=True)
        with open(os.path.join(args.save_path, "result.json"), "w") as f:
            json.dump(result, f)
    return result


if __name__ == "__main__":
    main()
