"""AudioSet-strong (407-class) SED finetune driver (reference
``downstream/train_as_strong.py:26-186`` +
``utils_as_strong/model_as_strong.py:61-325``): strong-only BCE,
optional per-layer lr scaling (0.75), early stopping on the PSDS-style
objective with patience 10.
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np
import pandas as pd

from audiossl_tpu.datasets import get_dataset
from audiossl_tpu.datasets.sed import (
    MixedBatchLoader,
    dcase_encoder,
    load_as_strong_labels,
)
from audiossl_tpu.downstream.train_dcase import evaluate_test
from audiossl_tpu.downstream.train_freeze import load_encoder
from audiossl_tpu.sed.decode import decode_preds
from audiossl_tpu.sed.metrics import SEDMetrics
from audiossl_tpu.sed.module import SEDConfig, SEDTask
from audiossl_tpu.training.checkpoint import TopKKeeper


def evaluate_val_as_strong(predict, state, loader, median_window):
    """Reference AS-strong validation (model_as_strong.py:140-161):
    the monitored ``val/object_metric`` is the mean strong BCE **loss**
    (min mode); intersection macro-F1 is logged alongside."""
    sed = SEDMetrics(intersection_thd=0.5)
    losses = []
    for batch in loader:
        batch.pop("filenames", None)
        strong, _ = predict(state, batch)
        strong = np.asarray(strong)
        y = np.transpose(batch["strong"], (0, 2, 1))[..., :strong.shape[-1]]
        p = np.clip(strong, 1e-7, 1 - 1e-7)
        losses.append(float(-np.mean(y * np.log(p)
                                     + (1 - y) * np.log(1 - p))))
        hard = decode_preds(strong, [0.5], median_window)
        sed.accumulate(np.asarray(hard), y)
    return float(np.mean(losses)) if losses else float("inf"), \
        sed.macro_f1()


def build_parser():
    p = argparse.ArgumentParser("train_as_strong")
    p.add_argument("--pretrained_ckpt_path", required=True)
    p.add_argument("--data_path", required=True)
    p.add_argument("--save_path", default=None)
    from audiossl_tpu.downstream.comparison_models import list_adapters

    p.add_argument("--arch", default="base",
                   choices=["tiny", "small", "base"] + list_adapters(),
                   help="own frame-AST size tier, or a comparison-"
                        "model adapter name (reference "
                        "train_as_strong.py dispatch)")
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--lr_scale", type=float, default=0.75)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_epochs", type=int, default=100)
    p.add_argument("--warmup_epochs", type=int, default=5)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--median_window", type=int, default=7)
    p.add_argument("--freeze_mode", action="store_true")
    p.add_argument("--save_top_k", type=int, default=3)
    # distill mode: frozen finetuned AS-strong teacher added to the
    # loss as tot = strong/2 + distill_strong/2 (reference --arch
    # distill -> utils_as_strong/model_distill_as_strong.py:115-141;
    # the teacher is named explicitly here instead of overloading
    # --arch)
    p.add_argument("--distill_ckpt", default=None,
                   help="teacher SED checkpoint: a previous run's "
                        "TopKKeeper dir or a save_params dir; enables "
                        "distill mode")
    p.add_argument("--distill_arch", default="frameatst",
                   help="teacher encoder arch (size tier or adapter)")
    p.add_argument("--distill_pretrained_ckpt_path", default=None,
                   help="pretrained checkpoint for the teacher "
                        "encoder module")
    p.add_argument("--distill_weight", type=float, default=1.0,
                   help="weight of the strong-distill term (1.0 = "
                        "the reference's strong/2 + d/2)")
    return p


def main(argv=None):
    # pod-slice bootstrap (no-op single-host) - before any backend use
    from audiossl_tpu.parallel.mesh import init_multihost
    init_multihost()
    args = build_parser().parse_args(argv)
    info = get_dataset("as_strong")
    if args.arch in ("tiny", "small", "base"):
        enc_mod, enc_params = load_encoder(
            args.pretrained_ckpt_path, "frame", args.arch, spec_w=1001)
        net_pooling = enc_mod.patch_w
    else:
        from audiossl_tpu.downstream.comparison_models import get_adapter

        adapter = get_adapter(args.arch,
                              ckpt_path=args.pretrained_ckpt_path)
        enc_mod, enc_params = adapter, adapter.params
        net_pooling = adapter.frame_rate_divisor
    labels = load_as_strong_labels(
        os.path.join(args.data_path, "common_labels.txt"))
    encoder = dcase_encoder(net_pooling=net_pooling, labels=labels)

    train_ds = info.creator(args.data_path, split="train", encoder=encoder)
    val_ds = info.creator(args.data_path, split="valid", encoder=encoder)
    test_ds = info.creator(args.data_path, split="test", encoder=encoder)

    train_loader = MixedBatchLoader([train_ds], [args.batch_size])
    # head size follows the actual label list (407 for the published
    # common_labels.txt; the registry metadata states the same)
    teacher_fn = None
    if args.distill_ckpt:
        from audiossl_tpu.downstream.train_dcase import build_sed_teacher

        teacher_fn = build_sed_teacher(
            args.distill_ckpt, args.distill_arch,
            args.distill_pretrained_ckpt_path or args.pretrained_ckpt_path,
            len(labels))
    cfg = SEDConfig(num_labels=len(labels),
                    learning_rate=args.learning_rate,
                    max_epochs=args.max_epochs,
                    steps_per_epoch=max(len(train_loader), 1),
                    warmup_epochs=args.warmup_epochs,
                    median_window=args.median_window,
                    lr_scale=args.lr_scale,
                    freeze_mode=args.freeze_mode,
                    distill_weight=(args.distill_weight
                                    if teacher_fn is not None else 0.0),
                    distill_combine="average_strong")
    task = SEDTask(enc_mod, cfg, teacher_fn=teacher_fn)
    state = task.init_state(jax.random.PRNGKey(0), enc_params)
    # data-parallel over all devices, incl. pod slices under
    # jax.distributed (reference: DDP SED finetune; here replicated
    # state + sharded global batches)
    from audiossl_tpu.parallel.mesh import downstream_spmd

    par = downstream_spmd(state)
    mesh, state, shard = par
    step = jax.jit(task.make_train_step(), donate_argnums=0)
    _predict = jax.jit(task.make_predict_fn())
    # eval path: replicated batches so outputs stay host-addressable
    predict = lambda st, b: _predict(st, par.shard_eval(b))  # noqa: E731

    # reference monitors val strong loss, MIN mode, save_top_k=3 +
    # EarlyStopping(patience 10, min) (train_as_strong.py:48-61)
    keeper = (TopKKeeper(args.save_path, k=args.save_top_k, mode="min")
              if args.save_path and par.is_main else None)
    best_obj, best_state, since = float("inf"), jax.device_get(state), 0
    for epoch in range(args.max_epochs):
        train_loader.set_epoch(epoch)
        for batch in train_loader:
            batch.pop("filenames")
            state, metrics = step(state, shard(batch))
        val_loss, f1 = evaluate_val_as_strong(
            predict, state, MixedBatchLoader([val_ds], [32],
                                             shuffle=False),
            cfg.median_window)
        print(f"epoch {epoch}: val_loss={val_loss:.4f} "
              f"intersection_f1={f1:.4f} "
              f"loss={float(metrics['loss']):.4f}", flush=True)
        if keeper is not None:
            keeper.update(val_loss, epoch, jax.device_get(state))
        if val_loss < best_obj:
            best_obj, best_state, since = (val_loss,
                                           jax.device_get(state), 0)
        else:
            since += 1
            if since >= args.patience:  # reference EarlyStopping
                print(f"early stop at epoch {epoch}")
                break

    gt = pd.read_csv(os.path.join(args.data_path, "eval/meta.tsv"),
                     sep="\t")
    dur_path = os.path.join(args.data_path, "eval/durations.tsv")
    durations = pd.read_csv(dur_path, sep="\t") if os.path.exists(
        dur_path) else pd.DataFrame({
            "filename": gt.filename.unique(),
            "duration": [cfg.audio_len] * gt.filename.nunique()})
    if keeper is not None:
        restored = keeper.restore_best(best_state)
        if restored is not None:
            best_state = restored
    result = evaluate_test(task, predict, best_state,
                           MixedBatchLoader([test_ds], [32],
                                            shuffle=False),
                           encoder, cfg, gt, durations)
    print(json.dumps(result))
    if args.save_path and par.is_main:
        os.makedirs(args.save_path, exist_ok=True)
        with open(os.path.join(args.save_path, "result.json"), "w") as f:
            json.dump(result, f)
    return result


if __name__ == "__main__":
    main()
