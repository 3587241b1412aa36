"""DCASE SED finetune driver (reference
``downstream/train_dcase.py:26-175`` + ``utils_dcase/model_dcase.py``).

Train on mixed strong-synthetic/weak batches, monitor the intersection
F1 + weak F1 objective, and score the test split with PSDS scenario 1
(dtc/gtc 0.7) and scenario 2 (0.1/0.1, cttc 0.3, alpha_ct 0.5) plus
collar event-F1.
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from audiossl_tpu.datasets import get_dataset
from audiossl_tpu.datasets.sed import MixedBatchLoader, dcase_encoder
from audiossl_tpu.downstream.train_freeze import load_encoder
from audiossl_tpu.sed.decode import batched_decode_preds, decode_preds
from audiossl_tpu.sed.metrics import (SEDMetrics, WeakF1Accumulator,
                                      clip_avg_f1)
from audiossl_tpu.sed.module import SEDConfig, SEDState, SEDTask
from audiossl_tpu.sed.psds import compute_psds, event_based_f1
from audiossl_tpu.training.checkpoint import TopKKeeper


def evaluate_val(task, predict, state, synth_loader, weak_loader,
                 median_window):
    """Reference val objective (utils_dcase/model_dcase.py:175-232):
    intersection macro-F1 on the synth-val strong labels + weak
    macro-F1 (torchmetrics multilabel, threshold 0.5) on the weak-val
    clip labels."""
    sed = SEDMetrics(intersection_thd=0.5)
    for batch in synth_loader:
        batch.pop("filenames", None)  # strings can't enter jit
        strong, _ = predict(state, batch)
        y = np.transpose(batch["strong"], (0, 2, 1))[..., :strong.shape[-1]]
        hard = decode_preds(strong, [0.5], median_window)
        sed.accumulate(np.asarray(hard), y)
    f1 = sed.macro_f1()

    weak_f1 = WeakF1Accumulator()
    for batch in weak_loader:
        batch.pop("filenames", None)
        strong, weak = predict(state, batch)
        y = np.transpose(batch["strong"], (0, 2, 1))[..., :strong.shape[-1]]
        weak_f1.accumulate(np.asarray(weak),
                           (y.sum(-1) > 0).astype(np.float32))
    return f1, weak_f1.macro_f1()


def evaluate_test(task, predict, state, loader, encoder, cfg,
                  ground_truth, durations):
    thds = np.arange(1 / (cfg.n_test_thresholds * 2), 1,
                     1 / cfg.n_test_thresholds)
    buffers = {t: [] for t in thds}
    buf05 = []
    for batch in loader:
        fnames = batch.pop("filenames")
        strong, _ = predict(state, batch)
        dfs = batched_decode_preds(strong, fnames, encoder,
                                   thresholds=list(thds),
                                   median_filter=cfg.median_window)
        for t in thds:
            buffers[t].append(dfs[t])
        buf05.append(batched_decode_preds(
            strong, fnames, encoder, thresholds=[0.5],
            median_filter=cfg.median_window)[0.5])
    dets = {t: pd.concat(v) if v else pd.DataFrame(
        columns=["event_label", "onset", "offset", "filename"])
        for t, v in buffers.items()}
    d05 = pd.concat(buf05) if buf05 else pd.DataFrame(
        columns=["event_label", "onset", "offset", "filename"])
    psds1 = compute_psds(dets, ground_truth, durations,
                         dtc_threshold=0.7, gtc_threshold=0.7,
                         alpha_ct=0.0, alpha_st=1.0)
    psds2 = compute_psds(dets, ground_truth, durations,
                         dtc_threshold=0.1, gtc_threshold=0.1,
                         cttc_threshold=0.3, alpha_ct=0.5, alpha_st=1.0)
    ef1 = event_based_f1(d05, ground_truth)
    return {"psds1": psds1, "psds2": psds2, "event_f1": ef1}


def build_parser():
    p = argparse.ArgumentParser("train_dcase")
    p.add_argument("--pretrained_ckpt_path", required=True)
    p.add_argument("--data_path", required=True)
    p.add_argument("--save_path", default=None)
    from audiossl_tpu.downstream.comparison_models import list_adapters

    p.add_argument("--arch", default="base",
                   choices=["tiny", "small", "base"] + list_adapters(),
                   help="own frame-AST size tier, or a comparison-"
                        "model adapter name (reference "
                        "train_dcase.py:139-175 dispatch)")
    p.add_argument("--learning_rate", type=float, default=1e-1)
    p.add_argument("--batch_size_synth", type=int, default=128)
    p.add_argument("--batch_size_weak", type=int, default=128)
    p.add_argument("--max_epochs", type=int, default=100)
    p.add_argument("--warmup_epochs", type=int, default=10)
    p.add_argument("--median_window", type=int, default=7)
    p.add_argument("--freeze_mode", action="store_true")
    p.add_argument("--save_top_k", type=int, default=3)
    # distill mode: frozen finetuned SED teacher added to the loss
    # (reference utils_dcase/model_distill.py + train_dcase.py:59-71
    # --distill_mode; here the teacher is named explicitly instead of
    # the clip<->frame mode string)
    p.add_argument("--distill_ckpt", default=None,
                   help="teacher SED checkpoint: a previous run's "
                        "save_path (best of top/) or a direct state "
                        "dir; enables distill mode")
    p.add_argument("--distill_arch", default="frameatst",
                   help="teacher encoder arch (size tier or adapter "
                        "name, like --arch)")
    p.add_argument("--distill_pretrained_ckpt_path", default=None,
                   help="pretrained checkpoint used to construct the "
                        "teacher encoder module (the teacher's "
                        "--pretrained_ckpt_path)")
    p.add_argument("--distill_weight", type=float, default=1.0,
                   help="weight of the teacher BCE term; 1.0 = the "
                        "reference's tot/2 + loss_d/2 ratio")
    return p


def build_sed_teacher(sed_ckpt, arch, pretrained_ckpt, num_labels):
    """Frozen finetuned SED teacher -> ``teacher_fn(wav, valid) ->
    (strong probs [B,C,T], weak probs [B,C])``.

    Reference utils_dcase/model_distill.py:163-174 +
    distill_atst_module.py:17-31: the teacher is a full finetuned SED
    model (encoder of the other family + trained SED head) loaded from
    a finetuned checkpoint and kept frozen. Here the checkpoint is a
    state saved by this driver (TopKKeeper layout or a direct
    ``save_params`` dir)."""
    from audiossl_tpu.downstream.comparison_models import (
        EncoderAdapter,
        get_adapter,
    )
    from audiossl_tpu.sed.head import SEDHead
    from audiossl_tpu.training.checkpoint import restore_params

    if arch in ("tiny", "small", "base"):
        enc_mod, _ = load_encoder(pretrained_ckpt, "frame", arch,
                                  spec_w=1001)
        adapter = EncoderAdapter(encoder=enc_mod, params=None)
    else:
        adapter = get_adapter(arch, ckpt_path=pretrained_ckpt)
    head = SEDHead(num_labels=num_labels)

    index_path = os.path.join(sed_ckpt, "top", "index.json")
    if os.path.exists(index_path):
        from audiossl_tpu.training.checkpoint import read_topk_index

        index, mode = read_topk_index(index_path)
        # BEST entry per the keeper's monitor mode (AS-strong keepers
        # store val LOSS with mode="min" - max() would pick the worst)
        sel = max if mode == "max" else min
        tag = sel(index, key=lambda t: index[t])
        tree = restore_params(os.path.join(sed_ckpt, "top", str(tag)))
    else:
        tree = restore_params(sed_ckpt)
    enc_p = jax.tree.map(jnp.asarray, tree["enc_params"])
    head_p = jax.tree.map(jnp.asarray, tree["head_params"])

    def teacher_fn(wav, valid):
        frames = adapter.frame_embeddings(enc_p, wav, valid)
        return head.apply({"params": head_p}, frames)

    return teacher_fn


def main(argv=None):
    # pod-slice bootstrap (no-op single-host) - before any backend use
    from audiossl_tpu.parallel.mesh import init_multihost
    init_multihost()
    args = build_parser().parse_args(argv)
    info = get_dataset("dcase")
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
    encoder = dcase_encoder(net_pooling=net_pooling)

    synth, weak = info.creator(args.data_path, split="train",
                               encoder=encoder)
    synth_val, weak_val = info.creator(args.data_path, split="valid",
                                       encoder=encoder)
    test_ds = info.creator(args.data_path, split="test", encoder=encoder)

    # epoch length governed by the weak set (batch_len_index: 1,
    # reference conf/frame_40.yaml)
    train_loader = MixedBatchLoader(
        [synth, weak], [args.batch_size_synth, args.batch_size_weak],
        mode=1)
    teacher_fn = None
    if args.distill_ckpt:
        teacher_fn = build_sed_teacher(
            args.distill_ckpt, args.distill_arch,
            args.distill_pretrained_ckpt_path or args.pretrained_ckpt_path,
            info.num_labels)
    cfg = SEDConfig(num_labels=info.num_labels,
                    learning_rate=args.learning_rate,
                    max_epochs=args.max_epochs,
                    steps_per_epoch=max(len(train_loader), 1),
                    warmup_epochs=args.warmup_epochs,
                    median_window=args.median_window,
                    freeze_mode=args.freeze_mode,
                    distill_weight=(args.distill_weight
                                    if args.distill_ckpt else 0.0))
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

    def eval_loader(ds, bs=32):
        loader = MixedBatchLoader([ds], [bs], shuffle=False)
        return loader

    keeper = (TopKKeeper(args.save_path, k=args.save_top_k)
              if args.save_path and par.is_main else None)
    best_obj, best_state = -1.0, jax.device_get(state)
    for epoch in range(args.max_epochs):
        train_loader.set_epoch(epoch)
        for batch in train_loader:
            fn = batch.pop("filenames")
            state, metrics = step(state, shard(batch))
        f1, weak_f1 = evaluate_val(task, predict, state,
                                   eval_loader(synth_val),
                                   eval_loader(weak_val),
                                   cfg.median_window)
        obj = f1 + weak_f1
        print(f"epoch {epoch}: intersection_f1={f1:.4f} weak_F1="
              f"{weak_f1:.4f} loss={float(metrics['loss']):.4f}",
              flush=True)
        if obj > best_obj:
            best_obj, best_state = obj, jax.device_get(state)
        if keeper is not None:
            keeper.update(obj, epoch, jax.device_get(state))

    # test: PSDS needs ground-truth events + durations
    gt = pd.read_csv(os.path.join(args.data_path, "strong_val/meta.tsv"),
                     sep="\t")
    dur_path = os.path.join(args.data_path, "strong_val/durations.tsv")
    if os.path.exists(dur_path):
        durations = pd.read_csv(dur_path, sep="\t")
    else:
        durations = pd.DataFrame({
            "filename": gt.filename.unique(),
            "duration": [cfg.audio_len] * gt.filename.nunique()})
    if keeper is not None:
        # test from the persisted best checkpoint (reference tests from
        # the ModelCheckpoint-monitored best, train_dcase.py:51-58)
        restored = keeper.restore_best(best_state)
        if restored is not None:
            best_state = restored
    result = evaluate_test(task, predict, best_state,
                           eval_loader(test_ds), encoder, cfg, gt,
                           durations)
    print(json.dumps(result))
    if args.save_path and par.is_main:
        os.makedirs(args.save_path, exist_ok=True)
        with open(os.path.join(args.save_path, "result.json"), "w") as f:
            json.dump(result, f)
    return result


if __name__ == "__main__":
    main()
