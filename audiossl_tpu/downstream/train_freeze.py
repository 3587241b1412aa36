"""Linear-probe driver (reference ``atst_downstream_train_freeze``,
``methods/atst/downstream/train_freeze.py`` + the atstframe variant).

Two-phase flow exactly like the reference: (1) extract embeddings once
with the frozen pretrained encoder (clip: chunked CLS+avg concat;
frame: chunk-averaged scene embeddings), (2) train a linear head on the
in-memory cache, select by val metric, report test metric; multi-fold
datasets (us8k) loop folds and average (train_freeze.py:147-155).
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from audiossl_tpu.datasets import get_dataset
from audiossl_tpu.datasets.pipeline import BatchLoader
from audiossl_tpu.downstream.embedding import (
    extract_split,
    make_clip_extractor,
    make_frame_extractor,
)
from audiossl_tpu.downstream.linear import LinearProbeConfig, train_linear_probe
from audiossl_tpu.models.atst import (
    ast_base,
    ast_small,
    frame_ast_base,
    frame_ast_small,
)


def load_encoder(ckpt_path: str, model_type: str, arch: str,
                 spec_w: int = 1001, which: str = "teacher"):
    """-> (encoder module, params). Accepts reference .ckpt or orbax."""
    from audiossl_tpu.models.atst import ast_tiny, frame_ast_tiny

    makers = {
        ("clip", "tiny"): ast_tiny, ("clip", "small"): ast_small,
        ("clip", "base"): ast_base,
        ("frame", "tiny"): frame_ast_tiny,
        ("frame", "small"): frame_ast_small,
        ("frame", "base"): frame_ast_base,
    }
    enc = makers[(model_type, arch)](spec_w=spec_w)
    if ckpt_path.endswith(".ckpt"):
        from audiossl_tpu.compat.torch_import import load_pretrain_checkpoint

        params, _ = load_pretrain_checkpoint(ckpt_path, which=which,
                                             depth=enc.depth)
    else:
        from audiossl_tpu.training.checkpoint import restore_params

        params = restore_params(ckpt_path)
    return enc, params


def run_fold(extract, info, args, fold: int):
    def loader(split):
        kw = dict(fold=fold) if info.num_folds > 1 else {}
        ds = info.creator(args.data_path, split=split, **kw)
        return BatchLoader(ds, args.batch_size,
                           pad_samples=int(args.train_len * 16000),
                           shuffle=False, drop_last=False)

    train_e, train_y = extract_split(extract, loader("train"))
    val_e, val_y = extract_split(extract, loader("valid"))
    test_e, test_y = extract_split(extract, loader("test"))

    cfg = LinearProbeConfig(
        learning_rate=args.learning_rate,
        batch_size=args.batch_size,
        max_epochs=args.max_epochs,
        multi_label=info.multi_label,
        num_labels=info.num_labels,
        lr_scale=args.batch_size / 256.0,  # reference lr rule
    )
    keeper = None
    if getattr(args, "save_path", None):
        from audiossl_tpu.training.checkpoint import TopKKeeper

        keeper = TopKKeeper(os.path.join(args.save_path,
                                         f"fold{fold}"), k=10)
    res = train_linear_probe(train_e, train_y, val_e, val_y, test_e,
                             test_y, cfg, keeper=keeper)
    return res["val_metric"], res["test_metric"]


def build_parser():
    p = argparse.ArgumentParser("atst_downstream_train_freeze")
    p.add_argument("--pretrained_ckpt_path", required=True)
    p.add_argument("--data_path", required=True)
    p.add_argument("--dataset_name", required=True)
    p.add_argument("--save_path", default=None)
    p.add_argument("--model_type", default="clip",
                   choices=["clip", "frame"])
    p.add_argument("--arch", default="small",
                   choices=["tiny", "small", "base"])
    p.add_argument("--use_encoder", default="teacher",
                   choices=["teacher", "student"])
    p.add_argument("--learning_rate", type=float, default=2e-3)
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--max_epochs", type=int, default=100)
    p.add_argument("--n_last_blocks", type=int, default=12)
    p.add_argument("--train_len", type=float, default=12.0,
                   help="central-crop seconds for downstream inputs")
    p.add_argument("--chunk_len_s", type=float, default=6.0,
                   help="frame-model chunk length (pretrain anchor_len)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    info = get_dataset(args.dataset_name)
    spec_w = int(args.chunk_len_s * 16000) // 160 + 1 \
        if args.model_type == "frame" else 1001
    enc, params = load_encoder(args.pretrained_ckpt_path, args.model_type,
                               args.arch, spec_w=spec_w,
                               which=args.use_encoder)
    if args.model_type == "clip":
        extract = make_clip_extractor(enc, params,
                                      crop_len_s=args.train_len,
                                      n_blocks=args.n_last_blocks)
    else:
        extract = make_frame_extractor(enc, params,
                                       crop_len_s=args.train_len,
                                       n_blocks=args.n_last_blocks,
                                       chunk_len_s=args.chunk_len_s)
    # data-parallel extraction over all local devices (the reference
    # extracts per-rank under DDP, downstream/train_freeze.py:91)
    from audiossl_tpu.parallel.mesh import data_mesh, maybe_shard_batch

    mesh = data_mesh()
    if mesh.shape["data"] > 1:
        _base_extract = extract
        extract = lambda wav, valid: _base_extract(  # noqa: E731
            *maybe_shard_batch(mesh, (wav, valid)))

    vals, tests = [], []
    for fold in range(info.num_folds):
        v, t = run_fold(extract, info, args, fold)
        vals.append(v)
        tests.append(t)
        print(f"fold {fold}: val={v:.4f} test={t:.4f}", flush=True)
    result = {
        "dataset": args.dataset_name,
        "metric": "mAP" if info.multi_label else "ACC",
        "val": float(np.mean(vals)),
        "test": float(np.mean(tests)),
        "folds": len(vals),
    }
    print(json.dumps(result))
    if args.save_path:
        os.makedirs(args.save_path, exist_ok=True)
        with open(os.path.join(args.save_path, "result.json"), "w") as f:
            json.dump(result, f)
    return result


if __name__ == "__main__":
    main()
