"""Dual (clip+frame combined) pretraining CLI (reference
``methods/dual/train.py``: ArgumentParser("DUAL") + DUALLightningModule
``add_model_specific_args`` — arch/learning_rate/warmup_steps/max_steps,
reference model.py:154-162 — over the AudioSet LMDB datamodule).

Example:
  python -m audiossl_tpu.methods.dual.train \
    --data_path /data/audioset --arch small --subset 200000 \
    --batch_size_per_device 256 --learning_rate 5e-4 \
    --max_steps 39010 --warmup_steps 1300 --save_path ./exp/dual_small
"""
from __future__ import annotations

import argparse

import jax

from audiossl_tpu.datasets.packed import PackedAudioDataset
from audiossl_tpu.methods.dual.method import DualConfig, DualMethod
from audiossl_tpu.training.pretrain import OptimizerConfig
from audiossl_tpu.training.runner import run_pretraining


def build_parser():
    p = argparse.ArgumentParser("dual_train")
    p.add_argument("--data_path", required=True)
    p.add_argument("--save_path", default=None)
    p.add_argument("--arch", default="small",
                   choices=["tiny", "small", "base"])
    p.add_argument("--batch_size_per_device", type=int, default=256)
    p.add_argument("--learning_rate", type=float, default=5e-4,
                   help="reference-batch-256 lr; scaled by "
                        "n_devices*batch/256 like the reference")
    p.add_argument("--warmup_steps", type=int, default=1300)
    p.add_argument("--max_steps", type=int, default=39010)
    p.add_argument("--subset", type=int, default=200000)
    p.add_argument("--anchor_len", type=float, default=6.0)
    p.add_argument("--mask_ratio", type=float, default=0.65)
    p.add_argument("--mask_len", type=int, default=5)
    p.add_argument("--expander_dim", type=int, default=8192)
    p.add_argument("--out_dim", type=int, default=256)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt_interval", type=int, default=5000)
    p.add_argument("--n_devices", type=int, default=None)
    p.add_argument("--profile_at", type=int, default=None)
    p.add_argument("--shard_optimizer", action="store_true")
    p.add_argument("--clip_len", type=float, default=10.0,
                   help="host buffer seconds (full clip length)")
    return p


def main(argv=None):
    # pod-slice bootstrap (no-op single-host; AUDIOSSL_MULTIHOST=1
    # or JAX_COORDINATOR_ADDRESS opt in) - before any backend use
    from audiossl_tpu.parallel.mesh import init_multihost
    init_multihost()
    args = build_parser().parse_args(argv)
    n_dev = args.n_devices or len(jax.devices())
    lr = args.learning_rate * n_dev * args.batch_size_per_device / 256.0
    cfg = DualConfig(
        arch=args.arch,
        anchor_len=args.anchor_len,
        mask_ratio=args.mask_ratio,
        mask_len=args.mask_len,
        expander_dim=args.expander_dim,
        out_dim=args.out_dim,
        dtype=args.dtype,
        optimizer=OptimizerConfig(
            learning_rate=lr, warmup_steps=args.warmup_steps,
            max_steps=args.max_steps),
    )
    dataset = PackedAudioDataset(args.data_path, "train",
                                 subset=args.subset)
    method = DualMethod(cfg)
    run_pretraining(
        method, dataset,
        batch_size_per_device=args.batch_size_per_device,
        max_steps=args.max_steps, save_path=args.save_path,
        ckpt_interval=args.ckpt_interval, seed=args.seed,
        n_devices=args.n_devices, clip_len_s=args.clip_len,
        profile_at=args.profile_at, shard_optimizer=args.shard_optimizer)


if __name__ == "__main__":
    main()
