"""MAE pretraining CLI.

The reference's MAE method has no training driver — its
LightningModule is an unfinished stub (reference
``methods/mae/model.py:7-11``; only the nn.Module in ``mae.py`` is
real). This CLI completes the method the same way the other methods'
drivers work here: a runner-compatible jitted SPMD step over the
packed AudioSet store.

Example:
  python -m audiossl_tpu.methods.mae.train \
    --data_path /data/audioset --subset 200000 \
    --batch_size_per_device 256 --learning_rate 5e-4 \
    --max_steps 39010 --warmup_steps 1300 --save_path ./exp/mae_small
"""
from __future__ import annotations

import argparse

import jax

from audiossl_tpu.datasets.packed import PackedAudioDataset
from audiossl_tpu.methods.mae.method import MAEConfig, MAEMethod
from audiossl_tpu.training.pretrain import OptimizerConfig
from audiossl_tpu.training.runner import run_pretraining


def build_parser():
    p = argparse.ArgumentParser("mae_train")
    p.add_argument("--data_path", required=True)
    p.add_argument("--save_path", default=None)
    p.add_argument("--batch_size_per_device", type=int, default=256)
    p.add_argument("--learning_rate", type=float, default=5e-4,
                   help="reference-batch-256 lr; scaled by "
                        "n_devices*batch/256")
    p.add_argument("--warmup_steps", type=int, default=1300)
    p.add_argument("--max_steps", type=int, default=39010)
    p.add_argument("--subset", type=int, default=200000)
    p.add_argument("--anchor_len", type=float, default=6.0)
    p.add_argument("--mask_ratio", type=float, default=0.75)
    p.add_argument("--embed_dim", type=int, default=384)
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--num_heads", type=int, default=6)
    p.add_argument("--dec_embed_dim", type=int, default=384)
    p.add_argument("--dec_depth", type=int, default=6)
    p.add_argument("--dec_num_heads", type=int, default=6)
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
    cfg = MAEConfig(
        anchor_len=args.anchor_len,
        mask_ratio=args.mask_ratio,
        embed_dim=args.embed_dim,
        depth=args.depth,
        num_heads=args.num_heads,
        dec_embed_dim=args.dec_embed_dim,
        dec_depth=args.dec_depth,
        dec_num_heads=args.dec_num_heads,
        optimizer=OptimizerConfig(
            learning_rate=lr, warmup_steps=args.warmup_steps,
            max_steps=args.max_steps),
    )
    dataset = PackedAudioDataset(args.data_path, "train",
                                 subset=args.subset)
    method = MAEMethod(cfg)
    run_pretraining(
        method, dataset,
        batch_size_per_device=args.batch_size_per_device,
        max_steps=args.max_steps, save_path=args.save_path,
        ckpt_interval=args.ckpt_interval, seed=args.seed,
        n_devices=args.n_devices, clip_len_s=args.clip_len,
        profile_at=args.profile_at, shard_optimizer=args.shard_optimizer)


if __name__ == "__main__":
    main()
