"""Masked-autoencoder pretraining (reference ``methods/mae/mae.py``).

Encoder sees only the kept tokens (+CLS); a small decoder receives the
encoded kept tokens plus mask tokens carrying the masked positions'
positional embeddings and regresses the masked mel patches with MSE
(reference MaskedAutoEncoder.forward, mae.py:141-179; the reference's
LightningModule was an unfinished stub, model.py:7-11 — this is the
completed method).

TPU design: the mask has a STATIC masked count (round(ratio*N)), and
kept/masked token selection is a batched gather from an argsorted
random permutation — no dynamic shapes, everything jits.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from audiossl_tpu.models.atst import num_patches, patchify
from audiossl_tpu.models.transformer import Block
from audiossl_tpu.ops.melspec import MelConfig, log_melspec
from audiossl_tpu.training.pretrain import (
    OptimizerConfig,
    apply_adamw_update,
    make_adam,
    wd_mask,
)
from audiossl_tpu.transforms.augment import (wav_to_f32, random_crop_wav)


@dataclasses.dataclass(frozen=True)
class MAEConfig:
    sr: int = 16000
    anchor_len: float = 6.0
    mask_ratio: float = 0.75
    patch_h: int = 16
    patch_w: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    dec_embed_dim: int = 384
    dec_depth: int = 6
    dec_num_heads: int = 6
    optimizer: OptimizerConfig = OptimizerConfig()
    mel: MelConfig = MelConfig()

    @property
    def out_samples(self):
        return int(self.anchor_len * self.sr)

    @property
    def out_frames(self):
        return self.out_samples // self.mel.hop_length + 1

    @property
    def n_patches(self):
        return num_patches(self.mel.n_mels, self.out_frames,
                           self.patch_h, self.patch_w)

    @property
    def n_masked(self):
        return int(round(self.mask_ratio * self.n_patches))


class MAEModel(nn.Module):
    cfg: MAEConfig

    @nn.compact
    def __call__(self, mel, rng, deterministic=True):
        """mel [B, F, T] -> (cls embedding [B, D], mse loss)."""
        cfg = self.cfg
        B = mel.shape[0]
        patches = patchify(mel, cfg.patch_h, cfg.patch_w)  # [B, N, ph*pw]
        N = patches.shape[1]
        n_mask = cfg.n_masked
        n_keep = N - n_mask

        init = nn.initializers.truncated_normal(stddev=0.02, lower=-2,
                                                upper=2)
        pos = self.param("pos_embed", init, (1, N + 1, cfg.embed_dim))
        cls_tok = self.param("cls_token", init, (1, 1, cfg.embed_dim))
        dec_pos = self.param("dec_pos_embed", init,
                             (1, N + 1, cfg.dec_embed_dim))
        mask_tok = self.param("mask_embed", init,
                              (1, 1, cfg.dec_embed_dim))

        # random shuffle per sample -> first n_keep kept, rest masked
        noise = jax.random.uniform(rng, (B, N))
        order = jnp.argsort(noise, axis=-1)          # [B, N]
        keep_idx = order[:, :n_keep]
        mask_idx = order[:, n_keep:]

        x = nn.Dense(cfg.embed_dim, name="patch_proj")(patches)
        x = x + pos[:, 1:]
        x_keep = jnp.take_along_axis(x, keep_idx[:, :, None], axis=1)
        cls = jnp.broadcast_to(cls_tok + pos[:, :1],
                               (B, 1, cfg.embed_dim))
        h = jnp.concatenate([cls, x_keep], axis=1)
        for i in range(cfg.depth):
            h = Block(cfg.embed_dim, cfg.num_heads, qkv_bias=True,
                      name=f"blocks_{i}")(h, None, deterministic)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)
        cls_out = h[:, 0]

        # decoder
        d = nn.Dense(cfg.dec_embed_dim, name="middle")(h)
        dec_pos_patches = jnp.broadcast_to(
            dec_pos[:, 1:], (B, N, cfg.dec_embed_dim))
        pos_keep = jnp.take_along_axis(dec_pos_patches,
                                       keep_idx[:, :, None], axis=1)
        pos_mask = jnp.take_along_axis(dec_pos_patches,
                                       mask_idx[:, :, None], axis=1)
        d = jnp.concatenate(
            [d[:, :1] + dec_pos[:, :1], d[:, 1:] + pos_keep], axis=1)
        d_mask = pos_mask + mask_tok
        d = jnp.concatenate([d, d_mask], axis=1)
        for i in range(cfg.dec_depth):
            d = Block(cfg.dec_embed_dim, cfg.dec_num_heads, qkv_bias=True,
                      name=f"dec_blocks_{i}")(d, None, deterministic)
        d = nn.LayerNorm(epsilon=1e-6, name="dec_norm")(d)
        pred = nn.Dense(cfg.patch_h * cfg.patch_w, name="dec_head")(
            d[:, -n_mask:])  # [B, n_mask, ph*pw]

        target = jnp.take_along_axis(patches, mask_idx[:, :, None],
                                     axis=1)
        loss = jnp.mean((pred - target) ** 2)
        return cls_out, loss


class MAEState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array


class MAEMethod:
    """Runner-compatible method object (cfg/init_state/make_step)."""

    def __init__(self, cfg: MAEConfig):
        self.cfg = cfg
        self.model = MAEModel(cfg)

    def init_state(self, rng) -> MAEState:
        k0, k1, k2 = jax.random.split(rng, 3)
        mel = jnp.zeros((2, self.cfg.mel.n_mels, self.cfg.out_frames))
        params = self.model.init({"params": k0, "droppath": k1}, mel, k1,
                                 deterministic=True)["params"]
        return MAEState(step=jnp.zeros((), jnp.int32), params=params,
                        opt_state=make_adam(self.cfg.optimizer).init(
                            params), rng=k2)

    def make_step(self):
        cfg = self.cfg
        opt = cfg.optimizer
        adam = make_adam(opt)
        lr_s = opt.lr_schedule()
        wd_s = opt.wd_schedule()

        def step_fn(state: MAEState, batch):
            rng, k_crop, k_mask, k_dp = jax.random.split(state.rng, 4)
            wav, valid = wav_to_f32(batch["wav"]), batch["valid"]
            B = wav.shape[0]
            crop_len = jnp.full((B,), cfg.out_samples, jnp.int32)
            crops, cv = random_crop_wav(k_crop, wav, valid, crop_len,
                                        cfg.out_samples)
            mel = log_melspec(crops, cv, cfg.mel)
            lr = lr_s(state.step)
            wd = wd_s(state.step)

            def loss_fn(params):
                _, loss = self.model.apply(
                    {"params": params}, mel, k_mask, deterministic=False,
                    rngs={"droppath": k_dp})
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = adam.update(grads, state.opt_state,
                                             state.params)
            params = apply_adamw_update(state.params, updates, lr, wd,
                                        wd_mask(state.params))
            return MAEState(state.step + 1, params, opt_state, rng), {
                "loss": loss, "lr": lr, "wd": wd}

        return step_fn
