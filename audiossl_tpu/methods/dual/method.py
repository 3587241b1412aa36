"""Dual-branch pretraining (reference ``methods/dual/`` — experimental).

Two CLS-free encoders see the same masked mel through different patch
geometries — a "patch" branch (16x16 patches) and a "frame" branch
(64x4 full-height patches) — and are trained with (reference
``dual.py:78-116``, ``model.py:25-106``):

* per-branch masked mel reconstruction (MSE on masked patches);
* a cross-branch consistency MSE between time-aligned embeddings
  (patch tokens pooled over frequency, frame tokens pooled x4 in time
  to meet on a common 16-frame grid);
* VICReg-style variance regularization mean(relu(1 - std)) on each
  branch's pooled embeddings.

The reference left this method half-finished (dynamic [mask] gathers,
mismatched expander dims); this is a completed static-shape version
with the same loss structure.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from audiossl_tpu.models.atst import AudioTransformer, patchify
from audiossl_tpu.ops.masking import block_token_mask
from audiossl_tpu.ops.melspec import MelConfig, log_melspec
from audiossl_tpu.training.pretrain import (
    OptimizerConfig,
    apply_adamw_update,
    make_adam,
    wd_mask,
)
from audiossl_tpu.transforms.augment import (wav_to_f32, random_crop_wav)


def variance_loss(z, eps: float = 1e-4):
    """mean(relu(1 - std_per_dim)) (reference model.py:25-39)."""
    std = jnp.sqrt(jnp.var(z, axis=0) + eps)
    return jnp.mean(nn.relu(1.0 - std)), jnp.mean(std)


@dataclasses.dataclass(frozen=True)
class DualConfig:
    arch: str = "small"
    sr: int = 16000
    anchor_len: float = 6.0
    mask_ratio: float = 0.65
    mask_len: int = 5
    expander_dim: int = 8192
    out_dim: int = 256
    optimizer: OptimizerConfig = OptimizerConfig()
    mel: MelConfig = MelConfig()
    dtype: str = "float32"
    # fused Pallas MHA on the transformer hot path (TPU-only at runtime)
    fused_attention: bool = True

    @property
    def out_samples(self):
        return int(self.anchor_len * self.sr)

    @property
    def out_frames(self):
        return self.out_samples // self.mel.hop_length + 1

    @property
    def n_groups(self):
        """Common time grid: 16-frame cells."""
        return self.out_frames // 16


class _Expander(nn.Module):
    """3-layer expander MLP (reference build_expander)."""
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc0")(x)
        x = nn.LayerNorm(name="ln0")(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.LayerNorm(name="ln1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out, name="fc2")(x)
        return x


class DualModel(nn.Module):
    cfg: DualConfig

    def setup(self):
        c = self.cfg
        # tiny = CI smoke tier (not in the reference), same as ast_tiny
        dims = {"tiny": (64, 2, 2), "small": (384, 12, 6),
                "base": (768, 12, 12)}[c.arch]
        d, depth, heads = dims
        kw = dict(embed_dim=d, depth=depth, num_heads=heads,
                  spec_h=c.mel.n_mels, spec_w=c.out_frames,
                  use_cls=False, dtype=jnp.dtype(c.dtype),
                  fused_attention=c.fused_attention)
        self.patchnet = AudioTransformer(patch_h=16, patch_w=16,
                                         name="patchnet", **kw)
        self.framenet = AudioTransformer(patch_h=64, patch_w=4,
                                         name="framenet", **kw)
        self.patch_recon = nn.Dense(16 * 16, name="patch_recon")
        self.frame_recon = nn.Dense(64 * 4, name="frame_recon")
        self.patch_expander = _Expander(c.expander_dim, c.out_dim,
                                        name="patch_expander")
        self.frame_expander = _Expander(c.expander_dim, c.out_dim,
                                        name="frame_expander")

    def __call__(self, mel, mask_groups, deterministic=False):
        """mel [B, F, T]; mask_groups [B, G] boolean over the common
        16-frame grid (G = T//16)."""
        c = self.cfg
        B, F, T = mel.shape
        G = mask_groups.shape[1]

        # branch masks on their own token grids
        # patchnet tokens: time-major (w outer, h=4 inner) w = T//16
        mask_patch = jnp.repeat(mask_groups, 4, axis=1)  # [B, 4*G]
        # framenet tokens: w = T//4; each group covers 4 tokens
        mask_frame = jnp.repeat(mask_groups, 4, axis=1)  # [B, 4*G]

        hp, _ = self.patchnet(mel, None, mask_index=mask_patch,
                              apply_mask=True,
                              deterministic=deterministic)
        hf, _ = self.framenet(mel, None, mask_index=mask_frame,
                              apply_mask=True,
                              deterministic=deterministic)
        # reconstructions at masked positions
        rec_p = self.patch_recon(hp)                  # [B, 4G, 256]
        rec_f = self.frame_recon(hf)                  # [B, 4G, 256]
        tgt_p = patchify(mel, 16, 16)[:, : 4 * G]
        tgt_f = patchify(mel, 64, 4)[:, : 4 * G]

        def masked_mse(a, b, m):
            w = m.astype(a.dtype)[:, :, None]
            return jnp.sum(((a - b) ** 2) * w) / jnp.maximum(
                jnp.sum(w) * a.shape[-1], 1.0)

        loss_mel_patch = masked_mse(rec_p, tgt_p, mask_patch)
        loss_mel_frame = masked_mse(rec_f, tgt_f, mask_frame)

        # time-aligned pooled embeddings on the common grid
        d = hp.shape[-1]
        zp = hp[:, : 4 * G].reshape(B, G, 4, d).mean(2)
        zf = hf[:, : 4 * G].reshape(B, G, 4, d).mean(2)
        zp = self.patch_expander(zp)
        zf = self.frame_expander(zf)
        w = mask_groups.astype(zp.dtype)[:, :, None]
        loss_dual = jnp.sum(((zp - zf) ** 2) * w) / jnp.maximum(
            jnp.sum(w) * zp.shape[-1], 1.0)
        lu_p, std_p = variance_loss(zp.reshape(-1, zp.shape[-1]))
        lu_f, std_f = variance_loss(zf.reshape(-1, zf.shape[-1]))
        loss = (loss_mel_patch + loss_mel_frame + loss_dual
                + lu_p + lu_f)
        aux = {
            "loss_mel_patch": loss_mel_patch,
            "loss_mel_frame": loss_mel_frame,
            "loss_dual": loss_dual,
            "loss_uniform_patch": lu_p,
            "loss_uniform_frame": lu_f,
            "std_patch": std_p,
            "std_frame": std_f,
        }
        return loss, aux


class DualState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array


class DualMethod:
    def __init__(self, cfg: DualConfig):
        self.cfg = cfg
        self.model = DualModel(cfg)

    def init_state(self, rng) -> DualState:
        c = self.cfg
        k0, k1, k2 = jax.random.split(rng, 3)
        mel = jnp.zeros((2, c.mel.n_mels, c.out_frames))
        mask = jnp.zeros((2, c.n_groups), bool)
        params = self.model.init({"params": k0, "droppath": k1}, mel,
                                 mask, deterministic=True)["params"]
        return DualState(jnp.zeros((), jnp.int32), params,
                         make_adam(c.optimizer).init(params), k2)

    def make_step(self):
        c = self.cfg
        adam = make_adam(c.optimizer)
        lr_s = c.optimizer.lr_schedule()
        wd_s = c.optimizer.wd_schedule()

        def step_fn(state: DualState, batch):
            rng, k_crop, k_mask, k_dp = jax.random.split(state.rng, 4)
            wav, valid = wav_to_f32(batch["wav"]), batch["valid"]
            B = wav.shape[0]
            crops, cv = random_crop_wav(
                k_crop, wav, valid,
                jnp.full((B,), c.out_samples, jnp.int32), c.out_samples)
            mel = log_melspec(crops, cv, c.mel)
            mask = block_token_mask(k_mask, B, c.n_groups, c.mask_ratio,
                                    span=c.mask_len)
            lr = lr_s(state.step)
            wd = wd_s(state.step)

            def loss_fn(params):
                return self.model.apply(
                    {"params": params}, mel, mask, deterministic=False,
                    rngs={"droppath": k_dp})

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = adam.update(grads, state.opt_state,
                                             state.params)
            params = apply_adamw_update(state.params, updates, lr, wd,
                                        wd_mask(state.params))
            metrics = {"loss": loss, "lr": lr, "wd": wd, **aux}
            return DualState(state.step + 1, params, opt_state, rng), \
                metrics

        return step_fn
