"""Full finetuning of the pretrained encoder + linear head.

Reference: ``FineTuningPLModule`` (``methods/atst/downstream/
model.py:172-306``; parametrized variant ``atstframe/.../model.py:
149-327``) — joint encoder+head training with per-step cosine LR
(manual), optional layer-wise LR decay 0.75 over the transformer
blocks, SGD momentum 0.9 (or AdamW), CE / BCE-with-logits (mixup
soft targets), gradient clipping 3.0.

TPU design: one jitted SPMD step; central-crop + mel + (optional)
mixup/specaug run on device in the same program; layer-wise decay is a
per-leaf LR multiplier tree (label-based optax partition is overkill —
the decay factors multiply the update directly).
"""
from __future__ import annotations

import dataclasses
import re
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiossl_tpu.downstream.embedding import central_crop_frames
from audiossl_tpu.models.atst import AudioTransformer
from audiossl_tpu.models.heads import LinearHead
from audiossl_tpu.ops.melspec import MelConfig, log_melspec
from audiossl_tpu.training.schedules import cosine_schedule
from audiossl_tpu.transforms.augment import freq_mask, mixup_log, time_mask


@dataclasses.dataclass(frozen=True)
class FinetuneConfig:
    learning_rate: float = 5e-4
    max_epochs: int = 50
    steps_per_epoch: int = 100
    warmup_steps: int = 0
    momentum: float = 0.9
    weight_decay: float = 0.0
    layer_wise_lr: float = 0.75       # reference lr_scale; 1.0 disables
    grad_clip: float = 3.0
    multi_label: bool = False
    num_labels: int = 0
    n_blocks: int = 12
    chunk_len: int = 601
    avgpool: bool = True
    crop_len_s: float = 12.0
    mixup: bool = True
    mixup_alpha: float = 0.5
    # probability of applying mixup per sample (reference
    # MixupSpecLabelAudioset.mixup_ratio, downstream/transform.py:117-139;
    # 1.0 = always, the clip-ATST default)
    mixup_ratio: float = 1.0
    specaug: bool = False
    rrc: bool = False  # RandomResizeCrop aug (FinetuneTargetTransform)
    freeze_embed: bool = False
    optimizer: str = "sgd"            # "sgd" | "adamw"
    mel: MelConfig = MelConfig()
    sr: int = 16000

    @property
    def max_steps(self):
        return self.max_epochs * self.steps_per_epoch


class FinetuneState(NamedTuple):
    step: jnp.ndarray
    enc_params: Any
    head_params: Any
    head_stats: Any
    opt_state: Any
    rng: jax.Array


_EMBED_KEYS = ("patch_proj", "pos_embed", "cls_token", "mask_embed",
               "prompt_embed")


def layer_decay_factors(params, depth: int, decay: float,
                        freeze_embed: bool = False):
    """Per-leaf LR multipliers matching the reference
    ``layer_wise_lr_groups`` (``methods/atst/downstream/model.py:129-169``,
    ``methods/atstframe/downstream/model.py:149-190``):
    ``lr_scales[i] = decay**(depth-i)`` for ``i in 0..depth``, so

    - embeddings (patch/pos/cls/mask) get ``lr_scales[0] = decay**depth``
      — or **0.0** when ``freeze_embed`` (atstframe ``model.py:165-172``
      zeroes only these while the blocks keep training);
    - block ``i`` gets ``lr_scales[i] = decay**(depth-i)``;
    - the final norm gets ``lr_scales[-2] = decay``;
    - the head gets ``lr_scales[-1] = 1.0``.
    """
    def factor_for(path):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        joined = "/".join(str(n) for n in names)
        m = re.search(r"blocks_(\d+)", joined)
        if m:
            return decay ** (depth - int(m.group(1)))
        if any(k in joined for k in _EMBED_KEYS):
            return 0.0 if freeze_embed else decay ** depth
        if joined.startswith("norm"):
            return decay
        return 1.0

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: factor_for(path), params)


class FinetuneTask:
    """Encoder + LinearHead joint training over chunked clip features."""

    def __init__(self, encoder: AudioTransformer, cfg: FinetuneConfig,
                 embed_dim: int):
        self.encoder = encoder
        self.cfg = cfg
        self.head = LinearHead(num_labels=cfg.num_labels)
        self.embed_dim = embed_dim
        self.lr_sched = cosine_schedule(cfg.learning_rate, 1e-6,
                                        cfg.max_steps, cfg.warmup_steps)
        if cfg.optimizer == "adamw":
            self.inner = optax.scale_by_adam(eps=1e-6)
        else:
            self.inner = optax.trace(decay=cfg.momentum)

    def init_state(self, rng, enc_params) -> FinetuneState:
        k0, k1 = jax.random.split(rng)
        hv = self.head.init(k0, jnp.zeros((2, self.embed_dim)), train=True)
        both = {"enc": enc_params, "head": hv["params"]}
        return FinetuneState(
            step=jnp.zeros((), jnp.int32),
            enc_params=enc_params,
            head_params=hv["params"],
            head_stats=hv.get("batch_stats", {}),
            opt_state=self.inner.init(both),
            rng=k1,
        )

    def _features(self, enc_params, wav, valid, rng=None):
        cfg = self.cfg
        crop, cv = central_crop_frames(wav, valid,
                                       int(cfg.crop_len_s * cfg.sr))
        spec = log_melspec(crop, cv, cfg.mel)
        frames = cv // cfg.mel.hop_length + 1
        return spec, frames

    def _encode(self, enc_params, spec, frames, rngs=None):
        cfg = self.cfg
        if self.encoder.use_cls:
            return self.encoder.apply(
                {"params": enc_params}, spec, frames, n=cfg.n_blocks,
                chunk_len=cfg.chunk_len, avgpool=cfg.avgpool,
                deterministic=rngs is None, rngs=rngs,
                method=self.encoder.get_intermediate_layers_chunks)
        return self.encoder.apply(
            {"params": enc_params}, spec, frames, n=cfg.n_blocks,
            scene=True, deterministic=rngs is None, rngs=rngs,
            method=self.encoder.get_intermediate_layers)

    def make_train_step(self):
        cfg = self.cfg
        decay_tree = None

        def step_fn(state: FinetuneState, batch):
            rng, k_aug, k_dp = jax.random.split(state.rng, 3)
            lr = self.lr_sched(state.step)
            wav, valid, y = batch["wav"], batch["valid"], batch["label"]
            spec, frames = self._features(state.enc_params, wav, valid)
            if cfg.multi_label:
                y_soft = y.astype(jnp.float32)
            else:
                y_soft = jax.nn.one_hot(y, cfg.num_labels)
            # distinct subkeys per augmentation (mixup / specaug / rrc
            # draws must be uncorrelated)
            k_m, k_l, k_f, k_t, k_r, k_p = jax.random.split(k_aug, 6)
            if cfg.mixup:
                lam = jax.random.beta(k_l, cfg.mixup_alpha,
                                      cfg.mixup_alpha, (wav.shape[0], 1))
                if cfg.mixup_ratio < 1.0:
                    keep = jax.random.uniform(
                        k_p, (wav.shape[0], 1)) >= cfg.mixup_ratio
                    lam = jnp.where(keep, 1.0, lam)
                shift = jax.random.randint(k_m, (), 1,
                                           max(wav.shape[0], 2))
                spec2 = jnp.roll(spec, shift, axis=0)
                y2 = jnp.roll(y_soft, shift, axis=0)
                lam3 = lam[:, :, None]
                spec = jnp.log(lam3 * jnp.exp(spec)
                               + (1 - lam3) * jnp.exp(spec2) + 1e-7)
                y_soft = lam * y_soft + (1 - lam) * y2
            if cfg.specaug:
                spec = freq_mask(k_f, spec, 10)
                spec = time_mask(k_t, spec, 50, valid_frames=frames)
            if cfg.rrc:
                from audiossl_tpu.transforms.augment import (
                    random_resize_crop,
                )

                spec = random_resize_crop(k_r, spec,
                                          virtual_crop_scale=(1.0, 1.5),
                                          valid_frames=frames)

            def loss_fn(enc_params, head_params):
                feats = self._encode(enc_params, spec, frames,
                                     rngs={"droppath": k_dp})
                logits, upd = self.head.apply(
                    {"params": head_params,
                     "batch_stats": state.head_stats},
                    feats, train=True, mutable=["batch_stats"])
                if cfg.multi_label:
                    l = optax.sigmoid_binary_cross_entropy(
                        logits, y_soft).sum(-1).mean()
                else:
                    l = optax.softmax_cross_entropy(logits, y_soft).mean()
                return l, upd["batch_stats"]

            (loss, head_stats), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                state.enc_params, state.head_params)
            g = {"enc": grads[0], "head": grads[1]}
            # global-norm clip (reference gradient_clip_val=3.0)
            gnorm = optax.global_norm(g)
            scale = jnp.minimum(1.0, cfg.grad_clip / (gnorm + 1e-6))
            g = jax.tree.map(lambda x: x * scale, g)
            params = {"enc": state.enc_params, "head": state.head_params}
            updates, opt_state = self.inner.update(g, state.opt_state,
                                                   params)
            nonlocal decay_tree
            if decay_tree is None and (cfg.layer_wise_lr < 1.0
                                       or cfg.freeze_embed):
                decay_tree = {
                    "enc": layer_decay_factors(
                        state.enc_params, self.encoder.depth,
                        cfg.layer_wise_lr,
                        freeze_embed=cfg.freeze_embed),
                    "head": jax.tree.map(lambda _: 1.0,
                                         state.head_params),
                }
            if decay_tree is not None:
                updates = jax.tree.map(lambda u, d: u * d, updates,
                                       decay_tree)
            if cfg.weight_decay > 0:
                # decoupled weight decay on >=2-D kernels only
                updates = jax.tree.map(
                    lambda u, p: u + (cfg.weight_decay * p
                                      if p.ndim >= 2 else 0.0),
                    updates, params)
            new_params = jax.tree.map(lambda p, u: p - lr * u, params,
                                      updates)
            metrics = {"loss": loss, "lr": lr, "gnorm": gnorm}
            # freeze_embed is realised via zeroed decay-tree multipliers
            # on patch/pos/mask embeddings only (reference
            # atstframe/downstream/model.py:165-172) — the blocks train.
            return FinetuneState(
                step=state.step + 1,
                enc_params=new_params["enc"],
                head_params=new_params["head"],
                head_stats=head_stats,
                opt_state=opt_state,
                rng=rng,
            ), metrics

        return step_fn

    def make_eval_fn(self):
        def eval_fn(state: FinetuneState, batch):
            spec, frames = self._features(state.enc_params, batch["wav"],
                                          batch["valid"])
            feats = self._encode(state.enc_params, spec, frames)
            logits = self.head.apply(
                {"params": state.head_params,
                 "batch_stats": state.head_stats}, feats, train=False)
            return logits
        return eval_fn
