"""DCASE / AudioSet-strong SED finetuning task.

Reference ``downstream/utils_dcase/model_dcase.py:71-352`` and
``utils_as_strong/model_as_strong.py:61-325``: frame embeddings from
the pretrained encoder -> SEDHead; mixed batches of synthetic-strong
and weak clips with masked BCE losses (strong BCE on the synth half,
weak BCE on the attention-pooled predictions of the weak half);
validation = intersection F1 + weak F1; test = PSDS over 50 thresholds.

One jitted SPMD train step: mel + encoder + head + loss together.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiossl_tpu.models.atst import AudioTransformer
from audiossl_tpu.ops.melspec import MelConfig, log_melspec
from audiossl_tpu.sed.head import SEDHead
from audiossl_tpu.training.schedules import cosine_schedule


@dataclasses.dataclass(frozen=True)
class SEDConfig:
    num_labels: int = 10
    learning_rate: float = 1e-1
    max_epochs: int = 100
    steps_per_epoch: int = 100
    warmup_epochs: int = 10
    momentum: float = 0.9
    freeze_mode: bool = False      # linear probe over frozen encoder
    lr_scale: float = 1.0          # per-layer decay (as_strong: 0.75)
    audio_len: float = 10.0
    median_window: int = 7
    n_test_thresholds: int = 50
    distill_weight: float = 0.0  # >0: add frozen-teacher BCE
    # "add": DCASE mode, total += w*(strong_d+weak_d)/2 (reference
    # utils_dcase/model_distill.py:170-174); "average_strong":
    # AS-strong mode, total = strong/2 + strong_d/2, weak ignored
    # (reference utils_as_strong/model_distill_as_strong.py:123-137)
    distill_combine: str = "add"
    mel: MelConfig = MelConfig()
    sr: int = 16000

    @property
    def max_steps(self):
        return self.max_epochs * self.steps_per_epoch

    @property
    def n_samples(self):
        return int(self.audio_len * self.sr)


class SEDState(NamedTuple):
    step: jnp.ndarray
    enc_params: Any
    head_params: Any
    opt_state: Any
    rng: jax.Array


class SEDTask:
    def __init__(self, encoder, cfg: SEDConfig, teacher_fn=None):
        """``encoder`` is either an :class:`AudioTransformer` (own
        model families) or any comparison-model adapter exposing
        ``frame_embeddings(params, wav, valid, train, rngs)``,
        ``embed_dim`` and ``token_count(n_samples)`` (reference
        train_dcase.py:139-175 dispatches 11 such modules).

        ``teacher_fn(wav, valid) -> (strong [B,C,T], weak [B,C])``
        *probabilities* of a frozen finetuned SED teacher (the
        SEDHead output surface) enables the distill mode (reference
        utils_dcase/model_distill.py:163-190: teacher strong+weak
        predictions added as BCE terms, ``loss_d = (strong_d +
        weak_d)/2``, scaled by cfg.distill_weight — weight 1.0
        reproduces the reference's ``tot/2 + loss_d/2`` ratio)."""
        self.encoder = encoder
        if isinstance(encoder, AudioTransformer):
            from audiossl_tpu.downstream.comparison_models import (
                EncoderAdapter,
            )

            self.adapter = EncoderAdapter(encoder=encoder, params=None,
                                          mel=cfg.mel)
        else:
            self.adapter = encoder
        self.cfg = cfg
        self.head = SEDHead(num_labels=cfg.num_labels)
        self.teacher_fn = teacher_fn
        self.lr_sched = cosine_schedule(
            cfg.learning_rate, 1e-6, cfg.max_steps,
            cfg.warmup_epochs * cfg.steps_per_epoch)
        self.opt = optax.trace(decay=cfg.momentum)

    # --------------------------------------------------------------- #
    def _frames(self, enc_params, wav, valid, train=False, rngs=None):
        frames = self.adapter.frame_embeddings(
            enc_params, wav, valid, train=train, rngs=rngs)  # [B, T, D]
        length = valid // self.cfg.mel.hop_length + 1
        return frames, length

    def init_state(self, rng, enc_params) -> SEDState:
        cfg = self.cfg
        k0, k1 = jax.random.split(rng)
        T = self.adapter.token_count(cfg.n_samples)
        hp = self.head.init(
            k0, jnp.zeros((2, T, self.adapter.embed_dim)))["params"]
        params = {"enc": enc_params, "head": hp}
        return SEDState(step=jnp.zeros((), jnp.int32),
                        enc_params=enc_params, head_params=hp,
                        opt_state=self.opt.init(params), rng=k1)

    # --------------------------------------------------------------- #
    def make_train_step(self):
        cfg = self.cfg
        decay_tree = None

        def step_fn(state: SEDState, batch):
            rng, k_dp = jax.random.split(state.rng)
            lr = self.lr_sched(state.step)
            wav, valid = batch["wav"], batch["valid"]
            strong_y = batch["strong"]          # [B, T_enc, C]
            source = batch["source"]            # [B] 0=strong 1=weak

            def loss_fn(enc_params, head_params):
                frames, _ = self._frames(
                    enc_params, wav, valid, train=not cfg.freeze_mode,
                    rngs=None if cfg.freeze_mode else {"droppath": k_dp})
                if cfg.freeze_mode:
                    frames = jax.lax.stop_gradient(frames)
                strong, weak = self.head.apply({"params": head_params},
                                               frames)
                # strong: [B, C, T]; labels arrive [B, T, C]
                y = jnp.transpose(strong_y, (0, 2, 1))
                T = min(strong.shape[-1], y.shape[-1])
                strong = strong[..., :T]
                y = y[..., :T]
                s_mask = (source == 0).astype(strong.dtype)
                w_mask = (source == 1).astype(strong.dtype)
                eps = 1e-7
                bce_s = -(y * jnp.log(strong + eps)
                          + (1 - y) * jnp.log(1 - strong + eps))
                strong_loss = jnp.sum(
                    bce_s.mean(axis=(1, 2)) * s_mask) / jnp.maximum(
                    jnp.sum(s_mask), 1.0)
                y_weak = (jnp.sum(y, axis=-1) > 0).astype(strong.dtype)
                bce_w = -(y_weak * jnp.log(weak + eps)
                          + (1 - y_weak) * jnp.log(1 - weak + eps))
                weak_loss = jnp.sum(
                    bce_w.mean(axis=-1) * w_mask) / jnp.maximum(
                    jnp.sum(w_mask), 1.0)
                total = strong_loss + weak_loss
                if self.teacher_fn is not None and \
                        cfg.distill_weight > 0:
                    t_strong, t_weak = self.teacher_fn(wav, valid)
                    Td = min(T, t_strong.shape[-1])
                    t_strong = jax.lax.stop_gradient(
                        t_strong)[..., :Td]
                    t_weak = jax.lax.stop_gradient(t_weak)
                    s_d = strong[..., :Td]
                    bce_ds = -(t_strong * jnp.log(s_d + eps)
                               + (1 - t_strong)
                               * jnp.log(1 - s_d + eps))
                    bce_dw = -(t_weak * jnp.log(weak + eps)
                               + (1 - t_weak)
                               * jnp.log(1 - weak + eps))
                    if cfg.distill_combine == "average_strong":
                        # AS-strong reference: tot = strong/2 + d/2,
                        # weak loss NOT in the total
                        # (model_distill_as_strong.py:132-137)
                        total = (0.5 * strong_loss
                                 + cfg.distill_weight * 0.5
                                 * bce_ds.mean())
                    else:
                        # DCASE reference loss_d = (strong_d+weak_d)/2
                        # (model_distill.py:170-174)
                        total = total + cfg.distill_weight * 0.5 * (
                            bce_ds.mean() + bce_dw.mean())
                return total, (strong_loss, weak_loss)

            (loss, (sl, wl)), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                state.enc_params, state.head_params)
            g = {"enc": grads[0], "head": grads[1]}
            params = {"enc": state.enc_params, "head": state.head_params}
            updates, opt_state = self.opt.update(g, state.opt_state, params)
            nonlocal decay_tree
            if decay_tree is None and cfg.lr_scale < 1.0 \
                    and hasattr(self.encoder, "depth"):
                # per-layer lr scaling (reference request_param_groups,
                # utils_as_strong/model_as_strong.py:289-325)
                from audiossl_tpu.downstream.finetune import (
                    layer_decay_factors,
                )

                decay_tree = {
                    "enc": layer_decay_factors(state.enc_params,
                                               self.encoder.depth,
                                               cfg.lr_scale),
                    "head": jax.tree.map(lambda _: 1.0,
                                         state.head_params),
                }
            if decay_tree is not None:
                updates = jax.tree.map(lambda u, d: u * d, updates,
                                       decay_tree)
            new = jax.tree.map(lambda p, u: p - lr * u, params, updates)
            return SEDState(
                step=state.step + 1,
                enc_params=state.enc_params if cfg.freeze_mode
                else new["enc"],
                head_params=new["head"],
                opt_state=opt_state,
                rng=rng,
            ), {"loss": loss, "strong_loss": sl, "weak_loss": wl,
                "lr": lr}

        return step_fn

    def make_predict_fn(self):
        def predict(state: SEDState, batch):
            frames, _ = self._frames(state.enc_params, batch["wav"],
                                     batch["valid"])
            strong, weak = self.head.apply(
                {"params": state.head_params}, frames)
            return strong, weak
        return predict
