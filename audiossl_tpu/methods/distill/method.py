"""ATST-C2F distillation (reference ``methods/atstframe/
module_distill.py:131-406`` + ``train_distill.py``).

A frozen, finetuned ATST-Clip classifier (AST encoder -> chunked
CLS+avg features -> LinearHead, "ClipModel") teaches a FrameAST
student: loss = lambda * BCE(student_logits, sigmoid(teacher_logits))
+ (1 - lambda) * BCE(student_logits, labels), layer-wise-decayed SGD.
Both teacher and student forwards (and the mel front end) run in one
jitted step; the reference's WeightedRandomSampler is provided by
``BatchLoader(weights=...)``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from audiossl_tpu.downstream.finetune import layer_decay_factors
from audiossl_tpu.models.atst import AudioTransformer, ast_base, frame_ast_base
from audiossl_tpu.models.heads import LinearHead
from audiossl_tpu.ops.melspec import MelConfig, log_melspec
from audiossl_tpu.training.schedules import cosine_schedule
from audiossl_tpu.transforms.augment import random_crop_wav


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    arch: str = "base"
    num_labels: int = 527
    lambda_d: float = 1.0
    learning_rate: float = 1e-1
    max_epochs: int = 40
    steps_per_epoch: int = 1000
    warmup_epochs: int = 2
    momentum: float = 0.9
    layer_wise_lr: float = 0.75
    freeze_embed: bool = False
    grad_clip: float = 3.0     # reference gradient_clip_val=3.0
    chunk_len: int = 601  # teacher chunked-inference window (frames)
    max_len: float = 10.0
    sr: int = 16000
    mel: MelConfig = MelConfig()
    # single-label tasks (module_distill_other.py): CE losses + a
    # CentralCrop transform instead of AudioSet's random 10 s crop
    multi_label: bool = True
    crop: str = "random"       # "random" | "central"
    # encoder construction width = the PRETRAIN width (pos-embed length
    # comes from the checkpoint); longer inputs are chunked
    pretrain_frames: int = 1001
    # student chunk window (module_distill_other.py:187 chunk_len=1001;
    # a 10 s AudioSet input = exactly one chunk, so the AudioSet path
    # reduces to the plain scene forward)
    student_chunk_len: int = 1001

    @property
    def out_samples(self):
        return int(self.max_len * self.sr)

    @property
    def out_frames(self):
        return self.out_samples // self.mel.hop_length + 1

    @property
    def max_steps(self):
        return self.max_epochs * self.steps_per_epoch


class DistillState(NamedTuple):
    step: jnp.ndarray
    student_params: Any
    head_params: Any
    head_stats: Any
    opt_state: Any
    rng: jax.Array


class DistillMethod:
    def __init__(self, cfg: DistillConfig, teacher_params,
                 teacher_head_params, teacher_head_stats=None):
        from audiossl_tpu.models.atst import (
            ast_small,
            ast_tiny,
            frame_ast_small,
            frame_ast_tiny,
        )

        self.cfg = cfg
        t_fn = {"tiny": ast_tiny, "small": ast_small,
                "base": ast_base}[cfg.arch]
        s_fn = {"tiny": frame_ast_tiny, "small": frame_ast_small,
                "base": frame_ast_base}[cfg.arch]
        self.teacher = t_fn(spec_w=cfg.pretrain_frames)
        self.student = s_fn(spec_w=cfg.pretrain_frames)
        self.t_head = LinearHead(num_labels=cfg.num_labels)
        self.s_head = LinearHead(num_labels=cfg.num_labels)
        self.teacher_params = teacher_params
        self.teacher_head_params = teacher_head_params
        self.teacher_head_stats = teacher_head_stats or {}
        self.lr_sched = cosine_schedule(
            cfg.learning_rate, 1e-6, cfg.max_steps,
            cfg.warmup_epochs * cfg.steps_per_epoch)
        self.opt = optax.trace(decay=cfg.momentum)

    def init_state(self, rng, student_params) -> DistillState:
        k0, k1 = jax.random.split(rng)
        hp = self.s_head.init(
            k0, jnp.zeros((2, self.student.embed_dim)), train=True)
        params = {"enc": student_params, "head": hp["params"]}
        return DistillState(
            step=jnp.zeros((), jnp.int32),
            student_params=student_params,
            head_params=hp["params"],
            head_stats=hp.get("batch_stats", {}),
            opt_state=self.opt.init(params),
            rng=k1,
        )

    def _student_scene(self, enc_params, mel, frames, k_dp=None):
        """Chunked student scene embedding (module_distill_other.py:
        183-212): split the mel into ``student_chunk_len`` windows, one
        batched forward, chunk-mark weighted average. A single-window
        input (AudioSet 10 s) reduces to the plain scene forward."""
        cfg = self.cfg
        B, F, T = mel.shape
        # never widen a chunk beyond the input or the model's pos table
        chunk_len = min(cfg.student_chunk_len, self.student.spec_w, T)
        num_chunks = max((T + chunk_len - 1) // chunk_len, 1)
        pad_to = num_chunks * chunk_len
        melp = jnp.pad(mel, ((0, 0), (0, 0), (0, pad_to - T)))
        chunks = melp.reshape(B, F, num_chunks, chunk_len)
        chunks = jnp.transpose(chunks, (0, 2, 1, 3)).reshape(
            B * num_chunks, F, chunk_len)
        ks = jnp.arange(num_chunks)
        cur = jnp.clip(frames[:, None] - ks[None, :] * chunk_len, 0,
                       chunk_len)
        mark = jnp.where(ks[None, :] == 0, cur > 0,
                         cur > chunk_len // 2).astype(jnp.float32)
        emb = self.student.apply(
            {"params": enc_params}, chunks, cur.reshape(-1), n=1,
            scene=True, deterministic=k_dp is None,
            rngs=None if k_dp is None else {"droppath": k_dp},
            method=self.student.get_intermediate_layers)
        emb = emb.reshape(B, num_chunks, -1)
        w = mark[..., None]
        return (w * emb).sum(1) / jnp.maximum(
            mark.sum(1, keepdims=True), 1e-6)

    def _teacher_logits(self, mel, frames):
        feats = self.teacher.apply(
            {"params": self.teacher_params}, mel, frames, n=1,
            chunk_len=self.cfg.chunk_len, avgpool=True,
            deterministic=True,
            method=self.teacher.get_intermediate_layers_chunks)
        return self.t_head.apply(
            {"params": self.teacher_head_params,
             "batch_stats": self.teacher_head_stats}, feats, train=False)

    def make_step(self):
        cfg = self.cfg
        decay_tree = None

        def step_fn(state: DistillState, batch):
            rng, k_crop, k_dp = jax.random.split(state.rng, 3)
            lr = self.lr_sched(state.step)
            wav, valid, y = batch["wav"], batch["valid"], batch["label"]
            B = wav.shape[0]
            if cfg.crop == "central":
                # DistillATSTTrainTransform: CentralCrop(max_len,
                # pad=False) (module_distill_other.py:33-55)
                from audiossl_tpu.downstream.embedding import (
                    central_crop_frames,
                )

                crops, cv = central_crop_frames(wav, valid,
                                                cfg.out_samples)
            else:
                crops, cv = random_crop_wav(
                    k_crop, wav, valid,
                    jnp.full((B,), cfg.out_samples, jnp.int32),
                    cfg.out_samples)
            mel = log_melspec(crops, cv, cfg.mel)
            frames = cv // cfg.mel.hop_length + 1
            t_logits = jax.lax.stop_gradient(
                self._teacher_logits(mel, frames))
            if cfg.multi_label:
                target = jax.nn.sigmoid(t_logits)
                y_soft = y.astype(jnp.float32)
            else:
                # reference single-label distill: CE to teacher softmax
                # + CE to the hard label (module_distill_other.py:315-324)
                target = jax.nn.softmax(t_logits, axis=-1)
                y_soft = jax.nn.one_hot(y, cfg.num_labels)

            def loss_fn(enc_params, head_params):
                emb = self._student_scene(enc_params, mel, frames,
                                          k_dp=k_dp)
                logits, upd = self.s_head.apply(
                    {"params": head_params,
                     "batch_stats": state.head_stats}, emb, train=True,
                    mutable=["batch_stats"])
                if cfg.multi_label:
                    loss_d = optax.sigmoid_binary_cross_entropy(
                        logits, target).mean()
                    loss_c = optax.sigmoid_binary_cross_entropy(
                        logits, y_soft).mean()
                else:
                    loss_d = optax.softmax_cross_entropy(
                        logits, target).mean()
                    loss_c = optax.softmax_cross_entropy(
                        logits, y_soft).mean()
                loss = cfg.lambda_d * loss_d + (1 - cfg.lambda_d) * loss_c
                return loss, (loss_d, loss_c, upd["batch_stats"])

            (loss, (ld, lc, head_stats)), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                state.student_params, state.head_params)
            g = {"enc": grads[0], "head": grads[1]}
            if cfg.grad_clip > 0:
                gnorm = optax.global_norm(g)
                scale = jnp.minimum(1.0, cfg.grad_clip / (gnorm + 1e-6))
                g = jax.tree.map(lambda x: x * scale, g)
            params = {"enc": state.student_params,
                      "head": state.head_params}
            updates, opt_state = self.opt.update(g, state.opt_state,
                                                 params)
            nonlocal decay_tree
            if decay_tree is None:
                # reference layer_wise_lr_groups: lr_scale 0 for
                # patch-embed/pos/mask params (module_distill.py:175)
                enc_decay = layer_decay_factors(
                    state.student_params, self.student.depth,
                    cfg.layer_wise_lr, freeze_embed=cfg.freeze_embed)
                decay_tree = {
                    "enc": enc_decay,
                    "head": jax.tree.map(lambda _: 1.0,
                                         state.head_params),
                }
            updates = jax.tree.map(lambda u, d: u * d, updates,
                                   decay_tree)
            new = jax.tree.map(lambda p, u: p - lr * u, params, updates)
            return DistillState(
                step=state.step + 1,
                student_params=new["enc"],
                head_params=new["head"],
                head_stats=head_stats,
                opt_state=opt_state,
                rng=rng,
            ), {"loss": loss, "loss_d": ld, "loss_c": lc, "lr": lr}

        return step_fn

    def make_eval_fn(self):
        """Student logits on the central-cropped eval input
        (DistillATSTEvalTransform, module_distill_other.py:58-80)."""
        cfg = self.cfg

        def eval_fn(state: DistillState, batch):
            from audiossl_tpu.downstream.embedding import (
                central_crop_frames,
            )

            crops, cv = central_crop_frames(batch["wav"], batch["valid"],
                                            cfg.out_samples)
            mel = log_melspec(crops, cv, cfg.mel)
            frames = cv // cfg.mel.hop_length + 1
            emb = self._student_scene(state.student_params, mel, frames)
            return self.s_head.apply(
                {"params": state.head_params,
                 "batch_stats": state.head_stats}, emb, train=False)

        return eval_fn
