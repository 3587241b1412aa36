"""ATST-Clip pretraining, end-to-end on device.

Reference recipe: ``audiossl/methods/atst/`` — two random-length crops
of each waveform -> mel -> Mixup -> RandomResizeCrop -> pad
(``transform.py:12-74``), BYOL teacher-student over CLS embeddings
(``models/atst/atst.py``), AdamW + cosine lr/wd/ema schedules
(``methods/atst/model.py:6-65``).

TPU-first design: the transform chain is batched device code fused into
the jitted train step (the reference runs it per sample on CPU workers,
which is its actual throughput bottleneck); the teacher EMA and the
schedules live in the same compiled program; data parallelism is the
surrounding pjit mesh — no DDP process group.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from audiossl_tpu.models.atst import (AudioTransformer, ast_base,
                                      ast_small, ast_tiny)
from audiossl_tpu.models.byol import clip_byol_loss
from audiossl_tpu.ops.melspec import MelConfig, log_melspec
from audiossl_tpu.transforms.augment import (
    wav_to_f32,
    mixup_log,
    random_crop_wav,
    random_resize_crop,
    sample_crop_lengths,
)
from audiossl_tpu.training.pretrain import (
    Branch,
    OptimizerConfig,
    PretrainState,
    init_pretrain_state,
    make_pretrain_step,
)


@dataclasses.dataclass(frozen=True)
class ClipPretrainConfig:
    arch: str = "small"
    sr: int = 16000
    anchor_len: Tuple[float, float] = (6.0, 6.0)
    positive_len: Tuple[float, float] = (6.0, 6.0)
    different_positive: bool = True
    virtual_crop: float = 1.5
    mixup_ratio: float = 0.4
    optimizer: OptimizerConfig = OptimizerConfig()
    mel: MelConfig = MelConfig(stft_precision="default")
    dtype: str = "float32"
    # fused Pallas MHA / whole-block teacher kernels; TPU-only at runtime
    fused_attention: bool = True
    # "int8": quantized no-grad TEACHER matmuls (2x MXU peak) - an
    # OPT-IN recipe change (see docs/PROFILE.md roofline ceiling)
    teacher_quant: str = "none"
    # "int8": quantized STUDENT forward projections (QAT straight-
    # through backward; ops/pallas_attn.py / pallas_mlp.py). OPT-IN
    student_quant: str = "none"

    @property
    def max_len_s(self) -> float:
        return max(self.anchor_len + self.positive_len)

    @property
    def out_frames(self) -> int:
        """Padded mel width (reference pads every view to the max crop
        length: ``(max_positive_len*16000)//160`` extra frames on top of
        the crop's own ``n//160+1``)."""
        return int(self.max_len_s * self.sr) // self.mel.hop_length + 1

    @property
    def out_samples(self) -> int:
        return int(self.max_len_s * self.sr)


def _crop_mel(key, wav, valid, len_range, cfg: ClipPretrainConfig):
    """waveform [B, L] -> un-augmented mel crop [B, n_mels, out_frames]
    plus its frame counts [B]."""
    k_len, k_crop = jax.random.split(key)
    B = wav.shape[0]
    crop_len = sample_crop_lengths(k_len, B, len_range[0], len_range[1],
                                   cfg.sr)
    crops, crop_valid = random_crop_wav(k_crop, wav, valid, crop_len,
                                        cfg.out_samples)
    mel = log_melspec(crops, crop_valid, cfg.mel)  # [B, F, T]
    frames = crop_valid // cfg.mel.hop_length + 1
    return mel, frames


def _augment_view(key, mel, frames, cfg: ClipPretrainConfig):
    """Per-view independent Mixup + RandomResizeCrop chain
    (reference positive_transform1/2, methods/atst/transform.py:34-45)."""
    k_mix, k_rrc = jax.random.split(key)
    mel = mixup_log(k_mix, mel, cfg.mixup_ratio, valid_frames=frames)
    return random_resize_crop(
        k_rrc, mel,
        virtual_crop_scale=(1.0, cfg.virtual_crop),
        freq_scale=(0.6, 1.5), time_scale=(0.6, 1.5),
        valid_frames=frames)


def _one_view(key, wav, valid, len_range, cfg: ClipPretrainConfig):
    k_cm, k_aug = jax.random.split(key)
    mel, frames = _crop_mel(k_cm, wav, valid, len_range, cfg)
    return _augment_view(k_aug, mel, frames, cfg), frames


def clip_train_views(key, wav, valid, cfg: ClipPretrainConfig):
    """Build the two training views, stacked view-major: [2B, F, T].

    Matches the reference transform (methods/atst/transform.py:50-74):
    view 1 = anchor crop, view 2 = an independent positive crop — or,
    when ``different_positive=False``, the SAME mel crop as view 1
    (``crop_positive2 = crop_positive1``, transform.py:66) — each then
    put through its own independent Mixup + RandomResizeCrop chain and
    padded to the common width.
    """
    k1, k2 = jax.random.split(key)
    if cfg.different_positive:
        v1, f1 = _one_view(k1, wav, valid, cfg.anchor_len, cfg)
        v2, f2 = _one_view(k2, wav, valid, cfg.positive_len, cfg)
    else:
        k_cm, k_aug1 = jax.random.split(k1)
        mel, f1 = _crop_mel(k_cm, wav, valid, cfg.anchor_len, cfg)
        v1 = _augment_view(k_aug1, mel, f1, cfg)
        v2 = _augment_view(k2, mel, f1, cfg)
        f2 = f1
    mel = jnp.concatenate([v1, v2], axis=0)
    frames = jnp.concatenate([f1, f2], axis=0)
    return mel, frames


class ClipMethod:
    """Bundles encoder construction, state init and the train step."""

    def __init__(self, cfg: ClipPretrainConfig):
        self.cfg = cfg
        enc_kw = dict(
            spec_h=cfg.mel.n_mels,
            spec_w=cfg.out_frames,
            dtype=jnp.dtype(cfg.dtype),
            fused_attention=cfg.fused_attention,
            train_quant=cfg.student_quant,
        )
        enc_fn = {"tiny": ast_tiny, "small": ast_small,
                  "base": ast_base}[cfg.arch]
        hd, od = (128, 32) if cfg.arch == "tiny" else (4096, 256)
        # teacher forwards are never differentiated -> whole-block
        # fused inference kernels (stochastic depth stays in-kernel)
        tea_kw = dict(enc_kw, fused_infer=cfg.fused_attention,
                      infer_quant=cfg.teacher_quant,
                      train_quant="none")  # teacher: no-grad kernels
        self.student = Branch(encoder=enc_fn(**enc_kw), predictor=True,
                              hidden_dim=hd, out_dim=od)
        self.teacher = Branch(encoder=enc_fn(**tea_kw), predictor=False,
                              hidden_dim=hd, out_dim=od)

    def init_state(self, rng) -> PretrainState:
        mel = jnp.zeros((2, self.cfg.mel.n_mels, self.cfg.out_frames),
                        jnp.float32)
        length = jnp.full((2,), self.cfg.out_frames, jnp.int32)
        return init_pretrain_state(rng, self.student, self.teacher,
                                   (mel, length), self.cfg.optimizer)

    def forward_loss(self, student_apply, teacher_apply, batch, rng):
        wav, valid = wav_to_f32(batch["wav"]), batch["valid"]
        k_aug, k_dp, k_dpt = jax.random.split(rng, 3)
        mel, frames = clip_train_views(k_aug, wav, valid, self.cfg)
        s_out, s_updates = student_apply(mel, frames,
                                         rngs={"droppath": k_dp})
        # the reference teacher runs in train mode too (stochastic depth
        # active; Lightning keeps the whole module in .train())
        t_out, t_updates = teacher_apply(mel, frames,
                                         rngs={"droppath": k_dpt})
        t_out = jax.lax.stop_gradient(t_out)
        ls = clip_byol_loss(s_out, t_out, ncrops=2)
        aux = {
            "student_stats": s_updates,
            "teacher_stats": t_updates,
            "std_cls_s": ls.std_student,
            "std_cls_t": ls.std_teacher,
        }
        return ls.loss, aux

    def make_step(self):
        return make_pretrain_step(self.student, self.teacher,
                                  self.cfg.optimizer, self.forward_loss)
