"""Uniform encoder-adapter interface for downstream SED/classification
drivers (reference ``downstream/comparison_models/*_module.py`` — 11
adapters exposing ``forward(batch) -> frame_embeddings``, ``transform``,
``freeze()/finetune_mode()``).

Adapters for this framework's own model families (clip-ATST,
frame-ATST, distilled frame-ATST) plus flax ports of the third-party
comparison encoders the reference vendors: BEATs, BYOL-A, AudioMAE,
M2D ("mmd"), SSAST frame+patch, MAE-AST frame+patch (see
``audiossl_tpu/compat/``; each has a released-checkpoint importer and
a torch forward-parity test — all 11 of the reference's ``--arch``
dispatch entries, train_dcase.py:139-161, are covered).
``register_adapter`` remains the
extension point for plugging any further encoder with the same
surface into train_dcase / train_as_strong / train_freeze.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from audiossl_tpu.models.atst import AudioTransformer
from audiossl_tpu.ops.melspec import MelConfig, log_melspec

_ADAPTERS: Dict[str, Callable] = {}


def register_adapter(name: str):
    def deco(fn):
        _ADAPTERS[name] = fn
        return fn
    return deco


def get_adapter(name: str, **kw):
    if name not in _ADAPTERS:
        raise KeyError(
            f"unknown encoder adapter {name!r}; available: "
            f"{sorted(_ADAPTERS)}")
    return _ADAPTERS[name](**kw)


def list_adapters():
    return sorted(_ADAPTERS)


@dataclasses.dataclass
class EncoderAdapter:
    """forward(wav, valid) -> frame embeddings [B, T', D]."""
    encoder: AudioTransformer
    params: dict
    mel: MelConfig = dataclasses.field(default_factory=MelConfig)
    frozen: bool = True

    @property
    def embed_dim(self):
        return self.encoder.embed_dim

    @property
    def frame_rate_divisor(self):
        return self.encoder.patch_w

    def token_count(self, n_samples: int) -> int:
        return n_samples // self.mel.hop_length // self.encoder.patch_w

    def frame_embeddings(self, params, wav, valid, train=False,
                         rngs=None):
        spec = log_melspec(wav, valid, self.mel)
        length = valid // self.mel.hop_length + 1
        out = self.encoder.apply(
            {"params": params}, spec, length, n=1, scene=False,
            deterministic=not train, rngs=rngs,
            method=self.encoder.get_intermediate_layers)
        if self.encoder.use_cls:
            # clip model used as a frame encoder: drop the CLS token
            # (reference clip_atst_module.py:19-29)
            out = out[:, 1:]
        return out


@register_adapter("frameatst")
def _frame_atst(ckpt_path: str, arch: str = "base", **kw):
    from audiossl_tpu.downstream.train_freeze import load_encoder

    enc, params = load_encoder(ckpt_path, "frame", arch, spec_w=1001)
    return EncoderAdapter(encoder=enc, params=params, **kw)


@register_adapter("clipatst")
def _clip_atst(ckpt_path: str, arch: str = "base", **kw):
    """Clip-level ATST as a frame encoder: CLS sliced off (reference
    clip_atst_module.py:19-29)."""
    from audiossl_tpu.downstream.train_freeze import load_encoder

    enc, params = load_encoder(ckpt_path, "clip", arch, spec_w=1001)
    return EncoderAdapter(encoder=enc, params=params, **kw)


@register_adapter("distillatst")
def _distill_atst(ckpt_path: str, arch: str = "base", **kw):
    from audiossl_tpu.downstream.train_freeze import load_encoder

    enc, params = load_encoder(ckpt_path, "frame", arch, spec_w=1001,
                               which="student")
    return EncoderAdapter(encoder=enc, params=params, **kw)


@dataclasses.dataclass
class BEATsAdapter:
    """BEATs as a frame encoder for SED drivers (reference
    beats_module.py:19-69): kaldi fbank front-end with the published
    normalization stats, encoder tokens mean-pooled over the 8 freq
    patches per time step (AvgPool1d(8, 8)) -> 1 embedding per 16
    fbank frames."""
    encoder: object
    params: dict
    fbank_mean: float = 15.41663
    fbank_std: float = 6.55582
    frozen: bool = True

    @property
    def embed_dim(self):
        return self.encoder.cfg.encoder_embed_dim

    @property
    def frame_rate_divisor(self):
        # strong labels are pooled by this factor from 100 fps fbank
        # frames (ManyHotEncoder net_pooling)
        return self.encoder.cfg.input_patch_size

    def token_count(self, n_samples: int) -> int:
        frames = 1 + (n_samples - 400) // 160  # kaldi snip_edges
        return frames // self.encoder.cfg.input_patch_size

    def frame_embeddings(self, params, wav, valid, train=False,
                         rngs=None):
        from audiossl_tpu.compat.beats import kaldi_fbank

        fb = kaldi_fbank(wav * 2.0 ** 15)
        fb = (fb - self.fbank_mean) / (2.0 * self.fbank_std)
        vf = jnp.maximum(1 + (valid - 400) // 160, 1)
        toks = self.encoder.apply({"params": params}, fb,
                                  valid_frames=vf)
        B, N, D = toks.shape
        F = 8  # freq patches per time step (128 mels / 16)
        return toks.reshape(B, N // F, F, D).mean(axis=2)


@dataclasses.dataclass
class BYOLAAdapter:
    """BYOL-A v2 CNN as a frame encoder (reference byola_module.py):
    Slaney log-mel front-end with the published PrecomputedNorm stats,
    conv stack pools time by 4 -> 25 fps frame embeddings of dim 3072.
    BatchNorm uses the checkpoint's running statistics."""
    encoder: object
    variables: dict
    frozen: bool = True

    @property
    def params(self):
        return self.variables["params"]

    @property
    def embed_dim(self):
        return self.encoder.d

    @property
    def frame_rate_divisor(self):
        return 4  # two 2x time maxpools over 100 fps mels

    def token_count(self, n_samples: int) -> int:
        return (n_samples // 160 + 1) // 4

    def frame_embeddings(self, params, wav, valid, train=False,
                         rngs=None):
        from audiossl_tpu.compat.byola import byola_logmel

        lms = byola_logmel(wav)
        return self.encoder.apply(
            {"params": params,
             "batch_stats": self.variables["batch_stats"]}, lms)


@register_adapter("byola")
def _byola(ckpt_path: str, **kw):
    """Released BYOL-A .pth -> flax adapter (reference
    train_dcase.py:141-142 + byola_module.py)."""
    from audiossl_tpu.compat.byola import load_byola_checkpoint

    kw.pop("arch", None)
    enc, variables = load_byola_checkpoint(ckpt_path)
    return BYOLAAdapter(encoder=enc, variables=variables, **kw)


@register_adapter("beats")
def _beats(ckpt_path: str, **kw):
    """Released BEATs torch checkpoint -> flax adapter (reference
    train_dcase.py:155-156 + beats_module.py)."""
    from audiossl_tpu.compat.beats import load_beats_checkpoint

    kw.pop("arch", None)
    enc, params = load_beats_checkpoint(ckpt_path)
    return BEATsAdapter(encoder=enc, params=params, **kw)


@register_adapter("audioMAE")
def _audiomae(ckpt_path: str, **kw):
    """Released AudioMAE .pth -> flax adapter (reference
    train_dcase.py:149-150 + audioMAE_module.py)."""
    from audiossl_tpu.compat.audiomae import (
        AudioMAEAdapter,
        load_audiomae_checkpoint,
    )

    kw.pop("arch", None)
    enc, params = load_audiomae_checkpoint(ckpt_path)
    return AudioMAEAdapter(encoder=enc, params=params, **kw)


@register_adapter("mmd")
def _mmd(ckpt_path: str, **kw):
    """Released M2D .pth -> flax adapter (reference
    train_dcase.py:157-158 + mmd_module.py)."""
    from audiossl_tpu.compat.m2d import M2DAdapter, load_m2d_checkpoint

    kw.pop("arch", None)
    enc, params = load_m2d_checkpoint(ckpt_path)
    return M2DAdapter(encoder=enc, params=params, **kw)


@register_adapter("ssast")
def _ssast(ckpt_path: str, **kw):
    """Released SSAST SSL checkpoint, frame (128x2) variant ->
    flax adapter (reference train_dcase.py:143-144 + ssast_module.py)."""
    from audiossl_tpu.compat.ssast import SSASTAdapter, load_ssast_checkpoint

    kw.pop("arch", None)
    enc, params = load_ssast_checkpoint(ckpt_path, variant="frame")
    return SSASTAdapter(encoder=enc, params=params, **kw)


@register_adapter("patchssast")
def _patch_ssast(ckpt_path: str, **kw):
    """Released SSAST SSL checkpoint, patch (16x16) variant ->
    flax adapter (reference train_dcase.py:145-146 +
    patch_ssast_module.py)."""
    from audiossl_tpu.compat.ssast import SSASTAdapter, load_ssast_checkpoint

    kw.pop("arch", None)
    enc, params = load_ssast_checkpoint(ckpt_path, variant="patch")
    return SSASTAdapter(encoder=enc, params=params, **kw)


@register_adapter("maeast")
def _maeast(ckpt_path: str, **kw):
    """Released MAE-AST frame-variant .pt -> flax adapter (reference
    train_dcase.py:141-142 + mae_ast_module.py)."""
    from audiossl_tpu.compat.maeast import (
        MAEASTAdapter,
        load_maeast_checkpoint,
    )

    kw.pop("arch", None)
    enc, params = load_maeast_checkpoint(ckpt_path, variant="frame")
    return MAEASTAdapter(encoder=enc, params=params, **kw)


@register_adapter("patchmaeast")
def _patch_maeast(ckpt_path: str, **kw):
    """Released MAE-AST patch-variant .pt -> flax adapter (reference
    train_dcase.py:147-148 + mae_ast_patch_module.py)."""
    from audiossl_tpu.compat.maeast import (
        MAEASTAdapter,
        load_maeast_checkpoint,
    )

    kw.pop("arch", None)
    enc, params = load_maeast_checkpoint(ckpt_path, variant="patch")
    return MAEASTAdapter(encoder=enc, params=params, **kw)


class EnsembleModel:
    """Average clip+frame classifier logits (working version of the
    reference's dead ensemble code, downstream/ensemble.py)."""

    def __init__(self, predict_fns):
        self.predict_fns = list(predict_fns)

    def __call__(self, *args, **kw):
        logits = [f(*args, **kw) for f in self.predict_fns]
        return sum(logits) / len(logits)


def cal_norm(extract_fn, loader):
    """Embedding mean/std over a dataset (reference
    downstream/cal_norm.py)."""
    import numpy as np

    total, total_sq, n = 0.0, 0.0, 0
    for batch in loader:
        e = np.asarray(extract_fn(batch["wav"], batch["valid"]))
        total = total + e.sum(0)
        total_sq = total_sq + (e ** 2).sum(0)
        n += len(e)
    mean = total / n
    std = np.sqrt(np.maximum(total_sq / n - mean ** 2, 0.0))
    return mean, std
