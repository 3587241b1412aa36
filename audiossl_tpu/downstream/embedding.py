"""Frozen-encoder embedding extraction (phase 1 of the linear probe).

Reference flow (``methods/atst/downstream/train_freeze.py:75-110``,
``lightning/utils.py:8``): freeze the pretrained encoder, run one DDP
predict pass over each split with ``get_intermediate_layers_chunks``
(clip) or the chunked frame loop (frame), cache embeddings in memory,
then train a linear head on the cache.

Here extraction is one jitted batched function per static shape; the
host loop streams padded batches through it and stacks numpy outputs.
Mel + central crop run on device (the reference's FreezingTransform ran
torchaudio DSP per sample on CPU).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.models.atst import AudioTransformer
from audiossl_tpu.ops.melspec import MelConfig, log_melspec


def central_crop_frames(wav, valid, crop_samples: int):
    """CentralCrop(train_len, pad=False) of the reference
    (transforms/common.py): crop the middle crop_samples; shorter clips
    keep their own length."""
    B, L = wav.shape
    start = jnp.maximum((valid - crop_samples) // 2, 0)
    start = jnp.minimum(start, jnp.maximum(L - crop_samples, 0))

    def take(w, s):
        return jax.lax.dynamic_slice(w, (s,), (min(crop_samples, L),))

    out = jax.vmap(take)(wav, start)
    out_valid = jnp.minimum(valid, crop_samples)
    pos = jnp.arange(out.shape[1])[None, :]
    out = jnp.where(pos < out_valid[:, None], out, 0.0)
    return out, out_valid


def make_clip_extractor(encoder: AudioTransformer, params,
                        crop_len_s: float = 12.0, n_blocks: int = 12,
                        chunk_len: int = 601, avgpool: bool = True,
                        mel: MelConfig = MelConfig(), sr: int = 16000):
    """-> jitted (wav [B,L], valid [B]) -> [B, 2*n_blocks*D] embeddings
    (reference PretrainedEncoderPLModule, downstream/model.py:18-41)."""
    crop_samples = int(crop_len_s * sr)

    @jax.jit
    def extract(wav, valid):
        crop, cv = central_crop_frames(wav, valid, crop_samples)
        spec = log_melspec(crop, cv, mel)
        frames = cv // mel.hop_length + 1
        return encoder.apply(
            {"params": params}, spec, frames, n=n_blocks,
            chunk_len=chunk_len, avgpool=avgpool, deterministic=True,
            method=encoder.get_intermediate_layers_chunks)

    return extract


def make_frame_extractor(encoder: AudioTransformer, params,
                         crop_len_s: float = 12.0, n_blocks: int = 12,
                         chunk_len_s: float = 6.0,
                         mel: MelConfig = MelConfig(), sr: int = 16000):
    """-> jitted scene-embedding extractor for the frame encoder
    (reference atstframe/downstream/model.py:18-61): chunk the mel into
    pretrain-length chunks, per-chunk scene embeddings (last-n block
    means), chunk-mark weighted average -> [B, n_blocks*D]."""
    crop_samples = int(crop_len_s * sr)
    chunk_len = int(chunk_len_s * sr) // mel.hop_length + 1

    @jax.jit
    def extract(wav, valid):
        crop, cv = central_crop_frames(wav, valid, crop_samples)
        spec = log_melspec(crop, cv, mel)
        length = cv // mel.hop_length + 1
        B, F, T = spec.shape
        num_chunks = max(T // chunk_len, 1)
        pad_to = num_chunks * chunk_len
        specp = jnp.pad(spec, ((0, 0), (0, 0), (0, max(pad_to - T, 0))))
        specp = specp[:, :, :pad_to]
        chunks = specp.reshape(B, F, num_chunks, chunk_len)
        chunks = jnp.transpose(chunks, (0, 2, 1, 3)).reshape(
            B * num_chunks, F, chunk_len)
        ks = jnp.arange(num_chunks)
        cur = jnp.clip(length[:, None] - ks[None, :] * chunk_len, 0, None)
        mark = jnp.where(ks[None, :] == 0, cur > 0, cur > chunk_len // 2)
        emb = encoder.apply(
            {"params": params}, chunks,
            jnp.minimum(cur.reshape(-1), chunk_len),
            n=n_blocks, scene=True, deterministic=True,
            method=encoder.get_intermediate_layers)  # [B*nc, n*D]
        emb = emb.reshape(B, num_chunks, -1)
        w = mark.astype(emb.dtype)[:, :, None]
        return jnp.sum(emb * w, axis=1) / jnp.maximum(
            jnp.sum(w, axis=1), 1.0)

    return extract


def extract_split(extract_fn, loader) -> tuple:
    """Run the extractor over a BatchLoader; -> (embeddings, labels)."""
    embs, labels = [], []
    for batch in loader:
        e = extract_fn(batch["wav"], batch["valid"])
        embs.append(np.asarray(e))
        labels.append(np.asarray(batch["label"]))
    return np.concatenate(embs), np.concatenate(labels)
