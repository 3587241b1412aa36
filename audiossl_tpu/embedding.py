"""Public embedding API (reference ``methods/atstframe/embedding.py``).

The three-function surface users script against:

* ``load_model(ckpt_path, arch)`` — load a pretrained ATST-Frame
  checkpoint (our orbax format or a reference PyTorch ``.ckpt`` via the
  importer) and return a ready ``EmbeddingModel``;
* ``get_scene_embedding(audio, model)`` — one embedding per clip:
  chunk into 1001-frame windows, encode, average over chunks
  -> [B, n_blocks*embed_dim]  (reference embedding.py:41-79);
* ``get_timestamp_embedding(audio, model)`` — frame-rate embeddings
  concatenated along time with 40 ms timestamps
  -> ([B, T, n_blocks*embed_dim], timestamps_ms) (embedding.py:85-127).

All DSP runs on device; functions are jit-cached per input shape.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.models.atst import (
    AudioTransformer,
    frame_ast_base,
    frame_ast_small,
)
from audiossl_tpu.ops.melspec import MelConfig, log_melspec

CHUNK_FRAMES = 1001  # 10 s at hop 160 (reference embedding.py:61)


@dataclasses.dataclass
class EmbeddingModel:
    encoder: AudioTransformer
    params: dict
    n_blocks: int = 12
    mel: MelConfig = dataclasses.field(default_factory=MelConfig)

    @property
    def embed_dim(self):
        return self.encoder.embed_dim

    @property
    def scene_embedding_size(self):
        return self.encoder.embed_dim * self.n_blocks

    @property
    def timestamp_embedding_size(self):
        return self.encoder.embed_dim * self.n_blocks


def load_model(ckpt_path: str, arch: Optional[str] = None,
               which: str = "teacher", fused: bool = False,
               quant: str = "none") -> EmbeddingModel:
    """Load atstframe_{small,base} weights from a reference PyTorch
    Lightning checkpoint (.ckpt) or an orbax directory.

    fused=True runs extraction through the whole-block resident-weight
    inference kernels (TPU bf16 path); quant="int8" additionally uses
    the int8 MXU matmuls (2x peak; ~1e-2 relative output change — for
    bulk offline extraction, NOT parity evaluation)."""
    if ckpt_path.endswith(".ckpt"):
        from audiossl_tpu.compat.torch_import import load_pretrain_checkpoint

        params, hparams = load_pretrain_checkpoint(ckpt_path, which=which)
        if arch is None:
            arch = hparams.get("arch", "base")
    else:
        from audiossl_tpu.training.checkpoint import restore_params

        params = restore_params(ckpt_path)
        if arch is None:
            arch = "base"
    from audiossl_tpu.models.atst import frame_ast_tiny

    if quant not in ("none", "int8"):
        raise ValueError(f"unknown quant mode {quant!r} "
                         "(supported: 'none', 'int8')")
    if quant != "none" and not fused:
        raise ValueError("quant requires fused=True (the quantized "
                         "matmuls live in the fused block kernels)")
    kw = {}
    if fused:
        kw = dict(fused_attention=True, fused_infer=True,
                  infer_quant=quant, dtype=jnp.bfloat16)
    enc = {"tiny": frame_ast_tiny, "small": frame_ast_small,
           "base": frame_ast_base}[arch](spec_w=CHUNK_FRAMES, **kw)
    return EmbeddingModel(encoder=enc, params=params)


def _chunkify(mel, length, chunk_len):
    """[B, F, T] -> ([B*nc, F, chunk_len], per-chunk lengths, chunk mask)."""
    B, F, T = mel.shape
    nc = max((T + chunk_len - 1) // chunk_len, 1)
    pad_to = nc * chunk_len
    melp = jnp.pad(mel, ((0, 0), (0, 0), (0, pad_to - T)))
    chunks = melp.reshape(B, F, nc, chunk_len)
    chunks = jnp.transpose(chunks, (0, 2, 1, 3)).reshape(B * nc, F,
                                                         chunk_len)
    ks = jnp.arange(nc)
    cur = jnp.clip(length[:, None] - ks[None, :] * chunk_len, 0, None)
    has = cur > 0
    return chunks, jnp.minimum(cur.reshape(-1), chunk_len), has, nc


@functools.lru_cache(maxsize=16)
def _scene_fn(model_id, n_samples: int, batch: int):
    model = _MODELS[model_id]

    @jax.jit
    def fn(params, wav, valid):
        mel = log_melspec(wav, valid, model.mel)
        length = valid // model.mel.hop_length + 1
        chunks, cur, has, nc = _chunkify(mel, length, CHUNK_FRAMES)
        emb = model.encoder.apply(
            {"params": params}, chunks, cur, n=model.n_blocks, scene=True,
            deterministic=True,
            method=model.encoder.get_intermediate_layers)
        emb = emb.reshape(batch, nc, -1)
        w = has.astype(emb.dtype)[:, :, None]
        return jnp.sum(emb * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1),
                                                      1.0)

    return fn


@functools.lru_cache(maxsize=16)
def _timestamp_fn(model_id, n_samples: int, batch: int):
    model = _MODELS[model_id]
    pw = model.encoder.patch_w

    @jax.jit
    def fn(params, wav, valid):
        mel = log_melspec(wav, valid, model.mel)
        length = valid // model.mel.hop_length + 1
        chunks, cur, has, nc = _chunkify(mel, length, CHUNK_FRAMES)
        emb = model.encoder.apply(
            {"params": params}, chunks, cur, n=model.n_blocks, scene=False,
            deterministic=True,
            method=model.encoder.get_intermediate_layers)
        # [B*nc, tokens, n*D] -> [B, nc*tokens, n*D] (concat along time)
        t = emb.shape[1]
        emb = emb.reshape(batch, nc * t, emb.shape[-1])
        return emb

    return fn


_MODELS: dict = {}


def _model_key(model: EmbeddingModel):
    mid = id(model)
    _MODELS[mid] = model
    return mid


def get_scene_embedding(audio, model: EmbeddingModel) -> jnp.ndarray:
    """audio: [B, n_samples] (or [n_samples]) 16 kHz waveform ->
    [B, n_blocks*embed_dim] scene embeddings."""
    audio = jnp.atleast_2d(jnp.asarray(audio, jnp.float32))
    B, n = audio.shape
    valid = jnp.full((B,), n, jnp.int32)
    fn = _scene_fn(_model_key(model), n, B)
    return fn(model.params, audio, valid)


def get_timestamp_embedding(audio, model: EmbeddingModel
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """audio: [B, n_samples] -> (embeddings [B, T, n_blocks*D],
    timestamps in ms [B, T]) at one embedding per patch (40 ms)."""
    audio = jnp.atleast_2d(jnp.asarray(audio, jnp.float32))
    B, n = audio.shape
    valid = jnp.full((B,), n, jnp.int32)
    fn = _timestamp_fn(_model_key(model), n, B)
    emb = fn(model.params, audio, valid)
    T = emb.shape[1]
    pw = model.encoder.patch_w
    hop_ms = model.mel.hop_length / model.mel.sample_rate * 1000.0
    ts = (jnp.arange(T) * pw + pw / 2.0) * hop_ms
    return emb, jnp.broadcast_to(ts[None, :], (B, T))
