"""Pallas TPU kernel: fused |STFT|^2 -> mel filterbank -> dB.

The MXU conv produces the interleaved real/imag STFT [B, 2F, T]
(ops/melspec.py). XLA would materialize the [B, F, T] power array in
HBM between the square and the mel matmul (~100 MB per 48x10 s batch,
each way). This kernel keeps the whole postprocess in VMEM per
(batch, time-block) tile: square, [n_mels, F] x [F, T_blk] matmul on
the MXU, and the 10*log10 compression — one HBM read of the STFT, one
HBM write of the [B, n_mels, T] mel.

The per-sample top_db clamp and MinMax normalization need a global
per-sample max, so they stay as a (cheap, fused) jnp epilogue in
``ops.melspec.log_melspec``.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG10_SCALE = 10.0 / math.log(10.0)


def _mel_db_kernel(stft_ref, fbt_ref, out_ref, *, amin: float):
    x = stft_ref[0]                       # [2F, T_blk]
    F = x.shape[0] // 2
    re = x[:F, :]
    im = x[F:, :]
    power = re * re + im * im             # [F, T_blk] (VPU)
    mel = jnp.dot(fbt_ref[:], power,
                  preferred_element_type=jnp.float32)  # [n_mels, T_blk]
    out_ref[0] = _LOG10_SCALE * jnp.log(jnp.maximum(mel, amin))


def stft_to_mel_db(stft: jnp.ndarray, fb: jnp.ndarray,
                   amin: float = 1e-10, block_t: int = 256,
                   interpret: bool = False) -> jnp.ndarray:
    """stft: [B, 2F, T] (cos rows then -sin rows); fb: [F, n_mels]
    -> unclamped mel dB [B, n_mels, T]."""
    B, F2, T = stft.shape
    n_mels = fb.shape[1]
    pad_t = (-T) % block_t
    if pad_t:
        # pad with ones -> log stays finite; sliced off below
        stft = jnp.pad(stft, ((0, 0), (0, 0), (0, pad_t)),
                       constant_values=1.0)
    Tp = T + pad_t
    grid = (B, Tp // block_t)
    fbt = jnp.asarray(fb.T, jnp.float32)  # [n_mels, F]
    out = pl.pallas_call(
        functools.partial(_mel_db_kernel, amin=amin),
        out_shape=jax.ShapeDtypeStruct((B, n_mels, Tp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, F2, block_t), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_mels, F2 // 2), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_mels, block_t),
                               lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Tp * (F2 // 2) * n_mels + 3 * B * F2 * Tp,
            bytes_accessed=(B * F2 * Tp + B * n_mels * Tp) * 4,
            transcendentals=B * n_mels * Tp,
        ),
        interpret=interpret,
    )(stft, fbt)
    return out[:, :, :T]


def mel_db_kernel_available() -> bool:
    return jax.default_backend() == "tpu"
