"""LayerNorm with a single-pass Pallas TPU backward.

The student encoder's block LayerNorms (``norm1`` before attention —
``norm2`` lives inside the trainable fused-MLP kernel) and the final
encoder norm backprop through XLA, which lowers each LN backward as a
reduce fusion (dscale/dbias + row statistics) plus an apply fusion —
two full reads of (x, dy) where one suffices. Profiled 2026-08-19:
19 `multiply_reduce` fusions, 13.2 ms/step at B=96 vs a ~7 ms
single-pass floor (docs/PROFILE.md round-4 breakdown).

Design: the FORWARD stays plain jnp — XLA fuses it into the adjacent
qkv matmul for free, and a Pallas forward would force an extra HBM
round trip of the normalized activations. Only the BACKWARD is a
Pallas kernel: one streaming pass over (x, dy) per row block that
recomputes mu/rstd on the VPU (cheaper than saving them), emits dx,
and accumulates dscale/dbias across the sequential grid.

Forward numerics match ``flax.linen.LayerNorm`` (f32 fast-variance
statistics, affine in f32, result cast to the compute dtype).
Reference provenance: torch ``nn.LayerNorm`` inside the ViT blocks,
/root/reference/audiossl/models/atst/audio_transformer.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_fwd_math(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(  # fast variance, clamped like flax
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias
    return y


def _bwd_block(xf, gf, scale, eps):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    dxhat = gf * scale
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    dscale = jnp.sum(gf * xhat, axis=0)  # [C]
    dbias = jnp.sum(gf, axis=0)
    return dx, dscale, dbias


def _bwd_kernel(x_ref, g_ref, s_ref, dx_ref, ds_ref, db_ref, *, eps,
                n_rows):
    bR = x_ref.shape[0]
    # zero x/g on the final block's padding rows so the dscale/dbias
    # accumulators see no out-of-bounds garbage (dx writes there are
    # masked by Pallas; these reductions are not). MUST be a select,
    # not a multiply: OOB block padding is undefined and may decode as
    # NaN/Inf, and NaN * 0 = NaN would poison the reductions (observed
    # on chip at B=96/base where R % bR != 0 leaves a partial block).
    rows = (jax.lax.broadcasted_iota(jnp.int32, (bR, 1), 0)
            + pl.program_id(0) * bR)
    live = rows < n_rows
    gf = jnp.where(live, g_ref[...].astype(jnp.float32), 0.0)
    dx, dscale, dbias = _bwd_block(
        jnp.where(live, x_ref[...].astype(jnp.float32), 0.0), gf,
        s_ref[0].astype(jnp.float32), eps)
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        ds_ref[...] = jnp.zeros_like(ds_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    ds_ref[0] += dscale
    db_ref[0] += dbias


def _bwd_pallas(x, g, scale, eps, interpret):
    shape = x.shape
    C = shape[-1]
    R = x.size // C
    x2, g2 = x.reshape(R, C), g.reshape(R, C)
    bR = max(8, min(R, ((1 << 20) // max(C * x.dtype.itemsize, 1))
                    // 8 * 8))
    blk = pl.BlockSpec((bR, C), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((1, C), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    dx, ds, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, n_rows=R),
        grid=(pl.cdiv(R, bR),),
        in_specs=[blk, blk,
                  pl.BlockSpec((1, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[blk, acc, acc],
        out_shape=[jax.ShapeDtypeStruct((R, C), x.dtype),
                   jax.ShapeDtypeStruct((1, C), jnp.float32),
                   jax.ShapeDtypeStruct((1, C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=14 * R * C,
            bytes_accessed=(2 * R * C * x.dtype.itemsize
                            + R * C * x.dtype.itemsize),
            transcendentals=2 * R,
        ),
        # sequential grid: dscale/dbias accumulate across row blocks
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x2, g2, scale.reshape(1, C).astype(jnp.float32))
    return dx.reshape(shape), ds[0], db[0]


def _use_pallas_bwd() -> bool:
    import os

    # Default OFF: the r4 chip A/B measured the XLA LN backward FASTER
    # end-to-end (357.97 vs 352.33 clips/s at B=96) — the custom-call
    # boundary forces layout copies that outweigh the single-pass win
    # (docs/PROFILE.md "kernel A/Bs after the LN-backward NaN fix").
    # AUDIOSSL_PALLAS_LN=1 re-enables the Pallas path.
    return (jax.default_backend() == "tpu"
            and os.environ.get("AUDIOSSL_PALLAS_LN", "0") == "1")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def layer_norm(x, scale, bias, eps=1e-6, dtype=jnp.float32,
               interpret=False):
    """flax-equivalent LayerNorm whose backward is one Pallas pass.
    ``dtype`` is the output/compute dtype (the result of the f32 affine
    is cast to it, exactly like ``nn.LayerNorm(dtype=...)``)."""
    return _ln_fwd_math(x, scale, bias, eps).astype(dtype)


def _ln_vjp_fwd(x, scale, bias, eps, dtype, interpret):
    return layer_norm(x, scale, bias, eps, dtype, interpret), (x, scale)


def _ln_vjp_bwd(eps, dtype, interpret, res, g):
    x, scale = res
    if _use_pallas_bwd() or interpret:
        dx, ds, db = _bwd_pallas(x, g.astype(x.dtype), eps=eps,
                                 scale=scale, interpret=interpret)
    else:
        dx, ds, db = _bwd_block(
            x.astype(jnp.float32).reshape(-1, x.shape[-1]),
            g.astype(jnp.float32).reshape(-1, x.shape[-1]),
            scale.astype(jnp.float32), eps)
        dx = dx.astype(x.dtype).reshape(x.shape)
    return dx, ds.astype(scale.dtype), db.astype(scale.dtype)


layer_norm.defvjp(_ln_vjp_fwd, _ln_vjp_bwd)
