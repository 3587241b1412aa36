"""Trainable fused MLP residual sub-block (LN -> fc1 -> GELU -> fc2 ->
stochastic-depth residual) with in-kernel weight-gradient accumulation.

The inference forwards already run as whole-block resident-weight
kernels (ops/pallas_block.py). This is the TRAINING counterpart for
the student encoder — a custom_vjp whose design follows a MEASURED
split (v5e, ViT-base, 192 sequences x 256 tokens per layer-pass):

Measured reality check (every variant benchmarked end-to-end in the
production step, v5e, B=96): the XLA per-op path, this whole-block
custom_vjp pair, and an XLA-fwd/Pallas-bwd hybrid all land within
~±2% of each other (328 / 330 / 322 clips/s) — XLA's pipelined
per-op fusions are already at ~145-160 TF/s effective here, so the
"whole-block training kernels" estimate from the round-2 handoff
(+20-30 clips/s) did NOT materialize; isolated-kernel wins (the
hybrid's backward is 0.9 ms/layer-pass faster standalone) are eaten
by lost cross-op overlap in the full step graph. The pair is kept
(it wins slightly and holds the door open for deeper fusion):

* **forward kernel**: LN -> fc1 -> exact GELU -> fc2 -> residual with
  weights resident in VMEM; saves one residual, the fc1
  pre-activation ``u`` (bf16).
* **backward kernel** (5.9 ms vs XLA's ~6.6 ms standalone):
  - the [*, 4C]-sized intermediates ``da``/``du`` never touch HBM
    (on the XLA path ``du`` alone is written once and read twice by
    the fc1 weight-grad and dx dots);
  - GELU value + derivative are rebuilt from ``u`` with ONE shared
    ``exp(-u^2/2)`` (the A&S erf polynomial and the gaussian pdf
    need the same exponential) while the MXU runs gradient dots;
  - dW1/dW2/db/dLN accumulate in f32 directly in VMEM output blocks
    across a sequential batch grid (constant index maps: one HBM
    write at grid end);
  - the LayerNorm backward runs inside the same kernel on f32
    statistics recomputed from the residual-stream input.

Semantics match ``transformer.Block``'s norm2+Mlp residual half:
pre-LN (f32 stats), exact-erf GELU (the same A&S 7.1.26 polynomial
the XLA path uses via ``transformer.erf_approx``), per-sample
stochastic-depth keep multiplier folded into the residual add.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiossl_tpu.ops.pallas_block import (  # shared helpers
    _const,
    _erf,
    _q8_dot,
    _rcp,
    _row,
    quantize_weight_q8,
)

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _erf_from_exp(x, ex2, hi=False):
    """A&S 7.1.26 erf(x) given a precomputed exp(-x*x). NR-refined
    approximate VPU reciprocal for the rational term; ``hi=True`` on
    f32-weight paths adds a second Newton step (see
    pallas_block._rcp)."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = _rcp(1.0 + 0.3275911 * a, hi=hi)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * ex2)


def _ln_fwd(xf, scale, bias, eps):
    mu = xf.mean(axis=-1, keepdims=True)
    xc = xf - mu
    var = (xc * xc).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    return xhat, rstd, xhat * scale + bias


def _row_droppath(dp_ref, mb, N):
    """Per-row [mb*N, 1] stochastic-depth multiplier from the per-sample
    [mb, 1, 1] block. Built with iota+select: Mosaic rejects the
    broadcast-reshape ((mb,1,256)->(mb*N,1) moves the lane dim)."""
    if mb == 1:
        return dp_ref[0, 0, 0]
    sid = jax.lax.broadcasted_iota(jnp.int32, (mb * N, 1), 0) // N
    dp = jnp.zeros((mb * N, 1), jnp.float32)
    for s in range(mb):
        dp = jnp.where(sid == s, dp_ref[s, 0, 0], dp)
    return dp


def _fwd_kernel(x_ref, dp_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, y_ref, u_ref, *, eps):
    cdt = w1_ref.dtype
    mb, N, C = x_ref.shape
    Hd = w1_ref.shape[1]
    xf = x_ref[...].reshape(mb * N, C).astype(jnp.float32)
    _, _, h = _ln_fwd(xf, ls_ref[0], lb_ref[0], eps)
    h = h.astype(cdt)
    u = jax.lax.dot_general(
        h, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[0]  # [mb*N, 4C] f32
    u_ref[...] = u.astype(u_ref.dtype).reshape(mb, N, Hd)
    ex2 = jnp.exp(-u * u * 0.5)
    a = (0.5 * u * (1.0 + _erf_from_exp(
        u * _INV_SQRT2, ex2, hi=cdt == jnp.float32))).astype(cdt)
    y = jax.lax.dot_general(
        a, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[0]
    dp = _row_droppath(dp_ref, mb, N)
    y_ref[...] = (xf + y * dp).astype(y_ref.dtype).reshape(mb, N, C)


def _fwd_kernel_q8(x_ref, dp_ref, ls_ref, lb_ref, w1_ref, s1_ref,
                   b1_ref, w2_ref, s2_ref, b2_ref, y_ref, u_ref, *,
                   eps):
    """int8-MXU forward (2x bf16 peak on v5e): per-output-channel
    weight scales x per-row activation scales, the same scheme as the
    teacher's _mlp_kernel_q8 (pallas_block.py). The saved ``u`` is the
    TRUE quantized-path pre-activation, so the backward's GELU
    derivative differentiates the function the forward actually
    computed; activation quantization itself is straight-through."""
    mb, N, C = x_ref.shape
    Hd = w1_ref.shape[1]
    xf = x_ref[...].reshape(mb * N, C).astype(jnp.float32)
    _, _, h = _ln_fwd(xf, ls_ref[0], lb_ref[0], eps)
    u = _q8_dot(h, w1_ref, s1_ref) + b1_ref[0]  # [mb*N, 4C] f32
    u_ref[...] = u.astype(u_ref.dtype).reshape(mb, N, Hd)
    ex2 = jnp.exp(-u * u * 0.5)
    a = 0.5 * u * (1.0 + _erf_from_exp(u * _INV_SQRT2, ex2))
    # |gelu(u)| <= max(gelu(rowmax(u)), 0.17) — one reduce over the
    # pre-activation bounds the activation rows (pallas_block notes)
    umax = jnp.max(u, axis=-1, keepdims=True)
    gmax = 0.5 * umax * (1.0 + _erf(umax * _INV_SQRT2))
    bound = jnp.maximum(gmax, 0.17)
    y = _q8_dot(a, w2_ref, s2_ref, bound=bound) + b2_ref[0]
    dp = _row_droppath(dp_ref, mb, N)
    y_ref[...] = (xf + y * dp).astype(y_ref.dtype).reshape(mb, N, C)


def _bwd_impl(x_ref, dy_ref, u_ref, dp_ref, ls_ref, lb_ref,
              dot_da, dot_dh, cdt,
              dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
              dls_ref, dlb_ref, *, eps):
    """Shared backward body. ``dot_da``/``dot_dh`` close over the
    weight refs (bf16 or int8-transposed SwitchBack path) and map f32
    cotangent rows to f32 rows."""
    b = pl.program_id(0)
    mb, N, C = x_ref.shape
    Hd = u_ref.shape[2]

    @pl.when(b == 0)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dls_ref[...] = jnp.zeros_like(dls_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)

    ls = ls_ref[0]
    xf = x_ref[...].reshape(mb * N, C).astype(jnp.float32)
    xhat, rstd, h = _ln_fwd(xf, ls, lb_ref[0], eps)
    h = h.astype(cdt)
    # GELU value + derivative from the saved pre-activation; erf and
    # the gaussian pdf share one exp(-u^2/2)
    u = u_ref[...].reshape(mb * N, Hd).astype(jnp.float32)
    ex2 = jnp.exp(-u * u * 0.5)
    erf_t = _erf_from_exp(u * _INV_SQRT2, ex2, hi=cdt == jnp.float32)
    half_cdf = 0.5 * (1.0 + erf_t)
    a = (u * half_cdf).astype(cdt)                   # gelu(u)
    gp = half_cdf + u * _INV_SQRT_2PI * ex2           # gelu'(u)

    dyf = dy_ref[...].reshape(mb * N, C).astype(jnp.float32)
    dyb = dyf * _row_droppath(dp_ref, mb, N)
    dyb_c = dyb.astype(cdt)
    dw2_ref[...] += jax.lax.dot_general(
        a, dyb_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [4C, C]
    db2_ref[...] += jnp.sum(dyb, axis=0, keepdims=True)
    da = dot_da(dyb)                                  # [N, 4C]
    du = da * gp
    du_c = du.astype(cdt)
    dw1_ref[...] += jax.lax.dot_general(
        h, du_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [C, 4C]
    db1_ref[...] += jnp.sum(du, axis=0, keepdims=True)
    dh = dot_dh(du)                                   # [N, C]
    dls_ref[...] += jnp.sum(dh * xhat, axis=0, keepdims=True)
    dlb_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dxh = dh * ls
    m1 = dxh.mean(axis=-1, keepdims=True)
    m2 = (dxh * xhat).mean(axis=-1, keepdims=True)
    dx_ref[...] = (dyf + rstd * (dxh - m1 - xhat * m2)).astype(
        dx_ref.dtype).reshape(mb, N, C)


def _bwd_kernel(x_ref, dy_ref, u_ref, dp_ref, ls_ref, lb_ref, w1_ref,
                w2_ref, dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                dls_ref, dlb_ref, *, eps):
    cdt = w1_ref.dtype

    def dot_da(dyb):
        return jax.lax.dot_general(
            dyb.astype(cdt), w2_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def dot_dh(du):
        return jax.lax.dot_general(
            du.astype(cdt), w1_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    _bwd_impl(x_ref, dy_ref, u_ref, dp_ref, ls_ref, lb_ref,
              dot_da, dot_dh, cdt,
              dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
              dls_ref, dlb_ref, eps=eps)


def _bwd_kernel_q8dx(x_ref, dy_ref, u_ref, dp_ref, ls_ref, lb_ref,
                     w1t_ref, s1t_ref, w2t_ref, s2t_ref,
                     dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                     dls_ref, dlb_ref, *, eps):
    """SwitchBack-style backward: the two grad-to-INPUT dots (da, dh)
    run on the int8 MXU against TRANSPOSED per-(input-)channel-
    quantized weights; the weight-gradient dots (dw1, dw2) stay bf16 —
    gradient noise on dW is what int8 training ablations show matters
    most, so those keep full precision."""
    _bwd_impl(x_ref, dy_ref, u_ref, dp_ref, ls_ref, lb_ref,
              lambda dyb: _q8_dot(dyb, w2t_ref, s2t_ref),
              lambda du: _q8_dot(du, w1t_ref, s1t_ref),
              x_ref.dtype,
              dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
              dls_ref, dlb_ref, eps=eps)


def _pick_mb(B):
    """Samples per grid step (M = mb*N rows per dot). Measured on the
    v5e: batching samples to amortize MXU pipeline fill LOSES —
    end-to-end frame-step throughput was 329.7 clips/s at mb=1,
    slower at mb=2, and 313.9 at mb=4 (the bigger VMEM blocks for
    x/dy/u plus the f32 grad accumulators crowd out double-buffering).
    When retuning for another chip, pick a DIVISOR of the batch (the
    grid is B // mb; a non-divisor would silently drop the trailing
    B % mb samples)."""
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_mlp_block(x, dp, ls, lb, w1, b1, w2, b2, eps=1e-6,
                    interpret=False, quant=None):
    """y = x + dp * fc2(gelu(fc1(LN(x)))) with trainable params.

    x: [B, N, C] (bf16 in production; N a sublane multiple), dp: [B]
    per-sample stochastic-depth keep multiplier (0 or 1/keep; ones for
    no drop — treated as non-differentiable), ls/lb: LN scale/bias
    [C], w1/b1/w2/b2: Dense params. Gradients flow to everything
    except dp.

    quant="int8" runs the fc1/fc2 FORWARD dots on the int8 MXU path
    (per-channel weight + per-row activation scales, re-quantized from
    the masters every call — student weights change every step). The
    backward stays the bf16 kernel, differentiating through the
    DEQUANTIZED weights with the saved quantized-path pre-activation —
    i.e. exact gradients of the forward actually computed, modulo the
    straight-through treatment of activation quantization (standard
    QAT). Opt-in numerics change; see docs/PROFILE.md."""
    y, _ = _fwd(x, dp, ls, lb, w1, b1, w2, b2, eps, interpret, quant)
    return y


def _fwd(x, dp, ls, lb, w1, b1, w2, b2, eps, interpret, quant=None):
    if quant not in (None, "int8", "int8dx"):
        raise ValueError(f"unknown quant mode {quant!r} "
                         "(supported: None, 'int8', 'int8dx')")
    B, N, C = x.shape
    Hd = w1.shape[1]
    cdt = x.dtype
    mb = _pick_mb(B)
    if quant in ("int8", "int8dx"):  # int8dx: same forward as int8
        w1q, s1 = quantize_weight_q8(w1)
        w2q, s2 = quantize_weight_q8(w2)
        # the backward differentiates the dequantized-weight function
        w1_sv = (w1q.astype(jnp.float32) * s1).astype(cdt)
        w2_sv = (w2q.astype(jnp.float32) * s2).astype(cdt)
        kernel = functools.partial(_fwd_kernel_q8, eps=eps)
        w_ops = [w1q, s1, _row(b1.astype(jnp.float32)),
                 w2q, s2, _row(b2.astype(jnp.float32))]
        w_specs = [
            pl.BlockSpec((C, Hd), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hd), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hd), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Hd, C), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
        ]
    else:
        w1_sv, w2_sv = w1, w2
        kernel = functools.partial(_fwd_kernel, eps=eps)
        w_ops = [w1.astype(cdt), _row(b1.astype(jnp.float32)),
                 w2.astype(cdt), _row(b2.astype(jnp.float32))]
        w_specs = [
            pl.BlockSpec((C, Hd), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hd), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Hd, C), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
        ]
    y, u = pl.pallas_call(
        kernel,
        grid=(B // mb,),
        in_specs=[
            pl.BlockSpec((mb, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mb, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=(
            pl.BlockSpec((mb, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mb, N, Hd), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, C), x.dtype),
            jax.ShapeDtypeStruct((B, N, Hd), cdt),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * C * Hd,
            bytes_accessed=(2 * B * N * C + B * N * Hd + 2 * C * Hd)
            * jnp.dtype(cdt).itemsize,
            transcendentals=B * N * Hd,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, dp.astype(jnp.float32)[:, None, None],
      _row(ls.astype(jnp.float32)), _row(lb.astype(jnp.float32)),
      *w_ops)
    return y, (x, dp, ls, lb, w1_sv, w2_sv, u)


def _bwd(eps, interpret, quant, res, dy):
    x, dp, ls, lb, w1, w2, u = res
    B, N, C = x.shape
    Hd = w1.shape[1]
    cdt = x.dtype
    mb = _pick_mb(B)
    if quant == "int8dx":
        # transposed per-(input-)channel quantization: the grad-to-
        # input contractions need scales constant over THEIR reduce dim
        w1t_q, s1t = quantize_weight_q8(w1.T)  # [Hd, C], [1, C]
        w2t_q, s2t = quantize_weight_q8(w2.T)  # [C, Hd], [1, Hd]
        kernel = functools.partial(_bwd_kernel_q8dx, eps=eps)
        w_ops = [w1t_q, s1t, w2t_q, s2t]
        w_specs = [
            pl.BlockSpec((Hd, C), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Hd), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hd), _const(0, 0), memory_space=pltpu.VMEM),
        ]
    else:
        kernel = functools.partial(_bwd_kernel, eps=eps)
        w_ops = [w1.astype(cdt), w2.astype(cdt)]
        w_specs = [
            pl.BlockSpec((C, Hd), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Hd, C), _const(0, 0), memory_space=pltpu.VMEM),
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(B // mb,),
        in_specs=[
            pl.BlockSpec((mb, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mb, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mb, N, Hd), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mb, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=(
            pl.BlockSpec((mb, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Hd), _const(0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hd), _const(0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hd, C), _const(0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, C), x.dtype),
            jax.ShapeDtypeStruct((C, Hd), jnp.float32),
            jax.ShapeDtypeStruct((1, Hd), jnp.float32),
            jax.ShapeDtypeStruct((Hd, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * N * C * Hd,
            bytes_accessed=(3 * B * N * C + B * N * Hd + 2 * C * Hd)
            * jnp.dtype(cdt).itemsize + 8 * C * Hd,
            transcendentals=B * N * Hd,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=108 * 1024 * 1024),
        interpret=interpret,
    )(x, dy.astype(x.dtype), u,
      dp.astype(jnp.float32)[:, None, None],
      _row(ls.astype(jnp.float32)), _row(lb.astype(jnp.float32)),
      *w_ops)
    dx, dw1, db1, dw2, db2, dls, dlb = outs
    return (dx, jnp.zeros_like(dp),
            dls[0].astype(ls.dtype), dlb[0].astype(lb.dtype),
            dw1.astype(w1.dtype), db1[0],
            dw2.astype(w2.dtype), db2[0])


fused_mlp_block.defvjp(_fwd, _bwd)
