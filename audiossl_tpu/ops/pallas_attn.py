"""Trainable fused attention residual sub-block (LN -> qkv -> MHA ->
proj -> stochastic-depth residual) with in-kernel weight-gradient
accumulation.

Completes the per-layer fusion story: with ops/pallas_mlp.py covering
the MLP half, the student encoder's training pass becomes exactly two
Pallas kernel pairs per block, and the ONLY activation crossing a
kernel boundary is the [B, N, C] residual stream. What this absorbs
from the XLA step graph (r4 profile, docs/PROFILE.md):

* the qkv/proj weight-grad dots (the largest slice of the 49 ms "XLA
  fusions" bucket) — accumulated in f32 VMEM blocks across the batch
  grid like fused_mlp_block's dW1/dW2;
* norm1's forward and its two-pass XLA backward (part of the 13.2 ms
  LN/BN bucket) — recomputed f32 statistics, single pass;
* the layout seams around the standalone fused-MHA custom call (the
  qkv Dense -> kernel -> proj Dense boundaries disappear entirely).

Attention math matches ops/pallas_mha.py exactly — exp-only softmax
(denominator from a validity column on the MXU), masking by zeroed
k/v, two-phase backward with the saved per-(query, head) reciprocal
denominators, delta via a tiny MXU dot, exact-softmax zero grads for
invalid keys. Forward saves qkv (bf16), per-head normalized outputs
``o`` (bf16) and denominators ``r`` (f32) — the same residuals the
split path materializes anyway as the Dense outputs.

Semantics match ``transformer.Block``'s norm1+Attention residual half
(pre-LN, f32 stats, additive -10000 key mask expressed as 0/1
validity, per-sample stochastic-depth multiplier on the branch).
Reference provenance: /root/reference/audiossl/modules/transformer.py:95-150.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiossl_tpu.ops.pallas_block import (
    _const,
    _ln,
    _q8_dot,
    _row,
    quantize_weight_q8,
)


def _fwd_body(x_ref, vk_ref, vv_ref, dp_ref, ls_ref, lb_ref,
              dot_qkv, dot_proj, bproj_row,
              y_ref, qkv_ref, r_ref, o_ref, *, H, scale, eps, cdt):
    """Shared forward body; ``dot_qkv``/``dot_proj`` close over the
    weight refs (bf16 MXU or int8-quantized MXU path) and take/return
    f32 rows with the bias folded in."""
    N, C = x_ref.shape[1], x_ref.shape[2]
    d = C // H
    xf = x_ref[0].astype(jnp.float32)
    vk = vk_ref[0, 0].astype(jnp.float32)[:, None]  # [N, 1] key mask
    vv = vv_ref[0, 0].astype(jnp.float32)[:, None]
    h = _ln(xf, ls_ref[0], lb_ref[0], eps)
    qkv = dot_qkv(h).astype(cdt)
    qkv_ref[0] = qkv
    for g in range(H):
        q = qkv[:, g * d:(g + 1) * d]
        k = qkv[:, C + g * d:C + (g + 1) * d]
        v = qkv[:, 2 * C + g * d:2 * C + (g + 1) * d]
        kz = (k.astype(jnp.float32) * vk).astype(k.dtype)
        # validity column: one dot yields exp(s) @ v AND the softmax
        # denominator, with invalid keys excluded (see pallas_mha)
        vvg = jnp.concatenate(
            [v.astype(jnp.float32) * vv, vv], axis=1).astype(v.dtype)
        s = jax.lax.dot_general(
            q, kz, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        e = jnp.exp(s).astype(cdt)  # the only [N, N] VPU chain
        o2 = jnp.dot(e, vvg, preferred_element_type=jnp.float32)
        r = 1.0 / (o2[:, -1:] + 1e-30)
        o_ref[0, :, g * d:(g + 1) * d] = (o2[:, :-1] * r).astype(cdt)
        r_ref[0, :, g:g + 1] = r
    y = dot_proj(o_ref[0].astype(jnp.float32)) + bproj_row
    y_ref[0] = (xf + y * dp_ref[0, 0, 0]).astype(y_ref.dtype)


def _fwd_kernel(x_ref, vk_ref, vv_ref, dp_ref, ls_ref, lb_ref,
                wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                y_ref, qkv_ref, r_ref, o_ref, *, H, scale, eps):
    cdt = wqkv_ref.dtype

    def dot_qkv(h):
        return jax.lax.dot_general(
            h.astype(cdt), wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bqkv_ref[0]

    def dot_proj(o):
        return jax.lax.dot_general(
            o.astype(cdt), wproj_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    _fwd_body(x_ref, vk_ref, vv_ref, dp_ref, ls_ref, lb_ref,
              dot_qkv, dot_proj, bproj_ref[0],
              y_ref, qkv_ref, r_ref, o_ref, H=H, scale=scale, eps=eps,
              cdt=cdt)


def _fwd_kernel_q8(x_ref, vk_ref, vv_ref, dp_ref, ls_ref, lb_ref,
                   wqkv_ref, sqkv_ref, bqkv_ref, wproj_ref, sproj_ref,
                   bproj_ref, y_ref, qkv_ref, r_ref, o_ref, *, H,
                   scale, eps):
    """int8-MXU qkv/proj projections (per-channel weight x per-row
    activation scales); the attention dots stay bf16. The saved
    qkv/r/o residuals are the TRUE quantized-path values, so the
    backward differentiates what the forward computed (activation
    quantization straight-through, dequantized weights in _bwd)."""
    _fwd_body(x_ref, vk_ref, vv_ref, dp_ref, ls_ref, lb_ref,
              lambda h: _q8_dot(h, wqkv_ref, sqkv_ref) + bqkv_ref[0],
              lambda o: _q8_dot(o, wproj_ref, sproj_ref),
              bproj_ref[0],
              y_ref, qkv_ref, r_ref, o_ref, H=H, scale=scale, eps=eps,
              cdt=qkv_ref.dtype)


def _bwd_impl(x_ref, dy_ref, qkv_ref, r_ref, o_ref, vk_ref, dp_ref,
              ls_ref, lb_ref, dot_do, dot_dh, cdt,
              dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
              dls_ref, dlb_ref, e_scr, dqkv_scr, *, H, scale, eps):
    """Shared backward body; ``dot_do``/``dot_dh`` close over the
    projection-weight refs (bf16 or int8-transposed SwitchBack path)
    and map f32 cotangent rows to f32 rows."""
    b = pl.program_id(0)
    N, C = x_ref.shape[1], x_ref.shape[2]
    d = C // H

    @pl.when(b == 0)
    def _():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwproj_ref[...] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[...] = jnp.zeros_like(dbproj_ref)
        dls_ref[...] = jnp.zeros_like(dls_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)

    ls = ls_ref[0]
    xf = x_ref[0].astype(jnp.float32)
    vk = vk_ref[0, 0].astype(jnp.float32)[:, None]
    mu = xf.mean(axis=-1, keepdims=True)
    xc = xf - mu
    var = (xc * xc).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    h = (xhat * ls + lb_ref[0]).astype(cdt)

    dyf = dy_ref[0].astype(jnp.float32)
    dyb = (dyf * dp_ref[0, 0, 0]).astype(cdt)
    # proj weight/bias grads + grad into the attention output
    dwproj_ref[...] += jax.lax.dot_general(
        o_ref[0], dyb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbproj_ref[...] += jnp.sum(dyb.astype(jnp.float32), axis=0,
                               keepdims=True)
    do = dot_do(dyf * dp_ref[0, 0, 0])  # [N, C]

    qkv = qkv_ref[0]
    # phase 1: all exp(s) blocks into scratch so phase 2's gradient
    # dots are independent per head (see pallas_mha two-phase note)
    for g in range(H):
        q = qkv[:, g * d:(g + 1) * d]
        k = qkv[:, C + g * d:C + (g + 1) * d]
        kz = (k.astype(jnp.float32) * vk).astype(k.dtype)
        s = jax.lax.dot_general(
            q, kz, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        e_scr[g] = jnp.exp(s).astype(cdt)
    ones_col = jnp.ones((d, 1), cdt)
    for g in range(H):
        q = qkv[:, g * d:(g + 1) * d]
        k = qkv[:, C + g * d:C + (g + 1) * d]
        v = qkv[:, 2 * C + g * d:2 * C + (g + 1) * d]
        kz = (k.astype(jnp.float32) * vk).astype(k.dtype)
        vzf = v.astype(jnp.float32) * vk
        rcol = r_ref[0, :, g:g + 1]
        og = o_ref[0, :, g * d:(g + 1) * d].astype(jnp.float32)
        dog = do[:, g * d:(g + 1) * d]
        e = e_scr[g]
        # delta[q] = sum_c do[q, c] o[q, c] via a tiny MXU dot
        delta = jax.lax.dot_general(
            (dog * og).astype(cdt), ones_col, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dor = (dog * rcol).astype(cdt)
        dor_aug = jnp.concatenate(
            [dor, (-delta * rcol).astype(cdt)], axis=1)
        vz_aug = jnp.concatenate(
            [vzf, jnp.ones_like(vk)], axis=1).astype(cdt)
        dpd = jax.lax.dot_general(
            dor_aug, vz_aug, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # dp - delta [N, N]
        t = (e.astype(jnp.float32) * dpd).astype(cdt)
        dq = jax.lax.dot_general(
            t, kz, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            t, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dv = jax.lax.dot_general(
            e, dor, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dqkv_scr[:, g * d:(g + 1) * d] = dq.astype(cdt)
        # exact-softmax gradient: invalid keys receive zero grad
        dqkv_scr[:, C + g * d:C + (g + 1) * d] = (dk * vk).astype(cdt)
        dqkv_scr[:, 2 * C + g * d:2 * C + (g + 1) * d] = (
            dv * vk).astype(cdt)

    dqkv = dqkv_scr[...]
    dwqkv_ref[...] += jax.lax.dot_general(
        h, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [C, 3C]
    dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0,
                              keepdims=True)
    dh = dot_dh(dqkv)  # [N, C]
    dls_ref[...] += jnp.sum(dh * xhat, axis=0, keepdims=True)
    dlb_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dxh = dh * ls
    m1 = dxh.mean(axis=-1, keepdims=True)
    m2 = (dxh * xhat).mean(axis=-1, keepdims=True)
    dx_ref[0] = (dyf + rstd * (dxh - m1 - xhat * m2)).astype(
        dx_ref.dtype)


def _bwd_kernel(x_ref, dy_ref, qkv_ref, r_ref, o_ref, vk_ref, dp_ref,
                ls_ref, lb_ref, wqkv_ref, wproj_ref,
                dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
                dls_ref, dlb_ref, e_scr, dqkv_scr, *, H, scale, eps):
    cdt = wqkv_ref.dtype

    def dot_do(dyb):
        return jax.lax.dot_general(
            dyb.astype(cdt), wproj_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def dot_dh(dqkv):
        return jax.lax.dot_general(
            dqkv.astype(cdt), wqkv_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    _bwd_impl(x_ref, dy_ref, qkv_ref, r_ref, o_ref, vk_ref, dp_ref,
              ls_ref, lb_ref, dot_do, dot_dh, cdt,
              dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
              dls_ref, dlb_ref, e_scr, dqkv_scr, H=H, scale=scale,
              eps=eps)


def _bwd_kernel_q8dx(x_ref, dy_ref, qkv_ref, r_ref, o_ref, vk_ref,
                     dp_ref, ls_ref, lb_ref, wqkvt_ref, sqkvt_ref,
                     wprojt_ref, sprojt_ref,
                     dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref,
                     dbproj_ref, dls_ref, dlb_ref, e_scr, dqkv_scr, *,
                     H, scale, eps):
    """SwitchBack-style backward: the grad-to-input dots (do, dh) run
    on the int8 MXU against TRANSPOSED per-(input-)channel-quantized
    weights; weight-gradient dots stay bf16 (see pallas_mlp
    _bwd_kernel_q8dx)."""
    _bwd_impl(x_ref, dy_ref, qkv_ref, r_ref, o_ref, vk_ref, dp_ref,
              ls_ref, lb_ref,
              lambda dyb: _q8_dot(dyb, wprojt_ref, sprojt_ref),
              lambda dqkv: _q8_dot(dqkv.astype(jnp.float32),
                                   wqkvt_ref, sqkvt_ref),
              x_ref.dtype,
              dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
              dls_ref, dlb_ref, e_scr, dqkv_scr, H=H, scale=scale,
              eps=eps)


def _valid_v(validf):
    """Value/denominator validity row: a sequence with ZERO valid keys
    attends uniformly over all keys (chunked-inference quirk — see
    pallas_block._attn_core)."""
    return jnp.where(
        jnp.sum(validf, axis=1, keepdims=True) > 0.5,
        validf, jnp.ones_like(validf))


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def fused_attn_block(x, valid, dp, ls, lb, wqkv, bqkv, wproj, bproj,
                     num_heads, eps=1e-6, interpret=False, quant=None):
    """y = x + dp * proj(MHA(qkv(LN(x)))) with trainable params.

    x: [B, N, C] (bf16 in production; N a 128-multiple), valid: [B, N]
    0/1 key-validity mask (non-differentiable), dp: [B] per-sample
    stochastic-depth keep multiplier (non-differentiable), ls/lb: LN
    scale/bias [C], wqkv/bqkv: [C, 3C]/[3C] packed projection
    (head-major within each C block), wproj/bproj: [C, C]/[C].
    Gradients flow to everything except valid/dp.

    quant="int8" runs the qkv/proj FORWARD projections on the int8 MXU
    path (the attention dots stay bf16); the backward differentiates
    the dequantized-weight function on the saved quantized-path
    residuals — standard QAT straight-through for the activation
    scales (see fused_mlp_block)."""
    y, _ = _fwd(x, valid, dp, ls, lb, wqkv, bqkv, wproj, bproj,
                num_heads, eps, interpret, quant)
    return y


def _fwd(x, valid, dp, ls, lb, wqkv, bqkv, wproj, bproj, num_heads,
         eps, interpret, quant=None):
    if quant not in (None, "int8", "int8dx"):
        raise ValueError(f"unknown quant mode {quant!r} "
                         "(supported: None, 'int8', 'int8dx')")
    B, N, C = x.shape
    d = C // num_heads
    cdt = x.dtype
    validf = valid.astype(jnp.float32)
    vv = _valid_v(validf)
    if quant in ("int8", "int8dx"):  # int8dx: same forward as int8
        wqkv_q, sqkv = quantize_weight_q8(wqkv)
        wproj_q, sproj = quantize_weight_q8(wproj)
        wqkv_sv = (wqkv_q.astype(jnp.float32) * sqkv).astype(cdt)
        wproj_sv = (wproj_q.astype(jnp.float32) * sproj).astype(cdt)
        kernel = functools.partial(_fwd_kernel_q8, H=num_heads,
                                   scale=d ** -0.5, eps=eps)
        w_ops = [wqkv_q, sqkv, _row(bqkv.astype(jnp.float32)),
                 wproj_q, sproj, _row(bproj.astype(jnp.float32))]
        w_specs = [
            pl.BlockSpec((C, 3 * C), _const(0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), _const(0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), _const(0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
        ]
    else:
        wqkv_sv, wproj_sv = wqkv, wproj
        kernel = functools.partial(_fwd_kernel, H=num_heads,
                                   scale=d ** -0.5, eps=eps)
        w_ops = [wqkv.astype(cdt), _row(bqkv.astype(jnp.float32)),
                 wproj.astype(cdt), _row(bproj.astype(jnp.float32))]
        w_specs = [
            pl.BlockSpec((C, 3 * C), _const(0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), _const(0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
        ]
    y, qkv, r, o = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=(
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 3 * C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, num_heads), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, C), x.dtype),
            jax.ShapeDtypeStruct((B, N, 3 * C), cdt),
            jax.ShapeDtypeStruct((B, N, num_heads), jnp.float32),
            jax.ShapeDtypeStruct((B, N, C), cdt),
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * N * (8 * C * C + 4 * num_heads * N * d),
            bytes_accessed=(2 * B * N * C + B * N * 3 * C + B * N * C
                            + 4 * C * C) * jnp.dtype(cdt).itemsize,
            transcendentals=B * num_heads * N * N,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, validf[:, None, :], vv[:, None, :],
      dp.astype(jnp.float32)[:, None, None],
      _row(ls.astype(jnp.float32)), _row(lb.astype(jnp.float32)),
      *w_ops)
    return y, (x, validf, dp, ls, lb, wqkv_sv, wproj_sv, qkv, r, o)


def _bwd(num_heads, eps, interpret, quant, res, dy):
    x, validf, dp, ls, lb, wqkv, wproj, qkv, r, o = res
    B, N, C = x.shape
    d = C // num_heads
    cdt = x.dtype
    if quant == "int8dx":
        # transposed per-(input-)channel quantization for the grad-to-
        # input contractions (see pallas_mlp._bwd)
        wqkvt_q, sqkvt = quantize_weight_q8(wqkv.T)  # [3C, C], [1, C]
        wprojt_q, sprojt = quantize_weight_q8(wproj.T)
        kernel = functools.partial(_bwd_kernel_q8dx, H=num_heads,
                                   scale=d ** -0.5, eps=eps)
        w_ops = [wqkvt_q, sqkvt, wprojt_q, sprojt]
        w_specs = [
            pl.BlockSpec((3 * C, C), _const(0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
        ]
    else:
        kernel = functools.partial(_bwd_kernel, H=num_heads,
                                   scale=d ** -0.5, eps=eps)
        w_ops = [wqkv.astype(cdt), wproj.astype(cdt)]
        w_specs = [
            pl.BlockSpec((C, 3 * C), _const(0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), _const(0, 0), memory_space=pltpu.VMEM),
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 3 * C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, num_heads), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=(
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), _const(0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), _const(0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), _const(0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, C), x.dtype),
            jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((num_heads, N, N), cdt),
            pltpu.VMEM((N, 3 * C), cdt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=B * N * (16 * C * C + 11 * num_heads * N * d),
            bytes_accessed=(5 * B * N * C + 2 * B * N * 3 * C
                            + 4 * C * C) * jnp.dtype(cdt).itemsize
            + 16 * C * C,
            transcendentals=B * num_heads * N * N,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, dy.astype(cdt), qkv, r, o, validf[:, None, :],
      dp.astype(jnp.float32)[:, None, None],
      _row(ls.astype(jnp.float32)), _row(lb.astype(jnp.float32)),
      *w_ops)
    dx, dwqkv, dbqkv, dwproj, dbproj, dls, dlb = outs
    return (dx, jnp.zeros_like(validf), jnp.zeros_like(dp),
            dls[0].astype(ls.dtype), dlb[0].astype(lb.dtype),
            dwqkv.astype(wqkv.dtype), dbqkv[0],
            dwproj.astype(wproj.dtype), dbproj[0])


fused_attn_block.defvjp(_fwd, _bwd)
