"""Fused whole-block transformer kernels for inference forwards.

Every no-grad encoder pass — the EMA teacher in pretraining (half of
each step's forward FLOPs), embedding extraction, frozen-probe feature
dumps, SED frozen teachers — runs the same 12-block stack. Under XLA
these forwards execute as ~5 fusions per block whose epilogues (LN
stats, GELU) leave the MXU at ~50% utilization and whose activations
round-trip HBM between fusions. These kernels run one whole residual
sub-block per pallas_call with the weights RESIDENT in VMEM (constant
index maps — fetched once, reused by every grid cell):

* :func:`attn_block_infer` — LN1 -> qkv Dense -> per-head exp-only
  softmax attention (the ops/pallas_mha.py scheme: denominator via a
  validity column on the MXU, masking by zeroed k/v) -> out-projection
  -> residual add.  Weights ~4.7 MB (bf16 ViT-base).
* :func:`mlp_block_infer` — LN2 -> fc1 -> exact GELU -> fc2 ->
  residual add.  Weights ~9.4 MB.

Both keep all activations for a batch row in VMEM ([N, 4C] peak), so
per-block HBM traffic drops from ~5 activation round-trips to exactly
one read + one write of [N, C].

:func:`encoder_blocks_infer` strings the kernels over a flax
``AudioTransformer`` param tree (models/atst.py run_blocks semantics
with deterministic=True). Inference only — no custom_vjp; gradient
paths keep the per-op route (ops/pallas_mha.py provides the trainable
fused attention).

Semantics mirror models/transformer.Block (pre-LN, exact-GELU MLP,
additive key masking); numerics differ from the XLA path only by f32
LN/softmax statistics and dot-accumulation rounding.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rcp(x, hi=False):
    """Reciprocal via the VPU's approximate-reciprocal (~2^-8 rel err)
    plus Newton steps: ~4 cheap VPU ops where a true divide on a full
    [M, 4C] block costs several times a multiply per element. One
    Newton step squares the error to ~1.5e-5 — fine when the result
    feeds a bf16 cast; ``hi=True`` (f32 COMPUTE paths, i.e. f32
    weights — the erf input itself is always an f32 accumulator, so
    the caller must gate on the weight dtype, not on x.dtype) adds a
    second step, squaring the error to ~2e-10, below f32 round-off."""
    t = pl.reciprocal(x, approx=True)
    t = t * (2.0 - x * t)
    if hi:
        t = t * (2.0 - x * t)
    return t


def _erf(x, hi=False):
    """Abramowitz & Stegun 7.1.26 (|err| ~1.5e-7 of the polynomial
    itself; the NR-refined reciprocal adds ~2e-5 unless ``hi`` — pass
    ``hi=True`` on f32-weight paths so the parity margin vs a true erf
    stays at the polynomial's own ~1.5e-7, see _rcp); Mosaic has no
    erf/erfc primitive."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = _rcp(1.0 + 0.3275911 * a, hi=hi)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _ln(xf, scale, bias, eps):
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _q8_act(h, bound=None):
    """Per-row symmetric int8 quantization of an f32 activation block:
    h [M, K] -> (int8 values, f32 [M, 1] scales). ``bound`` is an
    optional precomputed [M, 1] upper bound on |h| per row — passing
    one skips the abs+max reduce pass over the full block (the caller
    derived it from data it already reduced). Scaling multiplies by
    the reciprocal: a VPU divide on [M, K] costs several times a
    multiply."""
    m = jnp.max(jnp.abs(h), axis=-1, keepdims=True) if bound is None \
        else bound
    m = jnp.maximum(m, 1e-30)
    r = m * (1.0 / 127.0)
    rinv = 127.0 / m
    q = jnp.clip(jnp.round(h * rinv), -127.0, 127.0).astype(jnp.int8)
    return q, r


def _q8_dot(h, wq_ref, ws_ref, bound=None):
    """f32 [M, K] x per-channel-quantized weight -> f32 [M, J] on the
    int8 MXU path (2x bf16 peak on v5e): dynamic per-row activation
    scales x static per-output-channel weight scales."""
    q, r = _q8_act(h, bound)
    acc = jax.lax.dot_general(
        q, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * r * ws_ref[0]


def _attn_core(xf, vrow_k, vrow_v, dot_qkv, dot_proj, dp, lns, lnb,
               cdt, *, H, scale, eps):
    """Shared attention-block body: LN1 -> qkv (via ``dot_qkv``) ->
    exp-only masked softmax attention -> out-projection (``dot_proj``)
    -> stochastic-depth residual. The dot closures take the f32 LN/attn
    output rows and return f32 rows (bias included), so the float and
    int8-quantized kernels share every subtlety of the masking and
    zero-valid-key paths.

    Two validity rows realize the masking with ONE numerator/
    denominator pair per head: ``vrow_k`` zeroes invalid keys (their
    scores exponentiate to 1 but are excluded from the weighted sum),
    ``vrow_v`` gates the value/denominator columns. A sequence with
    ZERO valid keys (the chunked-inference length quirk,
    models/atst.py) gets vrow_v = all-ones from the caller while
    vrow_k stays 0 — scores are all 0, e = 1, so the single pair
    yields exactly mean(v): the additive-mask path's uniform
    attention. (An earlier version carried a second unmasked pair in
    the same dot; that doubled the AV dot's lane tiles — [*, 2d+2]
    pads to two 128-lane tiles where [*, d+1] needs one.)"""
    C = xf.shape[1]
    d = C // H
    vrow_k = vrow_k[:, None]  # [N, 1]
    vrow_v = vrow_v[:, None]
    h = _ln(xf, lns, lnb, eps)
    qkv = dot_qkv(h).astype(cdt)  # [N, 3C]
    outs = []
    for g in range(H):
        q = qkv[:, g * d:(g + 1) * d]
        k = qkv[:, C + g * d:C + (g + 1) * d]
        v = qkv[:, 2 * C + g * d:2 * C + (g + 1) * d]
        kz = (k.astype(jnp.float32) * vrow_k).astype(k.dtype)
        vf = v.astype(jnp.float32)
        vv = jnp.concatenate(
            [vf * vrow_v, vrow_v], axis=1).astype(v.dtype)
        s = jax.lax.dot_general(
            q, kz, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        e = jnp.exp(s).astype(q.dtype)  # exp-only softmax
        o2 = jnp.dot(e, vv, preferred_element_type=jnp.float32)
        den = o2[:, d:d + 1]
        outs.append(o2[:, :d] * (1.0 / (den + 1e-30)))
    o = jnp.concatenate(outs, axis=1).astype(jnp.float32)  # [N, C]
    y = dot_proj(o)
    # stochastic-depth keep multiplier (0 or 1/keep_rate per sample)
    return xf + y * dp


def _attn_kernel(x_ref, v_ref, v2_ref, dp_ref, lns_ref, lnb_ref,
                 wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, o_ref, *,
                 H, scale, eps, rows=1):
    cdt = wqkv_ref.dtype  # compute dtype follows the weights

    def dot_qkv(h):
        return jax.lax.dot_general(
            h.astype(cdt), wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bqkv_ref[0]

    def dot_proj(o):
        return jax.lax.dot_general(
            o.astype(cdt), wproj_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bproj_ref[0]

    for b in range(rows):  # independent per-row chains overlap VPU/MXU
        o_ref[b] = _attn_core(
            x_ref[b].astype(jnp.float32),
            v_ref[b, 0].astype(jnp.float32),
            v2_ref[b, 0].astype(jnp.float32),
            dot_qkv, dot_proj, dp_ref[b, 0, 0], lns_ref[0], lnb_ref[0],
            cdt, H=H, scale=scale, eps=eps).astype(o_ref.dtype)


def _attn_kernel_q8(x_ref, v_ref, v2_ref, dp_ref, lns_ref, lnb_ref,
                    wqkv_ref, sqkv_ref, bqkv_ref, wproj_ref, sproj_ref,
                    bproj_ref, o_ref, *, H, scale, eps, rows=1):
    for b in range(rows):
        o_ref[b] = _attn_core(
            x_ref[b].astype(jnp.float32),
            v_ref[b, 0].astype(jnp.float32),
            v2_ref[b, 0].astype(jnp.float32),
            lambda h: _q8_dot(h, wqkv_ref, sqkv_ref) + bqkv_ref[0],
            lambda o: _q8_dot(o, wproj_ref, sproj_ref) + bproj_ref[0],
            dp_ref[b, 0, 0], lns_ref[0], lnb_ref[0], jnp.bfloat16,
            H=H, scale=scale, eps=eps).astype(o_ref.dtype)


def _mlp_core(xf, dot1, dot2, dp, lns, lnb, *, eps, hi=False):
    h = _ln(xf, lns, lnb, eps)
    a = dot1(h)
    # exact GELU: 0.5 x (1 + erf(x/sqrt(2)))
    a = 0.5 * a * (1.0 + _erf(a * 0.7071067811865476, hi=hi))
    return xf + dot2(a) * dp


def _mlp_kernel(x_ref, dp_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, o_ref, *, eps, rows=1):
    cdt = w1_ref.dtype

    def dot1(h):
        return jax.lax.dot_general(
            h.astype(cdt), w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b1_ref[0]

    def dot2(a):
        return jax.lax.dot_general(
            a.astype(cdt), w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b2_ref[0]

    for b in range(rows):  # the [N, 4C] gelu VPU chain of row b can
        # overlap row b+1's MXU dots when rows > 1
        o_ref[b] = _mlp_core(
            x_ref[b].astype(jnp.float32), dot1, dot2, dp_ref[b, 0, 0],
            lns_ref[0], lnb_ref[0], eps=eps,
            hi=cdt == jnp.float32).astype(o_ref.dtype)


def _mlp_kernel_q8(x_ref, dp_ref, lns_ref, lnb_ref, w1_ref, s1_ref,
                   b1_ref, w2_ref, s2_ref, b2_ref, o_ref, *, eps,
                   rows=1):
    for b in range(rows):
        xf = x_ref[b].astype(jnp.float32)
        h = _ln(xf, lns_ref[0], lnb_ref[0], eps)
        u = _q8_dot(h, w1_ref, s1_ref) + b1_ref[0]
        a = 0.5 * u * (1.0 + _erf(u * 0.7071067811865476))
        # |gelu(u)| <= max(gelu(rowmax(u)), 0.17): gelu is monotone
        # above its minimum (~-0.17 at u~-0.75), so ONE reduce over
        # the pre-activation bounds the activation rows — _q8_act then
        # skips its own abs+max pass over the [N, 4C] block.
        umax = jnp.max(u, axis=-1, keepdims=True)
        gmax = 0.5 * umax * (1.0 + _erf(umax * 0.7071067811865476))
        bound = jnp.maximum(gmax, 0.17)
        y = _q8_dot(a, w2_ref, s2_ref, bound=bound) + b2_ref[0]
        o_ref[b] = (xf + y * dp_ref[b, 0, 0]).astype(o_ref.dtype)


def _row(x):
    return jnp.asarray(x)[None, :]


def _const(*idx):
    """BlockSpec index map pinning a whole operand to one grid step."""
    return lambda b: idx


def quantize_weight_q8(w):
    """Per-output-channel symmetric int8 weight quantization (XLA
    level, once per step — the EMA teacher's weights change every
    step): w [K, J] -> (int8 [K, J], f32 [1, J] scales)."""
    wf = jnp.asarray(w, jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=0, keepdims=True) * (1.0 / 127.0)
    s = jnp.maximum(s, 1e-30)
    q = jnp.clip(jnp.round(wf / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def _wspec(shape, const):
    return pl.BlockSpec(shape, const(*((0,) * len(shape))),
                        memory_space=pltpu.VMEM)


def _block_rows(B: int) -> int:
    """Batch rows per grid step for the whole-block inference kernels
    (A/B via AUDIOSSL_BLOCK_ROWS; default 2 — measured +0.7% over 1 on
    the r4 chip A/B, 354.72 vs 352.33 clips/s at B=96: two batch rows
    per grid step halve the per-step weight-block DMA re-fetch).
    Must divide B (falls back to 1 when it does not)."""
    import os

    try:
        r = max(1, int(os.environ.get("AUDIOSSL_BLOCK_ROWS", "2")))
    except ValueError:
        r = 1
    return r if B % r == 0 else 1


def attn_block_infer(x, valid, p, num_heads, eps=1e-6, dp=None,
                     quant=None, interpret=False):
    """x: [B, N, C] (N a 128-multiple), valid: [B, N] 0/1 key mask,
    p: Block param subtree {norm1, attn:{qkv, proj}}; dp: optional
    per-sample stochastic-depth keep multiplier [B] (0 or 1/keep);
    quant="int8" runs the qkv/proj weight matmuls on the int8 MXU path
    (per-channel weight + per-row activation scales — an opt-in
    numerics change, see encoder_blocks_infer)."""
    if quant not in (None, "int8"):
        raise ValueError(f"unknown quant mode {quant!r} "
                         "(supported: None, 'int8')")
    B, N, C = x.shape
    dp = jnp.ones((B,), jnp.float32) if dp is None else dp
    d = C // num_heads
    cdt = x.dtype  # bf16 production models; f32 kept exact for tests
    bqkv = p["attn"]["qkv"].get("bias")
    bqkv = (jnp.zeros((3 * C,), jnp.float32) if bqkv is None
            else bqkv.astype(jnp.float32))
    bproj = p["attn"]["proj"]["bias"].astype(jnp.float32)
    const = _const
    rows = _block_rows(B)
    if quant == "int8":
        wqkv, sqkv = quantize_weight_q8(p["attn"]["qkv"]["kernel"])
        wproj, sproj = quantize_weight_q8(p["attn"]["proj"]["kernel"])
        kernel = functools.partial(_attn_kernel_q8, H=num_heads,
                                   scale=d ** -0.5, eps=eps, rows=rows)
        w_ops = [wqkv, sqkv, _row(bqkv), wproj, sproj, _row(bproj)]
        w_specs = [_wspec((C, 3 * C), const), _wspec((1, 3 * C), const),
                   _wspec((1, 3 * C), const), _wspec((C, C), const),
                   _wspec((1, C), const), _wspec((1, C), const)]
    else:
        kernel = functools.partial(_attn_kernel, H=num_heads,
                                   scale=d ** -0.5, eps=eps, rows=rows)
        w_ops = [p["attn"]["qkv"]["kernel"].astype(cdt), _row(bqkv),
                 p["attn"]["proj"]["kernel"].astype(cdt), _row(bproj)]
        w_specs = [_wspec((C, 3 * C), const), _wspec((1, 3 * C), const),
                   _wspec((C, C), const), _wspec((1, C), const)]
    validf = valid.astype(jnp.float32)
    # value/denominator validity: a sequence with zero valid keys
    # attends uniformly over ALL keys (see _attn_core) — its vrow_v
    # flips to all-ones while vrow_k stays 0
    valid_v = jnp.where(
        jnp.sum(validf, axis=1, keepdims=True) > 0.5,
        validf, jnp.ones_like(validf))
    return pl.pallas_call(
        kernel,
        grid=(B // rows,),
        in_specs=[
            pl.BlockSpec((rows, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const(0, 0), memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((rows, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * C * (4 * C + 2 * num_heads * N * d // C
                                   * C),
            bytes_accessed=2 * (2 * B * N * C + 4 * C * C),
            transcendentals=B * num_heads * N * N,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x, validf[:, None, :], valid_v[:, None, :],
      dp.astype(jnp.float32)[:, None, None],
      _row(p["norm1"]["scale"].astype(jnp.float32)),
      _row(p["norm1"]["bias"].astype(jnp.float32)),
      *w_ops)


def mlp_block_infer(x, p, eps=1e-6, dp=None, quant=None,
                    interpret=False):
    """x: [B, N, C]; p: Block param subtree {norm2, mlp:{fc1, fc2}};
    dp: optional per-sample stochastic-depth keep multiplier [B];
    quant="int8" as in attn_block_infer."""
    if quant not in (None, "int8"):
        raise ValueError(f"unknown quant mode {quant!r} "
                         "(supported: None, 'int8')")
    B, N, C = x.shape
    dp = jnp.ones((B,), jnp.float32) if dp is None else dp
    cdt = x.dtype
    b1 = p["mlp"]["fc1"]["bias"].astype(jnp.float32)
    b2 = p["mlp"]["fc2"]["bias"].astype(jnp.float32)
    Hd = p["mlp"]["fc1"]["kernel"].shape[1]
    const = _const
    rows = _block_rows(B)
    if quant == "int8":
        w1, s1 = quantize_weight_q8(p["mlp"]["fc1"]["kernel"])
        w2, s2 = quantize_weight_q8(p["mlp"]["fc2"]["kernel"])
        kernel = functools.partial(_mlp_kernel_q8, eps=eps, rows=rows)
        w_ops = [w1, s1, _row(b1), w2, s2, _row(b2)]
        w_specs = [_wspec((C, Hd), const), _wspec((1, Hd), const),
                   _wspec((1, Hd), const), _wspec((Hd, C), const),
                   _wspec((1, C), const), _wspec((1, C), const)]
    else:
        kernel = functools.partial(_mlp_kernel, eps=eps, rows=rows)
        w_ops = [p["mlp"]["fc1"]["kernel"].astype(cdt), _row(b1),
                 p["mlp"]["fc2"]["kernel"].astype(cdt), _row(b2)]
        w_specs = [_wspec((C, Hd), const), _wspec((1, Hd), const),
                   _wspec((Hd, C), const), _wspec((1, C), const)]
    return pl.pallas_call(
        kernel,
        grid=(B // rows,),
        in_specs=[
            pl.BlockSpec((rows, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const(0, 0), memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((rows, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * C * Hd,
            bytes_accessed=2 * (2 * B * N * C + 2 * C * Hd),
            transcendentals=B * N * Hd,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x, dp.astype(jnp.float32)[:, None, None],
      _row(p["norm2"]["scale"].astype(jnp.float32)),
      _row(p["norm2"]["bias"].astype(jnp.float32)),
      *w_ops)


def encoder_blocks_infer(params, x, lengths, num_heads, depth,
                         eps=1e-6, collect_from=None,
                         drop_path_rate=0.0, rng=None, quant=None,
                         interpret=False):
    """Inference pass over all blocks with per-encoder-pass padding
    (models/atst.run_blocks semantics).

    params: AudioTransformer param tree holding ``blocks_i`` subtrees;
    x: [B, N0, C] tokens; lengths: [B] valid token counts or None.
    drop_path_rate > 0 with an rng applies the reference's stochastic
    depth (linearly ramped over depth, independent per sample and
    residual branch — transformer.drop_path) via per-sample keep
    multipliers; the pass stays a no-grad forward either way.
    quant="int8" routes the four weight matmuls of every block through
    the int8 MXU path (2x bf16 peak on v5e): per-output-channel weight
    scales (re-quantized from the f32 masters each call — the EMA
    teacher changes every step) x dynamic per-row activation scales
    computed in-kernel. This CHANGES NUMERICS (~1e-2 relative per
    block output) and is strictly opt-in — the default recipe keeps
    bf16 parity with the reference; see docs/PROFILE.md "roofline
    ceiling".
    Returns (x, collected) like run_blocks."""
    B, N0, C = x.shape
    pad = (-N0) % 128
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    N = x.shape[1]
    if lengths is None:
        lengths = jnp.full((B,), N0, jnp.int32)
    valid = (jnp.arange(N)[None, :] < lengths[:, None]).astype(
        jnp.float32)
    dps = None
    if drop_path_rate > 0.0 and rng is not None:
        rates = jnp.asarray([drop_path_rate * i / max(depth - 1, 1)
                             for i in range(depth)], jnp.float32)
        keep = 1.0 - rates[:, None, None]  # [depth, 1, 1]
        u = jax.random.uniform(rng, (depth, 2, B))
        dps = jnp.floor(keep + u) / keep  # 0 or 1/keep
    collected = []
    for i in range(depth):
        p = params[f"blocks_{i}"]
        x = attn_block_infer(x, valid, p, num_heads, eps=eps,
                             dp=None if dps is None else dps[i, 0],
                             quant=quant, interpret=interpret)
        x = mlp_block_infer(x, p, eps=eps,
                            dp=None if dps is None else dps[i, 1],
                            quant=quant, interpret=interpret)
        if collect_from is not None and i >= collect_from:
            collected.append(x[:, :N0] if pad else x)
    if pad:
        x = x[:, :N0]
    return x, collected
