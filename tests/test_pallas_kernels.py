"""Pallas kernels in interpret mode (CPU CI): fused MHA fwd/bwd vs the
reference einsum math; fused mel postprocess vs the jnp chain."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiossl_tpu.ops.pallas_mel import stft_to_mel_db


def _ref_mha_packed(x, mask, H, scale):
    """Reference einsum attention on the packed [B, N, 3C] layout."""
    B, N, C3 = x.shape
    d = C3 // 3 // H
    qkv = x.reshape(B, N, 3, H, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, d]
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    s = s + mask[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bmhd->bnhd", p, v)
    return o.reshape(B, N, H * d)


def test_fused_mha_fwd_interpret():
    from audiossl_tpu.ops.pallas_mha import fused_mha

    B, H, N, d = 2, 3, 40, 16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, 3 * H * d).astype(np.float32))
    mask = jnp.where(jnp.arange(N)[None, :] < jnp.array([[25], [40]]),
                     0.0, -10000.0)
    want = _ref_mha_packed(x, mask, H, d ** -0.5)
    got = fused_mha(x, mask, H, d ** -0.5, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_fused_mha_grad_interpret():
    from audiossl_tpu.ops.pallas_mha import fused_mha

    B, H, N, d = 2, 2, 24, 8
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, N, 3 * H * d).astype(np.float32))
    mask = jnp.where(jnp.arange(N)[None, :] < jnp.array([[16], [24]]),
                     0.0, -10000.0)
    scale = d ** -0.5

    def loss_ref(x):
        return jnp.sum(jnp.sin(_ref_mha_packed(x, mask, H, scale)))

    def loss_fused(x):
        return jnp.sum(jnp.sin(fused_mha(x, mask, H, scale, True)))

    gr = jax.grad(loss_ref)(x)
    gf = jax.grad(loss_fused)(x)
    # invalid-key dk/dv: the reference leaves exp(-10000)-sized noise,
    # the kernel produces exact zeros; both are < atol
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-4)


def test_fused_mha_zero_length_row_finite():
    """A sample with zero valid keys must yield finite outputs/grads
    (the eps-guarded denominator), not NaN."""
    from audiossl_tpu.ops.pallas_mha import fused_mha

    B, H, N, d = 2, 2, 16, 8
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, N, 3 * H * d).astype(np.float32))
    mask = jnp.stack([jnp.zeros(N), jnp.full(N, -10000.0)])

    def loss(x):
        return jnp.sum(fused_mha(x, mask, H, d ** -0.5, True) ** 2)

    val, grad = jax.value_and_grad(loss)(x)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_pallas_mel_interpret():
    from audiossl_tpu.ops.melspec import MelConfig, mel_filterbank, stft_conv

    cfg = MelConfig()
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(2, 16000).astype(np.float32) * 0.1)
    stft = stft_conv(wav, cfg)
    fb = mel_filterbank(cfg)
    got = stft_to_mel_db(stft, fb, amin=cfg.amin, interpret=True)
    F = cfg.n_freqs
    power = stft[:, :F] ** 2 + stft[:, F:] ** 2  # [B, F, T]
    want = 10.0 * jnp.log10(jnp.maximum(
        jnp.einsum("bft,fm->bmt", power, fb), cfg.amin))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4)


@pytest.mark.slow
def test_encoder_blocks_infer_matches_flax():
    """Whole-block fused inference kernels (interpret mode) vs the flax
    Block stack, with ragged valid lengths."""
    from audiossl_tpu.models.atst import AudioTransformer
    from audiossl_tpu.models.transformer import length_to_attn_mask
    from audiossl_tpu.ops.pallas_block import encoder_blocks_infer

    enc = AudioTransformer(embed_dim=64, depth=2, num_heads=2,
                           spec_h=64, spec_w=40, use_cls=False,
                           drop_path_rate=0.0)
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(2, 64, 40).astype(np.float32))
    lengths = jnp.asarray([40, 24])
    variables = enc.init(jax.random.PRNGKey(0), mel, length=lengths,
                         deterministic=True)
    params = variables["params"]

    # reference path: flax blocks with the additive attention mask
    bound = enc.bind(variables)

    def flax_blocks(x, tok_len):
        mask = length_to_attn_mask(tok_len, x.shape[1])
        for blk in bound.blocks:
            x = blk(x, mask, True)
        return x

    x = jnp.asarray(rng.randn(2, 10, 64).astype(np.float32))
    tok_len = jnp.asarray([10, 6])
    want = flax_blocks(x, tok_len)
    got, collected = encoder_blocks_infer(
        params, x, tok_len, enc.num_heads, enc.depth, eps=enc.eps,
        collect_from=0, interpret=True)
    # compare only valid tokens (invalid rows differ by mask scheme:
    # -10000 additive vs exact-zero probabilities)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got[1, :6]),
                               np.asarray(want[1, :6]), atol=2e-4)
    assert len(collected) == 2
    np.testing.assert_allclose(np.asarray(collected[-1][0]),
                               np.asarray(got[0]), atol=1e-6)


@pytest.mark.slow
def test_encoder_blocks_infer_rows2_matches_rows1(monkeypatch):
    """AUDIOSSL_BLOCK_ROWS=2 (two batch rows per grid step in the
    whole-block inference kernels) is numerically identical to the
    default one-row grid."""
    from audiossl_tpu.models.atst import AudioTransformer
    from audiossl_tpu.ops.pallas_block import encoder_blocks_infer

    enc = AudioTransformer(embed_dim=64, depth=2, num_heads=2,
                           spec_h=64, spec_w=40, use_cls=False,
                           drop_path_rate=0.0)
    rng = np.random.RandomState(2)
    mel = jnp.asarray(rng.randn(2, 64, 40).astype(np.float32))
    lengths = jnp.asarray([40, 24])
    params = enc.init(jax.random.PRNGKey(0), mel, length=lengths,
                      deterministic=True)["params"]
    x = jnp.asarray(rng.randn(4, 10, 64).astype(np.float32))
    tok_len = jnp.asarray([10, 6, 8, 10])
    args = (params, x, tok_len, enc.num_heads, enc.depth)
    monkeypatch.setenv("AUDIOSSL_BLOCK_ROWS", "1")
    want, _ = encoder_blocks_infer(*args, eps=enc.eps, interpret=True)
    monkeypatch.setenv("AUDIOSSL_BLOCK_ROWS", "2")
    got, _ = encoder_blocks_infer(*args, eps=enc.eps, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)
    # rows that don't divide B fall back to 1 instead of failing
    monkeypatch.setenv("AUDIOSSL_BLOCK_ROWS", "3")
    got3, _ = encoder_blocks_infer(*args, eps=enc.eps, interpret=True)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want),
                               atol=1e-6)


def test_fused_mlp_block_fwd_bwd_interpret():
    """Trainable fused MLP sub-block (ops/pallas_mlp.py): value and
    all gradients vs the XLA reference path (f32, interpret mode)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiossl_tpu.models.transformer import gelu_exact
    from audiossl_tpu.ops.pallas_mlp import fused_mlp_block

    B, N, C, H = 4, 32, 128, 256
    eps = 1e-6
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    dp = jnp.asarray([1.0, 0.0, 1.25, 0.8], jnp.float32)  # keep multipliers
    ls = jnp.asarray(1.0 + 0.1 * rng.randn(C).astype(np.float32))
    lb = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))
    w1 = jnp.asarray(rng.randn(C, H).astype(np.float32) * 0.05)
    b1 = jnp.asarray(0.1 * rng.randn(H).astype(np.float32))
    w2 = jnp.asarray(rng.randn(H, C).astype(np.float32) * 0.05)
    b2 = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))
    r = jnp.asarray(rng.randn(B, N, C).astype(np.float32))

    def ref(x, ls, lb, w1, b1, w2, b2):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        h = (x - mu) * jax.lax.rsqrt(var + eps) * ls + lb
        y = gelu_exact(h @ w1 + b1) @ w2 + b2
        return x + y * dp[:, None, None]

    def got(x, ls, lb, w1, b1, w2, b2):
        return fused_mlp_block(x, dp, ls, lb, w1, b1, w2, b2, eps, True)

    want = ref(x, ls, lb, w1, b1, w2, b2)
    out = got(x, ls, lb, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=1e-5)

    loss_ref = lambda *a: jnp.sum(ref(*a) * r)  # noqa: E731
    loss_got = lambda *a: jnp.sum(got(*a) * r)  # noqa: E731
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(
        x, ls, lb, w1, b1, w2, b2)
    g_got = jax.grad(loss_got, argnums=tuple(range(7)))(
        x, ls, lb, w1, b1, w2, b2)
    names = ["dx", "dls", "dlb", "dw1", "db1", "dw2", "db2"]
    for n, a, b in zip(names, g_got, g_ref):
        scale = max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4 * scale, rtol=2e-4,
            err_msg=n)


def test_q8_quantization_math():
    """quantize_weight_q8 round-trip error bound: |w - q*s| <= s/2
    per output channel (symmetric per-channel int8)."""
    from audiossl_tpu.ops.pallas_block import quantize_weight_q8

    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(64, 128).astype(np.float32))
    q, s = quantize_weight_q8(w)
    assert q.dtype == jnp.int8
    deq = q.astype(jnp.float32) * s
    err = np.abs(np.asarray(deq - w))
    assert (err <= np.asarray(s)[0] / 2 + 1e-7).all()
    # channel max maps to +-127 exactly
    amax = np.abs(np.asarray(w)).max(axis=0)
    hit = np.abs(np.asarray(q)).max(axis=0)
    np.testing.assert_array_equal(hit, 127)
    np.testing.assert_allclose(np.asarray(s)[0], amax / 127.0,
                               rtol=1e-6)


@pytest.mark.slow
def test_encoder_blocks_infer_int8_close_to_float():
    """quant="int8" (interpret mode) tracks the float block kernels
    within per-channel-int8 error bounds on realistic-scale inputs;
    masking/zero-valid-key semantics are shared code, so only the dot
    precision differs."""
    from audiossl_tpu.models.atst import AudioTransformer
    from audiossl_tpu.ops.pallas_block import encoder_blocks_infer

    enc = AudioTransformer(embed_dim=64, depth=2, num_heads=2,
                           spec_h=64, spec_w=40, use_cls=False,
                           drop_path_rate=0.0)
    rng = np.random.RandomState(1)
    mel = jnp.asarray(rng.randn(2, 64, 40).astype(np.float32))
    lengths = jnp.asarray([40, 24])
    params = enc.init(jax.random.PRNGKey(0), mel, length=lengths,
                      deterministic=True)["params"]
    x = jnp.asarray(rng.randn(2, 10, 64).astype(np.float32))
    tok_len = jnp.asarray([10, 6])
    want, _ = encoder_blocks_infer(
        params, x, tok_len, enc.num_heads, enc.depth, eps=enc.eps,
        interpret=True)
    got, _ = encoder_blocks_infer(
        params, x, tok_len, enc.num_heads, enc.depth, eps=enc.eps,
        quant="int8", interpret=True)
    w = np.asarray(want[0]); g = np.asarray(got[0])
    rel = np.abs(g - w) / (np.abs(w).mean() + 1e-9)
    assert rel.max() < 0.15 and rel.mean() < 0.02, (rel.max(),
                                                    rel.mean())
    # valid-token rows of the short sequence too
    w1 = np.asarray(want[1, :6]); g1 = np.asarray(got[1, :6])
    rel1 = np.abs(g1 - w1) / (np.abs(w1).mean() + 1e-9)
    assert rel1.mean() < 0.02


def test_layer_norm_pallas_grad_matches_flax():
    """ops/pallas_ln.layer_norm: forward bit-comparable to
    nn.LayerNorm, backward (Pallas interpret mode) matches flax
    autodiff for dx, dscale, dbias — incl. a row count that does not
    divide the kernel's block size."""
    import flax.linen as nn
    from audiossl_tpu.ops.pallas_ln import layer_norm

    rng = np.random.RandomState(0)
    B, N, C = 3, 50, 96  # R=150 rows, ragged vs any 8-multiple block
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32) * 2.0 + 0.3)
    scale = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)

    ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
    var = {"params": {"scale": scale, "bias": bias}}

    def loss_ref(x, s, b):
        y = ln.apply({"params": {"scale": s, "bias": b}}, x)
        return jnp.sum(jnp.sin(y))

    def loss_pl(x, s, b):
        y = layer_norm(x, s, b, 1e-6, jnp.float32, True)
        return jnp.sum(jnp.sin(y))

    y_ref = ln.apply(var, x)
    y_pl = layer_norm(x, scale, bias, 1e-6, jnp.float32, True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                               atol=1e-5)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    gp = jax.grad(loss_pl, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, tol in zip(gp, gr, (2e-5, 2e-4, 2e-4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=tol)


def test_layer_norm_bwd_dead_rows_nan_immune():
    """The LN backward kernel's dscale/dbias reductions must be immune
    to garbage in the padding rows of a partial final block: Pallas
    out-of-bounds block reads are undefined on TPU and were observed to
    decode as NaN at B=96/ViT-base (a `garbage * 0` mask kept the NaN;
    the kernel must select, not multiply). Simulated here by invoking
    the kernel with explicit NaN rows beyond n_rows."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from audiossl_tpu.ops.pallas_ln import _bwd_kernel

    rng = np.random.RandomState(3)
    R_live, bR, C = 12, 16, 32
    x = rng.randn(bR, C).astype(np.float32)
    g = rng.randn(bR, C).astype(np.float32)
    x[R_live:] = np.nan  # the undefined OOB padding
    g[R_live:] = np.inf
    scale = (rng.rand(1, C) + 0.5).astype(np.float32)
    blk = pl.BlockSpec((bR, C), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((1, C), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    dx, ds, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=1e-6, n_rows=R_live),
        grid=(1,),
        in_specs=[blk, blk, acc],
        out_specs=[blk, acc, acc],
        out_shape=[jax.ShapeDtypeStruct((bR, C), jnp.float32),
                   jax.ShapeDtypeStruct((1, C), jnp.float32),
                   jax.ShapeDtypeStruct((1, C), jnp.float32)],
        interpret=True,
    )(jnp.asarray(x), jnp.asarray(g), jnp.asarray(scale))
    assert np.isfinite(np.asarray(ds)).all()
    assert np.isfinite(np.asarray(db)).all()
    assert np.isfinite(np.asarray(dx)[:R_live]).all()
    # live-row values match the pure-math block on the live slice
    from audiossl_tpu.ops.pallas_ln import _bwd_block

    dx_ref, ds_ref, db_ref = _bwd_block(
        jnp.asarray(x[:R_live]), jnp.asarray(g[:R_live]),
        jnp.asarray(scale[0]), 1e-6)
    np.testing.assert_allclose(np.asarray(dx)[:R_live],
                               np.asarray(dx_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ds)[0], np.asarray(ds_ref),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(db)[0], np.asarray(db_ref),
                               atol=1e-4)


def test_layer_norm_pg_module_param_compat():
    """LayerNormPG exposes the same param tree as nn.LayerNorm and
    computes the same values (bf16 output dtype path included)."""
    import flax.linen as nn
    from audiossl_tpu.models.transformer import LayerNormPG

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 7, 32).astype(np.float32))
    m_pg = LayerNormPG(epsilon=1e-6, dtype=jnp.bfloat16)
    m_fl = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)
    p_pg = m_pg.init(jax.random.PRNGKey(0), x)["params"]
    p_fl = m_fl.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(p_pg) == jax.tree.structure(p_fl)
    assert all(a.shape == b.shape for a, b in
               zip(jax.tree.leaves(p_pg), jax.tree.leaves(p_fl)))
    y_pg = m_pg.apply({"params": p_fl}, x)
    y_fl = m_fl.apply({"params": p_fl}, x)
    assert y_pg.dtype == y_fl.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y_pg, np.float32), np.asarray(y_fl, np.float32),
        atol=1e-2)


def test_fused_attn_block_fwd_bwd_interpret():
    """Trainable fused attention sub-block (ops/pallas_attn.py): value
    and all gradients vs the XLA reference path (LN -> qkv -> packed
    MHA -> proj -> droppath residual; f32, interpret mode, ragged
    lengths)."""
    from audiossl_tpu.ops.pallas_attn import fused_attn_block

    B, H, N, d = 3, 2, 24, 8
    C = H * d
    eps = 1e-6
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    lengths = jnp.asarray([16, 24, 9])
    valid = (jnp.arange(N)[None, :] < lengths[:, None]).astype(
        jnp.float32)
    mask = jnp.where(valid > 0, 0.0, -10000.0)
    dp = jnp.asarray([1.0, 0.0, 1.25], jnp.float32)
    ls = jnp.asarray(1.0 + 0.1 * rng.randn(C).astype(np.float32))
    lb = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))
    wqkv = jnp.asarray(rng.randn(C, 3 * C).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(0.1 * rng.randn(3 * C).astype(np.float32))
    wproj = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.1)
    bproj = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))
    r = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    scale = d ** -0.5

    def ref(x, ls, lb, wqkv, bqkv, wproj, bproj):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        h = (x - mu) * jax.lax.rsqrt(var + eps) * ls + lb
        o = _ref_mha_packed(h @ wqkv + bqkv, mask, H, scale)
        y = o @ wproj + bproj
        return x + y * dp[:, None, None]

    def got(x, ls, lb, wqkv, bqkv, wproj, bproj):
        return fused_attn_block(x, valid, dp, ls, lb, wqkv, bqkv,
                                wproj, bproj, H, eps, True)

    want = ref(x, ls, lb, wqkv, bqkv, wproj, bproj)
    out = got(x, ls, lb, wqkv, bqkv, wproj, bproj)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=3e-5, rtol=1e-5)

    loss_ref = lambda *a: jnp.sum(ref(*a) * r)  # noqa: E731
    loss_got = lambda *a: jnp.sum(got(*a) * r)  # noqa: E731
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(
        x, ls, lb, wqkv, bqkv, wproj, bproj)
    g_got = jax.grad(loss_got, argnums=tuple(range(7)))(
        x, ls, lb, wqkv, bqkv, wproj, bproj)
    names = ["dx", "dls", "dlb", "dwqkv", "dbqkv", "dwproj", "dbproj"]
    for n, a, b in zip(names, g_got, g_ref):
        sc = max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4 * sc, rtol=3e-4,
            err_msg=n)


def test_fused_attn_block_zero_length_row_finite():
    """A sample with zero valid keys must yield finite outputs and
    gradients (uniform-attention fallback + eps-guarded denominator)."""
    from audiossl_tpu.ops.pallas_attn import fused_attn_block

    B, H, N, d = 2, 2, 16, 8
    C = H * d
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    valid = jnp.stack([jnp.ones(N), jnp.zeros(N)])
    dp = jnp.ones((B,), jnp.float32)
    ls, lb = jnp.ones((C,)), jnp.zeros((C,))
    wqkv = jnp.asarray(rng.randn(C, 3 * C).astype(np.float32) * 0.1)
    bqkv = jnp.zeros((3 * C,))
    wproj = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.1)
    bproj = jnp.zeros((C,))

    def loss(x, wqkv, wproj):
        return jnp.sum(fused_attn_block(
            x, valid, dp, ls, lb, wqkv, bqkv, wproj, bproj, H,
            1e-6, True) ** 2)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
        x, wqkv, wproj)
    assert np.isfinite(float(val))
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))


import pytest as _pytest


@_pytest.mark.parametrize("mode", ["int8", "int8dx"])
def test_fused_mlp_block_int8_tracks_float(mode):
    """quant="int8" trainable MLP forward (per-channel weight x
    per-row activation scales) tracks the float kernel within int8
    error bounds, and the QAT straight-through backward (dequantized
    weights + TRUE quantized-path pre-activation) stays within ~2% of
    the float gradients on realistic-scale inputs. "int8dx"
    additionally runs the grad-to-input dots (da, dh) on the int8 MXU
    against transposed per-channel-quantized weights (SwitchBack)."""
    from audiossl_tpu.ops.pallas_mlp import fused_mlp_block

    B, N, C, Hd = 2, 16, 32, 128
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32) * 0.5)
    dp = jnp.asarray([1.0, 1.25], jnp.float32)
    ls = jnp.asarray(1.0 + 0.1 * rng.randn(C).astype(np.float32))
    lb = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))
    w1 = jnp.asarray(rng.randn(C, Hd).astype(np.float32) * 0.1)
    b1 = jnp.asarray(0.05 * rng.randn(Hd).astype(np.float32))
    w2 = jnp.asarray(rng.randn(Hd, C).astype(np.float32) * 0.1)
    b2 = jnp.asarray(0.05 * rng.randn(C).astype(np.float32))
    r = jnp.asarray(rng.randn(B, N, C).astype(np.float32))

    def f(quant, *a):
        return fused_mlp_block(x, dp, *a, 1e-6, True, quant)

    y_f = f(None, ls, lb, w1, b1, w2, b2)
    y_q = f(mode, ls, lb, w1, b1, w2, b2)
    rel = float(jnp.linalg.norm(y_q - y_f) / jnp.linalg.norm(y_f))
    assert rel < 0.02, rel

    g_f = jax.grad(lambda *a: jnp.sum(f(None, *a) * r),
                   argnums=tuple(range(6)))(ls, lb, w1, b1, w2, b2)
    g_q = jax.grad(lambda *a: jnp.sum(f(mode, *a) * r),
                   argnums=tuple(range(6)))(ls, lb, w1, b1, w2, b2)
    for name, a, b in zip(["dls", "dlb", "dw1", "db1", "dw2", "db2"],
                          g_q, g_f):
        assert np.all(np.isfinite(np.asarray(a))), name
        gr = float(jnp.linalg.norm(a - b)
                   / (jnp.linalg.norm(b) + 1e-30))
        assert gr < 0.05, (name, gr)


@_pytest.mark.parametrize("mode", ["int8", "int8dx"])
def test_fused_attn_block_int8_tracks_float(mode):
    """quant="int8" trainable attention forward (int8 qkv/proj
    projections, bf16 attention dots) tracks the float kernel;
    straight-through gradients stay close, including the masked
    (ragged-length) rows. "int8dx" adds SwitchBack int8 do/dh dots."""
    from audiossl_tpu.ops.pallas_attn import fused_attn_block

    B, H, N, d = 2, 2, 24, 8
    C = H * d
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32) * 0.5)
    lengths = jnp.asarray([24, 10])
    valid = (jnp.arange(N)[None, :] < lengths[:, None]).astype(
        jnp.float32)
    dp = jnp.ones((B,), jnp.float32)
    ls = jnp.asarray(1.0 + 0.1 * rng.randn(C).astype(np.float32))
    lb = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))
    wqkv = jnp.asarray(rng.randn(C, 3 * C).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(0.05 * rng.randn(3 * C).astype(np.float32))
    wproj = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.1)
    bproj = jnp.asarray(0.05 * rng.randn(C).astype(np.float32))
    r = jnp.asarray(rng.randn(B, N, C).astype(np.float32))

    def f(quant, *a):
        return fused_attn_block(x, valid, dp, *a, H, 1e-6, True, quant)

    y_f = f(None, ls, lb, wqkv, bqkv, wproj, bproj)
    y_q = f(mode, ls, lb, wqkv, bqkv, wproj, bproj)
    rel = float(jnp.linalg.norm(y_q - y_f) / jnp.linalg.norm(y_f))
    assert rel < 0.02, rel

    args = (ls, lb, wqkv, bqkv, wproj, bproj)
    g_f = jax.grad(lambda *a: jnp.sum(f(None, *a) * r),
                   argnums=tuple(range(6)))(*args)
    g_q = jax.grad(lambda *a: jnp.sum(f(mode, *a) * r),
                   argnums=tuple(range(6)))(*args)
    for name, a, b in zip(
            ["dls", "dlb", "dwqkv", "dbqkv", "dwproj", "dbproj"],
            g_q, g_f):
        assert np.all(np.isfinite(np.asarray(a))), name
        gr = float(jnp.linalg.norm(a - b)
                   / (jnp.linalg.norm(b) + 1e-30))
        assert gr < 0.05, (name, gr)
