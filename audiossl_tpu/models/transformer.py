"""Pre-norm ViT blocks with variable-length attention masking.

Functional flax counterpart of the reference building blocks
(reference audiossl/modules/transformer.py:95-159): `Attention` (joint
QKV projection, additive -10000 padding mask), `Mlp` (GELU), `DropPath`
(per-sample stochastic depth) and the pre-norm residual `Block`.

TPU notes: attention stays as plain einsum matmuls — sequences here are
tiny (<=251 tokens at 10 s audio, patch 64x4), so a flash-attention
kernel buys nothing; batched QK^T/AV land straight on the MXU and XLA
fuses softmax+mask. All shapes are static; variable length is carried
as an additive key mask built from per-sample token counts.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

# The reference uses an additive -10000 mask (not -inf); kept for parity.
MASK_VALUE = -10000.0


class LayerNormPG(nn.Module):
    """flax-equivalent LayerNorm routed through
    ``ops.pallas_ln.layer_norm``: identical forward math (XLA keeps
    fusing it into the next matmul), single-pass Pallas backward on
    TPU (XLA's LN backward costs two full (x, dy) reads). Same param
    names/shapes as ``nn.LayerNorm`` — checkpoints interchange."""
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from audiossl_tpu.ops.pallas_ln import layer_norm

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,),
                          jnp.float32)
        return layer_norm(x, scale, bias, self.epsilon, self.dtype)


def length_to_attn_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] token counts -> additive attention mask [B, 1, 1, max_len]."""
    pos = jnp.arange(max_len)
    pad = pos[None, :] >= lengths[:, None]  # True where padded
    return (pad.astype(jnp.float32) * MASK_VALUE)[:, None, None, :]


def length_to_token_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] token counts -> boolean validity mask [B, max_len]."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


class Attention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    fused_attention: bool = False

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic=True,
                 return_attention=False):
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        use_fused = (self.fused_attention and not return_attention
                     and self.attn_drop == 0.0
                     and jax.default_backend() == "tpu")
        if use_fused:
            # fused softmax(QK^T+mask)V Pallas kernel — consumes the
            # packed [B, N, 3C] projection and emits [B, N, C], so no
            # transposes appear at the kernel boundary and the [N, N]
            # scores/probabilities never leave VMEM (ops/pallas_mha.py)
            from audiossl_tpu.ops.pallas_mha import fused_mha

            if attn_mask is not None:
                m2 = attn_mask[:, 0, 0, :].astype(jnp.float32)
            else:
                m2 = jnp.zeros((B, N), jnp.float32)
            out = fused_mha(qkv, m2, self.num_heads, scale).astype(x.dtype)
        else:
            qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
            if attn_mask is not None:
                attn = attn + attn_mask.astype(attn.dtype)
            attn = jax.nn.softmax(attn, axis=-1)
            if return_attention:
                return attn
            if self.attn_drop > 0:
                attn = nn.Dropout(self.attn_drop)(
                    attn, deterministic=deterministic)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        out = nn.Dense(self.dim, use_bias=True, dtype=self.dtype, name="proj")(out)
        if self.proj_drop > 0:
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


@jax.custom_jvp
def erf_approx(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| < 1.5e-7 — exact at
    bf16/f32 working precision). XLA lowers jax.lax.erf/erfc to a
    rational chain that costs ~1 ms per ViT-base fc1 activation on
    v5e; this polynomial is free next to the matmul (measured: 3.83 ->
    2.82 ms for the fused dot+GELU at [32768, 768]x[768, 3072]).
    The custom JVP supplies the exact analytic derivative
    2/sqrt(pi) e^(-x^2) — autodiff of the polynomial is both slower
    and less accurate."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


@erf_approx.defjvp
def _erf_approx_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    return erf_approx(x), 1.1283791670955126 * jnp.exp(-x * x) * dx


def gelu_exact(x):
    """Exact (erf-form) GELU, matching torch.nn.GELU default used by
    the reference ViT blocks — computed with erf_approx."""
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + erf_approx(
        xf * 0.7071067811865476))).astype(x.dtype)


class Mlp(nn.Module):
    dim: int
    hidden_dim: int
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = gelu_exact(x)
        if self.drop > 0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        if self.drop > 0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


def drop_path(x, rate, deterministic, rng):
    """Per-sample stochastic depth (reference modules/transformer.py:56-66)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, dtype=x.dtype))
    return x / keep * mask


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    fused_attention: bool = False

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic=True,
                 return_attention=False, attn_only=False):
        ln = LayerNormPG if self.fused_attention else nn.LayerNorm
        y = ln(epsilon=self.eps, dtype=self.dtype, name="norm1")(x)
        if return_attention:
            # reference Block.forward(return_attention=True)
            # (modules/transformer.py:124-133): the softmax attention map
            return Attention(self.dim, self.num_heads, self.qkv_bias,
                             self.attn_drop, self.drop, dtype=self.dtype,
                             fused_attention=self.fused_attention,
                             name="attn")(y, attn_mask, deterministic,
                                          return_attention=True)
        y = Attention(self.dim, self.num_heads, self.qkv_bias, self.attn_drop,
                      self.drop, dtype=self.dtype,
                      fused_attention=self.fused_attention, name="attn")(
            y, attn_mask, deterministic)
        if self.drop_path_rate > 0 and not deterministic:
            y = drop_path(y, self.drop_path_rate, deterministic,
                          self.make_rng("droppath"))
        x = x + y
        if attn_only:
            # caller runs the MLP residual half itself (the trainable
            # fused kernel path, models/atst.run_blocks +
            # ops/pallas_mlp.py)
            return x
        y = ln(epsilon=self.eps, dtype=self.dtype, name="norm2")(x)
        y = Mlp(self.dim, int(self.dim * self.mlp_ratio), self.drop,
                dtype=self.dtype, name="mlp")(y, deterministic)
        if self.drop_path_rate > 0 and not deterministic:
            y = drop_path(y, self.drop_path_rate, deterministic,
                          self.make_rng("droppath"))
        return x + y
