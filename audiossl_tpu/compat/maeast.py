"""MAE-AST encoder family (frame + patch variants): flax port +
torch-checkpoint importer.

Third-party comparison encoders (reference ``downstream/
comparison_models/{mae_ast,mae_ast_patch}_module.py`` over the
fairseq-based vendored ``models/mae_ast.py`` / ``mae_ast_patch.py``).
Inference path being reproduced (mae_ast_module.py:25-36,
mae_ast.py:358-435 with ``mask=False, features_only=True``):

  wav -> kaldi fbank (128 mels, povey window, 10 ms shift, NO
     normalization — mae_ast_module.py:54-64)
  -> BatchNorm2d(1, affine=False) over the whole [B,1,T,128] "image",
     eval running stats, scaled by 0.5 (mae_ast.py:373-375)
  -> Unfold kernel==stride: (time 2, freq 128) frame variant /
     (16, 16) patch variant -> 256-d patches, tokens time-major
     (mae_ast.py:210-211,378)
  -> Linear 256 -> 768 (post_extract_proj)
  -> + interleaved sin/cos positional encoding over the token index
     (SinusoidalPositionalEncoding, mae_ast.py:779-797)
  -> ONE pre-stack LayerNorm: the fairseq TransformerEncoder with
     ``layer_norm_first=False`` applies its ``layer_norm`` BEFORE the
     layers (mae_ast.py:638-640)
  -> 12 POST-LN layers: attn -> +residual -> LN -> FFN(exact-erf GELU)
     -> +residual -> LN (TransformerSentenceEncoderLayer,
     mae_ast.py:755-774); no trailing norm
  -> module pooling:
     frame: repeat the last token, then mean over token pairs
       (AvgPool2d((2,1)), mae_ast_module.py:34-35) -> 25 fps
     patch: mean over the 8 freq patches per time step
       (AvgPool1d(8,8), mae_ast_patch_module.py:33-35) -> 6.25 fps

The fairseq MultiheadAttention's separate q/k/v projections are fused
into one Dense by the importer (same math: fairseq scales q by
head_dim**-0.5 before the dot product, we scale the scores). Parity vs
the reference torch modules (under tests/fairseq_stub.py) is in
tests/test_maeast_parity.py.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.compat.vit import _np, extract_patches, heads_for_dim
from audiossl_tpu.models.transformer import Attention, Mlp


def interleaved_sincos_pe(n: int, d: int) -> np.ndarray:
    """Standard transformer PE [n, d]: even dims sin, odd dims cos
    (reference SinusoidalPositionalEncoding, mae_ast.py:781-788)."""
    position = np.arange(n, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float64)
                 * (-np.log(10000.0) / d))
    pe = np.zeros((n, d), np.float32)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


@dataclasses.dataclass(frozen=True)
class MAEASTConfig:
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    kernel: Tuple[int, int] = (2, 128)  # (time, freq); patch: (16, 16)
    variant: str = "frame"
    ln_eps: float = 1e-5  # fairseq LayerNorm / BatchNorm2d eps
    dtype: str = "float32"


class PostLNLayer(nn.Module):
    """fairseq TransformerSentenceEncoderLayer, layer_norm_first=False
    (mae_ast.py:755-774)."""
    dim: int
    num_heads: int
    ffn_dim: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = Attention(self.dim, self.num_heads, qkv_bias=True,
                      dtype=self.dtype, fused_attention=True,
                      name="attn")(x, None, deterministic)
        x = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                         name="norm1")(x + y)
        y = Mlp(self.dim, self.ffn_dim, dtype=self.dtype,
                name="mlp")(x, deterministic)
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                            name="norm2")(x + y)


class MAEASTEncoder(nn.Module):
    """Raw kaldi fbank [B, T, 128] -> frame embeddings
    [B, T//4ish, D] (frame variant) / [B, T//16, D] (patch)."""
    cfg: MAEASTConfig = MAEASTConfig()

    @property
    def embed_dim(self):
        return self.cfg.embed_dim

    @nn.compact
    def __call__(self, fbank, deterministic: bool = True):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        # BatchNorm2d(1, affine=False) eval: scalar running stats over
        # the whole spectrogram "image", then *0.5 (mae_ast.py:373-375)
        bn_mean = self.param("bn_mean", nn.initializers.zeros, (1,))
        bn_var = self.param("bn_var", nn.initializers.ones, (1,))
        x = (fbank - bn_mean[0]) * jax.lax.rsqrt(bn_var[0] + 1e-5) * 0.5
        kt, kf = c.kernel
        patches = extract_patches(x.astype(dtype), kt, kf)
        tok = nn.Dense(c.embed_dim, dtype=dtype, name="patch_proj")(patches)
        N = tok.shape[1]
        tok = tok + jnp.asarray(
            interleaved_sincos_pe(N, c.embed_dim), dtype)
        tok = nn.LayerNorm(epsilon=c.ln_eps, dtype=dtype,
                           name="enc_norm")(tok)
        for i in range(c.depth):
            tok = PostLNLayer(c.embed_dim, c.num_heads, c.ffn_dim,
                              eps=c.ln_eps, dtype=dtype,
                              name=f"layers_{i}")(tok, deterministic)
        B, N, D = tok.shape
        if c.variant == "frame":
            tok = jnp.concatenate([tok, tok[:, -1:]], axis=1)
            n_out = (N + 1) // 2
            return tok[:, : 2 * n_out].reshape(B, n_out, 2, D).mean(axis=2)
        nf = 128 // kf  # freq patches per time step (8)
        return tok.reshape(B, N // nf, nf, D).mean(axis=2)


# --------------------------- torch importer --------------------------- #

def convert_maeast_checkpoint(sd):
    """torch ``checkpoint['model']`` (raw MAE_AST naming, the format
    mae_ast_module.py:43-46 loads strict=True) -> flax params.

    Consumed: batch_norm running stats, post_extract_proj, the
    encoder's pre-stack layer_norm, and encoder.layers.N.* with the
    separate q/k/v projections fused. Dropped exactly like the
    reference's features-only path: decoder.*, final_proj_*,
    *_mask_emb, the unused model-level 128-d layer_norm, and the
    sinusoidal PE buffers (recomputed analytically)."""
    def linear(key):
        return {"kernel": _np(sd[key + ".weight"]).T,
                "bias": _np(sd[key + ".bias"])}

    def ln(key):
        return {"scale": _np(sd[key + ".weight"]),
                "bias": _np(sd[key + ".bias"])}

    p = {
        "bn_mean": _np(sd["batch_norm.running_mean"]),
        "bn_var": _np(sd["batch_norm.running_var"]),
        "patch_proj": linear("post_extract_proj"),
        "enc_norm": ln("encoder.layer_norm"),
    }
    depth = 1 + max(int(k.split(".")[2]) for k in sd
                    if k.startswith("encoder.layers."))
    for i in range(depth):
        b = f"encoder.layers.{i}"
        qkv_k = np.concatenate(
            [_np(sd[f"{b}.self_attn.{n}_proj.weight"]).T
             for n in ("q", "k", "v")], axis=1)
        qkv_b = np.concatenate(
            [_np(sd[f"{b}.self_attn.{n}_proj.bias"])
             for n in ("q", "k", "v")], axis=0)
        p[f"layers_{i}"] = {
            "attn": {"qkv": {"kernel": qkv_k, "bias": qkv_b},
                     "proj": linear(b + ".self_attn.out_proj")},
            "norm1": ln(b + ".self_attn_layer_norm"),
            "mlp": {"fc1": linear(b + ".fc1"),
                    "fc2": linear(b + ".fc2")},
            "norm2": ln(b + ".final_layer_norm"),
        }
    return p


def load_maeast_checkpoint(path: str, variant: str = "frame"):
    """Released MAE-AST .pt (``{'model': state_dict}``) ->
    (MAEASTEncoder, params). ``variant`` picks the frame (2x128) or
    patch (16x16) unfold shapes the two reference model files hard-code
    (mae_ast.py:30-49 vs mae_ast_patch.py:30-49; both 256-d patches,
    so the shape cannot be inferred from the weights)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    params = convert_maeast_checkpoint(sd)
    D = params["patch_proj"]["kernel"].shape[1]
    depth = sum(1 for k in params if k.startswith("layers_"))
    cfg = MAEASTConfig(
        embed_dim=D, depth=depth, num_heads=heads_for_dim(D),
        ffn_dim=params["layers_0"]["mlp"]["fc1"]["kernel"].shape[1],
        kernel=(2, 128) if variant == "frame" else (16, 16),
        variant=variant)
    return MAEASTEncoder(cfg), jax.tree.map(jnp.asarray, params)


# ----------------------------- adapter ------------------------------- #

def maeast_fbank(wav):
    """[B, L] waveforms -> raw kaldi fbank [B, T, 128] (reference
    MAEASTPredModule.transform, mae_ast_module.py:54-64: povey window,
    10 ms shift, no mean removal, no normalization)."""
    from audiossl_tpu.compat.beats import kaldi_fbank

    return kaldi_fbank(wav, num_mel_bins=128, window_type="povey")


@dataclasses.dataclass
class MAEASTAdapter:
    """MAE-AST as a frame encoder for the SED drivers (reference
    mae_ast_module.py / mae_ast_patch_module.py): 100 fps fbank ->
    25 fps (frame variant) or 6.25 fps (patch variant)."""
    encoder: MAEASTEncoder
    params: dict
    frozen: bool = True

    @property
    def embed_dim(self):
        return self.encoder.embed_dim

    @property
    def frame_rate_divisor(self):
        return 4 if self.encoder.cfg.variant == "frame" else 16

    def token_count(self, n_samples: int) -> int:
        frames = 1 + (n_samples - 400) // 160  # kaldi snip_edges
        if self.encoder.cfg.variant == "frame":
            return (frames // 2 + 1) // 2
        return frames // 16

    def frame_embeddings(self, params, wav, valid, train=False,
                         rngs=None):
        fb = maeast_fbank(wav)
        return self.encoder.apply({"params": params}, fb,
                                  deterministic=not train)
