"""Shared timm-style Vision Transformer in flax, for the third-party
comparison-encoder families the reference vendors on top of timm
(reference ``downstream/comparison_models/models/``):

* AudioMAE  — ``audioMAE_model.py:22-59`` subclasses
  ``timm.models.vision_transformer.VisionTransformer``
* M2D (mmd) — ``models_mae.py:117-160`` builds from timm's
  ``PatchEmbed``/``Block``
* SSAST     — ``ssast.py:73-85`` builds timm DeiT (distilled: CLS +
  DIST prefix tokens)

All three share the exact same encoder math: single-channel conv patch
embed (kernel == stride), prefix token(s) + additive position
embedding, a stack of pre-LN ViT blocks (fused QKV, exact-erf GELU,
LayerNorm eps 1e-6), and a final LayerNorm. This module implements
that once, TPU-style: the patch conv is an im2col reshape + one Dense
(lands on the MXU as a single matmul instead of a strided-conv
lowering), blocks reuse :class:`audiossl_tpu.models.transformer.Block`
(which carries the measured fused-attention path), and all shapes are
static.

``convert_timm_vit_state_dict`` imports a torch state dict in timm
naming (``blocks.N.attn.qkv`` etc.) — the layout every one of the
three families' released checkpoints uses.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.models.transformer import Block


def extract_patches(x: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    """[B, H, W] single-channel image -> non-overlapping patches
    [B, (H//ph)*(W//pw), ph*pw], flattened exactly like torch
    ``Conv2d(k=s=(ph,pw))`` + ``flatten(2).transpose(1,2)``: patch
    index is H-major, patch content is (ph, pw) row-major."""
    B, H, W = x.shape
    h, w = H // ph, W // pw
    x = x[:, : h * ph, : w * pw]
    x = x.reshape(B, h, ph, w, pw).transpose(0, 1, 3, 2, 4)
    return x.reshape(B, h * w, ph * pw)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    patch_size: Tuple[int, int] = (16, 16)
    # prefix tokens prepended before patches: 1 = CLS (AudioMAE/M2D),
    # 2 = CLS + DIST (SSAST's DeiT-distilled backbones)
    num_prefix: int = 1
    # total pos-embed length = num_prefix + max_patches
    max_patches: int = 512
    # (rows, cols) of the pos-embed patch grid when the VARIABLE input
    # axis is the minor (W/time) one — e.g. SSAST-patch's freq-major
    # 8 x T' grid. None = variable axis is the major one (AudioMAE /
    # M2D time-major grids, SSAST-frame's single row), where the plain
    # leading slice is already correct.
    pos_grid: Optional[Tuple[int, int]] = None
    ln_eps: float = 1e-6
    dtype: str = "float32"


class TimmViT(nn.Module):
    """Encoder trunk: [B, H, W] -> normed tokens [B, prefix+N, D].

    Shorter inputs than ``max_patches`` use the leading slice of the
    position embedding (matches the reference's
    ``pos_embed[:, 1:T+1]`` slicing, audioMAE_module.py:48 — correct
    when the variable axis is the H-major one: AudioMAE/M2D time-major
    grids and SSAST-frame's single-row grid). When the variable axis
    is the minor one (SSAST-patch's freq-major 8 x T' grid) set
    ``cfg.pos_grid=(rows, cols)`` and the slice is taken per grid
    column instead (the reference torch module simply shape-errors on
    such inputs; grid slicing is the consistent extension)."""
    cfg: ViTConfig = ViTConfig()

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 attn_mask: Optional[jnp.ndarray] = None):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        B = x.shape[0]
        patches = extract_patches(x, *c.patch_size)
        N = patches.shape[1]
        tok = nn.Dense(c.embed_dim, dtype=dtype, name="patch_proj")(patches)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (c.num_prefix + c.max_patches, c.embed_dim))
        prefix = self.param(
            "prefix_tokens", nn.initializers.zeros,
            (c.num_prefix, c.embed_dim))
        if N != c.max_patches and c.pos_grid is not None:
            rows, cols0 = c.pos_grid
            if rows * cols0 != c.max_patches or N % rows:
                raise ValueError(
                    f"pos_grid {c.pos_grid} inconsistent with "
                    f"max_patches={c.max_patches} / N={N}")
            ppatch = pos[c.num_prefix:].reshape(rows, cols0, c.embed_dim)
            ppatch = ppatch[:, : N // rows].reshape(N, c.embed_dim)
        else:
            ppatch = pos[c.num_prefix: c.num_prefix + N]
        tok = tok + ppatch.astype(dtype)
        lead = (prefix + pos[: c.num_prefix]).astype(dtype)
        tok = jnp.concatenate(
            [jnp.broadcast_to(lead[None], (B, c.num_prefix, c.embed_dim)),
             tok], axis=1)
        for i in range(c.depth):
            tok = Block(c.embed_dim, c.num_heads, c.mlp_ratio,
                        qkv_bias=True, eps=c.ln_eps, dtype=dtype,
                        name=f"blocks_{i}")(
                tok, attn_mask=attn_mask, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.ln_eps, dtype=dtype, name="norm")(tok)


# --------------------------- torch importer --------------------------- #

def _np(t):
    return np.asarray(t.detach().numpy() if hasattr(t, "detach") else t,
                      np.float32)


def infer_depth(sd, prefix: str = "") -> int:
    """Number of blocks in a timm-layout state dict."""
    ns = [int(k[len(prefix):].split(".")[1]) for k in sd
          if k.startswith(prefix + "blocks.")]
    return max(ns) + 1


def heads_for_dim(embed_dim: int) -> int:
    """ViT head count for an embed dim: the timm tiny/small/base table,
    dim/64 otherwise (the released-checkpoint families are all in the
    table; the fallback supports small synthetic test checkpoints)."""
    return {768: 12, 384: 6, 192: 3}.get(embed_dim,
                                         max(1, embed_dim // 64))


def convert_timm_vit_state_dict(sd, depth: int, prefix: str = "",
                                dist_token: bool = False):
    """timm-layout torch state dict -> flax params for :class:`TimmViT`.

    ``prefix`` addresses nested checkpoints (e.g. SSAST's ``module.v.``).
    Keys consumed: ``patch_embed.proj.{weight,bias}`` (Conv2d
    [D,1,ph,pw] -> Dense [(ph*pw), D]), ``cls_token`` (+``dist_token``),
    ``pos_embed``, ``blocks.N.{norm1,attn.qkv,attn.proj,norm2,
    mlp.fc1,mlp.fc2}``, ``norm``."""
    def arr(key):
        return _np(sd[prefix + key])

    def linear(key):
        out = {"kernel": arr(key + ".weight").T}
        if prefix + key + ".bias" in sd:
            out["bias"] = arr(key + ".bias")
        return out

    def ln(key):
        return {"scale": arr(key + ".weight"), "bias": arr(key + ".bias")}

    w = arr("patch_embed.proj.weight")  # [D, 1, ph, pw]
    p = {"patch_proj": {"kernel": w.reshape(w.shape[0], -1).T,
                        "bias": arr("patch_embed.proj.bias")}}
    toks = [arr("cls_token").reshape(1, -1)]
    if dist_token:
        toks.append(arr("dist_token").reshape(1, -1))
    p["prefix_tokens"] = np.concatenate(toks, axis=0)
    p["pos_embed"] = arr("pos_embed").reshape(
        -1, p["prefix_tokens"].shape[-1])
    for i in range(depth):
        b = f"blocks.{i}"
        p[f"blocks_{i}"] = {
            "norm1": ln(b + ".norm1"),
            "attn": {"qkv": linear(b + ".attn.qkv"),
                     "proj": linear(b + ".attn.proj")},
            "norm2": ln(b + ".norm2"),
            "mlp": {"fc1": linear(b + ".mlp.fc1"),
                    "fc2": linear(b + ".mlp.fc2")},
        }
    p["norm"] = ln("norm")
    return p


# ------------------------ sin-cos pos embeds -------------------------- #

def sincos_pos_embed_1d(embed_dim: int, positions: np.ndarray) -> np.ndarray:
    """MAE-style 1-D sin-cos table [len(positions), embed_dim]: first
    half sin, second half cos (reference models_mae.py:54-72)."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega = 1.0 / 10000 ** (omega / (embed_dim / 2.0))
    out = np.einsum("m,d->md", positions.reshape(-1).astype(np.float64),
                    omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1).astype(
        np.float32)


def sincos_pos_embed_2d(embed_dim: int, gh: int, gw: int,
                        cls_token: bool = True) -> np.ndarray:
    """MAE 2-D sin-cos pos embed [gh*gw (+1), embed_dim], grid
    flattened H-major. NOTE the reference's half-split is W-first: its
    ``emb_h`` is computed from ``grid[0]``, which ``meshgrid(w, h)``
    fills with the W coordinate (reference models_mae.py:24-51) — so
    the first half of the dim encodes W, the second half H."""
    grid_h = np.repeat(np.arange(gh, dtype=np.float32), gw)
    grid_w = np.tile(np.arange(gw, dtype=np.float32), gh)
    emb = np.concatenate(
        [sincos_pos_embed_1d(embed_dim // 2, grid_w),
         sincos_pos_embed_1d(embed_dim // 2, grid_h)], axis=1)
    if cls_token:
        emb = np.concatenate(
            [np.zeros((1, embed_dim), np.float32), emb], axis=0)
    return emb
