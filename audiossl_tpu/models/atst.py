"""The ATST audio transformer encoder family (clip-level and frame-level).

One flax module covers both reference encoders:

* ``AST`` (clip-level, CLS token) — reference
  ``audiossl/models/atst/audio_transformer.py:78-374``;
* ``FrameAST`` (frame-level, CLS-free, optional prompt tokens /
  data2vec-style block averaging) — reference
  ``audiossl/methods/atstframe/audio_transformer.py:99-291``.

They share every component except pooling, so they are one module here
configured by ``use_cls`` / ``nprompt`` / ``avg_blocks``.

TPU-first departures from the reference (semantics preserved, verified
by parity tests against the imported torch weights):

* masked-position selection (``frame_repr[mask_index]``) returns the full
  frame sequence plus the boolean mask instead of a dynamic-shape gather;
  the loss does masked reductions (identical math, static shapes);
* chunked long-audio inference is a single batched forward over
  ``[B*num_chunks, ...]`` with chunk-mark weighting instead of a Python
  loop over dynamic-width chunks (the reference already computes the
  same chunk marks, audio_transformer.py:263-268);
* the CNN patch embed variant is expressed as the equivalent Dense on
  rearranged patches (kernel-size == stride convolutions are exactly a
  per-patch linear map), so both variants hit the MXU the same way.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from audiossl_tpu.models.transformer import (
    Block,
    LayerNormPG,
    length_to_attn_mask,
    length_to_token_mask,
)
from audiossl_tpu.ops.interpolate import resize_bicubic


def num_patches(spec_h, spec_w, patch_h, patch_w):
    return (spec_h // patch_h) * (spec_w // patch_w)


def patchify(mel: jnp.ndarray, patch_h: int, patch_w: int) -> jnp.ndarray:
    """[B, F, T] -> [B, (w h), patch_h*patch_w] matching the reference
    einops pattern 'b c (h p1) (w p2) -> b (w h) (p1 p2 c)' (channel=1).

    Token index runs time-major (w outer, h inner); features are
    freq-major within a patch (p1 outer, p2 inner)."""
    B, F, T = mel.shape
    H = F - F % patch_h
    W = T - T % patch_w
    h, w = H // patch_h, W // patch_w
    x = mel[:, :H, :W].reshape(B, h, patch_h, w, patch_w)
    # -> [B, w, h, patch_h, patch_w] -> [B, w*h, patch_h*patch_w]
    x = jnp.transpose(x, (0, 3, 1, 2, 4))
    return x.reshape(B, w * h, patch_h * patch_w)


def patch_lengths(length, spec_h, patch_h, patch_w):
    """Frame counts [B] -> valid patch counts [B]
    (reference PatchEmbed_v2: (h//ph) * ((len - len%pw)//pw))."""
    return (spec_h // patch_h) * (length // patch_w)


class AudioTransformer(nn.Module):
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_h: int = 64
    patch_w: int = 4
    spec_h: int = 64
    spec_w: int = 1001
    use_cls: bool = True
    nprompt: int = 0
    avg_blocks: int = 0
    pos_type: str = "cut"
    qkv_bias: bool = False
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    # opt-in Pallas fused attention (wins for sequences >~512 tokens,
    # e.g. long-audio variants; see ops/pallas_mha.py)
    fused_attention: bool = False
    # whole-block fused inference kernels (ops/pallas_block.py) — set
    # ONLY on encoders whose forward is never differentiated (the EMA
    # teacher, embedding extractors); stochastic depth is applied
    # in-kernel so train-mode teacher semantics are preserved
    fused_infer: bool = False
    # "int8": run the no-grad block-kernel weight matmuls on the int8
    # MXU path (2x bf16 peak) — an OPT-IN numerics change (~1e-2 rel
    # per block); default keeps bf16 reference parity
    infer_quant: str = "none"
    # "int8": run the TRAINABLE fused kernels' forward projections
    # (qkv/proj, fc1/fc2) on the int8 MXU path; backward stays bf16 on
    # dequantized weights (QAT straight-through, ops/pallas_mlp.py /
    # pallas_attn.py). OPT-IN; error budget in docs/PROFILE.md
    train_quant: str = "none"

    @property
    def max_patches(self):
        return num_patches(self.spec_h, self.spec_w, self.patch_h, self.patch_w)

    def setup(self):
        init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)
        self.patch_proj = nn.Dense(self.embed_dim, name="patch_proj",
                                   dtype=self.dtype)
        self.pos_embed = self.param(
            "pos_embed", init, (1, self.max_patches + 1, self.embed_dim))
        self.mask_embed = self.param(
            "mask_embed", init, (1, 1, self.embed_dim))
        if self.use_cls:
            self.cls_token = self.param(
                "cls_token", init, (1, 1, self.embed_dim))
        if self.nprompt > 0:
            self.prompt_embed = self.param(
                "prompt_embed", init, (1, self.nprompt, self.embed_dim))
        block = Block
        if self.remat:
            block = nn.remat(Block, static_argnums=(2,))
        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1)
               for i in range(self.depth)]
        self.blocks = [
            block(self.embed_dim, self.num_heads, self.mlp_ratio,
                  self.qkv_bias, self.drop_rate, self.attn_drop_rate,
                  dpr[i], self.eps, self.dtype,
                  fused_attention=self.fused_attention,
                  name=f"blocks_{i}")
            for i in range(self.depth)
        ]
        ln_cls = LayerNormPG if self.fused_attention else nn.LayerNorm
        self.norm = ln_cls(epsilon=self.eps, dtype=self.dtype,
                           name="norm")

    # ------------------------------------------------------------------ #
    def _interpolated_pos(self, n_tokens: int, h: int, w: int):
        """pos_type='interpolate': bicubic 2-D resize of the patch grid
        (reference interpolate_pos_encoding, align_corners=False)."""
        H0 = self.spec_h // self.patch_h
        W0 = self.spec_w // self.patch_w
        h0 = h // self.patch_h
        w0 = w // self.patch_w
        if h0 * w0 == self.max_patches and h == self.spec_h and w == self.spec_w:
            return self.pos_embed
        grid = self.pos_embed[:, 1:].reshape(1, H0, W0, self.embed_dim)
        grid = jnp.transpose(grid, (0, 3, 1, 2))  # [1, D, H0, W0]
        grid = resize_bicubic(grid, h0, w0, align_corners=False)
        grid = jnp.transpose(grid, (0, 2, 3, 1)).reshape(1, -1, self.embed_dim)
        return jnp.concatenate([self.pos_embed[:, :1], grid], axis=1)

    def prepare_tokens(self, mel, length=None, mask_index=None,
                       apply_mask=True, deterministic=True):
        """mel [B, F, T] -> (tokens [B, N, D], patch_length [B] or None).

        N includes the CLS token (clip) or prompt tokens (frame)."""
        B, F, T = mel.shape
        patches = patchify(mel, self.patch_h, self.patch_w)
        x = self.patch_proj(patches)  # [B, Np, D]
        Np = x.shape[1]

        plen = None
        if length is not None:
            plen = patch_lengths(jnp.asarray(length, jnp.int32),
                                 F - F % self.patch_h, self.patch_h,
                                 self.patch_w)

        if mask_index is not None and apply_mask:
            m = mask_index[:, :, None].astype(x.dtype)
            x = (1.0 - m) * x + m * self.mask_embed.astype(x.dtype)

        if self.use_cls:
            cls = jnp.broadcast_to(self.cls_token, (B, 1, self.embed_dim))
            x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
            if self.pos_type == "cut":
                x = x + self.pos_embed[:, : Np + 1].astype(x.dtype)
            else:
                x = x + self._interpolated_pos(Np, F, T).astype(x.dtype)
        else:
            if self.pos_type == "cut":
                x = x + self.pos_embed[:, 1 : Np + 1].astype(x.dtype)
            else:
                x = x + self._interpolated_pos(Np, F, T)[:, 1:].astype(x.dtype)
            if self.nprompt > 0:
                pr = jnp.broadcast_to(
                    self.prompt_embed, (B, self.nprompt, self.embed_dim))
                x = jnp.concatenate([pr.astype(x.dtype), x], axis=1)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        return x, plen

    def _attn_lengths(self, plen):
        if plen is None:
            return None
        if self.use_cls:
            return plen + 1
        return plen + self.nprompt

    def run_blocks(self, x, plen, deterministic=True, collect_from=None):
        """Run all blocks; optionally collect raw outputs of the last-n.

        With the fused-attention kernel, the token dim is padded ONCE
        here to a 128-multiple (padded tokens get length-masked out),
        so the Pallas MHA sees lane-aligned sequences with no per-layer
        pad/slice traffic; outputs are sliced back to the logical
        length. On the MXU a 250-token einsum is padded to the same
        256 tiles anyway, so this costs no extra FLOPs.
        """
        N0 = x.shape[1]
        use_block_fused = (
            (self.fused_infer or (self.fused_attention and deterministic))
            and self.drop_rate == 0.0 and self.attn_drop_rate == 0.0
            and jnp.dtype(self.dtype) == jnp.bfloat16
            and jax.default_backend() == "tpu"
            and not self.is_initializing())
        if use_block_fused:
            # whole-block fused inference kernels (weights resident in
            # VMEM, one HBM round-trip per sub-block) — deterministic
            # forwards are always no-grad in this framework, and
            # fused_infer marks no-grad train-mode encoders (the EMA
            # teacher); their stochastic depth runs in-kernel
            # (ops/pallas_block.py)
            from audiossl_tpu.ops.pallas_block import encoder_blocks_infer

            dp_rng = None
            if not deterministic and self.drop_path_rate > 0.0:
                dp_rng = self.make_rng("droppath")
            bparams = {f"blocks_{i}": b.variables["params"]
                       for i, b in enumerate(self.blocks)}
            return encoder_blocks_infer(
                bparams, x, self._attn_lengths(plen), self.num_heads,
                self.depth, eps=self.eps, collect_from=collect_from,
                drop_path_rate=(0.0 if deterministic
                                else self.drop_path_rate),
                rng=dp_rng,
                quant=(None if self.infer_quant == "none"
                       else self.infer_quant))
        pad = (-N0) % 128 if self.fused_attention else 0
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        attn_mask = None
        lengths = self._attn_lengths(plen)
        if lengths is None and pad:
            lengths = jnp.full((x.shape[0],), N0, jnp.int32)
        if lengths is not None:
            attn_mask = length_to_attn_mask(lengths, x.shape[1])
        # student training path: each block runs as TWO trainable
        # Pallas kernel pairs with in-kernel weight-grad accumulation —
        # the attention residual half (ops/pallas_attn.py: LN1 -> qkv
        # -> MHA -> proj) and the MLP residual half (ops/pallas_mlp.py:
        # LN2 -> fc1 -> GELU -> fc2); only the [B, N, C] residual
        # stream crosses kernel boundaries
        import os
        use_mlp_fused = (
            self.fused_attention and not deterministic and not self.remat
            and self.drop_rate == 0.0 and self.attn_drop_rate == 0.0
            and jnp.dtype(self.dtype) == jnp.bfloat16
            and jax.default_backend() == "tpu"
            and os.environ.get("AUDIOSSL_FUSED_MLP", "1") != "0"
            and not self.is_initializing())
        use_attn_fused = (
            use_mlp_fused
            and os.environ.get("AUDIOSSL_FUSED_ATTN", "1") != "0")
        valid_f = None
        if use_attn_fused:
            if lengths is not None:
                valid_f = (jnp.arange(x.shape[1])[None, :]
                           < lengths[:, None]).astype(jnp.float32)
            else:
                valid_f = jnp.ones((x.shape[0], x.shape[1]), jnp.float32)

        def _dpm(rate):
            if rate > 0.0:
                keep = 1.0 - rate
                u = jax.random.uniform(self.make_rng("droppath"),
                                       (x.shape[0],))
                return jnp.floor(keep + u) / keep
            return jnp.ones((x.shape[0],), jnp.float32)

        tq = None if self.train_quant == "none" else self.train_quant
        collected = []
        for i, blk in enumerate(self.blocks):
            if use_mlp_fused:
                from audiossl_tpu.ops.pallas_mlp import fused_mlp_block

                rate = self.drop_path_rate * i / max(self.depth - 1, 1)
                if use_attn_fused:
                    from audiossl_tpu.ops.pallas_attn import (
                        fused_attn_block,
                    )

                    p = blk.variables["params"]
                    bqkv = p["attn"]["qkv"].get("bias")
                    if bqkv is None:  # qkv_bias=False archs: zero bias
                        bqkv = jnp.zeros(
                            (3 * self.embed_dim,), jnp.float32)
                    x = fused_attn_block(
                        x, valid_f, _dpm(rate), p["norm1"]["scale"],
                        p["norm1"]["bias"], p["attn"]["qkv"]["kernel"],
                        bqkv, p["attn"]["proj"]["kernel"],
                        p["attn"]["proj"]["bias"], self.num_heads,
                        self.eps, False, tq)
                else:
                    x = blk(x, attn_mask, deterministic, attn_only=True)
                dpm = _dpm(rate)
                p = blk.variables["params"]
                x = fused_mlp_block(
                    x, dpm, p["norm2"]["scale"], p["norm2"]["bias"],
                    p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"],
                    p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"],
                    self.eps, False, tq)
            else:
                x = blk(x, attn_mask, deterministic)
            if collect_from is not None and i >= collect_from:
                collected.append(x)
        if pad:
            x = x[:, :N0]
            collected = [c[:, :N0] for c in collected]
        return x, collected

    # ----------------------------- pretrain paths -------------------- #
    def __call__(self, mel, length=None, mask_index=None, apply_mask=True,
                 deterministic=True, avg=False):
        """Pretrain forward.

        Clip (use_cls=True): final-norm CLS embedding [B, D]
        (reference AST.forward, audio_transformer.py:188-221).

        Frame (use_cls=False): (frame reprs [B, T, D], selection mask
        [B, T]) where mask = mask_index & valid-length; the reference
        returns frame_repr[mask] (audio_transformer.py:183-207)."""
        x, plen = self.prepare_tokens(mel, length, mask_index, apply_mask,
                                      deterministic)
        collect_from = None
        if self.use_cls and avg:
            collect_from = self.depth - 8  # reference: i > len(blocks)-9
        if not self.use_cls and self.avg_blocks > 0:
            collect_from = self.depth - self.avg_blocks
        x, collected = self.run_blocks(x, plen, deterministic, collect_from)

        if self.use_cls:
            if avg:
                return jnp.mean(jnp.stack(collected), axis=0)[:, 0]
            return self.norm(x)[:, 0]

        # frame-level
        if self.avg_blocks > 0:
            # data2vec teacher: instance-norm each block output over tokens
            def inst_norm(h):
                mu = jnp.mean(h, axis=1, keepdims=True)
                var = jnp.var(h, axis=1, keepdims=True)
                return (h - mu) / jnp.sqrt(var + 1e-5)
            frames = jnp.mean(jnp.stack([inst_norm(h) for h in collected]),
                              axis=0)
        else:
            frames = self.norm(x)
        frames = frames[:, self.nprompt:]
        n_tok = frames.shape[1]
        if plen is not None:
            valid = length_to_token_mask(plen, n_tok)
        else:
            valid = jnp.ones(frames.shape[:2], bool)
        if mask_index is not None:
            sel = mask_index & valid
        else:
            sel = valid
        return frames, sel

    # ----------------------------- inference paths ------------------- #
    def get_last_selfattention(self, mel, length=None):
        """Softmax attention maps of the last block [B, H, N, N]
        (reference audio_transformer.py:223-233, DINO-style attention
        visualization)."""
        x, plen = self.prepare_tokens(mel, length, None, False, True)
        attn_mask = None
        lengths = self._attn_lengths(plen)
        if lengths is not None:
            attn_mask = length_to_attn_mask(lengths, x.shape[1])
        for blk in self.blocks[:-1]:
            x = blk(x, attn_mask, True)
        return self.blocks[-1](x, attn_mask, True, return_attention=True)

    def get_intermediate_layers(self, mel, length=None, n=1, scene=True,
                                deterministic=True):
        """Frame-level downstream/embedding API
        (reference methods/atstframe/audio_transformer.py:259-281).

        scene=True: concat of masked-mean over tokens of the last-n
        normed block outputs (+ prompt mean when nprompt>0) -> [B, n*D].
        scene=False: concat of last-n normed frame sequences -> [B, T, n*D].
        """
        x, plen = self.prepare_tokens(mel, length, None, False, deterministic)
        x, collected = self.run_blocks(x, plen, deterministic,
                                       collect_from=self.depth - n)
        outs = []
        for h in collected:
            norm_h = self.norm(h)
            if scene:
                body = norm_h[:, self.nprompt:]
                if plen is not None:
                    mask = length_to_token_mask(plen, body.shape[1])
                    avg = jnp.sum(body * mask[:, :, None], axis=1) / (
                        plen[:, None] + 1e-6)
                else:
                    avg = jnp.mean(body, axis=1)
                outs.append(avg)
                if self.nprompt > 0:
                    outs.append(jnp.mean(h[:, : self.nprompt], axis=1))
            else:
                outs.append(norm_h[:, self.nprompt:])
        return jnp.concatenate(outs, axis=-1)

    def cls_avg_layers(self, mel, length=None, n=1, deterministic=True):
        """Clip-level: per-block (CLS, masked token mean) of the last-n
        normed outputs (reference get_cls_avg, audio_transformer.py:357).
        Returns (cls [n, B, D], avg [n, B, D])."""
        x, plen = self.prepare_tokens(mel, length, None, False, deterministic)
        x, collected = self.run_blocks(x, plen, deterministic,
                                       collect_from=self.depth - n)
        cls_list, avg_list = [], []
        for h in collected:
            norm_h = self.norm(h)
            if self.use_cls:
                cls_list.append(norm_h[:, 0])
                body = norm_h[:, 1:]
            else:
                cls_list.append(jnp.zeros_like(norm_h[:, 0]))
                body = norm_h
            if plen is not None:
                mask = length_to_token_mask(plen, body.shape[1])
                avg = jnp.sum(body * mask[:, :, None], axis=1) / (
                    plen[:, None].astype(norm_h.dtype) + 1e-6)
            else:
                avg = jnp.mean(body, axis=1)
            avg_list.append(avg)
        return jnp.stack(cls_list), jnp.stack(avg_list)

    def get_intermediate_layers_chunks(self, mel, length=None, n=1,
                                       chunk_len: int = 601, avgpool=True,
                                       deterministic=True):
        """Clip-level chunked inference over long audio
        (reference audio_transformer.py:257-353).

        The mel [B, F, T] is split into ceil-ish ``num_chunks`` chunks of
        ``chunk_len`` frames (last chunk padded), all chunks are encoded
        in ONE batched forward, and per-block CLS/avg are combined by
        chunk-mark weighted averaging. Returns [B, 2*n*D] (avgpool) or
        [B, n*D]."""
        B, F, T = mel.shape
        num_chunks = T // chunk_len + 1
        if length is None:
            length = jnp.full((B,), T, jnp.int32)
        length = jnp.asarray(length, jnp.int32)

        # pad time axis so chunks are uniform
        pad_to = num_chunks * chunk_len
        melp = jnp.pad(mel, ((0, 0), (0, 0), (0, pad_to - T)))
        chunks = melp.reshape(B, F, num_chunks, chunk_len)
        chunks = jnp.transpose(chunks, (0, 2, 1, 3)).reshape(
            B * num_chunks, F, chunk_len)

        ks = jnp.arange(num_chunks)
        # NOTE: deliberately NOT clamped to the chunk width — the reference
        # passes clip(length - i*chunk_len, 0) straight through
        # (audio_transformer.py:263), so a >chunk_len remainder yields a
        # patch_length larger than the chunk's token count and the token
        # average divides by it. Reproduced for checkpoint parity.
        cur_len = jnp.clip(length[:, None] - ks[None, :] * chunk_len, 0, None)
        chunk_mark = jnp.where(
            ks[None, :] == 0, cur_len > 0, cur_len > chunk_len // 2)

        cls, avg = self.cls_avg_layers(
            chunks, cur_len.reshape(-1), n=n, deterministic=deterministic)
        D = cls.shape[-1]
        cls = cls.reshape(n, B, num_chunks, D)
        avg = avg.reshape(n, B, num_chunks, D)
        w = chunk_mark.astype(cls.dtype)[None, :, :, None]
        denom = jnp.sum(w, axis=2)
        cls_out = jnp.sum(cls * w, axis=2) / denom  # [n, B, D]
        avg_out = jnp.sum(avg * w, axis=2) / denom
        cls_cat = jnp.concatenate(list(cls_out), axis=-1)  # [B, n*D]
        avg_cat = jnp.concatenate(list(avg_out), axis=-1)
        if avgpool:
            return jnp.concatenate([cls_cat, avg_cat], axis=-1)
        return cls_cat


def _arch(embed_dim, depth, num_heads, use_cls, **kw):
    kw.setdefault("patch_h", 64)
    kw.setdefault("patch_w", 4)
    return AudioTransformer(embed_dim=embed_dim, depth=depth,
                            num_heads=num_heads, use_cls=use_cls, **kw)


def ast_tiny(**kw):
    """Tiny tier for CI smoke tests and dry runs (not in the reference)."""
    return _arch(64, 2, 2, True, **kw)


def ast_small(**kw):
    return _arch(384, 12, 6, True, **kw)


def ast_base(**kw):
    return _arch(768, 12, 12, True, **kw)


def ast_large(**kw):
    return _arch(1024, 24, 16, True, **kw)


def frame_ast_tiny(**kw):
    """Tiny tier for CI smoke tests and dry runs (not in the reference)."""
    return _arch(64, 2, 2, False, **kw)


def frame_ast_small(**kw):
    return _arch(384, 12, 6, False, **kw)


def frame_ast_base(**kw):
    return _arch(768, 12, 12, False, **kw)


def frame_ast_large(**kw):
    return _arch(1024, 24, 16, False, **kw)
