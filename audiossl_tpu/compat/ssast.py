"""SSAST encoder family (frame + patch variants): flax port +
torch-checkpoint importer.

Third-party comparison encoders (reference ``downstream/
comparison_models/{ssast,patch_ssast}_module.py`` over the vendored
``models/ssast.py``). Inference path being reproduced
(ssast_module.py:26-48, patch_ssast_module.py:22-45):

  wav - mean(wav) -> kaldi fbank (128 mels, hanning, 10 ms shift)
  -> (fbank - norm_mean) / (2 * norm_std)        [same stats as AudioMAE]
  -> [B, 1, 128(freq), T] Conv2d patch embed, kernel == stride ==
     (128, 2) frame variant / (16, 16) patch variant (tokens
     FREQ-major for the patch variant)
  -> CLS + DIST prefix (DeiT-distilled backbone) + trainable pos embed
  -> 12 pre-LN ViT blocks -> LayerNorm -> drop prefix
  -> the module's exact AvgPool quirks:
     frame: AvgPool2d((2,1), padding=(1,0)) over tokens — output row 0
       is HALF of token 0 (zero pad included in the mean), rows i>0 are
       mean(token[2i-1], token[2i])                  (ssast_module.py:24,47)
     patch: reshape [B, 8, T', D], AvgPool2d([8,1], padding=[1,0]) —
       ONE output row = sum(freq rows 0..6)/8 (row 7 never enters the
       window; zero pad row does)            (patch_ssast_module.py:20,40-44)

The checkpoint importer replicates ``ASTModel.__init__``'s
pretrain->finetune positional-embedding rebuild (ssast.py:190-202):
center-cut along time when the finetune grid is narrower than the
pretraining grid (the released-checkpoint case: 1024-frame pretrain,
998-frame DCASE finetune).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.compat.audiomae import audiomae_fbank
from audiossl_tpu.compat.vit import (
    TimmViT,
    ViTConfig,
    convert_timm_vit_state_dict,
)

# reference ssast_module.py:14-19 == audioMAE_module stats
ssast_fbank = audiomae_fbank


class SSASTEncoder(nn.Module):
    """Normalized fbank [B, T, 128] -> frame embeddings.

    ``variant='frame'``: patch (128, 2) -> [B, (T//2+1)//2, 768]
    ``variant='patch'``: patch (16, 16) -> [B, T//16, 768]
    """
    vit: ViTConfig = ViTConfig(patch_size=(128, 2), num_prefix=2,
                               max_patches=499)
    variant: str = "frame"

    @property
    def embed_dim(self):
        return self.vit.embed_dim

    @nn.compact
    def __call__(self, fbank, deterministic: bool = True):
        x = fbank.transpose(0, 2, 1)  # [B, 128, T] (freq as H)
        toks = TimmViT(self.vit, name="vit")(
            x, deterministic=deterministic)
        toks = toks[:, self.vit.num_prefix:]
        B, N, D = toks.shape
        if self.variant == "frame":
            # AvgPool2d((2,1), padding=(1,0)): zero row top and bottom
            # (count_include_pad), stride-2 pairs -> N//2 + 1 rows
            n_out = N // 2 + 1
            toks = jnp.pad(
                toks, ((0, 0), (1, 2 * n_out - (N + 1)), (0, 0)))
            return toks.reshape(B, n_out, 2, D).mean(axis=2)
        # patch: tokens freq-major [8, T']; AvgPool2d([8,1], pad [1,0])
        # emits one row covering (zero pad + freq rows 0..6) / 8
        nt = N // 8
        toks = toks.reshape(B, 8, nt, D)
        return toks[:, :7].sum(axis=1) / 8.0


def convert_ssast_checkpoint(sd, fshape=128, tshape=2,
                             input_fdim=128, input_tdim=998):
    """Reference SSL-pretraining checkpoint (DataParallel
    ``module.v.*`` keys, ssast.py:141-157) -> (flax params, ViTConfig).

    Replicates the finetune-stage pos-embed rebuild (ssast.py:190-202)
    in numpy: strip prefix tokens, reshape to the pretraining
    (p_f_dim, p_t_dim) grid, center-cut to the finetune grid (the
    interpolate branch for wider-than-pretrain inputs is out of the
    released checkpoints' envelope and unsupported here)."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}

    def item(key):
        t = sd[key]
        return int(t.item() if hasattr(t, "item") else t)

    p_input_fdim = item("p_input_fdim")
    p_input_tdim = item("p_input_tdim")
    p_f_dim = (p_input_fdim - fshape) // fshape + 1
    p_t_dim = (p_input_tdim - tshape) // tshape + 1
    f_dim = (input_fdim - fshape) // fshape + 1
    t_dim = (input_tdim - tshape) // tshape + 1
    if f_dim > p_f_dim or t_dim > p_t_dim:
        raise NotImplementedError(
            "finetune grid larger than pretraining grid needs the "
            "bilinear-interpolation branch (ssast.py:195)")

    from audiossl_tpu.compat.vit import heads_for_dim, infer_depth

    dist = "v.dist_token" in sd
    n_prefix = 2 if dist else 1
    depth = infer_depth(sd, prefix="v.")
    params = convert_timm_vit_state_dict(
        sd, depth=depth, prefix="v.", dist_token=dist)
    D = params["pos_embed"].shape[-1]
    pos = params["pos_embed"]  # [prefix + p_f*p_t, D]
    grid = pos[n_prefix:].reshape(p_f_dim, p_t_dim, D)
    t0 = p_t_dim // 2 - t_dim // 2
    f0 = p_f_dim // 2 - f_dim // 2
    grid = grid[f0: f0 + f_dim, t0: t0 + t_dim]
    params["pos_embed"] = np.concatenate(
        [pos[:n_prefix], grid.reshape(f_dim * t_dim, D)], axis=0)
    cfg = ViTConfig(embed_dim=D, depth=depth,
                    num_heads=heads_for_dim(D),
                    patch_size=(fshape, tshape), num_prefix=n_prefix,
                    max_patches=f_dim * t_dim,
                    # SSAST grids are freq-major (f_dim rows x t_dim
                    # time cols); inputs shorter than input_tdim must
                    # slice pos-embed per COLUMN, not leading-flat
                    pos_grid=(f_dim, t_dim))
    return params, cfg


def load_ssast_checkpoint(path: str, variant: str = "frame",
                          input_tdim: int = 998):
    """Released SSAST SSL checkpoint -> (SSASTEncoder, params).
    ``variant`` picks frame (128x2) or patch (16x16) shapes, the same
    way the two reference modules hard-code them
    (ssast_module.py:53-55, patch_ssast_module.py:50-52)."""
    import torch

    fshape, tshape = (128, 2) if variant == "frame" else (16, 16)
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    params, cfg = convert_ssast_checkpoint(
        sd, fshape=fshape, tshape=tshape, input_tdim=input_tdim)
    enc = SSASTEncoder(cfg, variant=variant)
    return enc, jax.tree.map(jnp.asarray, {"vit": params})


@dataclasses.dataclass
class SSASTAdapter:
    """SSAST as a frame encoder for the SED drivers: 100 fps fbank ->
    25 fps (frame variant, 768-d) or 6.25 fps (patch variant)."""
    encoder: SSASTEncoder
    params: dict
    frozen: bool = True

    @property
    def embed_dim(self):
        return self.encoder.embed_dim

    @property
    def frame_rate_divisor(self):
        return 4 if self.encoder.variant == "frame" else 16

    def token_count(self, n_samples: int) -> int:
        frames = 1 + (n_samples - 400) // 160
        if self.encoder.variant == "frame":
            # patch conv (128,2) stride 2 -> N tokens, then
            # AvgPool2d((2,1), padding=(1,0)) -> N//2 + 1 rows
            # (matches SSASTEncoder's n_out for BOTH parities of N;
            # (N+1)//2 was wrong for even N)
            n = (frames - 2) // 2 + 1
            return n // 2 + 1
        return ((frames - 16) // 16 + 1)

    def frame_embeddings(self, params, wav, valid, train=False,
                         rngs=None):
        fb = ssast_fbank(wav)
        return self.encoder.apply({"params": params}, fb,
                                  deterministic=not train)
