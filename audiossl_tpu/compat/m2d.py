"""M2D (Masked Modeling Duo, the reference's "mmd" arch): flax port +
torch-checkpoint importer.

Third-party comparison encoder (reference ``downstream/
comparison_models/mmd_module.py`` over the vendored
``models/mmd_model.py`` + ``models/models_mae.py``). Inference path
being reproduced (mmd_module.py:17-39 with mask_ratio=0, i.e.
models_mae.py:543-573 forward_encoder without masking):

  wav -> nnAudio MelSpectrogram (n_fft 400, hop 160, 80 Slaney mels,
  50-8000 Hz, power 2, center/reflect) -> ln(x + eps)
  -> (x - (-8.6463)) / 2.6721                    [DataTransform]
  -> zero-pad time to a multiple of 208 frames, split into 208-frame
     units -> per unit: Conv2d 16x16/16 patch embed over [80, 208]
     (tokens FREQ-major: grid 5 x 13) -> + fixed 2-D sin-cos pos embed
     -> CLS -> 12 pre-LN ViT-base blocks -> LayerNorm -> drop CLS
     -> rearrange 'b (f t) d -> b t (f d)'  (embed 5*768 = 3840)
  -> concat units along time, drop the padded tail + 1 extra frame
     (the reference's exact ``-(pad_emb_frames + 1)`` slice,
     mmd_module.py:37)

The trunk is the shared :class:`audiossl_tpu.compat.vit.TimmViT`
(M2D's forward_encoder at mask 0 is exactly the timm/MAE encoder);
parity is in tests/test_m2d_parity.py.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.compat.vit import (
    TimmViT,
    ViTConfig,
    convert_timm_vit_state_dict,
)
from audiossl_tpu.ops.melspec import MelConfig, stft_conv

# reference mmd_module.DataTransform:106-109
M2D_NORM_STATS = (-8.6463, 2.6721)
M2D_MEL = MelConfig(n_fft=400, win_length=400, hop_length=160, n_mels=80,
                    f_min=50.0, f_max=8000.0, stft_precision="high")
M2D_UNIT_FRAMES = 208  # cfg.input_size[1] (mmd_model.py:24)


class M2DEncoder(nn.Module):
    """Normalized log-mels [B, 80, T] -> frame embeddings
    [B, T', n_freq_patches * embed_dim] (reference MMDModel.forward,
    mmd_module.py:17-39)."""
    vit: ViTConfig = ViTConfig(max_patches=5 * 13)
    unit_frames: int = M2D_UNIT_FRAMES

    @property
    def embed_dim(self):
        # freq patches stacked per time step (80 mels / 16 = 5)
        ut = self.unit_frames // self.vit.patch_size[1]
        return self.vit.embed_dim * (self.vit.max_patches // ut)

    @nn.compact
    def __call__(self, lms, deterministic: bool = True):
        U = self.unit_frames
        pt = self.vit.patch_size[1]  # time patch (16)
        B, F, T = lms.shape
        nf = F // self.vit.patch_size[0]  # freq patches (5)
        pad = (-T) % U
        if pad:
            lms = jnp.pad(lms, ((0, 0), (0, 0), (0, pad)))
        n_units = (T + pad) // U
        # fold units into the batch: one big MXU-friendly forward
        x = lms.reshape(B, F, n_units, U).transpose(0, 2, 1, 3)
        x = x.reshape(B * n_units, F, U)
        toks = TimmViT(self.vit, name="vit")(
            x, deterministic=deterministic)
        toks = toks[:, self.vit.num_prefix:]  # drop CLS
        ut = U // pt  # time steps per unit (13)
        D = self.vit.embed_dim
        # freq-major tokens (f*ut + t) -> [.., t, f*D]
        toks = toks.reshape(B, n_units, nf, ut, D)
        toks = toks.transpose(0, 1, 3, 2, 4).reshape(
            B, n_units * ut, nf * D)
        if pad:
            # reference removes int(ut * pad / U) padded frames PLUS one
            # (mmd_module.py:34-37)
            drop = int(ut * pad / U) + 1
            toks = toks[:, :-drop]
        return toks


def m2d_logmel(wav, stats=M2D_NORM_STATS):
    """[B, L] waveforms -> normalized log-mels [B, 80, T] (reference
    mmd_module.DataTransform: nnAudio Slaney mel, natural log,
    fixed stats)."""
    from audiossl_tpu.compat.byola import _slaney_filterbank

    stft = stft_conv(wav, M2D_MEL)  # [B, 2F, T]
    Fr = M2D_MEL.n_freqs
    power = stft[:, :Fr] ** 2 + stft[:, Fr:] ** 2
    fb = jnp.asarray(_slaney_filterbank(M2D_MEL))
    mel = jnp.einsum("bft,mf->bmt", power, fb)
    eps = float(np.finfo(np.float32).eps)
    mean, std = stats
    return (jnp.log(mel + eps) - mean) / (std + eps)


def convert_m2d_checkpoint(sd):
    """torch M2D ``checkpoint['model']`` -> flax params. Consumes the
    encoder trunk (timm naming); target/decoder/mask_token weights are
    dropped exactly like the reference's encoder use."""
    from audiossl_tpu.compat.vit import infer_depth

    return {"vit": convert_timm_vit_state_dict(sd, depth=infer_depth(sd))}


def load_m2d_checkpoint(path: str, input_size=(80, 208),
                        patch_size=(16, 16)):
    """Released M2D .pth -> (M2DEncoder, params). The reference parses
    input/patch size from the checkpoint's folder name
    (``m2d_vit_base-80x208p16x16-...``, mmd_model.py:41-47); we accept
    them as arguments with the same defaults and also try the parse."""
    import re
    from pathlib import Path

    import torch

    m = re.match(r".*-(\d+)x(\d+)p(\d+)x(\d+)",
                 Path(path).parent.name)
    if m:
        input_size = (int(m.group(1)), int(m.group(2)))
        patch_size = (int(m.group(3)), int(m.group(4)))
    from audiossl_tpu.compat.vit import heads_for_dim, infer_depth

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    params = convert_m2d_checkpoint(sd)
    D = params["vit"]["pos_embed"].shape[-1]
    gh, gw = (input_size[0] // patch_size[0],
              input_size[1] // patch_size[1])
    enc = M2DEncoder(
        ViTConfig(embed_dim=D, depth=infer_depth(sd),
                  num_heads=heads_for_dim(D), patch_size=patch_size,
                  max_patches=gh * gw),
        unit_frames=input_size[1])
    return enc, jax.tree.map(jnp.asarray, params)


@dataclasses.dataclass
class M2DAdapter:
    """M2D as a frame encoder for the SED drivers (reference
    mmd_module.py): 100 fps mel pooled by the 16-frame patch ->
    6.25 fps frames of dim 3840."""
    encoder: M2DEncoder
    params: dict
    frozen: bool = True

    @property
    def embed_dim(self):
        return self.encoder.embed_dim

    @property
    def frame_rate_divisor(self):
        return 16

    def token_count(self, n_samples: int) -> int:
        T = 1 + n_samples // 160  # center=True framing
        U = self.encoder.unit_frames
        ut = U // self.encoder.vit.patch_size[1]
        pad = (-T) % U
        n = (T + pad) // U * ut
        return n - (int(ut * pad / U) + 1) if pad else n

    def frame_embeddings(self, params, wav, valid, train=False,
                         rngs=None):
        lms = m2d_logmel(wav)
        return self.encoder.apply({"params": params}, lms,
                                  deterministic=not train)
