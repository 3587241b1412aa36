"""AudioMAE encoder family: flax port + torch-checkpoint importer.

Third-party comparison encoder (reference ``downstream/
comparison_models/audioMAE_module.py`` over the vendored Meta
``models/audioMAE_model.py``). Inference path being reproduced
(audioMAE_module.py:44-92):

  wav - mean(wav) -> kaldi fbank (128 mels, hanning, 10 ms shift)
  -> (fbank - norm_mean) / (2 * norm_std)
  -> Conv2d 16x16/16 patch embed over [T, 128] (tokens time-major,
     8 freq patches per 16-frame step)
  -> + fixed sin-cos pos embed (sliced [1:T+1] for short inputs)
  -> CLS + pos[0]
  -> 12 pre-LN ViT-base blocks -> drop CLS -> LayerNorm
  -> AvgPool1d(8, 8) over tokens == mean over the 8 freq patches
  -> frame embeddings [B, T//16, 768]

The trunk is the shared :class:`audiossl_tpu.compat.vit.TimmViT`;
parity vs the reference torch modules (under the tests/timm_stub.py
shim) is in tests/test_audiomae_parity.py.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiossl_tpu.compat.vit import (
    TimmViT,
    ViTConfig,
    convert_timm_vit_state_dict,
)

# reference audioMAE_module.py:13-18
AUDIOMAE_NORM_MEAN = -6.030435443767988
AUDIOMAE_NORM_STD = 4.102992546322562
# reference patch grid: img_size (1024, 128) / 16 -> 64 * 8 = 512
AUDIOMAE_MAX_PATCHES = 512


class AudioMAEEncoder(nn.Module):
    """Normalized fbank [B, T, 128] -> frame embeddings
    [B, T//16, 768] (reference AudioMAEModel.forward,
    audioMAE_module.py:44-62)."""
    vit: ViTConfig = ViTConfig(max_patches=AUDIOMAE_MAX_PATCHES)

    @property
    def embed_dim(self):
        return self.vit.embed_dim

    @nn.compact
    def __call__(self, fbank, deterministic: bool = True):
        pt, pf = self.vit.patch_size
        B, T, F = fbank.shape
        toks = TimmViT(self.vit, name="vit")(
            fbank, deterministic=deterministic)
        toks = toks[:, self.vit.num_prefix:]  # drop CLS (norm is
        # per-token linear, so norm-then-drop == drop-then-norm)
        nf = F // pf  # freq patches per time step (8)
        Bt, N, D = toks.shape
        return toks.reshape(B, N // nf, nf, D).mean(axis=2)


def audiomae_fbank(wav):
    """[B, L] waveforms -> normalized fbank [B, T, 128] (reference
    AudioMAEPredModule.transform, audioMAE_module.py:76-92: per-clip
    mean removal, kaldi hanning fbank, fixed normalization stats)."""
    from audiossl_tpu.compat.beats import kaldi_fbank

    wav = wav - wav.mean(axis=-1, keepdims=True)
    fb = kaldi_fbank(wav, num_mel_bins=128, window_type="hanning")
    return (fb - AUDIOMAE_NORM_MEAN) / (AUDIOMAE_NORM_STD * 2.0)


def convert_audiomae_checkpoint(sd):
    """torch ``checkpoint['model']`` (timm ViT naming) -> flax params.

    The reference drops classifier-head keys and loads the rest
    strict=False (audioMAE_module.py:36-41); only the encoder trunk is
    consumed here."""
    from audiossl_tpu.compat.vit import infer_depth

    return {"vit": convert_timm_vit_state_dict(sd, depth=infer_depth(sd))}


def load_audiomae_checkpoint(path: str):
    """Released AudioMAE .pth -> (AudioMAEEncoder, params)."""
    import torch

    from audiossl_tpu.compat.vit import heads_for_dim, infer_depth

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    params = convert_audiomae_checkpoint(sd)
    n_pos, D = params["vit"]["pos_embed"].shape
    enc = AudioMAEEncoder(
        ViTConfig(embed_dim=D, depth=infer_depth(sd),
                  num_heads=heads_for_dim(D), max_patches=n_pos - 1))
    return enc, jax.tree.map(jnp.asarray, params)


@dataclasses.dataclass
class AudioMAEAdapter:
    """AudioMAE as a frame encoder for the SED drivers (reference
    audioMAE_module.py): 100 fps fbank pooled by the 16-frame patch
    -> 6.25 fps frame embeddings of dim 768."""
    encoder: AudioMAEEncoder
    params: dict
    frozen: bool = True

    @property
    def embed_dim(self):
        return self.encoder.embed_dim

    @property
    def frame_rate_divisor(self):
        return 16  # fbank frames per output frame (patch_t)

    def token_count(self, n_samples: int) -> int:
        frames = 1 + (n_samples - 400) // 160  # kaldi snip_edges
        return frames // 16

    def frame_embeddings(self, params, wav, valid, train=False,
                         rngs=None):
        fb = audiomae_fbank(wav)
        return self.encoder.apply({"params": params}, fb,
                                  deterministic=not train)
