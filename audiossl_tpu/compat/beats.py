"""BEATs encoder family: flax port + torch-checkpoint importer.

Third-party comparison encoder (VERDICT r1 missing #2). The reference
vendors Microsoft's BEATs for its DCASE/AS-strong comparison tables
(reference ``downstream/comparison_models/beats_module.py:19-69`` and
``models/beats/{BEATs,backbone,modules}.py``). This module provides the
TPU-side equivalent:

* :class:`BEATsEncoder` — a flax re-implementation of the BEATs
  fairseq-style encoder (``models/beats/BEATs.py:74-180`` +
  ``backbone.py:26-686``): 16x16 patch conv on 128-bin kaldi fbanks,
  LayerNorm + 512->768 projection, grouped-conv positional embedding,
  12 post-LN blocks with DeepNorm residual scaling, and T5-style
  bucketed relative position bias (shared across layers) with GRU-style
  gating, including the reference's alpha=32 max-subtract softmax
  rescaling trick.
* :func:`convert_beats_state_dict` — torch ``state_dict`` -> flax
  params (weight-norm of the positional conv collapsed at load time).
* :func:`kaldi_fbank` — a jit-friendly port of
  ``torchaudio.compliance.kaldi.fbank`` with the reference's settings
  (``beats_module.py:45``: 128 mels, 25 ms / 10 ms, snip_edges,
  povey window, preemphasis 0.97, DC removal, natural-log mels).

Weight parity is tested against the reference torch backbone with
randomly initialized weights (tests/test_beats_parity.py); the fbank
port is validated analytically (torchaudio is absent in this
environment — documented there).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BEATsConfig:
    """Mirror of the reference BEATsConfig fields the encoder uses
    (reference models/beats/BEATs.py:25-72). Defaults = BEATs_iter3."""
    input_patch_size: int = 16
    embed_dim: int = 512
    conv_bias: bool = False
    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    layer_norm_first: bool = False
    deep_norm: bool = True
    conv_pos: int = 128
    conv_pos_groups: int = 16
    relative_position_embedding: bool = True
    num_buckets: int = 320
    max_distance: int = 800
    gru_rel_pos: bool = True

    @classmethod
    def from_checkpoint_cfg(cls, cfg: dict) -> "BEATsConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in cfg.items() if k in names})


def _relative_position_bucket(relative_positions, num_buckets, max_distance):
    """T5 bidirectional bucketing (reference backbone.py:393-418)."""
    num_buckets = num_buckets // 2
    buckets = (relative_positions > 0).astype(jnp.int32) * num_buckets
    rel = jnp.abs(relative_positions)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    large = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return buckets + jnp.where(is_small, rel, large)


class BEATsSelfAttention(nn.Module):
    """Fairseq MultiheadAttention with gated relative position bias
    (reference backbone.py:278-686). The bias table lives at the
    encoder level (shared across layers); each layer applies its own
    GRU gate."""
    cfg: BEATsConfig

    @nn.compact
    def __call__(self, x, position_bias, key_mask=None):
        c = self.cfg
        H = c.encoder_attention_heads
        D = c.encoder_embed_dim
        d = D // H
        B, T, _ = x.shape
        scaling = d ** -0.5
        alpha = 32.0
        q0 = nn.Dense(D, name="q_proj")(x)  # raw q (gate input)
        k = nn.Dense(D, name="k_proj")(x)
        v = nn.Dense(D, name="v_proj")(x)
        q = q0 * (scaling / alpha)

        def heads(t):
            return t.reshape(B, T, H, d).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        s = jnp.einsum("bhtd,bhsd->bhts", qh, kh)
        # alpha-rescaled max-subtract (reference backbone.py:624-625)
        s = (s - jax.lax.stop_gradient(s.max(axis=-1, keepdims=True))) \
            * alpha
        if key_mask is not None:
            s = s + key_mask[:, None, None, :]
        if position_bias is not None:
            bias = position_bias[None]  # [1, H, T, T]
            if c.gru_rel_pos:
                # gate from the un-scaled q (reference backbone.py:652-658)
                ql = heads(q0)  # q * scaling/alpha * alpha/scaling
                gates = nn.Dense(8, name="grep_linear")(ql)
                gates = jax.nn.sigmoid(
                    gates.reshape(B, H, T, 2, 4).sum(-1))
                gate_a, gate_b = gates[..., 0], gates[..., 1]
                grep_a = self.param(
                    "grep_a", nn.initializers.ones, (1, H, 1, 1))
                gate = gate_a * (gate_b * grep_a[..., 0] - 1.0) + 2.0
                bias = gate[..., None] * bias
            s = s + bias
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhts,bhsd->bhtd", p, vh)
        o = o.transpose(0, 2, 1, 3).reshape(B, T, D)
        return nn.Dense(D, name="out_proj")(o)


class BEATsLayer(nn.Module):
    """Post-LN (DeepNorm) transformer layer
    (reference backbone.py:152-281, else-branch of forward)."""
    cfg: BEATsConfig

    @nn.compact
    def __call__(self, x, position_bias, key_mask=None):
        c = self.cfg
        if c.deep_norm:
            dn_alpha = (2.0 * c.encoder_layers) ** 0.25
        else:
            dn_alpha = 1.0
        residual = x
        x = BEATsSelfAttention(c, name="self_attn")(
            x, position_bias, key_mask)
        if c.layer_norm_first:
            raise NotImplementedError(
                "released BEATs checkpoints are post-LN")
        x = residual * dn_alpha + x
        x = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")(x)
        residual = x
        x = nn.Dense(c.encoder_ffn_embed_dim, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(c.encoder_embed_dim, name="fc2")(x)
        x = residual * dn_alpha + x
        return nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)


class BEATsEncoder(nn.Module):
    """BEATs feature extractor: fbank [B, T, 128] -> tokens
    [B, (T//16)*8, encoder_embed_dim] (reference BEATs.extract_features,
    BEATs.py:138-180, without the kaldi front-end)."""
    cfg: BEATsConfig = BEATsConfig()

    @nn.compact
    def __call__(self, fbank, valid_frames=None):
        c = self.cfg
        P = c.input_patch_size
        B, T, F = fbank.shape
        x = fbank[..., None]  # [B, T, 128, 1]
        x = nn.Conv(c.embed_dim, (P, P), strides=(P, P),
                    use_bias=c.conv_bias, padding="VALID",
                    name="patch_embedding")(x)  # [B, T//16, 8, 512]
        Bt, Tt, Ft, _ = x.shape
        x = x.reshape(B, Tt * Ft, c.embed_dim)
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)
        if c.embed_dim != c.encoder_embed_dim:
            x = nn.Dense(c.encoder_embed_dim, name="post_extract_proj")(x)

        key_mask = None
        if valid_frames is not None:
            # tokens are time-major with Ft freq patches per time step
            vt = (valid_frames // P)[:, None]  # valid time patches [B,1]
            tpos = jnp.arange(Tt * Ft)[None, :] // Ft
            key_mask = jnp.where(tpos < vt, 0.0, -1e4).astype(jnp.float32)
            x = x * (key_mask[..., None] >= 0)

        # grouped-conv positional embedding with SamePad trim + GELU
        # (reference backbone.py:32-46,112-115)
        pos = nn.Conv(c.encoder_embed_dim, (c.conv_pos,),
                      feature_group_count=c.conv_pos_groups,
                      padding=[(c.conv_pos // 2, c.conv_pos // 2)],
                      name="pos_conv")(x)
        if c.conv_pos % 2 == 0:
            pos = pos[:, :-1]
        x = x + jax.nn.gelu(pos, approximate=False)
        if not c.layer_norm_first:
            x = nn.LayerNorm(epsilon=1e-5, name="encoder_layer_norm")(x)

        position_bias = None
        if c.relative_position_embedding:
            table = self.param(
                "relative_attention_bias", nn.initializers.normal(0.02),
                (c.num_buckets, c.encoder_attention_heads))
            N = x.shape[1]
            rel = jnp.arange(N)[None, :] - jnp.arange(N)[:, None]
            bucket = _relative_position_bucket(
                rel, c.num_buckets, c.max_distance)
            position_bias = table[bucket].transpose(2, 0, 1)  # [H, N, N]

        for i in range(c.encoder_layers):
            x = BEATsLayer(c, name=f"layers_{i}")(
                x, position_bias, key_mask)
        return x


# --------------------------- torch importer --------------------------- #

def convert_beats_state_dict(sd, cfg: BEATsConfig):
    """Reference torch ``BEATs.state_dict()`` -> flax params for
    :class:`BEATsEncoder`. Accepts either raw tensors or numpy arrays.

    Handles: Conv2d/Conv1d kernel transposition, Linear transposes,
    weight-norm collapse of pos_conv (g * v / ||v||, norm over
    (out, in) dims per tap — torch weight_norm(dim=2)), and the
    layer-0-shared relative_attention_bias."""
    def arr(key):
        t = sd[key]
        return np.asarray(getattr(t, "detach", lambda: t)().numpy()
                          if hasattr(t, "detach") else t, np.float32)

    p = {}
    # patch conv: torch [out, 1, kh, kw] -> flax [kh, kw, 1, out]
    p["patch_embedding"] = {
        "kernel": arr("patch_embedding.weight").transpose(2, 3, 1, 0)}
    if "patch_embedding.bias" in sd:
        p["patch_embedding"]["bias"] = arr("patch_embedding.bias")
    p["layer_norm"] = {"scale": arr("layer_norm.weight"),
                       "bias": arr("layer_norm.bias")}
    if "post_extract_proj.weight" in sd:
        p["post_extract_proj"] = {
            "kernel": arr("post_extract_proj.weight").T,
            "bias": arr("post_extract_proj.bias")}

    # pos_conv weight norm: v [out, in/groups, k], g with dim=2
    g = arr("encoder.pos_conv.0.weight_g")
    v = arr("encoder.pos_conv.0.weight_v")
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = g * v / np.maximum(norm, 1e-12)  # [out, in/groups, k]
    p["pos_conv"] = {"kernel": w.transpose(2, 1, 0),
                     "bias": arr("encoder.pos_conv.0.bias")}
    p["encoder_layer_norm"] = {
        "scale": arr("encoder.layer_norm.weight"),
        "bias": arr("encoder.layer_norm.bias")}
    if cfg.relative_position_embedding:
        p["relative_attention_bias"] = arr(
            "encoder.layers.0.self_attn.relative_attention_bias.weight")

    def linear(prefix):
        return {"kernel": arr(prefix + ".weight").T,
                "bias": arr(prefix + ".bias")}

    def ln(prefix):
        return {"scale": arr(prefix + ".weight"),
                "bias": arr(prefix + ".bias")}

    for i in range(cfg.encoder_layers):
        pre = f"encoder.layers.{i}"
        attn = {
            "q_proj": linear(f"{pre}.self_attn.q_proj"),
            "k_proj": linear(f"{pre}.self_attn.k_proj"),
            "v_proj": linear(f"{pre}.self_attn.v_proj"),
            "out_proj": linear(f"{pre}.self_attn.out_proj"),
        }
        if cfg.gru_rel_pos:
            attn["grep_linear"] = linear(f"{pre}.self_attn.grep_linear")
            attn["grep_a"] = arr(f"{pre}.self_attn.grep_a")
        p[f"layers_{i}"] = {
            "self_attn": attn,
            "self_attn_layer_norm": ln(f"{pre}.self_attn_layer_norm"),
            "fc1": linear(f"{pre}.fc1"),
            "fc2": linear(f"{pre}.fc2"),
            "final_layer_norm": ln(f"{pre}.final_layer_norm"),
        }
    return p


def load_beats_checkpoint(path: str):
    """Load a released BEATs checkpoint (torch .pt with {'cfg','model'})
    -> (BEATsEncoder, params). Reference beats_module.py:22-28."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    cfg = BEATsConfig.from_checkpoint_cfg(ckpt.get("cfg", {}))
    enc = BEATsEncoder(cfg)
    params = convert_beats_state_dict(ckpt["model"], cfg)
    return enc, jax.tree.map(jnp.asarray, params)


# --------------------------- kaldi fbank ------------------------------ #

# torchaudio.compliance.kaldi.fbank defaults used by the reference
# (beats_module.py:45): 25 ms povey windows every 10 ms, snip_edges,
# remove_dc_offset, preemphasis 0.97, 512-point FFT, kaldi mel scale
# 20 Hz..Nyquist, natural-log mel energies.
_KALDI_EPS = 1.1920928955078125e-07  # float eps, kaldi's log floor


def _kaldi_mel_banks(num_bins, n_fft, sr, low_freq=20.0, high_freq=0.0):
    nyq = sr / 2.0
    high = nyq + high_freq if high_freq <= 0 else high_freq

    def mel(f):
        return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)

    lo_m, hi_m = mel(low_freq), mel(high)
    centers = np.linspace(lo_m, hi_m, num_bins + 2)
    fft_freqs = np.arange(n_fft // 2 + 1) * (sr / n_fft)
    fft_mel = mel(fft_freqs)
    fb = np.zeros((num_bins, n_fft // 2 + 1), np.float32)
    for b in range(num_bins):
        left, c, right = centers[b], centers[b + 1], centers[b + 2]
        up = (fft_mel - left) / (c - left)
        down = (right - fft_mel) / (right - c)
        fb[b] = np.maximum(0.0, np.minimum(up, down))
    # kaldi excludes the DC and Nyquist bins from the triangles
    fb[:, 0] = 0.0
    return fb


def kaldi_fbank(wav, num_mel_bins=128, sr=16000, frame_length_ms=25.0,
                frame_shift_ms=10.0, preemphasis=0.97,
                window_type="povey"):
    """Kaldi-compatible log-mel fbank of [B, L] waveforms -> [B, T, M].

    Matches ta_kaldi.fbank(waveform, num_mel_bins=..., ...) semantics:
    snip_edges framing, per-frame DC removal, preemphasis with
    replicated first sample, povey/hanning window, power spectrum on a
    512-point FFT, kaldi mel filters, ln(max(e, eps)). The caller is
    responsible for the reference's 2**15 scaling and normalization
    (beats_module.py:44-47). ``window_type='hanning'`` matches the
    reference SSAST/AudioMAE transforms (ssast_module.py:73)."""
    wav = jnp.asarray(wav, jnp.float32)
    B, L = wav.shape
    win = int(sr * frame_length_ms / 1000.0)  # 400
    hop = int(sr * frame_shift_ms / 1000.0)   # 160
    n_fft = 1 << (win - 1).bit_length()       # 512
    T = 1 + (L - win) // hop                  # snip_edges
    idx = jnp.arange(T)[:, None] * hop + jnp.arange(win)[None, :]
    frames = wav[:, idx.reshape(-1)].reshape(B, T, win)
    frames = frames - frames.mean(axis=-1, keepdims=True)  # DC offset
    prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - preemphasis * prev
    n = np.arange(win, dtype=np.float64)
    hanning = 0.5 - 0.5 * np.cos(2 * np.pi * n / (win - 1))
    if window_type == "povey":
        window = hanning ** 0.85
    elif window_type == "hanning":
        window = hanning
    else:
        raise ValueError(f"unsupported window_type {window_type!r}")
    frames = frames * jnp.asarray(window, jnp.float32)
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, n_fft - win)))
    spec = jnp.fft.rfft(frames, n=n_fft)
    power = jnp.abs(spec) ** 2
    fb = jnp.asarray(_kaldi_mel_banks(num_mel_bins, n_fft, sr))
    mel = jnp.einsum("btf,mf->btm", power.astype(jnp.float32), fb)
    return jnp.log(jnp.maximum(mel, _KALDI_EPS))
