"""BYOL-A encoder family: flax port + torch-checkpoint importer.

Second third-party comparison family (after BEATs). The reference
vendors NTT's BYOL-A v2 CNN for its DCASE/AS-strong comparisons
(reference ``downstream/comparison_models/byola_module.py:12-44`` and
``models/byola.py:60-110``):

* :class:`AudioNTT2022Encoder` — conv(3x3)+BN+ReLU+maxpool(2) x2 over
  [B, 1, mels, T] log-mels, flatten (ch x mel/4) per time step, a
  2048-hidden MLP head, and the "stack" concat of conv features with
  MLP features -> [B, T/4, 3072].
* :func:`convert_byola_state_dict` — torch ``state_dict`` -> flax
  params + BN running stats (the reference's load_pretrained_weights
  accepts raw/`state_dict`/`model`-wrapped checkpoints; so does
  :func:`load_byola_checkpoint`).
* :func:`byola_logmel` — the nnAudio front-end equivalent: power mel
  with a **Slaney** (librosa-default) filterbank over the same
  1024/160/64 grid as the framework's mel, natural log, and the
  reference's PrecomputedNorm stats (byola_module.py:72-73).

Forward parity is tested against the reference torch encoder
(randomly initialized) in tests/test_byola_parity.py. BatchNorm runs
on the checkpoint's running statistics (inference semantics) in both
freeze and finetune drivers — the reference updates them during
finetuning; documented divergence.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.ops.melspec import MelConfig, stft_conv

BYOLA_NORM_STATS = (-6.596029, 3.5494373)  # byola_module.py:72


class AudioNTT2022Encoder(nn.Module):
    """reference models/byola.py:60-95 (stack=True variant)."""
    n_mels: int = 64
    d: int = 3072
    base_d: int = 64
    mlp_hidden_d: int = 2048
    conv_layers: int = 2

    @nn.compact
    def __call__(self, lms):
        """lms: [B, mels, T] normalized log-mels -> [B, T//4, d]."""
        x = lms[..., None]  # [B, mels, T, 1] (flax NHWC: H=mel, W=time)
        for i in range(self.conv_layers):
            x = nn.Conv(self.base_d, (3, 3), padding=1,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # torch permutes (B, ch, mel, time) -> (B, time, mel, ch) and
        # flattens mel-major (index m*C + c); the flax [B, mel, time,
        # ch] layout flattens to the same order after (0, 2, 1, 3)
        B, M, T, C = x.shape
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B, T, M * C)
        h = nn.Dense(self.mlp_hidden_d, name="fc0")(x)
        h = nn.relu(h)
        h = nn.Dense(self.d - M * C, name="fc1")(h)
        h = nn.relu(h)
        return jnp.concatenate([x, h], axis=-1)  # stack=True


def byola_logmel(wav, cfg: MelConfig = MelConfig(stft_precision="high"),
                 stats=BYOLA_NORM_STATS):
    """[B, L] waveforms -> normalized log-mels [B, mels, T]
    (nnAudio MelSpectrogram power=2 with librosa's Slaney filterbank +
    ln + PrecomputedNorm; byola_module.DataTransform)."""
    stft = stft_conv(wav, cfg)  # [B, 2F, T]
    F = cfg.n_freqs
    power = stft[:, :F] ** 2 + stft[:, F:] ** 2
    fb = jnp.asarray(_slaney_filterbank(cfg))
    mel = jnp.einsum("bft,mf->bmt", power, fb)
    eps = float(np.finfo(np.float32).eps)
    logmel = jnp.log(mel + eps)
    mean, std = stats
    return (logmel - mean) / std


def _slaney_filterbank(cfg: MelConfig) -> np.ndarray:
    """librosa.filters.mel defaults (htk=False, norm='slaney')
    -> [n_mels, n_freqs]."""
    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        f_sp = 200.0 / 3
        mel = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(f >= min_log_hz,
                        min_log_mel + np.log(f / min_log_hz) / logstep,
                        mel)

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f_sp = 200.0 / 3
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(m >= min_log_mel,
                        min_log_hz * np.exp(logstep * (m - min_log_mel)),
                        f_sp * m)

    n_freqs = cfg.n_freqs
    fft_freqs = np.arange(n_freqs) * (cfg.sample_rate / cfg.n_fft)
    mels = np.linspace(hz_to_mel(cfg.f_min), hz_to_mel(cfg.f_max),
                       cfg.n_mels + 2)
    hz = mel_to_hz(mels)
    fb = np.zeros((cfg.n_mels, n_freqs), np.float64)
    fdiff = np.diff(hz)
    ramps = hz[:, None] - fft_freqs[None, :]
    for i in range(cfg.n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        fb[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (hz[2:cfg.n_mels + 2] - hz[:cfg.n_mels])
    fb *= enorm[:, None]
    return fb.astype(np.float32)


def convert_byola_state_dict(sd):
    """Reference torch AudioNTT2022Encoder ``state_dict`` -> flax
    (params, batch_stats). Sequential indices: features.{0,4} convs,
    features.{1,5} BNs, fc.{0,3} linears (models/byola.py:63-88)."""
    def arr(key):
        t = sd[key]
        return np.asarray(getattr(t, "detach", lambda: t)().numpy()
                          if hasattr(t, "detach") else t, np.float32)

    params, stats = {}, {}
    for i, (ci, bi) in enumerate(((0, 1), (4, 5))):
        params[f"conv{i}"] = {
            "kernel": arr(f"features.{ci}.weight").transpose(2, 3, 1, 0),
            "bias": arr(f"features.{ci}.bias")}
        params[f"bn{i}"] = {"scale": arr(f"features.{bi}.weight"),
                            "bias": arr(f"features.{bi}.bias")}
        stats[f"bn{i}"] = {"mean": arr(f"features.{bi}.running_mean"),
                           "var": arr(f"features.{bi}.running_var")}
    for j, fi in ((0, 0), (1, 3)):
        params[f"fc{j}"] = {"kernel": arr(f"fc.{fi}.weight").T,
                            "bias": arr(f"fc.{fi}.bias")}
    return params, stats


def load_byola_checkpoint(path: str, n_mels: int = 64, d: int = 3072):
    """Released BYOL-A .pth -> (encoder, variables). Unwraps
    'state_dict'/'model' and strips module prefixes like the
    reference's load_pretrained_weights (models/byola.py:15-49)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    if "model" in sd:
        sd = sd["model"]
    sd = {k.split("model.", 1)[-1] if k.startswith("model.") else k: v
          for k, v in sd.items()}
    enc = AudioNTT2022Encoder(n_mels=n_mels, d=d)
    params, stats = convert_byola_state_dict(sd)
    variables = {"params": jax.tree.map(jnp.asarray, params),
                 "batch_stats": jax.tree.map(jnp.asarray, stats)}
    return enc, variables
