"""On-device data augmentation (TPU-native).

The reference runs all augmentation per-sample on CPU inside DataLoader
workers (reference ``audiossl/transforms/common.py``, ``byol_a.py``,
per-method ``transform.py``). Here every augmentation is a batched,
jit-compatible function of explicit PRNG keys with static shapes, so the
whole chain (crop -> mel -> mixup -> freq-warp) fuses into the training
step and runs at HBM bandwidth on the device.

Semantic equivalences (documented departures, see SURVEY.md §7.4):

* ``Mixup`` — the reference mixes with a random item from a worker-local
  2000-item FIFO memory bank of *past* samples (``byol_a.py:85-117``).
  On device we mix with a random *other item of the current global
  batch* (a random derangement-ish permutation). Distributionally both
  mix with "a random recent sample of the dataset"; the in-batch form is
  stateless and SPMD-friendly.
* ``RandomResizeCrop`` — exact semantics of ``byol_a.py:7-57`` (virtual
  canvas, random box, bicubic resize back, align_corners=True),
  vectorized over the batch with traced box parameters.
* ``RandomCrop`` — ``common.py``: random start if longer than target,
  zero-pad (centered=False: right pad) if shorter.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from audiossl_tpu.ops.interpolate import (sample_bicubic_2d,
                                          sample_bicubic_rows)

_EPS32 = float(jnp.finfo(jnp.float32).eps)


# --------------------------------------------------------------------- #
# waveform-level
# --------------------------------------------------------------------- #
def wav_to_f32(wav):
    """Device-side waveform dequantization: int16 batches (the packed
    store's native sample dtype — datasets/pipeline.py ``wav_dtype``)
    -> float32 in [-1, 1) with the exact /32768 scale the host reader
    uses, so the f32 values are bitwise-identical to the float path.
    Halves host->device transfer for the loader-fed train loops.
    float inputs pass through unchanged."""
    if wav.dtype == jnp.int16:
        return wav.astype(jnp.float32) * (1.0 / 32768.0)
    return wav.astype(jnp.float32) if wav.dtype != jnp.float32 else wav


def sample_crop_lengths(key, batch: int, min_s: float, max_s: float,
                        sr: int = 16000):
    """Per-sample crop lengths in samples, uniform in [min_s, max_s]
    seconds (reference samples one float length per __call__)."""
    if min_s == max_s:
        return jnp.full((batch,), int(min_s * sr), jnp.int32)
    u = jax.random.uniform(key, (batch,), minval=min_s, maxval=max_s)
    return (u * sr).astype(jnp.int32)


def random_crop_wav(key, wav: jnp.ndarray, valid: jnp.ndarray,
                    crop_len: jnp.ndarray, out_len: int):
    """Batched random crop of padded waveforms.

    wav: [B, L] zero-padded; valid: [B] valid sample counts;
    crop_len: [B] desired crop lengths (<= out_len);
    out_len: static output width.

    Returns (crops [B, out_len], out_valid [B]). Matches reference
    RandomCrop semantics: random start when the clip is longer than the
    crop; when shorter, the whole clip is kept (zero right-pad) and the
    valid length is the clip length.
    """
    B, L = wav.shape
    crop_len = jnp.minimum(crop_len, out_len)
    out_valid = jnp.minimum(crop_len, valid)
    if out_len == L:
        # buffer width == crop width: the only feasible start is 0 —
        # skip the per-sample gather entirely (the common frame-method
        # case: 10 s anchors over 10 s buffers)
        pos = jnp.arange(out_len)[None, :]
        crops = jnp.where(pos < out_valid[:, None], wav, 0.0)
        return crops, out_valid
    max_start = jnp.maximum(valid - crop_len, 0)
    u = jax.random.uniform(key, (B,))
    start = (u * (max_start + 1).astype(jnp.float32)).astype(jnp.int32)
    start = jnp.minimum(start, max_start)

    def take(w, s):
        return jax.lax.dynamic_slice(w, (s,), (out_len,))

    # guard: dynamic_slice clamps automatically, but keep start in range
    start = jnp.clip(start, 0, jnp.maximum(L - out_len, 0))
    crops = jax.vmap(take)(wav, start)
    # zero out anything past the crop's own valid region
    pos = jnp.arange(out_len)[None, :]
    crops = jnp.where(pos < out_valid[:, None], crops, 0.0)
    return crops, out_valid


def gaussian_noise(key, wav, snr_range=(5.0, 20.0)):
    """Additive Gaussian noise at a random SNR (reference
    transforms/common.py GaussianNoise)."""
    k1, k2 = jax.random.split(key)
    B = wav.shape[0]
    snr = jax.random.uniform(k1, (B, 1), minval=snr_range[0],
                             maxval=snr_range[1])
    sig_pow = jnp.mean(wav ** 2, axis=-1, keepdims=True)
    noise_pow = sig_pow / (10.0 ** (snr / 10.0))
    noise = jax.random.normal(k2, wav.shape) * jnp.sqrt(noise_pow)
    return wav + noise


def normalize(x, mean, std):
    return (x - mean) / std


def min_max(x, lo, hi):
    return (x - lo) / (hi - lo) * 2.0 - 1.0


def pad_to_size(wav, size: int, centered: bool = False):
    """Zero-pad the last axis to `size` (reference common.py PadToSize);
    longer inputs are cropped (left-aligned, or centered)."""
    n = wav.shape[-1]
    if n >= size:
        if centered:
            s = (n - size) // 2
            return wav[..., s: s + size]
        return wav[..., :size]
    pad = size - n
    if centered:
        return jnp.pad(wav, [(0, 0)] * (wav.ndim - 1)
                       + [(pad // 2, pad - pad // 2)])
    return jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, pad)])


def to_size_n(wav, n: int):
    """Pad/crop to the nearest multiple of n above the current length
    (reference common.py ToSizeN)."""
    size = ((wav.shape[-1] + n - 1) // n) * n
    return pad_to_size(wav, size)


# --------------------------------------------------------------------- #
# spectrogram-level
# --------------------------------------------------------------------- #
def mixup_log(key, spec: jnp.ndarray, ratio: float = 0.4,
              valid_frames=None):
    """BYOL-A style log-mixup-exp, in-batch (reference byol_a.py:85-117).

    spec: [B, F, T] log-domain (MinMax-normalized) spectrograms.
    mixed = log((1-a)*exp(x) + a*exp(z) + eps), a = ratio*U(0,1) per
    sample, z a random OTHER batch item drawn independently per sample
    (the reference draws z uniformly from a worker-local 2000-item FIFO
    of previous inputs; with shuffled batches both partner marginals
    are uniform over the dataset and never the sample itself —
    equivalence measured in tests/test_mixup_equivalence.py, numbers
    in PARITY.md). When ``valid_frames`` is given, padded frames of x
    are left untouched (the reference mixes exact-length crops before
    padding)."""
    B = spec.shape[0]
    k1, k2 = jax.random.split(key)
    a = ratio * jax.random.uniform(k1, (B, 1, 1))
    # independent random partner per sample: index offset in [1, B-1]
    # (a gather of B rows — free next to the mel/encoder work)
    shift = jax.random.randint(k2, (B,), 1, max(B, 2))
    z = spec[(jnp.arange(B) + shift) % B]
    mixed = jnp.log((1.0 - a) * jnp.exp(spec) + a * jnp.exp(z) + _EPS32)
    if valid_frames is not None:
        pos = jnp.arange(spec.shape[-1])[None, None, :]
        keep = pos < valid_frames[:, None, None]
        mixed = jnp.where(keep, mixed, spec)
    return mixed


def mix_gaussian_noise(key, spec, ratio: float = 0.3):
    """MixGaussianNoise (reference byol_a.py:120-142): interpolate the
    exp-domain spectrogram with exp(N(0, lambda)) noise."""
    k1, k2 = jax.random.split(key)
    B = spec.shape[0]
    lam = ratio * jax.random.uniform(k1, (B, 1, 1))
    z = jnp.exp(jax.random.normal(k2, spec.shape) * lam)
    x = jnp.exp(spec)
    return jnp.log((1.0 - lam) * x + z + _EPS32)


def random_resize_crop(key, spec: jnp.ndarray,
                       virtual_crop_scale=(1.0, 1.5),
                       freq_scale=(0.6, 1.5),
                       time_scale=(0.6, 1.5),
                       valid_frames=None):
    """The BYOL-A "freq warp" (reference byol_a.py:7-57), batched.

    Per sample: place the [F, W] spectrogram (W = valid width) at the
    center of a zero canvas of size (F*vc_f, W*vc_t), pick a random box
    (h ~ U(freq_scale)*F, w ~ U(time_scale)*W, uniform position) and
    bicubic-resize the box back to (F, W) with align_corners=True.

    The reference runs this on exact-length crops; here crops arrive
    zero-padded to a static T with ``valid_frames`` counts, and all the
    canvas/box arithmetic is done per sample in the valid width W so the
    semantics match the reference exactly (padding stays zero). The
    physical canvas is the static worst case [F*vc_f, T*vc_t]; boxes are
    confined to the per-sample virtual width so out-of-range taps never
    occur. With time_scale=(1,1) and vc_t=1 the time mapping is the
    identity (the frame method's pure freq-warp path).
    """
    B, F, T = spec.shape
    CH = int(F * virtual_crop_scale[0])
    CW = int(T * virtual_crop_scale[1])
    # pure freq-warp (the ATST-Frame recipe: vc=(1,1), time_scale=(1,1)):
    # the canvas placement and the whole time pass of the separable
    # bicubic are exact identities (fractional x offsets are 0, so the
    # W-pass weights are (0,1,0,0)) — skip both, sample freq rows only
    time_identity = (virtual_crop_scale == (1.0, 1.0)
                     and tuple(time_scale) == (1.0, 1.0))
    if valid_frames is None:
        W = jnp.full((B,), T, jnp.int32)
    else:
        W = jnp.clip(jnp.asarray(valid_frames, jnp.int32), 1, T)
    # per-sample virtual canvas extent and centered placement offset
    CWv = jnp.maximum((W.astype(jnp.float32)
                       * virtual_crop_scale[1]).astype(jnp.int32), W)
    y0 = (CH - F) // 2
    x0 = (CWv - W) // 2  # [B]

    if time_identity:
        canvas = spec
    else:
        canvas = jnp.zeros((B, CH, CW), spec.dtype)

        def place(c, s, xo):
            return jax.lax.dynamic_update_slice(c, s, (y0, xo))

        canvas = jax.vmap(place)(canvas, spec, x0)

    k1, k2, k3, k4 = jax.random.split(key, 4)
    h = jnp.clip((jax.random.uniform(k1, (B,), minval=freq_scale[0],
                                     maxval=freq_scale[1]) * F)
                 .astype(jnp.int32), 1, CH)
    w = jnp.clip((jax.random.uniform(k2, (B,), minval=time_scale[0],
                                     maxval=time_scale[1])
                  * W.astype(jnp.float32)).astype(jnp.int32), 1, CWv)
    iy = (jax.random.uniform(k3, (B,)) * (CH - h + 1).astype(jnp.float32)
          ).astype(jnp.int32)
    ix = (jax.random.uniform(k4, (B,)) * (CWv - w + 1).astype(jnp.float32)
          ).astype(jnp.int32)

    # align_corners=True grids: output j -> box coord lo + j*(sz-1)/(out-1)
    jF = jnp.arange(F, dtype=jnp.float32)[None, :]
    ys = iy[:, None].astype(jnp.float32) + jF * (
        (h.astype(jnp.float32) - 1.0) / max(F - 1, 1))[:, None]
    if time_identity:
        out = sample_bicubic_rows(canvas, ys, y_lo=iy, y_hi=iy + h - 1)
    else:
        jT = jnp.arange(T, dtype=jnp.float32)[None, :]
        xs = ix[:, None].astype(jnp.float32) + jT * (
            (w.astype(jnp.float32) - 1.0)
            / jnp.maximum(W.astype(jnp.float32) - 1.0, 1.0))[:, None]
        out = sample_bicubic_2d(
            canvas, ys, xs,
            y_lo=iy, y_hi=iy + h - 1, x_lo=ix, x_hi=ix + w - 1)
    pos = jnp.arange(T)[None, None, :]
    return jnp.where(pos < W[:, None, None], out, 0.0)


def freq_mask(key, spec, max_width: int, num_masks: int = 1):
    """torchaudio FrequencyMasking semantics: one band [f0, f0+f),
    f ~ U[0, max_width), zeroed (value=0)."""
    B, F, T = spec.shape
    keys = jax.random.split(key, num_masks)
    for k in keys:
        k1, k2 = jax.random.split(k)
        f = jax.random.randint(k1, (B, 1), 0, max_width)
        f0 = (jax.random.uniform(k2, (B, 1))
              * (F - f + 1).astype(jnp.float32)).astype(jnp.int32)
        pos = jnp.arange(F)[None, :]
        band = (pos >= f0) & (pos < f0 + f)
        spec = jnp.where(band[:, :, None], 0.0, spec)
    return spec


def time_mask(key, spec, max_width: int, num_masks: int = 1,
              valid_frames=None):
    """torchaudio TimeMasking semantics on the last axis."""
    B, F, T = spec.shape
    keys = jax.random.split(key, num_masks)
    for k in keys:
        k1, k2 = jax.random.split(k)
        t = jax.random.randint(k1, (B, 1), 0, max_width)
        hi = jnp.full((B, 1), T, jnp.int32) if valid_frames is None else \
            jnp.asarray(valid_frames, jnp.int32).reshape(B, 1)
        t0 = (jax.random.uniform(k2, (B, 1))
              * jnp.maximum(hi - t + 1, 1).astype(jnp.float32)).astype(jnp.int32)
        pos = jnp.arange(T)[None, :]
        band = (pos >= t0) & (pos < t0 + t)
        spec = jnp.where(band[:, None, :], 0.0, spec)
    return spec
