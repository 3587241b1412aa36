"""On-device log-mel spectrogram front end (TPU-native).

Reproduces the reference front end — torchaudio ``MelSpectrogram`` +
``AmplitudeToDB(stype="power", top_db=80)`` + ``MinMax(-79.6482, 50.6842)``
as configured at ``/root/reference/audiossl/methods/atst/transform.py:14-18``
— as pure JAX ops that run batched on TPU instead of per-sample on CPU
DataLoader workers.

Semantics matched (verified by golden tests in tests/test_melspec.py):

* STFT: ``center=True``, reflect padding, periodic Hann window,
  ``n_fft == win_length``, ``power=2.0``, not normalized, one-sided.
* Mel filterbank: HTK mel scale, no norm (torchaudio defaults).
* ``AmplitudeToDB``: ``10*log10(clamp(x, 1e-10))`` then clamp to
  ``per-sample max - top_db`` (torchaudio computes the max per batch item
  over channel/freq/time).
* MinMax: ``(x - min)/(max - min)*2 - 1``.

Variable lengths: the reference crops the waveform *first* and runs the
mel transform on the exact-length signal, then zero-pads the spectrogram
(`methods/atst/transform.py:60-73`). On TPU we keep static shapes: the
waveform arrives zero-padded to a static size together with its valid
sample count, and this module reproduces the reference values inside the
valid region by applying the reflect padding *at the dynamic boundary*
via index arithmetic (see ``_reflect_index``). Frames past the valid
region are garbage and must be masked downstream (the models do, via
their length masks).
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# MinMax constants of the reference recipe (provenance: computed over the
# AudioSet train mel statistics, reference methods/atstframe/calculate_min_max.py).
MEL_MIN = -79.6482
MEL_MAX = 50.6842


@dataclasses.dataclass(frozen=True)
class MelConfig:
    sample_rate: int = 16000
    n_fft: int = 1024
    win_length: int = 1024
    hop_length: int = 160
    n_mels: int = 64
    f_min: float = 60.0
    f_max: float = 7800.0
    top_db: float = 80.0
    amin: float = 1e-10
    mel_min: float = MEL_MIN
    mel_max: float = MEL_MAX
    # STFT conv precision: "high" (3-pass bf16, ~4e-4 end-to-end error,
    # the 1e-3 parity setting) or "default" (1-pass bf16, ~2e-3 error —
    # fine for the training path where augmentation noise dominates)
    stft_precision: str = "high"

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    def num_frames(self, num_samples: int) -> int:
        # torch.stft with center=True: 1 + L // hop
        return 1 + num_samples // self.hop_length


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (torch.hann_window(periodic=True))."""
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * n / win_length))


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def _mel_filterbank_np(
    n_freqs: int, f_min: float, f_max: float, n_mels: int, sample_rate: int
) -> np.ndarray:
    """HTK-scale triangular mel filterbank, shape [n_freqs, n_mels].

    Standard triangular construction on the HTK mel scale with no
    normalization (torchaudio ``melscale_fbanks`` defaults:
    ``mel_scale="htk"``, ``norm=None``).
    """
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_min = _hz_to_mel_htk(f_min)
    m_max = _hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)  # [n_mels + 2]
    f_diff = f_pts[1:] - f_pts[:-1]  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def mel_filterbank(cfg: MelConfig) -> jnp.ndarray:
    return jnp.asarray(
        _mel_filterbank_np(cfg.n_freqs, cfg.f_min, cfg.f_max, cfg.n_mels, cfg.sample_rate)
    )


def _reflect_index(j: jnp.ndarray, length) -> jnp.ndarray:
    """Map possibly-out-of-range sample indices to in-range ones using
    reflect padding at a (possibly dynamic) boundary ``length``.

    torch reflect semantics: index -k maps to k; index length-1+k maps to
    length-1-k. A single reflection suffices because pad (n_fft//2) is
    smaller than any real clip length.
    """
    j = jnp.abs(j)
    j = jnp.where(j >= length, 2 * length - 2 - j, j)
    return jnp.clip(j, 0, length - 1)


def _frame_signal(wav: jnp.ndarray, length, cfg: MelConfig) -> jnp.ndarray:
    """Slice a padded waveform [B, L] into centered STFT frames.

    Returns [B, T, win_length] with T = 1 + L // hop. Reflect padding at
    both the static left edge and the dynamic per-sample right boundary.
    """
    B, L = wav.shape
    T = cfg.num_frames(L)
    pad = cfg.n_fft // 2
    starts = jnp.arange(T, dtype=jnp.int32) * cfg.hop_length - pad  # [T]
    offs = jnp.arange(cfg.win_length, dtype=jnp.int32)  # [win]
    idx = starts[:, None] + offs[None, :]  # [T, win]
    if length is None:
        j = _reflect_index(idx, L)  # [T, win]
        return wav[:, j]
    length = jnp.asarray(length, dtype=jnp.int32).reshape(B, 1, 1)
    j = _reflect_index(idx[None, :, :], length)  # [B, T, win]
    return jnp.take_along_axis(wav[:, None, :], j.reshape(B, -1)[:, None, :], axis=-1).reshape(
        B, T, cfg.win_length
    )


def power_spectrogram_exact(
    wav: jnp.ndarray, length=None, cfg: MelConfig = MelConfig()
) -> jnp.ndarray:
    """Power spectrogram |STFT|^2, [B, T, n_freqs] — gather-based exact
    framing (reference semantics). Kept as the golden reference for the
    fast conv path below and for tiny-batch host-side use; the gather
    materializes [B, T, win] and is slow on TPU."""
    frames = _frame_signal(wav.astype(jnp.float32), length, cfg)
    frames = frames * hann_window(cfg.win_length)
    spec = jnp.fft.rfft(frames, n=cfg.n_fft, axis=-1)
    return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2


@functools.lru_cache(maxsize=4)
def _dft_filters_np(n_fft: int, win_length: int) -> np.ndarray:
    """Hann-windowed real-DFT analysis filters [2*n_freqs, win_length]:
    rows 0..F-1 = cos (real part), rows F..2F-1 = -sin (imag part)."""
    n = np.arange(win_length)[None, :]
    k = np.arange(n_fft // 2 + 1)[:, None]
    ang = 2.0 * np.pi * k * n / n_fft
    hann = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win_length)
                               / win_length))
    cos = np.cos(ang) * hann[None, :]
    sin = -np.sin(ang) * hann[None, :]
    return np.concatenate([cos, sin], 0).astype(np.float32)


def stft_conv(wav: jnp.ndarray, cfg: MelConfig = MelConfig(),
              pad_frames_to: Optional[int] = None) -> jnp.ndarray:
    """Real/imag STFT [B, 2F, T] as ONE strided convolution with
    Hann-windowed DFT filters (im2col+matmul on the MXU) over a
    statically reflect-padded buffer — ~50 GFLOP for a 48x10 s batch
    instead of a ~200 MB random gather. Rows 0..F-1 are the real part,
    rows F..2F-1 the imaginary part.

    ``pad_frames_to`` (>= T) emits that many frames directly — the
    extra frames are GARBAGE that callers must slice off or mask
    (frames just past T still overlap the right reflect tail, so they
    carry nonzero power; only frames far enough into the zero
    extension are zero). Both in-tree callers slice [:T]. Padding
    the frame COUNT before the matmul costs +(Tp-T)/T flops; padding
    the [B, 2F, T] f32 OUTPUT afterwards (what the Pallas postprocess
    kernel otherwise forces) costs a full-tensor HBM round trip
    (measured 1.2 ms for a 96x10 s batch)."""
    wav = wav.astype(jnp.float32)
    B, L = wav.shape
    pad = cfg.n_fft // 2
    hop = cfg.hop_length
    win = cfg.win_length
    T = cfg.num_frames(L)
    To = T if pad_frames_to is None else max(pad_frames_to, T)
    nh = win // hop + 1
    # zero extension sized so every emitted frame (and every
    # hop-decomposed slice below) stays in bounds
    zeros_len = max(win, (To - 1) * hop + win - 2 * pad - L,
                    (To + nh - 1) * hop - 2 * pad - L)
    # static reflect at both edges (exact for full-length samples; frames
    # near a shorter sample's dynamic boundary are patched by callers)
    left = wav[:, 1: pad + 1][:, ::-1]
    right = wav[:, L - pad - 1: L - 1][:, ::-1]
    wavp = jnp.concatenate(
        [left, wav, right, jnp.zeros((B, zeros_len), wav.dtype)],
        axis=1)
    filt = jnp.asarray(_dft_filters_np(cfg.n_fft, cfg.win_length))
    if cfg.stft_precision == "default":
        # training-precision fast path: hop-decomposed framing (pure
        # reshapes/slices, no im2col gather) + ONE [B*T, win] x
        # [win, 2F] matmul. XLA's strided-conv lowering of the same
        # math runs at ~20 TF/s; the framed matmul more than halves it
        # (v5e: 6.8 -> ~3.5 ms for a 96x10 s batch).
        # one contiguous [B, To+nh-1, hop] reshape, then nh axis-1
        # window shifts: Xb[b, t+i, h] == wavp[b, (t+i)*hop + h], so
        # concatenating the shifted views along the last axis rebuilds
        # frames[b, t, i*hop+h]. The former per-shift
        # dynamic_slice+reshape forced XLA to materialize each segment
        # through a layout copy (7 x 225 MB of copy traffic at the
        # bench batch, ~1.9 ms/step); axis-1 slices of one contiguous
        # buffer fuse into the concat read instead.
        nseg = To + nh - 1
        Xb = wavp[:, : nseg * hop].reshape(B, nseg, hop)
        frames = jnp.concatenate(
            [Xb[:, i: i + To] for i in range(nh)],
            axis=2)[:, :, :cfg.win_length]
        out = jnp.einsum("btw,fw->bft", frames, filt,
                         precision=jax.lax.Precision.DEFAULT)
        return out
    # on CPU every setting lowers to full f32, so golden tests are exact
    prec = {"high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[cfg.stft_precision]
    out = jax.lax.conv_general_dilated(
        wavp[:, None, :], filt[:, None, :],
        window_strides=(cfg.hop_length,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=prec)  # [B, 2F, T']
    return out[:, :, :To]


def _boundary_power_fix(wav: jnp.ndarray, length, cfg: MelConfig):
    """Exact power [B, K, F] of the few frames whose analysis window
    crosses each sample's dynamic valid-length boundary (per-sample
    reflect padding, the reference computes mel on exact-length crops),
    plus their start frame t0 [B].

    Gather-free: an earlier version materialized the K windows with a
    [B, K*win] element gather from the waveform — a dynamic LANE gather
    that TPU lowers to a near-scalar loop (measured 6 ms/view for a
    96x10 s batch, the single most expensive op in the pretrain step).
    Instead we pull ONE contiguous [B, S] buffer per sample
    (vmap'd dynamic_slice = per-row DMA), take the K windows at STATIC
    offsets inside it, and realize the dynamic right-edge reflection as
    a per-sample shift of the reversed buffer: for a global sample
    index g >= length the reflected source 2*(length-1) - g is buffer
    position c - b (c = 2*(length-1) - 2*buffer_start), i.e. the
    reversed buffer offset by S-1-c. Positions whose window lies wholly
    past the boundary may read the zero extension — those frames sit at
    or beyond frame index length//hop + 1 and every caller masks them
    (assumes length >= win_length, as the single-reflection rule
    already does)."""
    B, L = wav.shape
    pad = cfg.n_fft // 2
    T = cfg.num_frames(L)
    hop = cfg.hop_length
    win = cfg.win_length
    length = jnp.asarray(length, jnp.int32)
    K = 6  # windows crossing the boundary: <= ceil((pad+hop)/hop)+1
    t0 = jnp.clip((length - (win - pad - hop + 1)) // hop,
                  0, max(T - K, 0))
    S = win + (K - 1) * hop  # contiguous samples covering all K windows
    # padded coords: position p <-> sample index p - pad; the static
    # left reflect serves windows that start before sample 0.
    wav = wav.astype(jnp.float32)
    left = wav[:, 1: pad + 1][:, ::-1]
    wavp = jnp.concatenate([left, wav, jnp.zeros((B, S), wav.dtype)], 1)
    starts = t0 * hop  # buffer start, padded coords (always >= 0)
    buf = jax.vmap(
        lambda w, s: jax.lax.dynamic_slice(w, (s,), (S,)))(wavp, starts)
    # g = global (unpadded) sample index of buffer position b
    g = (starts - pad)[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    c = 2 * (length - 1) - 2 * (starts - pad)
    rbuf = buf[:, ::-1]
    # rbuf index for buffer position b is (S-1-c) + b; shift via a
    # zero-extended dynamic slice (extension sized so no start clamps:
    # S-1-c + S stays within [0, 3S] for any length in [win, L])
    rpad = jnp.concatenate(
        [jnp.zeros((B, S), jnp.float32), rbuf,
         jnp.zeros((B, 2 * S), jnp.float32)], 1)
    refl = jax.vmap(
        lambda r, s: jax.lax.dynamic_slice(r, (s,), (S,)))(
            rpad, jnp.clip(S - 1 - c + S, 0, 3 * S))
    patched = jnp.where(g < length[:, None], buf, refl)
    frames = jnp.stack(
        [patched[:, k * hop: k * hop + win] for k in range(K)], 1)
    frames = frames * hann_window(win)
    spec = jnp.fft.rfft(frames, n=cfg.n_fft, axis=-1)
    fix = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2  # [B, K, F]
    return fix, t0


def power_spectrogram(
    wav: jnp.ndarray, length=None, cfg: MelConfig = MelConfig()
) -> jnp.ndarray:
    """Power spectrogram |STFT|^2, [B, T, n_freqs], MXU-native: conv
    STFT + per-sample boundary patch; equals
    ``power_spectrogram_exact`` to float tolerance (tests/test_melspec).
    """
    out = stft_conv(wav, cfg)
    F = cfg.n_freqs
    power = out[:, :F, :] ** 2 + out[:, F:, :] ** 2  # [B, F, T]
    power = jnp.transpose(power, (0, 2, 1))  # [B, T, F]
    if length is None:
        return power
    fix, t0 = _boundary_power_fix(wav, length, cfg)

    def patch(p, f, t):
        return jax.lax.dynamic_update_slice(p, f, (t, 0))

    return jax.vmap(patch)(power, fix, t0)


def amplitude_to_db(
    power: jnp.ndarray,
    cfg: MelConfig = MelConfig(),
    valid_frames: Optional[jnp.ndarray] = None,
    frame_axis: int = -1,
) -> jnp.ndarray:
    """Power → dB with per-sample top_db clamping.

    ``valid_frames`` (optional, [B]) restricts the per-sample max used by
    the top_db clamp to the valid frames, so a zero-padded batch matches
    the reference's per-crop computation exactly.
    """
    x_db = 10.0 * jnp.log10(jnp.maximum(power, cfg.amin))
    if cfg.top_db is None:
        return x_db
    reduce_axes = tuple(range(1, x_db.ndim))
    if valid_frames is not None:
        T = x_db.shape[frame_axis]
        frame_ids = jnp.arange(T)
        shape = [1] * x_db.ndim
        shape[frame_axis % x_db.ndim] = T
        mask = frame_ids.reshape(shape) < valid_frames.reshape(
            (-1,) + (1,) * (x_db.ndim - 1)
        )
        masked = jnp.where(mask, x_db, -jnp.inf)
        max_db = jnp.max(masked, axis=reduce_axes, keepdims=True)
    else:
        max_db = jnp.max(x_db, axis=reduce_axes, keepdims=True)
    return jnp.maximum(x_db, max_db - cfg.top_db)


def minmax_scale(x: jnp.ndarray, cfg: MelConfig = MelConfig()) -> jnp.ndarray:
    return (x - cfg.mel_min) / (cfg.mel_max - cfg.mel_min) * 2.0 - 1.0


# process-wide override for the Pallas mel path: None = auto (TPU
# default backend). Set False when tracing for non-TPU devices inside a
# TPU-default process (e.g. the CPU-mesh multi-chip dry run).
_PALLAS_OVERRIDE: Optional[bool] = None


def set_pallas_default(enabled: Optional[bool]) -> None:
    global _PALLAS_OVERRIDE
    _PALLAS_OVERRIDE = enabled


def _topdb_minmax(db: jnp.ndarray, cfg: MelConfig, valid, normalize: bool):
    """Shared epilogue: per-sample top_db clamp (+ MinMax)."""
    if cfg.top_db is not None:
        if valid is not None:
            mask = jnp.arange(db.shape[-1])[None, None, :] < \
                valid[:, None, None]
            masked = jnp.where(mask, db, -jnp.inf)
        else:
            masked = db
        max_db = jnp.max(masked, axis=(1, 2), keepdims=True)
        db = jnp.maximum(db, max_db - cfg.top_db)
    if normalize:
        db = minmax_scale(db, cfg)
    return db


def log_melspec(
    wav: jnp.ndarray,
    length=None,
    cfg: MelConfig = MelConfig(),
    normalize: bool = True,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Waveform [B, L] (+ optional valid sample counts [B]) → normalized
    log-mel spectrogram [B, n_mels, T], T = 1 + L // hop.

    Equivalent to the reference chain MelSpectrogram → AmplitudeToDB →
    MinMax applied per exact-length crop. On TPU the power→mel→dB
    postprocess runs as one fused Pallas kernel (ops/pallas_mel.py);
    set ``use_pallas`` to force either path.
    """
    if wav.ndim == 1:
        wav = wav[None]
    if use_pallas is None:
        use_pallas = _PALLAS_OVERRIDE if _PALLAS_OVERRIDE is not None \
            else jax.default_backend() == "tpu"
    valid = None
    if length is not None:
        valid = jnp.asarray(length, dtype=jnp.int32) // cfg.hop_length + 1

    if use_pallas:
        from audiossl_tpu.ops.pallas_mel import stft_to_mel_db

        # emit the postprocess kernel's block-aligned frame count
        # directly from the framed matmul (saves the [B, 2F, T] f32
        # pad round trip the kernel's BlockSpec otherwise forces)
        T = cfg.num_frames(wav.shape[1])
        Tp = T + (-T) % 256
        stft = stft_conv(wav, cfg, pad_frames_to=Tp)  # [B, 2F, Tp]
        db = stft_to_mel_db(stft, mel_filterbank(cfg), amin=cfg.amin)
        if Tp != T:
            db = db[:, :, :T]
        if length is not None:
            fix_p, t0 = _boundary_power_fix(wav, length, cfg)
            fix_mel = jnp.einsum(
                "bkf,fm->bmk", fix_p, mel_filterbank(cfg),
                preferred_element_type=jnp.float32)
            fix_db = 10.0 * jnp.log10(jnp.maximum(fix_mel, cfg.amin))

            def patch(d, f, t):
                return jax.lax.dynamic_update_slice(d, f, (0, t))

            db = jax.vmap(patch)(db, fix_db, t0)
        return _topdb_minmax(db, cfg, valid, normalize)

    power = power_spectrogram(wav, length, cfg)  # [B, T, F]
    mel = jnp.einsum(
        "btf,fm->btm", power, mel_filterbank(cfg),
        preferred_element_type=jnp.float32)
    mel = jnp.transpose(mel, (0, 2, 1))  # [B, n_mels, T]
    db = 10.0 * jnp.log10(jnp.maximum(mel, cfg.amin))
    return _topdb_minmax(db, cfg, valid, normalize)


def mel_frame_count(num_samples, hop_length: int = 160):
    """Reference length bookkeeping: ``int(len_s*16000)//160 + 1``."""
    return num_samples // hop_length + 1
