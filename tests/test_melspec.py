"""Golden-parity tests of the on-device mel front end.

The golden is constructed from torch.stft (torch core, CPU) plus an
independently written numpy HTK mel filterbank + dB/top_db/minmax chain
that follows the torchaudio semantics the reference relies on
(reference methods/atst/transform.py:14-18). BASELINE.md requires mel
parity <= 1e-3.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from audiossl_tpu.ops import melspec as M


def torch_golden_logmel(wav_np: np.ndarray, cfg: M.MelConfig) -> np.ndarray:
    """torchaudio-equivalent MelSpectrogram -> AmplitudeToDB -> MinMax,
    built from torch.stft directly (torchaudio itself is unavailable)."""
    x = torch.from_numpy(wav_np.astype(np.float32))
    window = torch.hann_window(cfg.win_length, periodic=True)
    spec = torch.stft(
        x,
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        window=window,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    power = spec.abs().numpy() ** 2  # [B, F, T]

    # independent numpy HTK filterbank (same construction torchaudio uses)
    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel2hz(m):
        return 700.0 * (10 ** (m / 2595.0) - 1.0)

    all_freqs = np.linspace(0, cfg.sample_rate / 2, cfg.n_fft // 2 + 1)
    m_pts = np.linspace(hz2mel(cfg.f_min), hz2mel(cfg.f_max), cfg.n_mels + 2)
    f_pts = mel2hz(m_pts)
    fb = np.zeros((len(all_freqs), cfg.n_mels))
    for i in range(cfg.n_mels):
        lower = (all_freqs - f_pts[i]) / (f_pts[i + 1] - f_pts[i])
        upper = (f_pts[i + 2] - all_freqs) / (f_pts[i + 2] - f_pts[i + 1])
        fb[:, i] = np.maximum(0, np.minimum(lower, upper))

    mel = np.einsum("bft,fm->bmt", power, fb)
    db = 10.0 * np.log10(np.maximum(mel, cfg.amin))
    # per-sample top_db clamp
    mx = db.max(axis=(1, 2), keepdims=True)
    db = np.maximum(db, mx - cfg.top_db)
    return (db - cfg.mel_min) / (cfg.mel_max - cfg.mel_min) * 2.0 - 1.0


@pytest.fixture(scope="module")
def cfg():
    return M.MelConfig()


def _rand_wav(b, n, seed=0):
    rng = np.random.RandomState(seed)
    # realistic audio scale so dB values land in the reference min/max range
    return (rng.randn(b, n) * 0.1).astype(np.float32)


def test_mel_filterbank_properties(cfg):
    fb = np.asarray(M.mel_filterbank(cfg))
    assert fb.shape == (513, 64)
    assert (fb >= 0).all()
    # each filter is a triangle with a single peak and nonzero support
    assert (fb.sum(axis=0) > 0).all()


def test_logmel_matches_torch_golden(cfg):
    wav = _rand_wav(3, 16000 * 2)
    ours = np.asarray(M.log_melspec(jnp.asarray(wav), cfg=cfg))
    golden = torch_golden_logmel(wav, cfg)
    assert ours.shape == golden.shape == (3, 64, 201)
    assert np.abs(ours - golden).max() < 1e-3


def test_logmel_sine_wave(cfg):
    t = np.arange(16000, dtype=np.float32) / 16000
    wav = (0.5 * np.sin(2 * np.pi * 1000 * t))[None]
    ours = np.asarray(M.log_melspec(jnp.asarray(wav), cfg=cfg))
    golden = torch_golden_logmel(wav, cfg)
    assert np.abs(ours - golden).max() < 1e-3


def test_frame_count_formula(cfg):
    for secs in (1.0, 6.0, 9.5, 10.0):
        n = int(secs * 16000)
        assert cfg.num_frames(n) == n // 160 + 1


def test_variable_length_matches_exact_crop(cfg):
    """Zero-padded batch + valid-length arg reproduces per-crop reference
    values in the valid frame range (the key TPU static-shape trick)."""
    n_valid = 16000  # 1 s
    n_total = 16000 * 2  # padded to 2 s
    wav = _rand_wav(2, n_valid, seed=3)
    padded = np.zeros((2, n_total), np.float32)
    padded[:, :n_valid] = wav

    exact = np.asarray(M.log_melspec(jnp.asarray(wav), cfg=cfg))  # [2,64,101]
    padded_out = np.asarray(
        M.log_melspec(jnp.asarray(padded), length=jnp.asarray([n_valid, n_valid]), cfg=cfg)
    )
    n_frames_valid = n_valid // 160 + 1
    assert np.abs(padded_out[:, :, :n_frames_valid] - exact).max() < 1e-3


def test_mixed_lengths_in_one_batch(cfg):
    n_total = 16000 * 2
    la, lb = 16000, 24000
    rng = np.random.RandomState(7)
    a = (rng.randn(la) * 0.05).astype(np.float32)
    b = (rng.randn(lb) * 0.2).astype(np.float32)
    padded = np.zeros((2, n_total), np.float32)
    padded[0, :la] = a
    padded[1, :lb] = b
    out = np.asarray(
        M.log_melspec(jnp.asarray(padded), length=jnp.asarray([la, lb]), cfg=cfg)
    )
    ga = torch_golden_logmel(a[None], cfg)
    gb = torch_golden_logmel(b[None], cfg)
    assert np.abs(out[0:1, :, : la // 160 + 1] - ga).max() < 1e-3
    assert np.abs(out[1:2, :, : lb // 160 + 1] - gb).max() < 1e-3


def test_amplitude_to_db_topdb(cfg):
    power = np.array([[1.0, 1e-12, 1e-4]], np.float32)
    db = np.asarray(M.amplitude_to_db(jnp.asarray(power), cfg))
    assert db[0, 0] == pytest.approx(0.0, abs=1e-4)
    # clamped to max - 80
    assert db[0, 1] == pytest.approx(-80.0, abs=1e-4)
    assert db[0, 2] == pytest.approx(-40.0, abs=1e-3)


def test_minmax_range(cfg):
    x = jnp.asarray(np.array([[cfg.mel_min, cfg.mel_max]], np.float32))
    y = np.asarray(M.minmax_scale(x, cfg))
    assert y[0, 0] == pytest.approx(-1.0)
    assert y[0, 1] == pytest.approx(1.0)


def test_conv_path_matches_exact_gather_path(cfg):
    """The MXU conv STFT (+ boundary patch) must equal the gather-based
    exact framing for mixed valid lengths, inside the valid frames."""
    n_total = 16000 * 2
    lengths = np.array([32000, 17000, 9600], np.int32)
    rng = np.random.RandomState(11)
    padded = np.zeros((3, n_total), np.float32)
    for i, l in enumerate(lengths):
        padded[i, :l] = rng.randn(l) * 0.1
    import jax
    fast = np.asarray(M.power_spectrogram(
        jnp.asarray(padded), jnp.asarray(lengths), cfg))
    exact = np.asarray(M.power_spectrogram_exact(
        jnp.asarray(padded), jnp.asarray(lengths), cfg))
    for i, l in enumerate(lengths):
        t = int(l) // cfg.hop_length + 1
        np.testing.assert_allclose(fast[i, :t], exact[i, :t],
                                   rtol=1e-4, atol=1e-4)


def test_boundary_fix_random_length_sweep(cfg):
    """The gather-free boundary patch (dynamic-slice + shifted-reverse
    reflect) must equal the exact framing for arbitrary valid lengths,
    including hop-aligned, window-edge, and near-full cases."""
    n_total = 16000 * 2
    rng = np.random.RandomState(3)
    lengths = np.array(
        [cfg.win_length, cfg.win_length + 1, 2048, 4999, 16000,
         n_total - 1, n_total, 31841, 1600, 12800]
        + list(rng.randint(cfg.win_length, n_total, 14)), np.int32)
    B = len(lengths)
    padded = np.zeros((B, n_total), np.float32)
    for i, l in enumerate(lengths):
        padded[i, :l] = rng.randn(l) * 0.1
    fast = np.asarray(M.power_spectrogram(
        jnp.asarray(padded), jnp.asarray(lengths), cfg))
    exact = np.asarray(M.power_spectrogram_exact(
        jnp.asarray(padded), jnp.asarray(lengths), cfg))
    for i, l in enumerate(lengths):
        t = int(l) // cfg.hop_length + 1
        np.testing.assert_allclose(
            fast[i, :t], exact[i, :t], rtol=1e-4, atol=1e-4,
            err_msg=f"length={l}")
