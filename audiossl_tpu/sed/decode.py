"""SED prediction decoding: threshold -> median smoothing -> events.

Reference ``downstream/utils_psds_eval/gpu_decode.py:18-311``: hard
thresholding, a same-padded median filter along time (scipy-compatible
reflect padding), and event-boundary extraction into pandas dataframes
for PSDS scoring. Here the threshold+median runs jitted on device for
any number of thresholds at once; the dataframe conversion is host-side
numpy (offline scoring code).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd


def _reflect_pad_1d(x: jnp.ndarray, pl: int, pr: int) -> jnp.ndarray:
    """scipy.ndimage-style reflect padding on the last axis, matching
    the reference's 'scripy_pad' construction (gpu_decode.py:58-68):
    edge values are repeated then interior-reflected."""
    left = x[..., :pl][..., ::-1] if pl else x[..., :0]
    right = x[..., -pr:][..., ::-1] if pr else x[..., :0]
    return jnp.concatenate([left, x, right], axis=-1)


def median_filter_1d(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Median filter along the last (time) axis, 'same' output length.

    Even window sizes average the two central order statistics, exactly
    like the reference MedianPool2d.median (gpu_decode.py:39-56)."""
    pw = max(k - 1, 0)
    pl, pr = pw // 2, pw - pw // 2
    xp = _reflect_pad_1d(x, pl, pr)
    T = x.shape[-1]
    idx = jnp.arange(T)[:, None] + jnp.arange(k)[None, :]  # [T, k]
    windows = xp[..., idx]  # [..., T, k]
    s = jnp.sort(windows, axis=-1)
    mid = k // 2
    if k % 2 == 1:
        return s[..., mid]
    return 0.5 * (s[..., mid - 1] + s[..., mid])


def decode_preds(strong_preds: jnp.ndarray, thresholds: Sequence[float],
                 median_window: int = 7) -> jnp.ndarray:
    """[B, C, T] sigmoid scores -> smoothed hard preds
    [n_thds, B, C, T] (or [B, C, T] for a single threshold),
    reference decode_preds (gpu_decode.py:231-245)."""
    thds = jnp.asarray(list(thresholds), strong_preds.dtype)
    hard = (strong_preds[None] > thds[:, None, None, None]).astype(
        strong_preds.dtype)
    smooth = median_filter_1d(hard, median_window)
    if len(thresholds) == 1:
        return smooth[0]
    return smooth


def preds_to_events(hard_preds: np.ndarray, filenames: Sequence[str],
                    encoder) -> pd.DataFrame:
    """[B, C, T] binarized (smoothed) predictions -> event dataframe
    with columns event_label/onset/offset/filename (reference
    batched_decode_preds, gpu_decode.py:248-311)."""
    rows = []
    for b, fname in enumerate(filenames):
        for lab, onset, offset in encoder.decode_strong(
                np.asarray(hard_preds[b]).T):
            rows.append((lab, onset, offset, fname))
    return pd.DataFrame(rows, columns=["event_label", "onset", "offset",
                                       "filename"])


def batched_decode_preds(strong_preds, filenames, encoder,
                         thresholds=(0.5,), median_filter: int = 7):
    """-> {threshold: events dataframe} for a batch."""
    smooth = decode_preds(jnp.asarray(strong_preds), list(thresholds),
                          median_filter)
    if len(thresholds) == 1:
        smooth = smooth[None]
    out = {}
    for i, thd in enumerate(thresholds):
        out[thd] = preds_to_events(np.asarray(smooth[i]) > 0.5, filenames,
                                   encoder)
    return out
