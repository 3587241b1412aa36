"""Bicubic resampling primitives.

Two users, matching the reference:

* static-shape bicubic resize for positional-embedding interpolation
  (reference ``models/atst/audio_transformer.py:131-151`` uses torch
  ``F.interpolate(mode='bicubic')``, align_corners=False);
* traced-coordinate bicubic sampling for the RandomResizeCrop
  augmentation (reference ``transforms/byol_a.py:7-57`` crops a random
  box out of a virtual canvas and resizes back with align_corners=True).

Both use the Keys cubic convolution kernel with A = -0.75 (torch's
choice) and edge-clamped taps, implemented as separable gathers so XLA
maps them onto vector units with static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_A = -0.75  # torch cubic convolution constant


def _cubic_weights(t):
    """Weights for taps at offsets (-1, 0, 1, 2) given fractional pos t in [0,1).

    Keys kernel: |x|<=1 -> (A+2)|x|^3-(A+3)|x|^2+1 ; 1<|x|<2 ->
    A|x|^3-5A|x|^2+8A|x|-4A."""
    def k01(x):
        return ((_A + 2.0) * x - (_A + 3.0)) * x * x + 1.0

    def k12(x):
        return ((_A * x - 5.0 * _A) * x + 8.0 * _A) * x - 4.0 * _A

    w0 = k12(t + 1.0)
    w1 = k01(t)
    w2 = k01(1.0 - t)
    w3 = k12(2.0 - t)
    return jnp.stack([w0, w1, w2, w3], axis=-1)  # [..., 4]


def resize_bicubic(x: jnp.ndarray, out_h: int, out_w: int,
                   align_corners: bool = False) -> jnp.ndarray:
    """Resize the last two axes of x to (out_h, out_w), torch-compatible."""
    *lead, H, W = x.shape

    def coords(in_n, out_n):
        i = jnp.arange(out_n, dtype=jnp.float32)
        if align_corners:
            if out_n == 1:
                return jnp.zeros((out_n,), jnp.float32)
            return i * (in_n - 1) / (out_n - 1)
        return (i + 0.5) * (in_n / out_n) - 0.5

    ch = coords(H, out_h)
    cw = coords(W, out_w)
    # sample along H (axis=-2): coords broadcast to [..., out_h, W]
    y = _sample_axis(x, ch, axis=-2)
    y = _sample_axis(y, cw, axis=-1)
    return y


def _sample_axis(x, coords1d, axis):
    """Static 1-D coordinate sampling along `axis` (shared across batch)."""
    N = x.shape[axis]
    f = jnp.floor(coords1d)
    t = coords1d - f
    w = _cubic_weights(t)  # [O, 4]
    base = f.astype(jnp.int32)
    out = None
    for m, off in enumerate((-1, 0, 1, 2)):
        idx = jnp.clip(base + off, 0, N - 1)  # [O]
        tap = jnp.take(x, idx, axis=axis)
        wm = w[:, m]
        shape = [1] * x.ndim
        shape[axis % x.ndim] = wm.shape[0]
        out_m = tap * wm.reshape(shape)
        out = out_m if out is None else out + out_m
    return out


def sample_bicubic_rows(x: jnp.ndarray, ys: jnp.ndarray, y_lo, y_hi
                        ) -> jnp.ndarray:
    """Per-sample bicubic sampling of x [B, H, W] along H only at traced
    coordinates ys [B, OH] with per-sample tap clamps [y_lo, y_hi]
    (the freq-warp fast path: identical to sample_bicubic_2d when the
    W mapping is the identity — the W pass's weights are exactly
    (0, 1, 0, 0) there, so skipping it changes nothing)."""
    fy = jnp.floor(ys)
    ty = ys - fy
    wy = _cubic_weights(ty)  # [B, OH, 4]
    by = fy.astype(jnp.int32)
    out = None
    for m, off in enumerate((-1, 0, 1, 2)):
        idx = jnp.clip(by + off, y_lo[:, None], y_hi[:, None])  # [B, OH]
        tap = jnp.take_along_axis(x, idx[:, :, None], axis=1)
        contrib = tap * wy[:, :, m][:, :, None]
        out = contrib if out is None else out + contrib
    return out


def sample_bicubic_2d(canvas: jnp.ndarray,
                      ys: jnp.ndarray, xs: jnp.ndarray,
                      y_lo, y_hi, x_lo, x_hi) -> jnp.ndarray:
    """Per-sample bicubic sampling of canvas [B, H, W] at traced coordinates.

    ys: [B, OH], xs: [B, OW] fractional coordinates in canvas space.
    y_lo/y_hi/x_lo/x_hi: [B] inclusive tap clamp bounds (the crop box),
    reproducing torch's edge-clamped bicubic over the cropped tensor.
    Returns [B, OH, OW].
    """
    B, H, W = canvas.shape
    OH = ys.shape[-1]
    OW = xs.shape[-1]

    # --- sample along W first: rows [B, H, W] at xs -> [B, H, OW]
    fx = jnp.floor(xs)
    tx = xs - fx
    wx = _cubic_weights(tx)  # [B, OW, 4]
    bx = fx.astype(jnp.int32)
    acc_w = None
    for m, off in enumerate((-1, 0, 1, 2)):
        idx = jnp.clip(bx + off, x_lo[:, None], x_hi[:, None])  # [B, OW]
        tap = jnp.take_along_axis(canvas, idx[:, None, :], axis=-1)  # [B, H, OW]
        contrib = tap * wx[:, None, :, m]
        acc_w = contrib if acc_w is None else acc_w + contrib

    # --- then along H: [B, H, OW] at ys -> [B, OH, OW]
    fy = jnp.floor(ys)
    ty = ys - fy
    wy = _cubic_weights(ty)  # [B, OH, 4]
    by = fy.astype(jnp.int32)
    out = None
    for m, off in enumerate((-1, 0, 1, 2)):
        idx = jnp.clip(by + off, y_lo[:, None], y_hi[:, None])  # [B, OH]
        tap = jnp.take_along_axis(acc_w, idx[:, :, None], axis=1)  # [B, OH, OW]
        contrib = tap * wy[:, :, m][:, :, None]
        out = contrib if out is None else out + contrib
    return out
