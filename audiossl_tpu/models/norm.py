"""BatchNorm with torch semantics, masked-row support, and SPMD-global
batch statistics.

The reference relies on torch BatchNorm1d inside the BYOL projector /
predictor (reference models/atst/byol.py:6-22) and the linear-probe head
(modules/head.py:48-70), trained with Lightning ``sync_batchnorm=True``
(cross-GPU stats). Under pjit the batch is a single global array, so
plain ``jnp`` reductions already produce globally synced statistics; the
mask argument supports the frame-level path where only masked-position
frames flow through the head.

Semantics matched to torch: eps 1e-5, running stats updated with
momentum 0.1 using the *unbiased* variance, normalization uses the
*biased* variance of the current batch in training mode.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn


class BatchNorm1d(nn.Module):
    features: int
    affine: bool = True
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool = False,
                 mask: Optional[jnp.ndarray] = None):
        """x: [..., features]; mask (optional): broadcastable to x[..., 0],
        True where the row is a real (selected) sample."""
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,)))
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))

        # statistics and normalization always compute in f32; the input
        # may be a bf16 tensor (the BYOL heads keep fc0's [R, 4096]
        # activation in bf16 — HALF the HBM traffic of an f32
        # materialization; the per-element upcasts fuse into the
        # reductions/normalize, so nothing f32-sized hits HBM). This is
        # torch-AMP BN semantics: f32 statistics over lower-precision
        # activations.
        xf = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            if mask is None:
                n = jnp.asarray(
                    jnp.prod(jnp.asarray(x.shape[:-1])), jnp.float32)
                mean = jnp.mean(xf, axis=reduce_axes)
                var = jnp.mean((xf - mean) ** 2, axis=reduce_axes)
            else:
                w = mask.astype(jnp.float32)[..., None]
                n = jnp.sum(w)
                mean = jnp.sum(xf * w, axis=reduce_axes) / n
                var = jnp.sum(((xf - mean) ** 2) * w, axis=reduce_axes) / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + \
                    self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + \
                    self.momentum * unbiased

        y = (xf - mean) / jnp.sqrt(var + self.eps)
        if self.affine:
            y = y * scale + bias
        return y.astype(x.dtype)
