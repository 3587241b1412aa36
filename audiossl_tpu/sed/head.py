"""SED head: per-frame sigmoid "strong" + attention-pooled "weak".

Reference ``downstream/utils_dcase/model_dcase.py:38-69`` LinearHead:
two parallel linear layers on the frame embeddings; strong =
sigmoid(linear(x)/temp) per frame, weak = softmax-attention pooling
Σ(strong·soft)/Σsoft over time.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


class SEDHead(nn.Module):
    num_labels: int
    use_norm: bool = False

    @nn.compact
    def __call__(self, x, temp: float = 1.0, frame_mask=None):
        """x: [B, T, D] frame embeddings -> (strong [B, C, T],
        weak [B, C]). ``frame_mask`` [B, T] optionally excludes padded
        frames from the weak pooling."""
        init = nn.initializers.normal(stddev=0.01)
        if self.use_norm:
            mu = jnp.mean(x, axis=(0, 1), keepdims=True)
            var = jnp.var(x, axis=(0, 1), keepdims=True)
            x = (x - mu) / jnp.sqrt(var + 1e-5)
        strong = nn.sigmoid(
            nn.Dense(self.num_labels, kernel_init=init,
                     bias_init=nn.initializers.zeros,
                     name="linear")(x) / temp)  # [B, T, C]
        soft = nn.softmax(
            nn.Dense(self.num_labels, kernel_init=init,
                     bias_init=nn.initializers.zeros,
                     name="linear_softmax")(x), axis=-1)
        soft = jnp.clip(soft, 1e-7, 1.0)
        if frame_mask is not None:
            m = frame_mask[:, :, None].astype(x.dtype)
            soft = soft * m
        weak = jnp.sum(strong * soft, axis=1) / jnp.maximum(
            jnp.sum(soft, axis=1), 1e-7)
        return jnp.transpose(strong, (0, 2, 1)), weak
