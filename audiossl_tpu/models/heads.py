"""Downstream classification heads (reference audiossl/modules/head.py:48-89)."""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from audiossl_tpu.models.norm import BatchNorm1d
from audiossl_tpu.models.transformer import Block


class LinearHead(nn.Module):
    """BatchNorm1d(affine=False) + Linear(std 0.01 init, zero bias)."""
    num_labels: int
    use_norm: bool = True
    affine: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.use_norm:
            x = BatchNorm1d(x.shape[-1], affine=self.affine, name="norm")(
                x, use_running_average=not train)
        return nn.Dense(
            self.num_labels,
            kernel_init=nn.initializers.normal(stddev=0.01),
            bias_init=nn.initializers.zeros,
            name="linear",
        )(x)


class AttentionHead(nn.Module):
    """pre-Linear -> one transformer Block with prepended CLS ->
    BatchNorm -> Linear (reference head.py:72-89)."""
    att_dim: int
    num_heads: int
    num_labels: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Dense(self.att_dim, name="pre_linear")(x)
        cls = self.param(
            "cls_token",
            nn.initializers.truncated_normal(stddev=0.02, lower=-2, upper=2),
            (1, 1, self.att_dim),
        )
        cls = jnp.broadcast_to(cls, (x.shape[0], 1, self.att_dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = Block(self.att_dim, self.num_heads, name="att")(
            x, None, deterministic=not train)[:, 0]
        x = BatchNorm1d(self.att_dim, affine=False, name="norm")(
            x, use_running_average=not train)
        return nn.Dense(self.num_labels, name="linear")(x)
