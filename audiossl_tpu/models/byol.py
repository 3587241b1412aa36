"""BYOL projector/predictor heads and the teacher-student cosine loss.

Functional equivalents of the reference ``build_mlp`` / ``ByolLoss`` /
``MultiCropWrapper`` (reference audiossl/models/atst/byol.py and
methods/atstframe/byol.py). TPU-first changes:

* crops are equal-width padded tensors (the reference pads them too),
  so MultiCropWrapper's group-by-width loop collapses to one batched
  encoder call — done at the method level, not here;
* frame-level losses take the full frame sequence plus a boolean
  selection mask instead of a dynamic gather (identical masked math);
* feature-std monitoring (``compute_var``: explicit NCCL all_reduce of
  count/sum/sumsq in the reference, byol.py:42-53) is expressed as
  global reductions — under pjit XLA inserts the collectives.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from audiossl_tpu.models.norm import BatchNorm1d


class MLPHead(nn.Module):
    """Linear(no bias) -> BN -> ReLU -> Linear(no bias)
    (reference build_mlp(2, in, 4096, out, last_bn=False)).

    Matmuls run in ``dtype`` (bf16 on TPU); the BatchNorm statistics
    stay f32 for stability."""
    hidden_dim: int = 4096
    out_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, mask=None):
        x = nn.Dense(self.hidden_dim, use_bias=False, dtype=self.dtype,
                     name="fc0")(x)
        # x stays in ``dtype`` (bf16 on TPU): BatchNorm1d computes its
        # statistics/normalize in f32 internally and returns the input
        # dtype, so the [R, hidden] activation is never materialized in
        # f32 (halves the head's HBM traffic; torch-AMP BN semantics)
        x = BatchNorm1d(self.hidden_dim, affine=True, name="bn0")(
            x, use_running_average=not train, mask=mask)
        x = nn.relu(x)
        x = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                     name="fc1")(x)
        return x.astype(jnp.float32)


class Projector(nn.Module):
    """projector (+ optional predictor) stack applied after the encoder."""
    embed_dim: int
    projector: str = "mlp"  # "mlp" | "linear" | "none"
    predictor: bool = True
    hidden_dim: int = 4096
    out_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, mask=None):
        if self.projector == "mlp":
            x = MLPHead(self.hidden_dim, self.out_dim, dtype=self.dtype,
                        name="projector")(x, train, mask)
        elif self.projector == "linear":
            x = nn.Dense(self.embed_dim, dtype=self.dtype,
                         name="projector_linear")(x)
        if self.predictor:
            x = MLPHead(self.hidden_dim, self.out_dim, dtype=self.dtype,
                        name="predictor")(x, train, mask)
        return x


def l2_normalize(x, axis=-1, eps=1e-12):
    # torch F.normalize: x / max(||x||, eps)
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def feature_std(y: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
    """Mean per-dim std of (already normalized) features across all
    (selected) rows — reference compute_var (byol.py:42-53)."""
    d = y.shape[-1]
    y2 = y.reshape(-1, d)
    if mask is not None:
        w = mask.reshape(-1, 1).astype(y2.dtype)
        zc = jnp.sum(w)
        zs = jnp.sum(y2 * w, axis=0)
        zss = jnp.sum((y2 ** 2) * w, axis=0)
    else:
        zc = jnp.asarray(y2.shape[0], y2.dtype)
        zs = jnp.sum(y2, axis=0)
        zss = jnp.sum(y2 ** 2, axis=0)
    var = zss / (zc - 1) - (zs ** 2) / (zc * (zc - 1))
    return jnp.mean(jnp.sqrt(var + 1e-6))


def byol_pair_loss(p, z, mask: Optional[jnp.ndarray] = None):
    """2 - 2*cos(p, z), averaged over (selected) rows."""
    cos = jnp.sum(l2_normalize(p) * l2_normalize(z), axis=-1)
    if mask is not None:
        w = mask.astype(cos.dtype)
        return 2.0 - 2.0 * jnp.sum(cos * w) / jnp.maximum(jnp.sum(w), 1.0)
    return 2.0 - 2.0 * jnp.mean(cos)


class ByolLossState(NamedTuple):
    loss: jnp.ndarray
    std_student: jnp.ndarray
    std_teacher: jnp.ndarray


def clip_byol_loss(student, teacher, ncrops: int = 2) -> ByolLossState:
    """Clip-level cross-view loss (reference models/atst/byol.py:57-78).

    student: [ncrops*B, D] (predictor outputs, view-major stacking);
    teacher: [2*B, D]. Pairs with iq == iv are skipped."""
    std_s = feature_std(l2_normalize(student))
    std_t = feature_std(l2_normalize(teacher))
    s_views = jnp.split(student, ncrops, axis=0)
    t_views = jnp.split(teacher, 2, axis=0)
    total, n_terms = 0.0, 0
    for iq, q in enumerate(t_views):
        for iv, v in enumerate(s_views):
            if iq == iv:
                continue
            total = total + byol_pair_loss(q, v)
            n_terms += 1
    return ByolLossState(total / n_terms, std_s, std_t)


def frame_byol_loss(student, teacher, mask, symmetric: bool = True
                    ) -> ByolLossState:
    """Frame-level loss (reference methods/atstframe/byol.py:57-84).

    student/teacher: [2*B, T, D] head outputs for both views;
    mask: [2*B, T] True at selected (masked & valid) positions — the
    same mask is shared by both views (built once in the transform)."""
    std_s = feature_std(l2_normalize(student), mask)
    std_t = feature_std(l2_normalize(teacher), mask)
    if symmetric:
        s_views = jnp.split(student, 2, axis=0)
        t_views = jnp.split(teacher, 2, axis=0)
        m_views = jnp.split(mask, 2, axis=0)
        total, n_terms = 0.0, 0
        for iq, q in enumerate(t_views):
            for iv, v in enumerate(s_views):
                if iq == iv:
                    continue
                total = total + byol_pair_loss(v, q, m_views[iv])
                n_terms += 1
        loss = total / n_terms
    else:
        loss = byol_pair_loss(teacher, student, mask)
    return ByolLossState(loss, std_s, std_t)
