"""Token masking for masked teacher-student pretraining (ATST-Frame).

TPU-native reimplementation of the masking semantics the reference pulls
from fairseq (``compute_mask_indices``) and its local wrappers
(reference ``methods/atstframe/random_mask.py:5-36``):

* ``random`` — per-sample random subset of exactly ``ceil(ratio*n)``
  valid tokens (reference ``get_mask_one``: ``randperm(n) < n*ratio``);
  tokens beyond the valid length are marked masked (padded with True).
* ``block``  — fixed-length spans ("static" in fairseq) with
  ``num_spans = ratio*n/span`` start positions sampled uniformly;
  overlaps allowed (the reference calls with ``no_overlap=False``),
  at least ``min_masks=2`` spans.
* ``uniform`` — spans with lengths uniform in ``[min_span, 2*span]``.

The reference computes masks on CPU inside DataLoader workers; here they
are computed on device from PRNG keys with static shapes, so they fuse
into the training step. Counts are deterministic per sample (fairseq
adds a random 0/1 rounding term); this is a documented distributional
equivalence, not a bitwise port.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def random_token_mask(key, batch: int, num_tokens: int, ratio: float, valid=None):
    """[B, T] bool mask; exactly ceil(ratio * valid) True among valid tokens,
    True everywhere past the valid length (matching reference get_mask_one's
    pad(value=1))."""
    u = jax.random.uniform(key, (batch, num_tokens))
    if valid is None:
        valid = jnp.full((batch,), num_tokens, dtype=jnp.int32)
    else:
        valid = jnp.asarray(valid, dtype=jnp.int32)
    tok = jnp.arange(num_tokens)[None, :]
    in_valid = tok < valid[:, None]
    # rank of each valid token among valid tokens: sort by (invalid, u)
    u = jnp.where(in_valid, u, 2.0)
    rank = jnp.argsort(jnp.argsort(u, axis=-1), axis=-1)
    k = jnp.ceil(ratio * valid.astype(jnp.float32)).astype(jnp.int32)
    mask = rank < k[:, None]
    return jnp.where(in_valid, mask, True)


def _span_mask(key, batch, num_tokens, starts_count, span_lengths):
    """Union of spans [start, start+len) per sample.

    starts are sampled uniformly in [0, num_tokens - max_len]."""
    tok = jnp.arange(num_tokens)[None, None, :]  # [1, 1, T]
    starts, lengths = span_lengths  # [B, K] each
    s = starts[:, :, None]
    e = s + lengths[:, :, None]
    return jnp.any((tok >= s) & (tok < e), axis=1)  # [B, T]


def _valid_arr(valid, batch, num_tokens):
    if valid is None:
        return jnp.full((batch,), num_tokens, dtype=jnp.int32)
    return jnp.asarray(valid, dtype=jnp.int32)


def _span_count(key, ratio, span, min_masks, valid):
    """Per-sample span count with fairseq's randomized rounding
    ``int(x + U(0,1))`` (x = ratio*valid/mask_length — compute_mask_
    indices divides by mask_length in BOTH static and uniform modes)."""
    x = ratio * valid.astype(jnp.float32) / span
    u = jax.random.uniform(key, valid.shape)
    return jnp.maximum(min_masks, jnp.floor(x + u).astype(jnp.int32))


def _start_range(valid, min_len, n_spans, num_tokens):
    """fairseq's start-sampling range size ``sz - min_len`` with its
    short-sequence fallback (compute_mask_indices: ``if sz - min_len <=
    num_mask: min_len = sz - num_mask - 1`` -> range = num_mask + 1),
    so the K distinct starts always fit. Clamped to [1, num_tokens]
    (the traced buffer size; fairseq then clips indices at sz)."""
    rng = valid - min_len
    rng = jnp.where(rng <= n_spans, n_spans + 1, rng)
    return jnp.clip(rng, 1, num_tokens)


def _span_starts(key, batch, num_tokens, K, hi):
    """K per-sample start positions sampled WITHOUT replacement from
    [0, hi) (np.random.choice replace=False) via per-sample top-K of
    uniform keys; positions past hi are pushed to the back and any
    overflow (hi < K) clamps to hi-1."""
    u = jax.random.uniform(key, (batch, num_tokens))
    u = jnp.where(jnp.arange(num_tokens)[None, :] < hi[:, None], u, 2.0)
    order = jnp.argsort(u, axis=-1)
    return jnp.minimum(order[:, :K], hi[:, None] - 1).astype(jnp.int32)


def block_token_mask(key, batch: int, num_tokens: int, ratio: float,
                     span: int = 5, min_masks: int = 2, valid=None):
    """Fairseq "static" block masking, distribution-exact: fixed span
    length, overlapping spans allowed, randomized span-count rounding,
    without-replacement starts in [0, valid - span) (np.random.choice
    (sz - span)) with fairseq's short-sequence fallback widening the
    range to num_mask + 1 when it can't fit the starts, honoring
    per-sample valid lengths (fairseq applies the padding mask before
    sampling) and clipping mask indices at valid."""
    valid = _valid_arr(valid, batch, num_tokens)
    # worst-case span slots: the randomized rounding can add one
    K = max(min_masks, int(ratio * num_tokens / span) + 1)
    k_round, k_starts = jax.random.split(key)
    n_spans = _span_count(k_round, ratio, span, min_masks, valid)
    hi = _start_range(valid, span, n_spans, num_tokens)
    starts = _span_starts(k_starts, batch, num_tokens, K, hi)
    active = jnp.arange(K)[None, :] < n_spans[:, None]
    lengths = jnp.where(active, span, 0).astype(jnp.int32)
    m = _span_mask(key, batch, num_tokens, K, (starts, lengths))
    # fairseq clips mask_idc < sz — only reachable after the
    # short-sequence fallback widened the start range past valid-span
    return m & (jnp.arange(num_tokens)[None, :] < valid[:, None])


def uniform_span_mask(key, batch: int, num_tokens: int, ratio: float,
                      span: int = 5, min_span: int = 2, min_masks: int = 2,
                      valid=None):
    """Fairseq "uniform" masking, distribution-exact: span count uses
    ``span`` as the divisor (NOT the mean drawn length — fairseq divides
    by mask_length, so uniform mode over-masks by ~mean/span), lengths
    uniform in [min_span, 2*span], start range
    [0, valid - min(drawn lengths)) like compute_mask_indices'
    ``min_len = min(lengths)``, and mask indices clipped at the valid
    length (mask_idc[mask_idc < sz])."""
    valid = _valid_arr(valid, batch, num_tokens)
    K = max(min_masks, int(ratio * num_tokens / span) + 1)
    k_round, k_len, k_starts = jax.random.split(key, 3)
    n_spans = _span_count(k_round, ratio, span, min_masks, valid)
    active = jnp.arange(K)[None, :] < n_spans[:, None]
    lengths = jax.random.randint(k_len, (batch, K), min_span,
                                 2 * span + 1)
    min_len = jnp.min(jnp.where(active, lengths, 2 * span + 1), axis=1)
    hi = _start_range(valid, min_len, n_spans, num_tokens)
    starts = _span_starts(k_starts, batch, num_tokens, K, hi)
    lengths = jnp.where(active, lengths, 0).astype(jnp.int32)
    m = _span_mask(key, batch, num_tokens, K, (starts, lengths))
    return m & (jnp.arange(num_tokens)[None, :] < valid[:, None])


def make_token_mask(key, batch, num_tokens, ratio, mask_type="block",
                    span=5, min_span=2, valid=None):
    """Dispatch matching reference FrameATSTTrainTransform mask_type flag."""
    if mask_type == "random":
        return random_token_mask(key, batch, num_tokens, ratio, valid=valid)
    if mask_type == "block":
        return block_token_mask(key, batch, num_tokens, ratio, span=span,
                                valid=valid)
    if mask_type == "uniform":
        return uniform_span_mask(key, batch, num_tokens, ratio, span=span,
                                 min_span=min_span, valid=valid)
    raise ValueError(f"unknown mask_type {mask_type!r}")
