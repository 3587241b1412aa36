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


def _per_sample_spans(key, batch, num_tokens, ratio, span_for_count,
                      start_margin, min_masks, valid):
    """Per-sample (starts, active-count) honoring valid lengths.

    Fairseq applies the padding mask before sampling: the span count is
    computed from each sample's valid length and starts are drawn inside
    [0, valid - margin] (reference random_mask.py:5-15 passes
    padding_mask into compute_mask_indices). Static shapes: K spans are
    allocated for the worst case and deactivated per sample.

    Matches compute_mask_indices' distribution exactly on the two
    details that shift coverage measurably (~3 points of masked
    fraction at the base recipe, see the fairseq-oracle test):

    * randomized span-count rounding ``int(x + U(0,1))`` instead of
      deterministic round;
    * starts sampled WITHOUT replacement (np.random.choice
      replace=False) via per-sample top-K of uniform keys, instead of
      independent draws."""
    if valid is None:
        valid = jnp.full((batch,), num_tokens, dtype=jnp.int32)
    else:
        valid = jnp.asarray(valid, dtype=jnp.int32)
    # worst-case span slots: the randomized rounding can add one
    K = max(min_masks,
            int(ratio * num_tokens / span_for_count) + 1)
    k_round, k_starts = jax.random.split(key)
    x = ratio * valid.astype(jnp.float32) / span_for_count
    n_spans = jnp.maximum(
        min_masks,
        jnp.floor(x + jax.random.uniform(k_round, (batch,)))
        .astype(jnp.int32))  # [B]
    hi = jnp.maximum(1, valid - start_margin)  # [B]
    # without-replacement sample of K starts from [0, hi): rank uniform
    # keys, positions past hi pushed to the back
    u = jax.random.uniform(k_starts, (batch, num_tokens))
    u = jnp.where(jnp.arange(num_tokens)[None, :] < hi[:, None], u, 2.0)
    order = jnp.argsort(u, axis=-1)  # [B, T], first hi entries valid
    starts = jnp.minimum(order[:, :K], hi[:, None] - 1).astype(jnp.int32)
    active = jnp.arange(K)[None, :] < n_spans[:, None]  # [B, K]
    return starts, active, K


def block_token_mask(key, batch: int, num_tokens: int, ratio: float,
                     span: int = 5, min_masks: int = 2, valid=None):
    """Fairseq "static" block masking: fixed span length, overlapping
    spans, span count and start range from each sample's valid length.
    Start range [0, valid - span) matches np.random.choice(sz - span)."""
    starts, active, K = _per_sample_spans(
        key, batch, num_tokens, ratio, span, span, min_masks, valid)
    lengths = jnp.where(active, span, 0).astype(jnp.int32)
    return _span_mask(key, batch, num_tokens, K, (starts, lengths))


def uniform_span_mask(key, batch: int, num_tokens: int, ratio: float,
                      span: int = 5, min_span: int = 2, min_masks: int = 2,
                      valid=None):
    """Fairseq "uniform" masking, distribution-exact: span count uses
    ``span`` as the divisor (NOT the mean drawn length — fairseq divides
    by mask_length, so uniform mode over-masks by ~mean/span), lengths
    uniform in [min_span, 2*span], and the start range is
    [0, valid - min(drawn lengths)) like compute_mask_indices'
    ``min_len = min(lengths)``."""
    if valid is None:
        valid = jnp.full((batch,), num_tokens, dtype=jnp.int32)
    else:
        valid = jnp.asarray(valid, dtype=jnp.int32)
    K = max(min_masks, int(ratio * num_tokens / span) + 1)
    k_round, k_len, k_starts = jax.random.split(key, 3)
    x = ratio * valid.astype(jnp.float32) / span
    n_spans = jnp.maximum(
        min_masks,
        jnp.floor(x + jax.random.uniform(k_round, (batch,)))
        .astype(jnp.int32))
    active = jnp.arange(K)[None, :] < n_spans[:, None]
    lengths = jax.random.randint(k_len, (batch, K), min_span,
                                 2 * span + 1)
    min_len = jnp.min(jnp.where(active, lengths, 2 * span + 1), axis=1)
    hi = jnp.maximum(1, valid - min_len)
    u = jax.random.uniform(k_starts, (batch, num_tokens))
    u = jnp.where(jnp.arange(num_tokens)[None, :] < hi[:, None], u, 2.0)
    order = jnp.argsort(u, axis=-1)
    starts = jnp.minimum(order[:, :K], hi[:, None] - 1).astype(jnp.int32)
    lengths = jnp.where(active, lengths, 0).astype(jnp.int32)
    m = _span_mask(key, batch, num_tokens, K, (starts, lengths))
    # spans longer than min_len may overrun the valid region; fairseq
    # drops those indices (mask_idc[mask_idc < sz])
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
