"""Intersection-based SED metrics, static-shape jax.

Reference ``downstream/utils_psds_eval/gpu_decode.py:85-229``
(SEDMetrics): events are contiguous runs of OR(pred, truth) per
(clip, class); each event scores ratio = Σpred/Σtruth inside the event
and is exactly one of TP (thd <= ratio < 1/thd), FP (ratio >= 1/thd) or
FN (ratio < thd). The reference extracts events with argwhere + a
[T+1, T] triu mask (dynamic shapes, GPU); here events get static ids
via a cumulative-sum labeling and per-event sums via vmapped
segment_sum, so the whole thing jits for TPU.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _event_sums(active: jnp.ndarray, *values: jnp.ndarray):
    """active: [R, T] bool (R = B*C rows). Returns (is_event [R, E],
    per-event sums of each `values` [R, E]) with E = T//2 + 1 (max
    possible contiguous runs)."""
    R, T = active.shape
    E = T // 2 + 2
    prev = jnp.pad(active[:, :-1], ((0, 0), (1, 0)))
    starts = active & ~prev
    eid = jnp.cumsum(starts, axis=-1) - 1  # [R, T], -1 before 1st event
    # inactive frames -> scratch bucket E-1
    ids = jnp.where(active, jnp.clip(eid, 0, E - 1), E - 1)

    def seg(vals, i):
        return jax.ops.segment_sum(vals, i, num_segments=E)

    n_events = jnp.sum(starts, axis=-1)  # [R]
    is_event = jnp.arange(E)[None, :] < n_events[:, None]
    is_event = is_event.at[:, E - 1].set(False)
    sums = [jax.vmap(seg)(v.astype(jnp.float32), ids) for v in values]
    return is_event, sums


def intersection_stats(preds: jnp.ndarray, truths: jnp.ndarray,
                       thd: float = 0.7
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                  jnp.ndarray]:
    """preds/truths: [B, C, T] binary. Returns per-(clip, class) event
    stats summed over events: tp/fp/fn [B, C] plus n_events [B, C]."""
    B, C, T = preds.shape
    p = preds.reshape(B * C, T) > 0.5
    t = truths.reshape(B * C, T) > 0.5
    active = p | t
    is_event, (p_sum, t_sum) = _event_sums(active, p, t)
    ratio = p_sum / (t_sum + 1e-7)
    longer = ratio >= thd
    shorter = ratio < 1.0 / thd
    tp = longer & shorter & is_event
    fp = longer & ~shorter & is_event
    fn = shorter & ~longer & is_event
    shape = (B, C)
    return (jnp.sum(tp, -1).reshape(shape).astype(jnp.float32),
            jnp.sum(fp, -1).reshape(shape).astype(jnp.float32),
            jnp.sum(fn, -1).reshape(shape).astype(jnp.float32),
            jnp.sum(is_event, -1).reshape(shape).astype(jnp.float32))


def true_negative_stats(preds: jnp.ndarray, neg_truths: jnp.ndarray
                        ) -> jnp.ndarray:
    """TN events: runs of neg_truth fully covered by `preds`
    (reference compute_tn, gpu_decode.py:127-148). preds here is the
    NEGATED hard prediction. -> [B, C] counts."""
    B, C, T = preds.shape
    p = preds.reshape(B * C, T) > 0.5
    n = neg_truths.reshape(B * C, T) > 0.5
    is_event, (p_sum, n_sum) = _event_sums(n, p & n, n)
    tn = (p_sum >= n_sum - 1e-6) & is_event
    return jnp.sum(tn, -1).reshape(B, C).astype(jnp.float32)


def f1_from_stats(tp, fp, fn, eps: float = 1e-7) -> jnp.ndarray:
    """Macro F1 over classes from accumulated per-class counts [C]."""
    f1 = tp / (tp + 0.5 * (fp + fn) + eps)
    return jnp.mean(jnp.nan_to_num(f1))


def clip_avg_f1(preds, truths, thd: float = 0.5) -> jnp.ndarray:
    """Per-clip F1 averaged over the batch (reference compute_avg_f1,
    gpu_decode.py:150-161 — the DCASE val objective)."""
    tp, fp, fn, n_ev = intersection_stats(preds, truths, thd)
    tp_clip = jnp.sum(tp, -1)
    all_clip = jnp.sum(n_ev, -1)
    f = tp_clip / (0.5 * tp_clip + 0.5 * all_clip)
    return jnp.mean(jnp.nan_to_num(f))


class SEDMetrics:
    """Host-side accumulator matching reference SEDMetrics usage."""

    def __init__(self, intersection_thd: float = 0.5):
        self.thd = intersection_thd
        self.reset()

    def reset(self):
        self.tp = 0.0
        self.fp = 0.0
        self.fn = 0.0
        self.tn = 0.0

    def accumulate(self, preds, truths):
        tp, fp, fn, _ = intersection_stats(jnp.asarray(preds),
                                           jnp.asarray(truths), self.thd)
        self.tp = self.tp + np.asarray(tp).sum(0)
        self.fp = self.fp + np.asarray(fp).sum(0)
        self.fn = self.fn + np.asarray(fn).sum(0)

    def macro_f1(self) -> float:
        f1 = self.tp / (self.tp + 0.5 * (self.fp + self.fn) + 1e-7)
        out = float(np.mean(np.nan_to_num(f1)))
        self.reset()
        return out


class WeakF1Accumulator:
    """Clip-level (weak-label) multilabel macro F1 at threshold 0.5.

    Matches torchmetrics ``F1Score(num_labels=C, average="macro",
    task="multilabel")`` as used for the reference's validation
    objective (``utils_dcase/model_dcase.py:116-120,175``): scores are
    binarized at 0.5, per-class tp/fp/fn accumulate across batches,
    ``f1_c = 2tp/(2tp+fp+fn)`` (0 when the denominator is 0), macro
    mean over ALL classes.
    """

    def __init__(self, threshold: float = 0.5):
        self.threshold = threshold
        self.reset()

    def reset(self):
        self.tp = 0.0
        self.fp = 0.0
        self.fn = 0.0

    def accumulate(self, scores, targets):
        """scores [B, C] in [0,1]; targets [B, C] in {0,1}."""
        pred = (np.asarray(scores) >= self.threshold)
        t = np.asarray(targets) > 0.5
        self.tp = self.tp + (pred & t).sum(0).astype(np.float64)
        self.fp = self.fp + (pred & ~t).sum(0).astype(np.float64)
        self.fn = self.fn + (~pred & t).sum(0).astype(np.float64)

    def macro_f1(self) -> float:
        denom = 2 * self.tp + self.fp + self.fn
        f1 = np.where(denom > 0, 2 * self.tp / np.maximum(denom, 1), 0.0)
        out = float(np.mean(f1))
        self.reset()
        return out


def auc_from_curves(tpr: np.ndarray, fpr: np.ndarray) -> float:
    """Mean per-class trapezoid AUC of (fpr, tpr) curves [n_thds, C]."""
    aucs = []
    for c in range(tpr.shape[1]):
        x = fpr[::-1, c]
        y = tpr[::-1, c]
        ok = ~(np.isnan(x) | np.isnan(y))
        if ok.sum() < 2:
            continue
        aucs.append(np.trapezoid(y[ok], x[ok]))
    return float(np.mean(aucs)) if aucs else 0.0


def d_prime(auc: float) -> float:
    from scipy import stats

    return float(stats.norm().ppf(auc) * math.sqrt(2.0))
