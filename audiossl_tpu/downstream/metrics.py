"""Evaluation metrics: top-1 accuracy and macro mAP.

Reference ``methods/atst/downstream/utils.py:142-178`` accumulates
predictions across DDP ranks with a padded all_gather, then computes
sklearn average_precision per class (NaN-filtered) or top-1 accuracy.
Under SPMD the accumulation is host-side numpy over already-global
batches (jit outputs are replicated), so no collective is needed; the
math matches sklearn exactly.
"""
from __future__ import annotations

from typing import List

import numpy as np


def top1_accuracy(logits: np.ndarray, targets: np.ndarray) -> float:
    return float((logits.argmax(-1) == targets).mean())


def average_precision(scores: np.ndarray, targets: np.ndarray) -> float:
    """Binary AP for one class, sklearn 'average_precision_score'
    semantics (step-wise integral of P at each recall change)."""
    order = np.argsort(-scores, kind="stable")
    t = targets[order]
    npos = t.sum()
    if npos == 0:
        return float("nan")
    tp = np.cumsum(t)
    precision = tp / np.arange(1, len(t) + 1)
    recall_step = t / npos
    return float(np.sum(precision * recall_step))


def mean_average_precision(scores: np.ndarray, targets: np.ndarray) -> float:
    """Macro mAP over classes, NaN classes dropped (reference Metric)."""
    aps = [average_precision(scores[:, c], targets[:, c])
           for c in range(scores.shape[1])]
    aps = [a for a in aps if not np.isnan(a)]
    return float(np.mean(aps)) if aps else 0.0


class Metric:
    """Accumulate (pred, target) batches; compute mAP or ACC
    (reference downstream/utils.py:142-178)."""

    def __init__(self, mode: str = "ACC"):
        assert mode in ("ACC", "mAP")
        self.mode = mode
        self._preds: List[np.ndarray] = []
        self._targets: List[np.ndarray] = []

    def update(self, pred, target):
        self._preds.append(np.asarray(pred))
        self._targets.append(np.asarray(target))

    def compute(self) -> float:
        preds = np.concatenate(self._preds)
        targets = np.concatenate(self._targets)
        if self.mode == "mAP":
            return mean_average_precision(preds, targets)
        return top1_accuracy(preds, targets)

    def reset(self):
        self._preds, self._targets = [], []
