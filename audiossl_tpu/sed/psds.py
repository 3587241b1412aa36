"""Polyphonic Sound Detection Score (PSDS) + collar-based event F1.

Host-side scoring (offline test-time code, like the reference's
vendored ``utils_psds_eval/psds.py``), implemented compactly from the
PSDS definition (Bilen et al., ICASSP 2020):

* DTC: a detection is valid iff the summed intersection with same-class
  ground truths covers >= dtc_threshold of the detection's duration;
* GTC: a ground truth counts as TP iff DTC-valid detections cover
  >= gtc_threshold of its duration;
* CTTC: invalid detections count as cross-triggers against other
  classes' ground truths when covered >= cttc_threshold;
* per operating point, per class: eTPR = TP/#GT, eFPR = #FP per hour,
  cross-trigger rate folded in with alpha_ct; the PSD-ROC takes the
  running max TPR over operating points sorted by eFPR, the effective
  TPR subtracts alpha_st * std across classes, and PSDS is the
  normalized area under the curve up to e_max FP/hour.

DCASE scenario 1: dtc=gtc=0.7, alpha_ct=0, alpha_st=1.
DCASE scenario 2: dtc=gtc=0.1, cttc=0.3, alpha_ct=0.5, alpha_st=1.

Also: sed_eval-style event-based macro F1 with onset/offset collars.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np
import pandas as pd


@dataclasses.dataclass
class PSDSConfig:
    dtc_threshold: float = 0.5
    gtc_threshold: float = 0.5
    cttc_threshold: float = 0.3
    alpha_ct: float = 0.0
    alpha_st: float = 0.0
    e_max: float = 100.0  # FP per hour


def _intersection(a_on, a_off, b_on, b_off):
    return np.maximum(
        0.0, np.minimum(a_off, b_off) - np.maximum(a_on, b_on))


def _per_op_counts(det: pd.DataFrame, gt: pd.DataFrame,
                   classes: List[str], cfg: PSDSConfig):
    """One operating point -> (tp [C], fp [C], ct [C, C])."""
    C = len(classes)
    cidx = {c: i for i, c in enumerate(classes)}
    tp = np.zeros(C)
    fp = np.zeros(C)
    ct = np.zeros((C, C))
    gt_by = dict(tuple(gt.groupby(["filename", "event_label"])))

    # detections of classes with no ground truth cannot score TPs and
    # have no per-class FP bucket — drop them (psds_eval restricts its
    # class list to the ground-truth classes)
    det = det[det.event_label.isin(cidx)].copy()
    if len(det):
        det["dur"] = det.offset - det.onset

    valid_flags = np.zeros(len(det), bool)
    for pos, (i, d) in enumerate(det.iterrows()):
        key = (d.filename, d.event_label)
        g = gt_by.get(key)
        if g is not None and d.dur > 0:
            inter = _intersection(d.onset, d.offset, g.onset.values,
                                  g.offset.values).sum()
            if inter / d.dur >= cfg.dtc_threshold:
                valid_flags[pos] = True

    det["dtc_valid"] = valid_flags

    # GTC: ground truths covered by valid detections
    for (fname, cls), g in gt_by.items():
        dv = det[(det.filename == fname) & (det.event_label == cls)
                 & det.dtc_valid]
        for _, row in g.iterrows():
            dur = row.offset - row.onset
            if dur <= 0:
                continue
            inter = _intersection(row.onset, row.offset, dv.onset.values,
                                  dv.offset.values).sum() if len(dv) else 0.0
            if inter / dur >= cfg.gtc_threshold:
                tp[cidx[cls]] += 1

    # FPs: detections failing DTC
    inval = det[~det.dtc_valid]
    for _, d in inval.iterrows():
        fp[cidx[d.event_label]] += 1

    # CTTC: invalid detections vs other-class ground truths
    if cfg.alpha_ct > 0:
        for _, d in inval.iterrows():
            if d.dur <= 0:
                continue
            for cls in classes:
                if cls == d.event_label:
                    continue
                g = gt_by.get((d.filename, cls))
                if g is None:
                    continue
                inter = _intersection(d.onset, d.offset, g.onset.values,
                                      g.offset.values).sum()
                if inter / d.dur >= cfg.cttc_threshold:
                    ct[cidx[d.event_label], cidx[cls]] += 1
    return tp, fp, ct


def compute_psds(detections: Dict[float, pd.DataFrame],
                 ground_truth: pd.DataFrame,
                 durations: pd.DataFrame,
                 dtc_threshold: float = 0.5,
                 gtc_threshold: float = 0.5,
                 cttc_threshold: float = 0.3,
                 alpha_ct: float = 0.0,
                 alpha_st: float = 0.0,
                 e_max: float = 100.0) -> float:
    """detections: {operating_point: events df}; ground_truth: events df
    (filename/onset/offset/event_label); durations: df with
    filename/duration seconds. -> PSDS in [0, 1]."""
    cfg = PSDSConfig(dtc_threshold, gtc_threshold, cttc_threshold,
                     alpha_ct, alpha_st, e_max)
    classes = sorted(ground_truth.event_label.dropna().unique())
    C = len(classes)
    total_hours = durations.duration.sum() / 3600.0
    n_gt = np.array([
        (ground_truth.event_label == c).sum() for c in classes],
        dtype=np.float64)
    gt_dur_per_class = np.array([
        (ground_truth[ground_truth.event_label == c].offset
         - ground_truth[ground_truth.event_label == c].onset).sum()
        for c in classes]) / 3600.0

    ops = []
    for op, det in detections.items():
        det = det.dropna(subset=["event_label"])
        tp, fp, ct = _per_op_counts(det, ground_truth, classes, cfg)
        tpr = np.divide(tp, n_gt, out=np.zeros(C), where=n_gt > 0)
        efpr = fp / max(total_hours, 1e-9)
        if cfg.alpha_ct > 0:
            ctr = np.zeros(C)
            for i in range(C):
                rates = [ct[i, j] / max(gt_dur_per_class[j], 1e-9)
                         for j in range(C) if j != i]
                ctr[i] = np.mean(rates) if rates else 0.0
            efpr = efpr + cfg.alpha_ct * ctr
        ops.append((tpr, efpr))

    # PSD-ROC: per class running-max TPR vs eFPR staircase
    grid = np.linspace(0, e_max, 1001)
    tpr_at = np.zeros((len(grid), C))
    for c in range(C):
        pts = sorted([(op[1][c], op[0][c]) for op in ops])
        xs = np.array([p[0] for p in pts])
        ys = np.maximum.accumulate(np.array([p[1] for p in pts]))
        for gi, e in enumerate(grid):
            k = np.searchsorted(xs, e, side="right") - 1
            tpr_at[gi, c] = ys[k] if k >= 0 else 0.0
    etpr = tpr_at.mean(axis=1) - alpha_st * tpr_at.std(axis=1)
    etpr = np.maximum(etpr, 0.0)
    return float(np.trapezoid(etpr, grid) / e_max)


def event_based_f1(detections: pd.DataFrame, ground_truth: pd.DataFrame,
                   t_collar: float = 0.2,
                   percentage_of_length: float = 0.2) -> float:
    """sed_eval-style event-based macro F1 with onset/offset collars
    (reference log_sedeval_metrics usage, gpu_decode.py:313-401)."""
    classes = sorted(ground_truth.event_label.dropna().unique())
    f1s = []
    for cls in classes:
        tp = 0
        d_all = detections[detections.event_label == cls]
        g_all = ground_truth[ground_truth.event_label == cls]
        for fname in set(g_all.filename) | set(d_all.filename):
            d = d_all[d_all.filename == fname].reset_index()
            g = g_all[g_all.filename == fname].reset_index()
            used = np.zeros(len(d), bool)
            for _, ge in g.iterrows():
                dur = ge.offset - ge.onset
                off_collar = max(t_collar, percentage_of_length * dur)
                for di in range(len(d)):
                    if used[di]:
                        continue
                    de = d.iloc[di]
                    if (abs(de.onset - ge.onset) <= t_collar and
                            abs(de.offset - ge.offset) <= off_collar):
                        used[di] = True
                        tp += 1
                        break
        fp = len(d_all) - tp
        fn = len(g_all) - tp
        denom = tp + 0.5 * (fp + fn)
        f1s.append(tp / denom if denom > 0 else 0.0)
    return float(np.mean(f1s)) if f1s else 0.0
