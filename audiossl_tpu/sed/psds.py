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
    """One operating point -> (tp [C], fp [C], ct [C, C]).

    Fully vectorized (pairwise det×gt merges + groupby sums) — the
    AS-strong scale (50 thresholds × 407 classes) evaluates in seconds
    rather than the former O(n²) ``iterrows`` loops.
    """
    C = len(classes)
    cidx = {c: i for i, c in enumerate(classes)}
    tp = np.zeros(C)
    fp = np.zeros(C)
    ct = np.zeros((C, C))

    # detections of classes with no ground truth cannot score TPs and
    # have no per-class FP bucket — drop them (psds_eval restricts its
    # class list to the ground-truth classes)
    det = det[det.event_label.isin(cidx)].reset_index(drop=True)
    det = det.assign(det_id=np.arange(len(det)),
                     dur=det.offset - det.onset)
    gt = gt.assign(gt_id=np.arange(len(gt)),
                   gt_dur=gt.offset - gt.onset)

    # pairwise same-class same-file intersections
    pair = det.merge(gt, on=["filename", "event_label"],
                     suffixes=("", "_gt"))
    if len(pair):
        pair["inter"] = _intersection(pair.onset.values,
                                      pair.offset.values,
                                      pair.onset_gt.values,
                                      pair.offset_gt.values)
    else:
        pair["inter"] = np.zeros(0)

    # DTC: summed same-class intersection covers >= dtc of the detection
    inter_by_det = pair.groupby("det_id")["inter"].sum()
    dtc_ratio = np.zeros(len(det))
    if len(inter_by_det):
        dtc_ratio[inter_by_det.index.values] = inter_by_det.values
    with np.errstate(divide="ignore", invalid="ignore"):
        dtc_ratio = np.where(det.dur.values > 0,
                             dtc_ratio / np.maximum(det.dur.values, 1e-30),
                             0.0)
    dtc_valid = dtc_ratio >= cfg.dtc_threshold
    det["dtc_valid"] = dtc_valid

    # GTC: ground truths covered >= gtc by DTC-valid detections
    if len(pair):
        pv = pair[dtc_valid[pair.det_id.values]]
        inter_by_gt = pv.groupby("gt_id")["inter"].sum()
        cov = np.zeros(len(gt))
        if len(inter_by_gt):
            cov[inter_by_gt.index.values] = inter_by_gt.values
        ok = (gt.gt_dur.values > 0) & (
            cov / np.maximum(gt.gt_dur.values, 1e-30)
            >= cfg.gtc_threshold)
        if ok.any():
            np.add.at(tp, [cidx[c] for c in gt.event_label.values[ok]], 1)

    # FPs: detections failing DTC
    inval = det[~det.dtc_valid]
    if len(inval):
        np.add.at(fp, [cidx[c] for c in inval.event_label.values], 1)

    # CTTC: invalid detections vs other-class ground truths
    if cfg.alpha_ct > 0 and len(inval):
        cross = inval.merge(gt, on="filename", suffixes=("", "_gt"))
        cross = cross[cross.event_label != cross.event_label_gt]
        if len(cross):
            cross["inter"] = _intersection(cross.onset.values,
                                           cross.offset.values,
                                           cross.onset_gt.values,
                                           cross.offset_gt.values)
            s = cross.groupby(["det_id", "event_label_gt"]).agg(
                inter=("inter", "sum"), dur=("dur", "first"),
                det_cls=("event_label", "first")).reset_index()
            hit = s[(s.dur > 0)
                    & (s.inter / np.maximum(s.dur, 1e-30)
                       >= cfg.cttc_threshold)]
            for dc, gc in zip(hit.det_cls.values,
                              hit.event_label_gt.values):
                ct[cidx[dc], cidx[gc]] += 1
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

    # PSD-ROC exactly as psds_eval (psds.py:700-786,1004-1078): pad a
    # zero operating point per class, evaluate each class's running-max
    # staircase at the UNION of all eFPR breakpoints (left step), then
    # integrate mean - alpha_st*std with left rectangles up to e_max.
    tprs = np.stack([op[0] for op in ops] + [np.zeros(C)], axis=0)
    efprs = np.stack([op[1] for op in ops] + [np.zeros(C)], axis=0)
    xp = np.unique(efprs[np.isfinite(efprs)])
    curves = np.zeros((C, xp.size))
    for c in range(C):
        order = np.argsort(efprs[:, c], kind="stable")
        xs = efprs[order, c]
        ys = np.maximum.accumulate(tprs[order, c])
        idx = np.searchsorted(xs, xp, side="right") - 1
        curves[c] = np.where(idx >= 0, ys[np.maximum(idx, 0)], 0.0)
    etpr = curves.mean(axis=0) - alpha_st * curves.std(axis=0)
    etpr = np.maximum(np.nan_to_num(etpr), 0.0)
    # left-rectangle area over [0, e_max] (psds_eval._auc inserts e_max
    # carrying the previous y)
    if e_max not in xp:
        k = int(np.searchsorted(xp, e_max))
        xp = np.insert(xp, k, e_max)
        etpr = np.insert(etpr, k, etpr[k - 1] if k > 0 else 0.0)
    m = xp <= e_max
    return float(np.sum(np.diff(xp[m]) * etpr[m][:-1]) / e_max)


def event_based_f1(detections: pd.DataFrame, ground_truth: pd.DataFrame,
                   t_collar: float = 0.2,
                   percentage_of_length: float = 0.2) -> float:
    """sed_eval-style event-based macro F1 with onset/offset collars
    (reference log_sedeval_metrics usage, gpu_decode.py:313-401)."""
    classes = sorted(ground_truth.event_label.dropna().unique())
    cidx = {c: i for i, c in enumerate(classes)}
    tp = np.zeros(len(classes))
    n_det = np.zeros(len(classes))
    n_gt = np.zeros(len(classes))
    for c, n in detections.event_label.value_counts().items():
        if c in cidx:
            n_det[cidx[c]] = n
    for c, n in ground_truth.event_label.value_counts().items():
        n_gt[cidx[c]] = n

    # group by (class, file) once; per group do the sed_eval greedy match
    # on numpy arrays (eligibility matrix + first-unused-hit scan) instead
    # of the former O(G*D) pandas iterrows/iloc loops.
    def _groups(df):
        out = {}
        for (c, f), sub in df.groupby(["event_label", "filename"],
                                      sort=False):
            out[(c, f)] = (sub.onset.to_numpy(float),
                           sub.offset.to_numpy(float))
        return out

    dg = _groups(detections)
    gg = _groups(ground_truth)
    for key, (g_on, g_off) in gg.items():
        cls = key[0]
        if cls not in cidx or key not in dg:
            continue
        d_on, d_off = dg[key]
        off_collar = np.maximum(t_collar,
                                percentage_of_length * (g_off - g_on))
        # elig[i, j]: detection j within collars of ground truth i
        elig = ((np.abs(d_on[None, :] - g_on[:, None]) <= t_collar) &
                (np.abs(d_off[None, :] - g_off[:, None])
                 <= off_collar[:, None]))
        used = np.zeros(len(d_on), bool)
        hits = 0
        for i in range(len(g_on)):  # greedy: first unused eligible det
            cand = elig[i] & ~used
            j = int(np.argmax(cand))
            if cand[j]:
                used[j] = True
                hits += 1
        tp[cidx[cls]] += hits

    fp = n_det - tp
    fn = n_gt - tp
    denom = tp + 0.5 * (fp + fn)
    f1s = np.where(denom > 0, tp / np.maximum(denom, 1e-12), 0.0)
    return float(np.mean(f1s)) if len(classes) else 0.0
