"""Analytic PSDS validation on hand-computed staircases.

These check compute_psds against exactly derivable cases of the PSDS
definition; test_psds_crossval.py additionally cross-validates against
the reference's vendored psds_eval (patched in-memory for
numpy 2 / pandas 3) on randomized multi-class sets.
"""
import numpy as np
import pandas as pd
import pytest

from audiossl_tpu.sed.psds import compute_psds, event_based_f1


def _df(rows):
    return pd.DataFrame(rows, columns=["filename", "onset", "offset",
                                       "event_label"])


GT = _df([("a.wav", 1.0, 3.0, "Cat"), ("b.wav", 2.0, 5.0, "Cat")])
META = pd.DataFrame({"filename": ["a.wav", "b.wav"],
                     "duration": [1800.0, 1800.0]})  # 1 hour total


def test_psds_two_point_staircase():
    """op0: perfect (TPR 1, eFPR 0); op1: half the GT + 50 spurious
    detections (TPR 0.5, eFPR 50/h). PSD-ROC running-max => TPR = 1 for
    all eFPR >= 0, so PSDS = 1 regardless of op1."""
    spurious = _df([("a.wav", 100 + 2 * i, 100.5 + 2 * i, "Cat")
                    for i in range(50)])
    ops = {0: GT.copy(), 1: pd.concat([GT.iloc[:1], spurious])}
    psds = compute_psds(ops, GT, META, dtc_threshold=0.5,
                        gtc_threshold=0.5, e_max=100.0)
    assert psds == pytest.approx(1.0, abs=1e-3)


def test_psds_staircase_area():
    """Only op: TPR 0.5 at eFPR 50/h -> curve is 0 on [0, 50) and 0.5 on
    [50, 100] -> PSDS = 0.5 * 50 / 100 = 0.25."""
    spurious = _df([("a.wav", 100 + 2 * i, 100.5 + 2 * i, "Cat")
                    for i in range(50)])
    ops = {0: pd.concat([GT.iloc[:1], spurious])}
    psds = compute_psds(ops, GT, META, dtc_threshold=0.5,
                        gtc_threshold=0.5, e_max=100.0)
    assert psds == pytest.approx(0.25, abs=5e-3)


def test_psds_dtc_rejects_bad_overlap():
    """A detection overlapping its GT by <50% of its own duration fails
    the DTC -> it is an FP and the GT is not detected."""
    det = _df([("a.wav", 2.5, 8.0, "Cat")])  # overlap 0.5 of 5.5 < 0.5
    psds = compute_psds({0: det}, GT, META, dtc_threshold=0.5,
                        gtc_threshold=0.5, e_max=100.0)
    assert psds == pytest.approx(0.0, abs=1e-6)


def test_psds_gtc_accepts_good_overlap():
    """Detection covering >=50% of the GT passes DTC+GTC -> TP."""
    det = _df([("a.wav", 1.0, 2.2, "Cat"), ("b.wav", 2.0, 4.0, "Cat")])
    psds = compute_psds({0: det}, GT, META, dtc_threshold=0.5,
                        gtc_threshold=0.5, e_max=100.0)
    assert psds == pytest.approx(1.0, abs=1e-3)


def test_psds_alpha_st_penalizes_class_variance():
    """Two classes, one perfectly detected, one missed entirely:
    mean TPR 0.5, std 0.5 -> effective TPR 0 with alpha_st=1."""
    gt = _df([("a.wav", 1.0, 3.0, "Cat"), ("a.wav", 5.0, 7.0, "Dog")])
    det = _df([("a.wav", 1.0, 3.0, "Cat")])
    p0 = compute_psds({0: det}, gt, META, dtc_threshold=0.5,
                      gtc_threshold=0.5, alpha_st=0.0, e_max=100.0)
    p1 = compute_psds({0: det}, gt, META, dtc_threshold=0.5,
                      gtc_threshold=0.5, alpha_st=1.0, e_max=100.0)
    assert p0 == pytest.approx(0.5, abs=1e-3)
    assert p1 == pytest.approx(0.0, abs=1e-6)


def test_psds_cross_trigger_penalty():
    """alpha_ct shifts a class's eFPR by its cross-trigger rate: a Dog
    detection failing DTC but covering a Cat GT counts against Dog."""
    gt = _df([("a.wav", 1.0, 3.0, "Cat"), ("a.wav", 5.0, 7.0, "Dog")])
    # perfect Dog + a Dog detection sitting on the Cat event
    det = _df([("a.wav", 5.0, 7.0, "Dog"), ("a.wav", 1.0, 3.0, "Dog"),
               ("a.wav", 1.0, 3.0, "Cat")])
    p_no_ct = compute_psds({0: det}, gt, META, dtc_threshold=0.9,
                           gtc_threshold=0.9, cttc_threshold=0.3,
                           alpha_ct=0.0, e_max=100.0)
    p_ct = compute_psds({0: det}, gt, META, dtc_threshold=0.9,
                        gtc_threshold=0.9, cttc_threshold=0.3,
                        alpha_ct=0.5, e_max=100.0)
    # cross-trigger penalty can only lower the score
    assert p_ct <= p_no_ct + 1e-9


def test_event_f1_collar():
    det = _df([("a.wav", 1.1, 3.1, "Cat"), ("b.wav", 2.0, 5.0, "Cat")])
    # onset within 0.2 collar, offset within max(0.2, 0.2*2.0)=0.4
    assert event_based_f1(det, GT) == pytest.approx(1.0)
    det_bad = _df([("a.wav", 1.5, 3.0, "Cat")])
    assert event_based_f1(det_bad, GT) < 1.0


def _naive_event_f1(detections, ground_truth, t_collar=0.2,
                    percentage_of_length=0.2):
    """Direct transliteration of the sed_eval greedy collar matching
    (the pre-vectorization loop), kept as the equivalence oracle."""
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


def test_event_f1_matches_naive_randomized():
    """Vectorized event_based_f1 == the original greedy loop on random
    multi-class, multi-file scenarios (incl. overlapping/duplicate
    events that exercise the first-unused-detection tie-break)."""
    rng = np.random.RandomState(7)
    labels = [f"c{i}" for i in range(6)]
    files = [f"f{i}.wav" for i in range(8)]
    for trial in range(10):
        def rand_events(n):
            onset = rng.uniform(0, 90, n)
            dur = rng.uniform(0.2, 8.0, n)
            return _df(list(zip(
                rng.choice(files, n), onset, onset + dur,
                rng.choice(labels, n))))
        gt = rand_events(40)
        # detections: jittered copies of half the GT + random clutter
        base = gt.sample(n=20, random_state=trial).copy()
        base.onset += rng.uniform(-0.3, 0.3, len(base))
        base.offset += rng.uniform(-0.5, 0.5, len(base))
        det = pd.concat([base, rand_events(25)], ignore_index=True)
        got = event_based_f1(det, gt)
        want = _naive_event_f1(det, gt)
        assert got == pytest.approx(want, abs=1e-12), (trial, got, want)
