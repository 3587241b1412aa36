"""SED protocol parity pieces: weak macro-F1 (torchmetrics-equivalent),
MixedBatchLoader epoch mode, DCASE weak train/val split, TopKKeeper."""
import os

import numpy as np
import pandas as pd
import pytest

from audiossl_tpu.sed.metrics import WeakF1Accumulator
from audiossl_tpu.datasets.sed import MixedBatchLoader
from audiossl_tpu.training.checkpoint import TopKKeeper


def _sklearn_macro_f1(scores, targets, thd=0.5):
    from sklearn.metrics import f1_score

    return f1_score(targets > 0.5, scores >= thd, average="macro",
                    zero_division=0)


def test_weak_f1_matches_sklearn_macro():
    rng = np.random.RandomState(0)
    scores = rng.rand(64, 10)
    targets = (rng.rand(64, 10) > 0.7).astype(np.float32)
    acc = WeakF1Accumulator()
    # accumulate across several batches
    for lo in range(0, 64, 16):
        acc.accumulate(scores[lo:lo + 16], targets[lo:lo + 16])
    got = acc.macro_f1()
    want = _sklearn_macro_f1(scores, targets)
    assert got == pytest.approx(want, abs=1e-6)


def test_weak_f1_empty_class_counts_zero():
    scores = np.zeros((4, 3))
    targets = np.zeros((4, 3))
    targets[:, 0] = 1.0
    scores[:, 0] = 0.9
    acc = WeakF1Accumulator()
    acc.accumulate(scores, targets)
    # class 0 f1=1, classes 1-2 have no tp/fp/fn -> 0 (torchmetrics
    # macro over ALL classes)
    assert acc.macro_f1() == pytest.approx(1.0 / 3.0)


class _FakeDs:
    def __init__(self, n, tag):
        self.n = n
        self.tag = tag

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return (np.zeros(16, np.float32),
                np.zeros((4, 2), np.float32), f"{self.tag}{i}")


def test_mixed_batch_loader_mode_governs_epoch():
    a, b = _FakeDs(20, "a"), _FakeDs(100, "b")
    # mode 0: epoch = 20 // 2 = 10 steps
    assert len(MixedBatchLoader([a, b], [2, 5], mode=0)) == 10
    # mode 1 (reference batch_len_index: 1): epoch = 100 // 5 = 20
    loader = MixedBatchLoader([a, b], [2, 5], mode=1)
    assert len(loader) == 20
    batches = list(loader)
    assert len(batches) == 20
    assert batches[0]["wav"].shape[0] == 7
    assert (batches[0]["source"] == [0, 0, 1, 1, 1, 1, 1]).all()


def test_dcase_weak_split(tmp_path):
    from audiossl_tpu.datasets.sed import _weak_train_val_split

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "weak_train"), exist_ok=True)
    n = 30
    pd.DataFrame({
        "filename": [f"f{i}.wav" for i in range(n)],
        "event_labels": ["Dog"] * n,
    }).to_csv(os.path.join(root, "weak_train/meta.tsv"),
              sep="\t", index=False)
    tr, va = _weak_train_val_split(root, 0.9, 42)
    assert len(tr) == 27 and len(va) == 3
    assert set(tr.filename) | set(va.filename) == \
        {f"f{i}.wav" for i in range(n)}
    assert set(tr.filename).isdisjoint(set(va.filename))
    # deterministic given the seed (reference random_state=seed)
    tr2, va2 = _weak_train_val_split(root, 0.9, 42)
    assert list(va.filename) == list(va2.filename)


def test_topk_keeper_persists_and_restores(tmp_path):
    keep = TopKKeeper(str(tmp_path), k=2, mode="max")
    s = lambda v: {"w": np.full((3,), v, np.float32)}
    assert keep.update(0.1, 0, s(0.1))
    assert keep.update(0.3, 1, s(0.3))
    assert keep.update(0.2, 2, s(0.2))   # evicts 0.1
    assert not keep.update(0.05, 3, s(0.05))  # below the worst kept
    assert keep.best_tag == 1
    assert keep.best_metric == pytest.approx(0.3)
    assert sorted(os.listdir(os.path.join(str(tmp_path), "top"))) == \
        ["1", "2", "index.json"]
    best = keep.restore_best(s(0.0))
    np.testing.assert_allclose(best["w"], 0.3)
    # crash-restart: a fresh keeper reads the same index from disk
    keep2 = TopKKeeper(str(tmp_path), k=2, mode="max")
    assert keep2.best_tag == 1
    best2 = keep2.restore_best(s(0.0))
    np.testing.assert_allclose(best2["w"], 0.3)


def test_topk_keeper_min_mode(tmp_path):
    keep = TopKKeeper(str(tmp_path), k=1, mode="min")
    s = lambda v: {"w": np.full((2,), v, np.float32)}
    keep.update(1.0, 0, s(1.0))
    assert keep.update(0.5, 1, s(0.5))
    assert not keep.update(2.0, 2, s(2.0))
    assert keep.best_tag == 1


def test_topk_index_records_mode_and_best_selection(tmp_path):
    """The index file records the monitor mode so consumers (the
    distill teacher loader) pick the BEST entry: for a min-mode keeper
    (AS-strong val loss) that is the LOWEST score, not max()."""
    from audiossl_tpu.training.checkpoint import read_topk_index

    keeper = TopKKeeper(str(tmp_path), k=3, mode="min")
    state = {"w": np.zeros(2, np.float32)}
    keeper.update(0.9, 1, state)
    keeper.update(0.3, 2, state)
    keeper.update(0.6, 3, state)
    scores, mode = read_topk_index(
        os.path.join(str(tmp_path), "top", "index.json"))
    assert mode == "min"
    sel = max if mode == "max" else min
    assert sel(scores, key=lambda t: scores[t]) == 2
    assert keeper.best_tag == 2

    # legacy flat index files still read (mode defaults to "max")
    import json
    legacy = tmp_path / "legacy.json"
    legacy.write_text(json.dumps({"1": 0.5, "2": 0.8}))
    scores, mode = read_topk_index(str(legacy))
    assert mode == "max" and scores == {1: 0.5, 2: 0.8}
