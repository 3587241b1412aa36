"""Packed store, registry, and batch loader tests."""
import os

import numpy as np
import pytest

from audiossl_tpu.datasets import (
    BatchLoader,
    PackedAudioDataset,
    PackedReader,
    PackedWriter,
    get_dataset,
    list_all_datasets,
    write_synthetic_pack,
)


def test_registry_names_match_reference():
    names = set(list_all_datasets())
    # reference registrations (datasets/__init__.py:16-67)
    for want in ("voxceleb1", "us8k", "nsynth", "spcv2", "fsd50k",
                 "audioset_b", "audioset"):
        assert want in names
    info = get_dataset("voxceleb1")
    assert info.num_labels == 1251 and not info.multi_label
    assert get_dataset("us8k").num_folds == 10
    assert get_dataset("audioset").multi_label
    assert get_dataset("audioset").num_labels == 527
    with pytest.raises(KeyError):
        get_dataset("nope")


def test_packed_roundtrip(tmp_path):
    path = str(tmp_path)
    with PackedWriter(os.path.join(path, "train.ards")) as w:
        w.add(np.arange(100, dtype=np.int16), 3)
        w.add(np.ones(50, np.float32) * 0.5, np.array([1.0, 0.0],
                                                      np.float32))
    r = PackedReader(os.path.join(path, "train.ards"))
    assert len(r) == 2
    wav, label, sr = r.read(0)
    assert sr == 16000 and label == 3
    np.testing.assert_allclose(wav, np.arange(100) / 32768.0, atol=1e-6)
    wav2, label2, _ = r.read(1)
    np.testing.assert_allclose(wav2, 0.5)
    np.testing.assert_array_equal(label2, [1.0, 0.0])
    assert r.num_samples(0) == 100 and r.num_samples(1) == 50


def test_packed_dataset_subset_cycles(tmp_path):
    write_synthetic_pack(str(tmp_path), "train", 20, min_s=0.1, max_s=0.2)
    ds = PackedAudioDataset(str(tmp_path), "train", subset=5)
    # epoch length == subset (reference lmdb.py:33-38)
    assert len(ds) == 5
    assert len(set(ds.keys.tolist())) == 5
    first = set(ds.keys.tolist())
    # cycle() rotates the subset window through the remaining keys
    # (lmdb.py:83-91); the next window is disjoint until wraparound
    ds.cycle()
    assert len(ds) == 5
    second = set(ds.keys.tolist())
    assert first.isdisjoint(second)
    seen = first | second
    for _ in range(2):
        ds.cycle()
        seen |= set(ds.keys.tolist())
    assert seen == set(range(20))  # all keys reached over 4 windows
    full = PackedAudioDataset(str(tmp_path), "train")
    assert len(set(full.keys.tolist())) == 20
    wav, label = full[0]
    assert wav.dtype == np.float32


def test_get_length_heuristic(tmp_path):
    with PackedWriter(os.path.join(str(tmp_path), "train.ards")) as w:
        w.add(np.zeros(16000, np.int16), 0)       # 1 s
        w.add(np.zeros(6 * 16000, np.int16), 0)   # 6 s > 5 s
    ds = PackedAudioDataset(str(tmp_path), "train")
    assert ds.get_length(0) == 101
    assert ds.get_length(1) == 501  # reference lmdb.py:84-92


def test_batch_loader_padding_and_labels(tmp_path):
    write_synthetic_pack(str(tmp_path), "train", 10, min_s=0.5, max_s=1.0,
                         num_labels=4)
    ds = PackedAudioDataset(str(tmp_path), "train")
    loader = BatchLoader(ds, batch_size=4, pad_samples=16000,
                         shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    b = batches[0]
    assert b["wav"].shape == (4, 16000)
    assert b["valid"].shape == (4,)
    assert (b["valid"] >= 8000).all() and (b["valid"] <= 16000).all()
    for i in range(4):
        assert np.all(b["wav"][i, b["valid"][i]:] == 0)
    assert b["label"].shape == (4,)
    # different epochs shuffle differently
    loader.set_epoch(1)
    b2 = next(iter(loader))
    assert not np.array_equal(b["valid"], b2["valid"]) or \
        not np.array_equal(b["wav"], b2["wav"])


def test_multi_label_pack(tmp_path):
    write_synthetic_pack(str(tmp_path), "valid", 6, num_labels=8,
                         multi_label=True, min_s=0.2, max_s=0.3)
    ds = PackedAudioDataset(str(tmp_path), "valid")
    loader = BatchLoader(ds, 3, pad_samples=8000, shuffle=False)
    b = next(iter(loader))
    assert b["label"].shape == (3, 8)
