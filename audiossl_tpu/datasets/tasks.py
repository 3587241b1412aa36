"""Downstream task datasets over the original on-disk layouts.

Equivalents of the reference dataset classes (reference
``audiossl/datasets/{byol_a,voxceleb1,iemocap,librispeech}.py``) reading
the SAME metadata files users already have, with scipy-based wav IO
instead of torchaudio. Every class is a map-style dataset yielding
``(waveform float32 [n], label)`` and integrates with ``BatchLoader``.
"""
from __future__ import annotations

import glob
import json
import os
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

from audiossl_tpu.datasets.audio_io import load_wav


class _WavDataset:
    """Shared base: list of (path, label)."""

    sr = 16000

    def __init__(self, files: Sequence[str], labels: Sequence[int],
                 transform=None, target_transform=None,
                 return_key: bool = False):
        self.files = list(files)
        self.labels = list(labels)
        self.transform = transform
        self.target_transform = target_transform
        self.return_key = return_key

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i: int):
        wav = load_wav(self.files[i], self.sr)
        label = self.labels[i]
        if self.transform is not None:
            wav = self.transform(wav)
        if self.target_transform is not None:
            label = self.target_transform(label)
        if self.return_key:
            return wav, label, os.path.basename(self.files[i])
        return wav, label


def _read_task_df(meta_dir: str, task: str) -> pd.DataFrame:
    """BYOL-A meta csv: columns file_name, label[, split]; string labels
    are mapped to ints by first occurrence (reference byol_a.py:30-35)."""
    df = pd.read_csv(os.path.join(meta_dir, f"{task}.csv"))
    df.label = df.label.map({l: i for i, l in enumerate(df.label.unique())})
    return df


class Nsynth(_WavDataset):
    """NSynth-11 instrument family (reference byol_a.py:182-209):
    splits train/valid/test from the csv's split column."""

    def __init__(self, root: str, meta_dir: str, split: str = "train",
                 **kw):
        df = _read_task_df(meta_dir, "nsynth")
        split = {"val": "valid"}.get(split, split)
        sdf = df[df.split == split]
        files = [os.path.join(root, f) for f in sdf.file_name]
        super().__init__(files, sdf.label.values.tolist(), **kw)


class Urbansound8k(_WavDataset):
    """US8K 10-fold (reference byol_a.py:212-251): fold from the path
    'audio/foldXX/...'; train = the 9 other folds, valid == test == the
    held-out fold (the reference evaluates on the same fold it selects
    on in the n-fold loop)."""

    def __init__(self, root: str, meta_dir: str, split: str = "train",
                 fold: int = 0, **kw):
        df = _read_task_df(meta_dir, "us8k")
        df["fold"] = df.file_name.map(lambda s: int(s.split("/")[1][4:]) - 1)
        if split == "train":
            sel = df[df.fold != fold]
        else:  # valid/test: the held-out fold
            sel = df[df.fold == fold]
        files = [os.path.join(root, f) for f in sel.file_name]
        super().__init__(files, sel.label.values.tolist(), **kw)


class SpeechCommandsV2(_WavDataset):
    """SPCV2-35 (reference scripts/dataset_preprocess/speech_command_v2.py):
    validation/testing file lists; everything else is train."""

    LABELS = [
        "backward", "bed", "bird", "cat", "dog", "down", "eight", "five",
        "follow", "forward", "four", "go", "happy", "house", "learn",
        "left", "marvin", "nine", "no", "off", "on", "one", "right",
        "seven", "sheila", "six", "stop", "three", "tree", "two", "up",
        "visual", "wow", "yes", "zero",
    ]

    def __init__(self, root: str, split: str = "train", **kw):
        def read_list(name):
            with open(os.path.join(root, name)) as f:
                return set(l.strip() for l in f if l.strip())

        val = read_list("validation_list.txt")
        test = read_list("testing_list.txt")
        lab2i = {l: i for i, l in enumerate(self.LABELS)}
        files, labels = [], []
        for lab in self.LABELS:
            for p in sorted(glob.glob(os.path.join(root, lab, "*.wav"))):
                rel = os.path.relpath(p, root)
                in_val = rel in val
                in_test = rel in test
                if (split == "train" and not in_val and not in_test) or \
                   (split in ("valid", "val") and in_val) or \
                   (split == "test" and in_test):
                    files.append(p)
                    labels.append(lab2i[lab])
        super().__init__(files, labels, **kw)


class SpeakerClassifiDataset(_WavDataset):
    """VoxCeleb1 speaker-id (reference voxceleb1.py:26-149): splits from
    iden_split.txt (1=train 2=valid 3=test), label = int(id) - 10001."""

    def __init__(self, root: str, meta_file: Optional[str] = None,
                 split: str = "train", **kw):
        meta_file = meta_file or os.path.join(root, "iden_split.txt")
        want = {"train": "1", "valid": "2", "val": "2", "test": "3"}[split]
        files, labels = [], []
        with open(meta_file) as f:
            for line in f:
                parts = line.split()
                if len(parts) != 2 or parts[0] != want:
                    continue
                rel = parts[1]
                cands = glob.glob(os.path.join(root, "*", "wav", rel))
                path = cands[0] if cands else os.path.join(root, "wav", rel)
                files.append(path)
                labels.append(int(rel.split("/")[0][2:]) - 10001)
        super().__init__(files, labels, **kw)


class IEMOCAPDataset(_WavDataset):
    """IEMOCAP 4-class emotion (reference iemocap.py:21-66): JSON meta
    {'meta_data': [{'path', 'label'}...]}, resampled to 16k."""

    LABELS = ["neu", "hap", "ang", "sad"]

    def __init__(self, root: str, meta_file: str, **kw):
        with open(meta_file) as f:
            meta = json.load(f)["meta_data"]
        lab2i = {l: i for i, l in enumerate(self.LABELS)}
        files = [os.path.join(root, m["path"]) for m in meta]
        labels = [lab2i[m["label"]] if isinstance(m["label"], str)
                  else int(m["label"]) for m in meta]
        super().__init__(files, labels, **kw)


class LibriSpeechDataset(_WavDataset):
    """Pretrain-only concat of LibriSpeech subsets; label always 0
    (reference librispeech.py:8-23)."""

    def __init__(self, root: str,
                 subsets=("train-clean-100", "train-clean-360",
                          "train-other-500"), **kw):
        files: List[str] = []
        for s in subsets:
            files.extend(sorted(
                glob.glob(os.path.join(root, s, "**", "*.flac"),
                          recursive=True) +
                glob.glob(os.path.join(root, s, "**", "*.wav"),
                          recursive=True)))
        super().__init__(files, [0] * len(files), **kw)
