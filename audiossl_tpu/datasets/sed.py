"""SED datasets: DCASE-style strong/weak sets + mixed-batch loader.

Reference ``datasets/dcase_utils/datasets.py`` (StronglyAnnotatedSet /
WeakSet / UnlabeledSet: tsv-driven, pad/crop to 10 s, frame-grid strong
labels), ``datasets/dcase_utils/sampler.py`` (ConcatDatasetSampler:
every batch = fixed counts from each source), ``datasets/dcase.py``
(DCASEDataset yaml builder) and ``datasets/as_strong.py`` (407-class
AudioSet-strong).
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

from audiossl_tpu.datasets.audio_io import load_wav
from audiossl_tpu.datasets.registry import register_dataset
from audiossl_tpu.sed.encoder import ManyHotEncoder

DCASE_CLASSES = [
    "Alarm_bell_ringing", "Blender", "Cat", "Dishes", "Dog",
    "Electric_shaver_toothbrush", "Frying", "Running_water", "Speech",
    "Vacuum_cleaner",
]


def dcase_encoder(audio_len: float = 10.0, frame_hop: int = 160,
                  net_pooling: int = 4, fs: int = 16000,
                  labels: Optional[Sequence[str]] = None) -> ManyHotEncoder:
    """Default DCASE encoder grid: 10 s, 10 ms hop, net pooling 4
    (patch_w) -> 250 output frames (reference utils_dcase/conf)."""
    return ManyHotEncoder(labels or DCASE_CLASSES, audio_len=audio_len,
                          frame_len=1024, frame_hop=frame_hop,
                          net_pooling=net_pooling, fs=fs)


class StronglyAnnotatedSet:
    """tsv (filename, onset, offset, event_label) -> per-file examples;
    yields (wav [pad_to*fs], strong [n_frames, C], filename)."""

    def __init__(self, audio_folder: str, tsv_entries: pd.DataFrame,
                 encoder: ManyHotEncoder, pad_to: float = 10.0,
                 fs: int = 16000, return_filename: bool = True):
        self.encoder = encoder
        self.fs = fs
        self.pad_to = int(pad_to * fs)
        self.return_filename = return_filename
        tsv_entries = tsv_entries.dropna(subset=["filename"])
        ex = {}
        for _, r in tsv_entries.iterrows():
            e = ex.setdefault(r["filename"], {
                "path": os.path.join(audio_folder, r["filename"]),
                "events": []})
            if "onset" in r and not pd.isna(r.get("onset")):
                e["events"].append({
                    "event_label": r["event_label"],
                    "onset": float(r["onset"]),
                    "offset": float(r["offset"])})
        self.examples = list(ex.values())
        self.filenames = list(ex.keys())

    def __len__(self):
        return len(self.examples)

    def _load(self, path):
        wav = load_wav(path, self.fs)
        out = np.zeros(self.pad_to, np.float32)
        n = min(len(wav), self.pad_to)
        out[:n] = wav[:n]
        return out, n

    def __getitem__(self, i):
        e = self.examples[i]
        wav, n = self._load(e["path"])
        df = pd.DataFrame(e["events"]) if e["events"] else pd.DataFrame(
            columns=["event_label", "onset", "offset"])
        strong = self.encoder.encode_strong_df(df).astype(np.float32)
        if self.return_filename:
            return wav, strong, self.filenames[i]
        return wav, strong


class WeakSet:
    """tsv (filename, event_labels comma-joined); strong-shaped labels
    active over all frames (the weak-pooled loss masks frames)."""

    def __init__(self, audio_folder: str, tsv_entries: pd.DataFrame,
                 encoder: ManyHotEncoder, pad_to: float = 10.0,
                 fs: int = 16000, return_filename: bool = True):
        self.encoder = encoder
        self.fs = fs
        self.pad_to = int(pad_to * fs)
        self.return_filename = return_filename
        self.examples = [
            (os.path.join(audio_folder, r["filename"]),
             str(r["event_labels"]).split(","), r["filename"])
            for _, r in tsv_entries.iterrows()]

    def __len__(self):
        return len(self.examples)

    def __getitem__(self, i):
        path, labels, fname = self.examples[i]
        wav = load_wav(path, self.fs)
        out = np.zeros(self.pad_to, np.float32)
        n = min(len(wav), self.pad_to)
        out[:n] = wav[:n]
        strong = self.encoder.encode_strong_df(labels).astype(np.float32)
        if self.return_filename:
            return out, strong, fname
        return out, strong


class UnlabeledSet(WeakSet):
    def __init__(self, audio_folder: str, encoder: ManyHotEncoder,
                 pad_to: float = 10.0, fs: int = 16000,
                 return_filename: bool = True):
        files = sorted(os.listdir(audio_folder))
        tsv = pd.DataFrame({"filename": files,
                            "event_labels": ["" for _ in files]})
        super().__init__(audio_folder, tsv, encoder, pad_to, fs,
                         return_filename)


class MixedBatchLoader:
    """Every batch = fixed per-source counts (reference
    ConcatDatasetSampler, sampler.py:7-101): e.g. [128 synth, 128 weak].
    Shorter sources cycle. Yields dicts with wav/valid/strong/source_mask
    (bool [B] per source) and filenames.

    ``mode`` selects the dataset index that governs the epoch length
    (reference ``mode``/``batch_len_index``: steps per epoch =
    ``len(datasets[mode]) // batch_sizes[mode]``; the DCASE config uses
    ``batch_len_index: 1`` — the weak set — ``conf/frame_40.yaml``).
    """

    def __init__(self, datasets: Sequence, batch_sizes: Sequence[int],
                 shuffle: bool = True, seed: int = 0, epoch: int = 0,
                 mode: int = 0):
        assert len(datasets) == len(batch_sizes)
        assert 0 <= mode < len(datasets)
        self.datasets = list(datasets)
        self.batch_sizes = list(batch_sizes)
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = epoch
        self.mode = mode

    def __len__(self):
        return max(len(self.datasets[self.mode])
                   // self.batch_sizes[self.mode], 1)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self):
        rng = np.random.RandomState(self.seed + self.epoch)
        orders = []
        for ds in self.datasets:
            o = np.arange(len(ds))
            if self.shuffle:
                rng.shuffle(o)
            orders.append(o)
        pos = [0] * len(self.datasets)
        for _ in range(len(self)):
            wavs, strongs, fnames, src_ids = [], [], [], []
            for si, (ds, bs) in enumerate(zip(self.datasets,
                                              self.batch_sizes)):
                for _ in range(bs):
                    if pos[si] >= len(orders[si]):
                        pos[si] = 0
                        if self.shuffle:
                            rng.shuffle(orders[si])
                    item = ds[int(orders[si][pos[si]])]
                    pos[si] += 1
                    wavs.append(item[0])
                    strongs.append(item[1])
                    fnames.append(item[2] if len(item) > 2 else "")
                    src_ids.append(si)
            batch = {
                "wav": np.stack(wavs).astype(np.float32),
                "valid": np.full(len(wavs), wavs[0].shape[0], np.int32),
                "strong": np.stack(strongs),
                "source": np.asarray(src_ids, np.int32),
                "filenames": fnames,
            }
            yield batch


def load_dcase_split(audio_folder: str, tsv_path: str, kind: str,
                     encoder: Optional[ManyHotEncoder] = None,
                     pad_to: float = 10.0):
    """kind in {'strong', 'weak', 'unlabeled'}."""
    enc = encoder or dcase_encoder(audio_len=pad_to)
    if kind == "unlabeled":
        return UnlabeledSet(audio_folder, enc, pad_to=pad_to)
    tsv = pd.read_csv(tsv_path, sep="\t")
    cls = StronglyAnnotatedSet if kind == "strong" else WeakSet
    return cls(audio_folder, tsv, enc, pad_to=pad_to)


def _weak_train_val_split(path, weak_split: float, seed: int):
    """Reference datasets/dcase.py:121-133: the weak tsv is sampled
    into a train fraction (``weak_split``, default 0.9, seed 42) and
    the remainder becomes the weak VALIDATION set."""
    tsv = pd.read_csv(os.path.join(path, "weak_train/meta.tsv"), sep="\t")
    train_df = tsv.sample(frac=weak_split, random_state=seed)
    val_df = tsv.drop(train_df.index).reset_index(drop=True)
    return train_df.reset_index(drop=True), val_df


@register_dataset("dcase", multi_label=True, num_labels=10)
def create_dcase(path, split="train", weak_split: float = 0.9,
                 seed: int = 42, **kw):
    """Directory layout: {synth_train,weak_train,synth_val,strong_val}
    subfolders each with audio/ + meta.tsv (converted from the DCASE
    yaml config paths of the reference, datasets/dcase.py:80-181).

    train -> (synth_strong, weak_train);
    valid -> (synth_val, weak_val) — the weak val samples are the
    1-weak_split remainder of the weak tsv (dcase.py:121-133);
    test  -> strong_val.
    """
    enc = kw.pop("encoder", None) or dcase_encoder()
    if split == "train":
        synth = load_dcase_split(os.path.join(path, "synth_train/audio"),
                                 os.path.join(path, "synth_train/meta.tsv"),
                                 "strong", enc)
        weak_df, _ = _weak_train_val_split(path, weak_split, seed)
        weak = WeakSet(os.path.join(path, "weak_train/audio"), weak_df,
                       enc)
        return synth, weak
    if split in ("valid", "val"):
        synth_val = load_dcase_split(
            os.path.join(path, "synth_val/audio"),
            os.path.join(path, "synth_val/meta.tsv"), "strong", enc)
        _, weak_val_df = _weak_train_val_split(path, weak_split, seed)
        weak_val = WeakSet(os.path.join(path, "weak_train/audio"),
                           weak_val_df, enc)
        return synth_val, weak_val
    return load_dcase_split(os.path.join(path, "strong_val/audio"),
                            os.path.join(path, "strong_val/meta.tsv"),
                            "strong", enc)


def load_as_strong_labels(label_file: str) -> List[str]:
    """AudioSet-strong 407-label list (reference
    as_strong_utils/as_strong_dict.py)."""
    with open(label_file) as f:
        return [l.strip() for l in f if l.strip()]


@register_dataset("as_strong", multi_label=True, num_labels=407)
def create_as_strong(path, split="train", **kw):
    labels = load_as_strong_labels(os.path.join(path, "common_labels.txt"))
    enc = kw.pop("encoder", None) or dcase_encoder(labels=labels)
    sub = {"train": "train", "valid": "val", "val": "val",
           "test": "eval"}[split]
    return load_dcase_split(os.path.join(path, sub, "audio"),
                            os.path.join(path, sub, "meta.tsv"),
                            "strong", enc)
