"""Datasets: registry + creators (reference ``audiossl/datasets/__init__.py``).

The registry API and the registered names/metadata match the reference
exactly (voxceleb1 1251, us8k 10/10-fold, nsynth 11, spcv2 35, fsd50k
200 multi, audioset_b/audioset 527 multi, dcase 10 multi, as_strong 407
multi — reference ``datasets/__init__.py:16-67``). Bulk corpora
(audioset, fsd50k) read .ards packs (see ``packed.py``); task datasets
read their original filesystem layouts.
"""
from __future__ import annotations

import os

from audiossl_tpu.datasets.registry import (
    DatasetInfo,
    get_dataset,
    list_all_datasets,
    register_dataset,
)
from audiossl_tpu.datasets.packed import (
    PackedAudioDataset,
    PackedReader,
    PackedWriter,
    write_synthetic_pack,
)
from audiossl_tpu.datasets.pipeline import BatchLoader
from audiossl_tpu.datasets.tasks import (
    IEMOCAPDataset,
    LibriSpeechDataset,
    Nsynth,
    SpeakerClassifiDataset,
    SpeechCommandsV2,
    Urbansound8k,
)


@register_dataset("voxceleb1", multi_label=False, num_labels=1251)
def create_voxceleb1(path, split="train", **kw):
    return SpeakerClassifiDataset(path, split=split, **kw)


@register_dataset("us8k", multi_label=False, num_labels=10, num_folds=10)
def create_us8k(path, split="train", fold=0, **kw):
    meta = kw.pop("meta_dir", os.path.join(path, "metadata"))
    return Urbansound8k(path, meta, split=split, fold=fold, **kw)


@register_dataset("nsynth", multi_label=False, num_labels=11)
def create_nsynth(path, split="train", **kw):
    meta = kw.pop("meta_dir", os.path.join(path, "metadata"))
    return Nsynth(path, meta, split=split, **kw)


@register_dataset("spcv2", multi_label=False, num_labels=35)
def create_spcv2(path, split="train", **kw):
    return SpeechCommandsV2(path, split=split, **kw)


@register_dataset("iemocap", multi_label=False, num_labels=4, num_folds=5)
def create_iemocap(path, split="train", fold=0, **kw):
    """5-fold by session: meta_data_<split>_session<fold+1>.json if
    present, else meta_data_<split>.json (single split)."""
    cand = os.path.join(path, f"meta_data_{split}_session{fold + 1}.json")
    default = os.path.join(path, f"meta_data_{split}.json")
    meta = kw.pop("meta_file", cand if os.path.exists(cand) else default)
    return IEMOCAPDataset(path, meta, **kw)


@register_dataset("librispeech", multi_label=False, num_labels=1)
def create_librispeech(path, split="train", **kw):
    return LibriSpeechDataset(path, **kw)


def _packed(path, split, **kw):
    split = {"val": "valid"}.get(split, split)
    return PackedAudioDataset(path, split=split, **kw)


@register_dataset("fsd50k", multi_label=True, num_labels=200)
def create_fsd50k(path, split="train", **kw):
    return _packed(path, split, **kw)


@register_dataset("audioset_b", multi_label=True, num_labels=527)
def create_audioset_b(path, split="train", **kw):
    return _packed(path, split, **kw)


@register_dataset("audioset", multi_label=True, num_labels=527)
def create_audioset(path, split="train", **kw):
    return _packed(path, split, **kw)


def _register_sed():
    """DCASE / AudioSet-strong SED datasets live in the sed subpackage
    (imported lazily — they pull in the encoder/sampler machinery)."""
    from audiossl_tpu.datasets import sed  # noqa: F401


try:
    _register_sed()
except ImportError:
    pass

__all__ = [
    "DatasetInfo",
    "get_dataset",
    "list_all_datasets",
    "register_dataset",
    "PackedAudioDataset",
    "PackedReader",
    "PackedWriter",
    "write_synthetic_pack",
    "BatchLoader",
    "Nsynth",
    "Urbansound8k",
    "SpeechCommandsV2",
    "SpeakerClassifiDataset",
    "IEMOCAPDataset",
    "LibriSpeechDataset",
]
