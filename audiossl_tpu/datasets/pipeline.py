"""Host-side input pipeline: packed records -> padded device batches.

The reference feeds GPUs with torch DataLoader workers that do file IO,
decode AND the whole DSP/augmentation chain on CPU (SURVEY.md §3.1 —
its actual bottleneck). Here the host does only IO + pad/stack; every
FLOP (mel, augmentation, masking) runs on device inside the jitted
step. The loader double-buffers batches with a small thread pool so
host IO overlaps device compute.

Batches are dicts of numpy arrays with STATIC shapes:
  wav   [B, pad_samples] float32 (zero-padded)
  valid [B]              int32   valid sample counts
  label [B] / [B, C]     labels (classification) — optional
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np


class BatchLoader:
    """Iterable over padded batches of a map-style dataset.

    dataset must implement __len__ and __getitem__ -> (wav, label).
    drop_last=True keeps shapes static (required under jit).
    """

    def __init__(self, dataset, batch_size: int, pad_samples: int,
                 shuffle: bool = True, drop_last: bool = True,
                 seed: int = 0, num_threads: int = 8,
                 prefetch: int = 2, epoch: int = 0,
                 include_labels: bool = True, weights=None,
                 process_index: int = 0, process_count: int = 1,
                 wav_dtype=np.float32):
        """batch_size is the GLOBAL batch; with process_count > 1 each
        process reads only its contiguous slice of every (identically
        shuffled) global batch and yields batch_size // process_count
        rows — the union over processes is exactly the single-host
        stream (per-host sharded input for pod slices, SURVEY §2.8)."""
        if batch_size % max(process_count, 1):
            raise ValueError("global batch_size must divide evenly "
                             f"across {process_count} processes")
        self.process_index = process_index
        self.process_count = process_count
        self.dataset = dataset
        self.batch_size = batch_size
        self.pad_samples = pad_samples
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.epoch = epoch
        self.include_labels = include_labels
        # int16 emit halves host->device batch bytes; the device
        # dequantizes with the identical /32768 scale
        # (transforms.augment.wav_to_f32) so int16-stored samples are
        # bitwise-identical to the float path. float32-returning
        # datasets are re-quantized to 16 bits (source audio is 16-bit
        # PCM in practice).
        self.wav_dtype = np.dtype(wav_dtype)
        # per-sample sampling weights (reference WeightedRandomSampler
        # with replacement for AudioSet finetuning,
        # downstream/train_finetune.py:48-110)
        self.weights = None if weights is None else np.asarray(
            weights, np.float64)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _load_one(self, idx: int):
        wav, label = self.dataset[idx][:2]
        wav = np.asarray(wav, np.float32).reshape(-1)
        n = min(len(wav), self.pad_samples)
        out = np.zeros(self.pad_samples, self.wav_dtype)
        if self.wav_dtype == np.int16:
            out[:n] = np.clip(wav[:n] * 32768.0, -32768, 32767)
        else:
            out[:n] = wav[:n]
        return out, n, label

    def _make_batch(self, indices):
        if self.num_threads > 1 and len(indices) > 1:
            from concurrent.futures import ThreadPoolExecutor

            if not hasattr(self, "_pool"):
                self._pool = ThreadPoolExecutor(self.num_threads)
            rows = list(self._pool.map(self._load_one, indices))
        else:
            rows = [self._load_one(i) for i in indices]
        wav = np.stack([r[0] for r in rows])
        valid = np.asarray([r[1] for r in rows], np.int32)
        batch = {"wav": wav, "valid": valid}
        if self.include_labels:
            labels = [r[2] for r in rows]
            if isinstance(labels[0], np.ndarray):
                batch["label"] = np.stack(labels)
            else:
                batch["label"] = np.asarray(labels)
        return batch

    def __iter__(self) -> Iterator[dict]:
        rng = np.random.RandomState(self.seed + self.epoch)
        if self.weights is not None:
            p = self.weights / self.weights.sum()
            order = rng.choice(len(self.dataset), size=len(self.dataset),
                               replace=True, p=p)
        else:
            order = np.arange(len(self.dataset))
            if self.shuffle:
                rng.shuffle(order)
        nb = len(self)
        chunks = [order[i * self.batch_size:(i + 1) * self.batch_size]
                  for i in range(nb)]
        if self.process_count > 1:
            # same shuffled order on every process (seeded identically);
            # each takes its contiguous per-host slice of every batch
            local = self.batch_size // self.process_count
            lo = self.process_index * local
            chunks = [c[lo:lo + local] for c in chunks]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for c in chunks:
                    if stop.is_set():
                        return
                    q.put(self._make_batch(c))
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is None:
                    return
                yield b
        finally:
            stop.set()

    def set_epoch(self, epoch: int):
        self.epoch = epoch
