"""ctypes bindings for the native .ards batched reader.

The C++ reader (``native/ards_reader.cc``) assembles whole padded
float32 batches off the GIL with a thread pool — the native-runtime
replacement for the reference's per-sample Python LMDB+pyarrow decode
inside DataLoader workers. Built on demand with g++ and cached next to
the source; everything degrades gracefully to the pure-Python
``PackedReader`` when no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "ards_reader.cc")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libards_reader.so")
_BUILD_LOCK = threading.Lock()
_LIB = None


def _build_lib() -> Optional[str]:
    if os.path.exists(_LIB_PATH) and (
            os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True)
        return _LIB_PATH
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def get_lib():
    """-> ctypes CDLL or None when the native reader is unavailable."""
    global _LIB
    if _LIB is not None:
        return _LIB
    with _BUILD_LOCK:
        if _LIB is not None:
            return _LIB
        path = _build_lib()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.ards_open.restype = ctypes.c_void_p
        lib.ards_open.argtypes = [ctypes.c_char_p]
        lib.ards_len.restype = ctypes.c_long
        lib.ards_len.argtypes = [ctypes.c_void_p]
        lib.ards_num_samples.restype = ctypes.c_long
        lib.ards_num_samples.argtypes = [ctypes.c_void_p, ctypes.c_long]
        lib.ards_read_batch.restype = ctypes.c_int
        lib.ards_read_batch.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_long, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.ards_read_batch_i16.restype = ctypes.c_int
        lib.ards_read_batch_i16.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_long, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.ards_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


class NativeReader:
    """Batched reader over one .ards pack."""

    def __init__(self, pack_path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native reader unavailable (no g++)")
        self._lib = lib
        self._h = lib.ards_open(pack_path.encode())
        if not self._h:
            raise IOError(f"failed to open {pack_path}")

    def __len__(self):
        return int(self._lib.ards_len(self._h))

    def num_samples(self, i: int) -> int:
        return int(self._lib.ards_num_samples(self._h, i))

    def read_batch(self, indices, pad_samples: int,
                   n_threads: int = 8, dtype=np.float32):
        """-> (wav [n, pad_samples] float32|int16, valid [n] int32).

        dtype=np.int16 emits raw 16-bit samples (float32 records are
        re-quantized) — half the batch bytes; the device dequantizes
        with the identical /32768 scale (transforms.augment.wav_to_f32),
        so the f32 values match the float path bitwise for int16
        stores."""
        idx = np.ascontiguousarray(indices, np.int64)
        n = len(idx)
        valid = np.empty((n,), np.int32)
        if np.dtype(dtype) == np.int16:
            wav = np.empty((n, pad_samples), np.int16)
            rc = self._lib.ards_read_batch_i16(self._h, idx, n,
                                               pad_samples, n_threads,
                                               wav, valid)
        else:
            wav = np.empty((n, pad_samples), np.float32)
            rc = self._lib.ards_read_batch(self._h, idx, n, pad_samples,
                                           n_threads, wav, valid)
        if rc != 0:
            raise IOError(f"ards_read_batch failed with code {rc}")
        return wav, valid

    def close(self):
        if self._h:
            self._lib.ards_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeBatchLoader:
    """Drop-in pretraining loader over a PackedAudioDataset using the
    native reader (labels omitted — the SSL pretrain path needs none).

    Batches are prefetched by a background thread (the C++ read
    releases the GIL, so assembly overlaps the device step) into a
    bounded queue — the native equivalent of the reference DataLoader's
    worker prefetch."""

    def __init__(self, dataset, batch_size: int, pad_samples: int,
                 shuffle: bool = True, seed: int = 0, epoch: int = 0,
                 n_threads: int = 8, prefetch: int = 2,
                 wav_dtype=np.float32):
        pack_path = dataset.reader.path
        self.wav_dtype = np.dtype(wav_dtype)
        self.keys = np.asarray(dataset.keys, np.int64)
        self.reader = NativeReader(pack_path)
        self.batch_size = batch_size
        self.pad_samples = pad_samples
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = epoch
        self.n_threads = n_threads
        self.prefetch = max(1, prefetch)

    def __len__(self):
        return len(self.keys) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _read(self, order, b):
        sel = self.keys[order[b * self.batch_size:
                              (b + 1) * self.batch_size]]
        wav, valid = self.reader.read_batch(sel, self.pad_samples,
                                            self.n_threads,
                                            dtype=self.wav_dtype)
        return {"wav": wav, "valid": valid}

    def __iter__(self):
        import queue

        order = np.arange(len(self.keys))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        n = len(self)
        if n == 0:
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            for b in range(n):
                if stop.is_set():
                    return
                try:
                    item = self._read(order, b)
                except Exception as e:  # surface in the consumer
                    q.put(e)
                    return
                q.put(item)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            for _ in range(n):
                item = q.get()
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            # unblock a producer waiting on a full queue, then wait for
            # it to actually finish (an abandoned worker would keep a
            # multi-threaded read running into the next epoch)
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=30)
