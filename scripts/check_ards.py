"""Sanity-print a .ards pack (reference
``scripts/dataset_preprocess/check_lmdb.py``)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from audiossl_tpu.datasets.packed import PackedReader  # noqa: E402

if __name__ == "__main__":
    path = sys.argv[1]
    r = PackedReader(path)
    print(f"{path}: {len(r)} records")
    for i in range(min(5, len(r))):
        wav, label, sr = r.read(i)
        print(i, wav.shape, wav.dtype, "sr", sr, "label",
              label if not hasattr(label, "shape") else
              f"array{label.shape}")
