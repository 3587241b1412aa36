"""Scan a packed training set's mel dB range (reference
``methods/atstframe/calculate_min_max.py`` — provenance of the
MinMax(-79.6482, 50.6842) constants)."""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from audiossl_tpu.datasets.packed import PackedAudioDataset  # noqa: E402
from audiossl_tpu.ops.melspec import MelConfig, log_melspec  # noqa: E402

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--max_items", type=int, default=2000)
    args = p.parse_args()

    cfg = MelConfig()
    ds = PackedAudioDataset(args.data_path, args.split)
    lo, hi = np.inf, -np.inf
    for i in range(min(len(ds), args.max_items)):
        wav, _ = ds[i]
        db = np.asarray(log_melspec(jnp.asarray(wav[None]), cfg=cfg,
                                    normalize=False))
        lo = min(lo, float(db.min()))
        hi = max(hi, float(db.max()))
        if i % 200 == 0:
            print(i, lo, hi, flush=True)
    print(f"min={lo:.4f} max={hi:.4f}")
