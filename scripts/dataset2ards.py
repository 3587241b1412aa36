"""Dataset -> .ards pack converters (reference
``scripts/dataset_preprocess/dataset2lmdb.py`` / ``audioset.py`` /
``speech_command_v2.py`` — same jobs, targeting the flat packed store
instead of LMDB).

Usage:
  # folder of wavs + csv (columns: file_name, label[, split])
  python scripts/dataset2ards.py folder --audio_root DIR --csv META.csv \
      --out OUT_DIR [--split-col split]

  # AudioSet-style: csv with ytid -> label indices (multi-hot, 527)
  python scripts/dataset2ards.py audioset --audio_root DIR \
      --csv unbalanced.csv --labels class_labels_indices.csv --out OUT

  # reference LMDB store -> ards (needs the lmdb package)
  python scripts/dataset2ards.py lmdb --lmdb PATH/train.lmdb --out OUT

  # synthetic data for tests/benchmarks
  python scripts/dataset2ards.py synth --out OUT --n 1000
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from audiossl_tpu.datasets.audio_io import load_wav  # noqa: E402
from audiossl_tpu.datasets.packed import (  # noqa: E402
    PackedWriter,
    write_synthetic_pack,
)


def convert_folder(args):
    import pandas as pd

    df = pd.read_csv(args.csv)
    split_col = args.split_col if args.split_col in df.columns else None
    labels = {l: i for i, l in enumerate(df.label.unique())}
    os.makedirs(args.out, exist_ok=True)
    splits = sorted(df[split_col].unique()) if split_col else ["train"]
    for split in splits:
        sdf = df[df[split_col] == split] if split_col else df
        name = {"val": "valid"}.get(split, split)
        with PackedWriter(os.path.join(args.out, f"{name}.ards")) as w:
            for _, row in sdf.iterrows():
                wav = load_wav(os.path.join(args.audio_root,
                                            row.file_name), args.sr)
                w.add((wav * 32767).astype(np.int16),
                      int(labels[row.label]), args.sr)
        print(f"{name}: {len(sdf)} records")


def convert_audioset(args):
    import pandas as pd

    lab = pd.read_csv(args.labels)  # index,mid,display_name
    mid2idx = dict(zip(lab["mid"], lab["index"]))
    n_cls = len(lab)
    seg = pd.read_csv(args.csv, sep=",", comment="#", quotechar='"',
                      skipinitialspace=True, header=None,
                      names=["ytid", "start", "end", "positive_labels"])
    os.makedirs(args.out, exist_ok=True)
    n_written = 0
    with PackedWriter(os.path.join(args.out,
                                   f"{args.split}.ards")) as w:
        for _, row in seg.iterrows():
            path = os.path.join(args.audio_root, f"{row.ytid}.wav")
            if not os.path.exists(path):
                continue
            y = np.zeros(n_cls, np.float32)
            for mid in str(row.positive_labels).split(","):
                mid = mid.strip().strip('"')
                if mid in mid2idx:
                    y[mid2idx[mid]] = 1.0
            wav = load_wav(path, args.sr)
            w.add((wav * 32767).astype(np.int16), y, args.sr)
            n_written += 1
    print(f"{args.split}: {n_written} records")


def convert_lmdb(args):
    try:
        import lmdb
        import pyarrow as pa
    except ImportError as e:
        raise SystemExit(f"lmdb conversion needs lmdb+pyarrow: {e}")
    env = lmdb.open(args.lmdb, readonly=True, lock=False)
    os.makedirs(args.out, exist_ok=True)
    split = os.path.basename(args.lmdb).replace(".lmdb", "")
    with env.begin() as txn, PackedWriter(
            os.path.join(args.out, f"{split}.ards")) as w:
        n = 0
        for key, value in txn.cursor():
            if key in (b"__len__", b"__keys__"):
                continue
            wav, label = pa.deserialize(value)
            wav = np.asarray(wav).reshape(-1)
            w.add(wav, label if np.isscalar(label)
                  else np.asarray(label, np.float32), args.sr)
            n += 1
    print(f"{split}: {n} records")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("folder")
    f.add_argument("--audio_root", required=True)
    f.add_argument("--csv", required=True)
    f.add_argument("--out", required=True)
    f.add_argument("--split-col", default="split")
    f.add_argument("--sr", type=int, default=16000)

    a = sub.add_parser("audioset")
    a.add_argument("--audio_root", required=True)
    a.add_argument("--csv", required=True)
    a.add_argument("--labels", required=True)
    a.add_argument("--out", required=True)
    a.add_argument("--split", default="train")
    a.add_argument("--sr", type=int, default=16000)

    l = sub.add_parser("lmdb")
    l.add_argument("--lmdb", required=True)
    l.add_argument("--out", required=True)
    l.add_argument("--sr", type=int, default=16000)

    s = sub.add_parser("synth")
    s.add_argument("--out", required=True)
    s.add_argument("--n", type=int, default=1000)
    s.add_argument("--split", default="train")
    s.add_argument("--num_labels", type=int, default=527)
    s.add_argument("--multi_label", action="store_true")

    args = p.parse_args()
    if args.cmd == "folder":
        convert_folder(args)
    elif args.cmd == "audioset":
        convert_audioset(args)
    elif args.cmd == "lmdb":
        convert_lmdb(args)
    else:
        write_synthetic_pack(args.out, args.split, args.n,
                             num_labels=args.num_labels,
                             multi_label=args.multi_label)
        print(f"wrote {args.n} synthetic records")


if __name__ == "__main__":
    main()
