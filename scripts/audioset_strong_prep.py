"""AudioSet-strong preprocessing pipeline (reference
``scripts/dataset_preprocess/audioset_strong/``: gen_tsv.py,
common_label_filtrate.py, intersected_event_filtrate.py, orchestrated
by audioset_strong.bash).

Subcommands:
  gen_tsv     raw AudioSet-strong csv -> DCASE-format tsv + durations
  common      keep only labels present in BOTH train and eval tsv,
              write common_labels.txt (407 classes in the reference)
  merge       merge overlapping same-class events per file
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pandas as pd


def gen_tsv(args):
    """Raw csv columns: segment_id, start_time_seconds,
    end_time_seconds, label -> tsv filename/onset/offset/event_label
    with a durations tsv."""
    df = pd.read_csv(args.csv, sep=None, engine="python")
    cols = {c.lower(): c for c in df.columns}
    seg = cols.get("segment_id", df.columns[0])
    on = cols.get("start_time_seconds", df.columns[1])
    off = cols.get("end_time_seconds", df.columns[2])
    lab = cols.get("label", df.columns[3])
    out = pd.DataFrame({
        "filename": df[seg].astype(str) + ".wav",
        "onset": df[on].astype(float),
        "offset": df[off].astype(float),
        "event_label": df[lab].astype(str),
    })
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    out.to_csv(args.out, sep="\t", index=False)
    dur = out.groupby("filename").offset.max().reset_index()
    dur.columns = ["filename", "duration"]
    dur["duration"] = np.maximum(dur["duration"], args.min_duration)
    dur.to_csv(args.out.replace(".tsv", "_durations.tsv"), sep="\t",
               index=False)
    print(f"{args.out}: {len(out)} events, {out.filename.nunique()} files")


def common(args):
    """Intersect label sets of train/eval and filter both tsvs
    (reference common_label_filtrate.py)."""
    tr = pd.read_csv(args.train, sep="\t")
    ev = pd.read_csv(args.eval, sep="\t")
    labels = sorted(set(tr.event_label) & set(ev.event_label))
    with open(args.labels_out, "w") as f:
        f.write("\n".join(labels) + "\n")
    tr[tr.event_label.isin(labels)].to_csv(args.train, sep="\t",
                                           index=False)
    ev[ev.event_label.isin(labels)].to_csv(args.eval, sep="\t",
                                           index=False)
    print(f"{len(labels)} common labels")


def merge(args):
    """Merge overlapping same-class events per file (reference
    intersected_event_filtrate.py)."""
    df = pd.read_csv(args.tsv, sep="\t").sort_values(
        ["filename", "event_label", "onset"])
    rows = []
    for (fname, lab), g in df.groupby(["filename", "event_label"]):
        cur_on, cur_off = None, None
        for _, r in g.iterrows():
            if cur_on is None:
                cur_on, cur_off = r.onset, r.offset
            elif r.onset <= cur_off:
                cur_off = max(cur_off, r.offset)
            else:
                rows.append((fname, cur_on, cur_off, lab))
                cur_on, cur_off = r.onset, r.offset
        if cur_on is not None:
            rows.append((fname, cur_on, cur_off, lab))
    out = pd.DataFrame(rows, columns=["filename", "onset", "offset",
                                      "event_label"])
    out.to_csv(args.tsv, sep="\t", index=False)
    print(f"{args.tsv}: {len(df)} -> {len(out)} events after merging")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("gen_tsv")
    g.add_argument("--csv", required=True)
    g.add_argument("--out", required=True)
    g.add_argument("--min_duration", type=float, default=10.0)
    c = sub.add_parser("common")
    c.add_argument("--train", required=True)
    c.add_argument("--eval", required=True)
    c.add_argument("--labels_out", required=True)
    m = sub.add_parser("merge")
    m.add_argument("--tsv", required=True)
    args = p.parse_args()
    {"gen_tsv": gen_tsv, "common": common, "merge": merge}[args.cmd](args)


if __name__ == "__main__":
    main()
