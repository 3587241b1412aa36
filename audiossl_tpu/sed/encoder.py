"""Many-hot strong/weak label encoder (host side).

Reference ``datasets/dcase_utils/encoder.py:8-230``: events given as
(onset, offset, event_label) seconds are rasterized onto a fixed frame
grid; decoding turns frame activations back into event lists. Semantics
matched: n_frames = (audio_len*fs // frame_hop) // net_pooling, onset
floor / offset ceil, 'empty' sentinel = all -1.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd


class ManyHotEncoder:
    def __init__(self, labels: Sequence[str], audio_len: float,
                 frame_len: int, frame_hop: int, net_pooling: int = 1,
                 fs: int = 16000):
        self.labels = list(labels)
        self.audio_len = audio_len
        self.frame_len = frame_len
        self.frame_hop = frame_hop
        self.fs = fs
        self.net_pooling = net_pooling
        self.n_frames = int(int(audio_len * fs / frame_hop) / net_pooling)

    # ------------------------------------------------------------- #
    def _time_to_frame(self, time):
        frame = time * self.fs / self.frame_hop
        return np.clip(frame / self.net_pooling, 0, self.n_frames)

    def _frame_to_time(self, frame):
        t = frame * self.net_pooling * self.frame_hop / self.fs
        return np.clip(t, 0, self.audio_len)

    # ------------------------------------------------------------- #
    def encode_weak(self, labels) -> np.ndarray:
        if isinstance(labels, str):
            if labels == "empty":
                return np.zeros(len(self.labels)) - 1
            labels = labels.split(",")
        if isinstance(labels, pd.DataFrame):
            labels = [] if labels.empty else labels["event_label"]
        y = np.zeros(len(self.labels))
        for lab in labels:
            if not pd.isna(lab):
                y[self.labels.index(lab)] = 1
        return y

    def encode_strong_df(self, label_df) -> np.ndarray:
        if isinstance(label_df, str) and label_df == "empty":
            return np.zeros((self.n_frames, len(self.labels))) - 1
        y = np.zeros((self.n_frames, len(self.labels)))
        if isinstance(label_df, pd.DataFrame):
            cols = {"onset", "offset", "event_label"}
            if cols.issubset(label_df.columns):
                for _, row in label_df.iterrows():
                    if pd.isna(row["event_label"]):
                        continue
                    i = self.labels.index(row["event_label"])
                    onset = int(self._time_to_frame(row["onset"]))
                    offset = int(np.ceil(self._time_to_frame(row["offset"])))
                    y[onset:offset, i] = 1
        elif isinstance(label_df, (pd.Series, list, np.ndarray)):
            for lab in label_df:
                if lab and not pd.isna(lab):
                    y[:, self.labels.index(lab)] = 1
        return y

    def decode_strong(self, labels: np.ndarray) -> List[list]:
        """[n_frames, n_classes] activations -> [[label, onset_s,
        offset_s], ...] (reference encoder.py:173-195)."""
        out = []
        for i, cls_name in enumerate(self.labels):
            col = np.asarray(labels[:, i] > 0.5, np.int8)
            changes = np.diff(np.concatenate([[0], col, [0]]))
            starts = np.where(changes == 1)[0]
            ends = np.where(changes == -1)[0]
            for s, e in zip(starts, ends):
                out.append([cls_name, self._frame_to_time(s),
                            self._frame_to_time(e)])
        return out

    def decode_weak(self, labels: np.ndarray) -> List[str]:
        return [self.labels[i] for i in np.where(np.asarray(labels) > 0.5)[0]]
