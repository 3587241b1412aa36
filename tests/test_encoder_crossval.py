"""Cross-validate sed/encoder.ManyHotEncoder against the reference's
own class imported from /root/reference (pure numpy/pandas once
dcase_util.data.DecisionEncoder is stubbed with the standard
find_contiguous_regions)."""
import sys
import types

import numpy as np
import pandas as pd
import pytest

from audiossl_tpu.sed.encoder import ManyHotEncoder


class _DecisionEncoder:
    def find_contiguous_regions(self, activity_array):
        # standard dcase_util implementation (public): boundaries
        # where the binary array changes value
        change = np.logical_xor(activity_array[1:],
                                activity_array[:-1]).nonzero()[0]
        change += 1
        if activity_array[0]:
            change = np.r_[0, change]
        if activity_array[-1]:
            change = np.r_[change, activity_array.size]
        return change.reshape((-1, 2))


def _load_reference_encoder():
    if "dcase_util.data" not in sys.modules:
        du = types.ModuleType("dcase_util")
        dud = types.ModuleType("dcase_util.data")
        du.data = dud
        sys.modules["dcase_util"] = du
        sys.modules["dcase_util.data"] = dud
    # ref_stubs.py may have pre-installed DecisionEncoder = object
    # (suite-order dependent); always install the working one
    sys.modules["dcase_util.data"].DecisionEncoder = _DecisionEncoder
    # import the module by file path: the audiossl package __init__
    # pulls in lmdb/pyarrow which this env doesn't ship
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_dcase_encoder",
        "/root/reference/audiossl/datasets/dcase_utils/encoder.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.ManyHotEncoder


LABELS = ["Blender", "Cat", "Dog", "Speech", "Water"]


def _pair():
    RefEncoder = _load_reference_encoder()
    kw = dict(audio_len=10.0, frame_len=1024, frame_hop=160,
              net_pooling=4, fs=16000)
    ours = ManyHotEncoder(LABELS, **kw)
    ref = RefEncoder(LABELS, **kw)
    return ours, ref


def test_encode_weak_matches_reference():
    ours, ref = _pair()
    for labs in (["Cat"], ["Cat", "Dog"], [], "Cat,Water", "empty"):
        np.testing.assert_array_equal(ours.encode_weak(labs),
                                      ref.encode_weak(labs))


def test_encode_strong_df_matches_reference_randomized():
    ours, ref = _pair()
    rng = np.random.RandomState(0)
    for _ in range(20):
        n = rng.randint(1, 6)
        onset = rng.uniform(0, 9.5, n)
        dur = rng.uniform(0.05, 5.0, n)
        df = pd.DataFrame({
            "onset": onset,
            "offset": np.minimum(onset + dur, 10.0),
            "event_label": rng.choice(LABELS, n),
        })
        np.testing.assert_array_equal(ours.encode_strong_df(df),
                                      ref.encode_strong_df(df))
    np.testing.assert_array_equal(ours.encode_strong_df("empty"),
                                  ref.encode_strong_df("empty"))


def test_decode_strong_matches_reference_randomized():
    ours, ref = _pair()
    rng = np.random.RandomState(1)
    for _ in range(10):
        y = (rng.rand(ours.n_frames, len(LABELS)) > 0.8).astype(float)
        got = ours.decode_strong(y)
        want = ref.decode_strong(y)
        assert len(got) == len(want)
        for g, w in zip(sorted(map(tuple, got)), sorted(map(tuple, want))):
            assert g[0] == w[0]
            assert g[1] == pytest.approx(w[1])
            assert g[2] == pytest.approx(w[2])
