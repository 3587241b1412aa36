"""Import the reference PyTorch code read-only with its unavailable
heavyweight deps (lightning, torchaudio, lmdb, fairseq, ...) stubbed out.

Only used by parity tests that need the reference's *pure-torch* logic
(param grouping, module math); the stubs never execute — they just let
the module graph import.
"""
import sys
import types

import torch


def install_reference_stubs():
    import pandas  # noqa: F401  (load before stubbing pyarrow)

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        pl.LightningModule = torch.nn.Module
        pl.__version__ = "99.0.0"

        class _Callback:
            pass

        pl.Callback = _Callback
        pl.LightningDataModule = object
        pl.Trainer = object
        sys.modules["pytorch_lightning"] = pl

    stub_names = [
        "fairseq", "fairseq.data", "fairseq.data.data_utils",
        "lmdb", "pyarrow", "dcase_util", "dcase_util.data", "torchmetrics",
        "librosa", "librosa.util", "sed_eval",
        "torchaudio", "torchaudio.transforms", "torchaudio.functional",
        "torchaudio.datasets",
    ]
    for name in stub_names:
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__version__ = "99.0.0"
            sys.modules[name] = m

    sys.modules["fairseq"].data = sys.modules["fairseq.data"]
    sys.modules["fairseq.data"].data_utils = (
        sys.modules["fairseq.data.data_utils"])
    if not hasattr(sys.modules["fairseq.data.data_utils"],
                   "compute_mask_indices"):
        sys.modules["fairseq.data.data_utils"].compute_mask_indices = None
    sys.modules["librosa.util"].find_files = getattr(
        sys.modules["librosa.util"], "find_files", None)
    sys.modules["dcase_util"].data = sys.modules["dcase_util.data"]
    if not hasattr(sys.modules["dcase_util.data"], "DecisionEncoder"):
        sys.modules["dcase_util.data"].DecisionEncoder = object
        sys.modules["dcase_util.data"].ProbabilityEncoder = object

    ta = sys.modules["torchaudio"]
    ta.load = getattr(ta, "load", None)
    ta.transforms = sys.modules["torchaudio.transforms"]
    ta.functional = sys.modules["torchaudio.functional"]
    ta.datasets = sys.modules["torchaudio.datasets"]
    for n in ("MelSpectrogram", "AmplitudeToDB", "FrequencyMasking",
              "TimeMasking", "Resample"):
        if not hasattr(ta.transforms, n):
            setattr(ta.transforms, n, object)
    if not hasattr(ta.datasets, "LIBRISPEECH"):
        ta.datasets.LIBRISPEECH = object

    class _F1Score:
        def __init__(self, *a, **k):
            pass

    tm = sys.modules["torchmetrics"]
    if not hasattr(tm, "F1Score"):
        tm.F1Score = _F1Score
        tm.classification = types.ModuleType("torchmetrics.classification")
        tm.classification.F1Score = _F1Score
        sys.modules["torchmetrics.classification"] = tm.classification
