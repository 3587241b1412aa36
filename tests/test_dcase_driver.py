"""End-to-end DCASE SED driver on a synthetic dataset (tiny arch)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
from scipy.io import wavfile

from audiossl_tpu.datasets.sed import DCASE_CLASSES


def _make_dcase_dir(root):
    rng = np.random.RandomState(0)
    sr = 16000
    for sub, n, strong in (("synth_train", 6, True),
                           ("weak_train", 6, False),
                           ("synth_val", 4, True),
                           ("strong_val", 4, True)):
        audio = os.path.join(root, sub, "audio")
        os.makedirs(audio, exist_ok=True)
        rows = []
        for i in range(n):
            fname = f"{sub}_{i}.wav"
            wav = (rng.randn(sr * 2) * 3000).astype(np.int16)
            wavfile.write(os.path.join(audio, fname), sr, wav)
            cls = DCASE_CLASSES[i % 3]
            if strong:
                rows.append({"filename": fname, "onset": 0.2,
                             "offset": 1.5, "event_label": cls})
            else:
                rows.append({"filename": fname, "event_labels": cls})
        pd.DataFrame(rows).to_csv(os.path.join(root, sub, "meta.tsv"),
                                  sep="\t", index=False)


def test_train_dcase_driver_e2e(tmp_path):
    from audiossl_tpu.downstream.train_dcase import main
    from audiossl_tpu.models.atst import frame_ast_tiny
    from audiossl_tpu.training.checkpoint import save_params

    enc = frame_ast_tiny(spec_w=1001)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 101)),
                      length=jnp.asarray([101]),
                      deterministic=True)["params"]
    ckpt = str(tmp_path / "enc")
    save_params(ckpt, params)

    data = str(tmp_path / "dcase")
    _make_dcase_dir(data)
    save = str(tmp_path / "out")
    res = main([
        "--pretrained_ckpt_path", ckpt, "--data_path", data,
        "--arch", "tiny", "--batch_size_synth", "2",
        "--batch_size_weak", "2", "--max_epochs", "1",
        "--warmup_epochs", "0", "--learning_rate", "0.01",
        "--save_path", save,
    ])
    for k in ("psds1", "psds2", "event_f1"):
        assert k in res
        assert 0.0 <= res[k] <= 1.0
    # the best checkpoint was persisted to disk and is restorable
    # (reference ModelCheckpoint save_top_k, train_dcase.py:51-58)
    import json

    idx = os.path.join(save, "top", "index.json")
    assert os.path.exists(idx)
    with open(idx) as f:
        entries = json.load(f)
    assert len(entries) == 1  # 1 epoch -> 1 kept checkpoint
