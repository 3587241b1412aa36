"""In-process CLI smoke tests (tiny arch, few steps)."""
import os

import numpy as np
import pytest

from audiossl_tpu.datasets import write_synthetic_pack


def test_atst_clip_cli(tmp_path):
    from audiossl_tpu.methods.atst.train import main

    data = str(tmp_path / "data")
    write_synthetic_pack(data, "train", 16, min_s=0.6, max_s=1.0)
    main([
        "--data_path", data, "--save_path", str(tmp_path / "exp"),
        "--arch", "tiny", "--batch_size_per_device", "2",
        "--max_steps", "2", "--warmup_steps", "1",
        "--anchor_len", "0.5", "0.5", "--positive_len", "0.5", "0.5",
        "--clip_len", "1.0", "--subset", "16",
        "--ckpt_interval", "2", "--dtype", "float32",
    ])
    assert os.path.exists(str(tmp_path / "exp" / "ckpt"))


def test_atst_frame_cli(tmp_path):
    from audiossl_tpu.methods.atstframe.train import main

    data = str(tmp_path / "data")
    write_synthetic_pack(data, "train", 16, min_s=0.6, max_s=1.0)
    main([
        "--data_path", data, "--save_path", str(tmp_path / "exp"),
        "--arch", "tiny", "--batch_size_per_device", "2",
        "--max_steps", "2", "--warmup_steps", "1",
        "--anchor_len", "0.5", "--clip_len", "1.0", "--subset", "16",
        "--ckpt_interval", "2", "--dtype", "float32",
    ])
    assert os.path.exists(str(tmp_path / "exp" / "ckpt"))
