"""In-process CLI smoke tests (tiny arch, few steps)."""
import os

import numpy as np
import pytest

from audiossl_tpu.datasets import write_synthetic_pack


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_train_freeze_driver_orbax(tmp_path):
    """Probe driver end-to-end with an orbax-exported tiny encoder and
    a synthetic packed dataset (uses the audioset_b registry entry)."""
    import jax
    import jax.numpy as jnp

    from audiossl_tpu.downstream.train_freeze import main
    from audiossl_tpu.models.atst import ast_tiny
    from audiossl_tpu.training.checkpoint import save_params

    enc = ast_tiny(spec_w=1001)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 101)),
                      length=jnp.asarray([101]),
                      deterministic=True)["params"]
    ckpt = str(tmp_path / "enc_params")
    save_params(ckpt, params)

    data = str(tmp_path / "data")
    for split in ("train", "valid", "test"):
        write_synthetic_pack(data, split, 8, min_s=0.5, max_s=1.0,
                             num_labels=527, multi_label=True, seed=1)
    res = main([
        "--pretrained_ckpt_path", ckpt, "--data_path", data,
        "--dataset_name", "audioset_b", "--model_type", "clip",
        "--arch", "tiny", "--batch_size", "8", "--max_epochs", "2",
        "--n_last_blocks", "2", "--train_len", "1.0",
    ])
    assert res["metric"] == "mAP"
    assert 0.0 <= res["test"] <= 1.0


@pytest.mark.slow
def test_mae_cli(tmp_path):
    from audiossl_tpu.methods.mae.train import main

    data = str(tmp_path / "data")
    write_synthetic_pack(data, "train", 16, min_s=0.6, max_s=1.0)
    main([
        "--data_path", data, "--save_path", str(tmp_path / "exp"),
        "--batch_size_per_device", "2", "--max_steps", "2",
        "--warmup_steps", "1", "--anchor_len", "0.5",
        "--embed_dim", "32", "--depth", "2", "--num_heads", "2",
        "--dec_embed_dim", "32", "--dec_depth", "1",
        "--dec_num_heads", "2", "--clip_len", "1.0", "--subset", "16",
        "--ckpt_interval", "2",
    ])
    assert os.path.exists(str(tmp_path / "exp" / "ckpt"))


@pytest.mark.slow
def test_dual_cli(tmp_path):
    from audiossl_tpu.methods.dual.train import main

    data = str(tmp_path / "data")
    write_synthetic_pack(data, "train", 16, min_s=0.6, max_s=1.0)
    main([
        "--data_path", data, "--save_path", str(tmp_path / "exp"),
        "--arch", "tiny", "--batch_size_per_device", "2",
        "--max_steps", "2", "--warmup_steps", "1",
        "--anchor_len", "0.5", "--expander_dim", "64",
        "--out_dim", "16", "--clip_len", "1.0", "--subset", "16",
        "--ckpt_interval", "2",
    ])
    assert os.path.exists(str(tmp_path / "exp" / "ckpt"))
