"""Config-file probe entry (reference train_freeze_hydra.py:197-210)."""
import json

import pytest

from audiossl_tpu.downstream.train_freeze_config import config_to_argv


def test_config_to_argv_grouped_and_flat():
    cfg = {
        "data": {"dataset_name": "spcv2", "data_path": "/d"},
        "model": {"model_type": "clip", "arch": "small"},
        "train": {"learning_rate": 2e-3, "batch_size": 1024},
        "pretrained_ckpt_path": "/ckpt",  # flat key also accepted
    }
    argv = config_to_argv(cfg)
    as_dict = dict(zip(argv[::2], argv[1::2]))
    assert as_dict["--dataset_name"] == "spcv2"
    assert as_dict["--pretrained_ckpt_path"] == "/ckpt"
    assert as_dict["--batch_size"] == "1024"


def test_config_to_argv_overrides_and_unknown():
    cfg = {"train": {"max_epochs": 100}, "data_path": "/d"}
    argv = config_to_argv(cfg, ["train.max_epochs=2", "arch=tiny"])
    as_dict = dict(zip(argv[::2], argv[1::2]))
    assert as_dict["--max_epochs"] == "2"  # hydra-style override wins
    assert as_dict["--arch"] == "tiny"
    with pytest.raises(SystemExit):
        config_to_argv({"nonexistent_key": 1})
    with pytest.raises(SystemExit):
        config_to_argv({}, ["not-an-override"])


def test_config_none_values_dropped():
    # the reference's config.yaml ships empty (None) placeholders
    cfg = {"train": {"learning_rate": None, "batch_size": 8},
           "save_path": None}
    argv = config_to_argv(cfg)
    assert "--learning_rate" not in argv and "--save_path" not in argv
    assert argv == ["--batch_size", "8"]


@pytest.mark.slow
def test_config_driver_end_to_end(tmp_path):
    """Same flow as test_cli.test_train_freeze_driver_orbax, driven by
    a YAML config file + a CLI override."""
    import jax
    import jax.numpy as jnp
    import yaml

    from audiossl_tpu.datasets import write_synthetic_pack
    from audiossl_tpu.downstream.train_freeze_config import main
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
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump({
        "data": {"dataset_name": "audioset_b", "data_path": data},
        "model": {"pretrained_ckpt_path": ckpt, "model_type": "clip",
                  "arch": "tiny", "n_last_blocks": 2},
        "train": {"batch_size": 8, "max_epochs": 4, "train_len": 1.0},
    }))
    res = main([str(cfg_path), "train.max_epochs=2"])
    assert res["metric"] == "mAP"
    assert 0.0 <= res["test"] <= 1.0
    assert json.dumps(res)  # serializable result like the flag entry
