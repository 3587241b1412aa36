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


@pytest.mark.slow
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
    from audiossl_tpu.training.checkpoint import read_topk_index

    entries, mode = read_topk_index(idx)
    assert mode == "max"  # DCASE keeper monitors weak F1 (max)
    assert len(entries) == 1  # 1 epoch -> 1 kept checkpoint


@pytest.mark.slow
def test_train_dcase_driver_beats_arch(tmp_path):
    """--arch beats: a released-format torch checkpoint (cfg + model
    state_dict) drives the same SED pipeline through the BEATs adapter
    (reference train_dcase.py:155-156)."""
    torch = pytest.importorskip("torch")
    from audiossl_tpu.downstream.train_dcase import main

    small_cfg = dict(
        input_patch_size=16, embed_dim=32, conv_bias=False,
        encoder_layers=2, encoder_embed_dim=48,
        encoder_ffn_embed_dim=96, encoder_attention_heads=4,
        layer_norm_first=False, deep_norm=True, conv_pos=128,
        conv_pos_groups=16, relative_position_embedding=True,
        num_buckets=80, max_distance=800, gru_rel_pos=True)

    # build a torch state_dict in the released layout from our own
    # flax init (inverse of convert_beats_state_dict)
    from audiossl_tpu.compat.beats import BEATsConfig, BEATsEncoder

    cfg = BEATsConfig.from_checkpoint_cfg(small_cfg)
    enc = BEATsEncoder(cfg)
    p = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 128)))["params"]

    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32))

    sd = {
        "patch_embedding.weight": t(p["patch_embedding"]["kernel"]
                                    ).permute(3, 2, 0, 1),
        "layer_norm.weight": t(p["layer_norm"]["scale"]),
        "layer_norm.bias": t(p["layer_norm"]["bias"]),
        "post_extract_proj.weight": t(p["post_extract_proj"]["kernel"]).T,
        "post_extract_proj.bias": t(p["post_extract_proj"]["bias"]),
        "encoder.layer_norm.weight": t(p["encoder_layer_norm"]["scale"]),
        "encoder.layer_norm.bias": t(p["encoder_layer_norm"]["bias"]),
        "encoder.layers.0.self_attn.relative_attention_bias.weight":
            t(p["relative_attention_bias"]),
    }
    # weight-normed pos conv: store v = kernel, g = per-tap norm of v
    # so that g * v / ||v|| == kernel
    v = t(p["pos_conv"]["kernel"]).permute(2, 1, 0)  # [out, in/g, k]
    sd["encoder.pos_conv.0.weight_v"] = v
    sd["encoder.pos_conv.0.weight_g"] = v.norm(dim=(0, 1), keepdim=True)
    sd["encoder.pos_conv.0.bias"] = t(p["pos_conv"]["bias"])
    for i in range(cfg.encoder_layers):
        lp = p[f"layers_{i}"]
        pre = f"encoder.layers.{i}"
        for tn, fn in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                       ("v_proj", "v_proj"), ("out_proj", "out_proj"),
                       ("grep_linear", "grep_linear")):
            sd[f"{pre}.self_attn.{tn}.weight"] = t(
                lp["self_attn"][fn]["kernel"]).T
            sd[f"{pre}.self_attn.{tn}.bias"] = t(
                lp["self_attn"][fn]["bias"])
        sd[f"{pre}.self_attn.grep_a"] = t(lp["self_attn"]["grep_a"])
        for tn in ("fc1", "fc2"):
            sd[f"{pre}.{tn}.weight"] = t(lp[tn]["kernel"]).T
            sd[f"{pre}.{tn}.bias"] = t(lp[tn]["bias"])
        for tn, fn in (("self_attn_layer_norm", "self_attn_layer_norm"),
                       ("final_layer_norm", "final_layer_norm")):
            sd[f"{pre}.{tn}.weight"] = t(lp[fn]["scale"])
            sd[f"{pre}.{tn}.bias"] = t(lp[fn]["bias"])

    ckpt = str(tmp_path / "beats.pt")
    torch.save({"cfg": small_cfg, "model": sd}, ckpt)

    data = str(tmp_path / "dcase")
    _make_dcase_dir(data)
    res = main([
        "--pretrained_ckpt_path", ckpt, "--data_path", data,
        "--arch", "beats", "--batch_size_synth", "2",
        "--batch_size_weak", "2", "--max_epochs", "1",
        "--warmup_epochs", "0", "--learning_rate", "0.01",
    ])
    for k in ("psds1", "psds2", "event_f1"):
        assert k in res
        assert 0.0 <= res[k] <= 1.0


@pytest.mark.slow
def test_train_dcase_driver_byola_arch(tmp_path):
    """--arch byola: a released-format BYOL-A .pth drives the SED
    pipeline through the CNN adapter (reference train_dcase.py:141)."""
    torch = pytest.importorskip("torch")
    from audiossl_tpu.compat.byola import AudioNTT2022Encoder
    from audiossl_tpu.downstream.train_dcase import main

    enc = AudioNTT2022Encoder(n_mels=64, d=3072)
    v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96)))

    def t(x):
        return torch.from_numpy(np.array(x, np.float32))

    p, s = v["params"], v["batch_stats"]
    sd = {}
    for i, (ci, bi) in enumerate(((0, 1), (4, 5))):
        sd[f"features.{ci}.weight"] = t(p[f"conv{i}"]["kernel"]
                                        ).permute(3, 2, 0, 1)
        sd[f"features.{ci}.bias"] = t(p[f"conv{i}"]["bias"])
        sd[f"features.{bi}.weight"] = t(p[f"bn{i}"]["scale"])
        sd[f"features.{bi}.bias"] = t(p[f"bn{i}"]["bias"])
        sd[f"features.{bi}.running_mean"] = t(s[f"bn{i}"]["mean"])
        sd[f"features.{bi}.running_var"] = t(s[f"bn{i}"]["var"])
    for j, fi in ((0, 0), (1, 3)):
        sd[f"fc.{fi}.weight"] = t(p[f"fc{j}"]["kernel"]).T
        sd[f"fc.{fi}.bias"] = t(p[f"fc{j}"]["bias"])
    ckpt = str(tmp_path / "byola.pth")
    torch.save(sd, ckpt)

    data = str(tmp_path / "dcase")
    _make_dcase_dir(data)
    res = main([
        "--pretrained_ckpt_path", ckpt, "--data_path", data,
        "--arch", "byola", "--batch_size_synth", "2",
        "--batch_size_weak", "2", "--max_epochs", "1",
        "--warmup_epochs", "0", "--learning_rate", "0.01",
    ])
    for k in ("psds1", "psds2", "event_f1"):
        assert k in res
        assert 0.0 <= res[k] <= 1.0
