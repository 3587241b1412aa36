"""Component-inventory coverage: AttentionHead, attention maps, target
mixups, utils, datamodule facade, preprocessing scripts."""
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_attention_head():
    from audiossl_tpu.models.heads import AttentionHead

    head = AttentionHead(att_dim=32, num_heads=2, num_labels=7)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 10, 16)
                    .astype(np.float32))
    v = head.init(jax.random.PRNGKey(0), x, train=False)
    out = head.apply(v, x, train=False)
    assert out.shape == (3, 7)


def test_get_last_selfattention():
    from audiossl_tpu.models.atst import AudioTransformer

    enc = AudioTransformer(embed_dim=32, depth=2, num_heads=4, spec_h=64,
                           spec_w=41, use_cls=True)
    mel = jnp.asarray(np.random.RandomState(0).randn(2, 64, 41)
                      .astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), mel,
                      deterministic=True)["params"]
    attn = enc.apply({"params": params}, mel, jnp.asarray([11, 7]),
                     method=enc.get_last_selfattention)
    N = 1 + 10  # cls + 10 patches
    assert attn.shape == (2, 4, N, N)
    s = np.asarray(attn).sum(-1)
    np.testing.assert_allclose(s, 1.0, atol=1e-5)


def test_mixup_spec_label():
    from audiossl_tpu.transforms.target import (
        mixup_spec_label,
        mixup_wav_label,
    )

    B, F, T, C = 6, 8, 12, 4
    rng = np.random.RandomState(0)
    spec = jnp.asarray(rng.uniform(-1, 1, (B, F, T)).astype(np.float32))
    y = jax.nn.one_hot(jnp.asarray(rng.randint(C, size=B)), C)
    mixed, ym = mixup_spec_label(jax.random.PRNGKey(0), spec, y, alpha=10)
    assert mixed.shape == spec.shape and ym.shape == (B, C)
    np.testing.assert_allclose(np.asarray(ym.sum(-1)), 1.0, atol=1e-5)
    wav = jnp.asarray(rng.randn(B, 100).astype(np.float32))
    wm, ym2 = mixup_wav_label(jax.random.PRNGKey(1), wav, y)
    assert wm.shape == wav.shape
    np.testing.assert_allclose(np.asarray(ym2.sum(-1)), 1.0, atol=1e-5)


def test_bool_flag_and_param_groups():
    from audiossl_tpu.utils import bool_flag, get_params_groups

    assert bool_flag("true") and not bool_flag("off")
    with pytest.raises(Exception):
        bool_flag("maybe")
    params = {"a": {"kernel": jnp.ones((3, 3)), "bias": jnp.ones((3,))}}
    reg, no_reg = get_params_groups(params)
    assert reg == ["a/kernel"] and no_reg == ["a/bias"]


def test_downstream_datamodule(tmp_path):
    from audiossl_tpu.datasets import write_synthetic_pack
    from audiossl_tpu.datamodules import (
        DownstreamDataModule,
        InMemoryDataModule,
    )

    for split in ("train", "valid", "eval"):
        write_synthetic_pack(str(tmp_path), split, 8, min_s=0.2,
                             max_s=0.4, num_labels=527, multi_label=True)
    # fsd50k/audioset creators map 'test'->'eval'? our packed maps
    # val->valid; use audioset_b with the eval file renamed
    os.rename(tmp_path / "eval.ards", tmp_path / "test.ards")
    os.rename(tmp_path / "eval.ards.idx", tmp_path / "test.ards.idx")
    dm = DownstreamDataModule(str(tmp_path), "audioset_b", batch_size=4,
                              train_len_s=1.0)
    assert dm.num_labels == 527 and dm.multi_label
    b = next(iter(dm.train_dataloader()))
    assert b["wav"].shape == (4, 16000)
    assert b["label"].shape == (4, 527)

    im = InMemoryDataModule(np.zeros((10, 3)), np.zeros(10),
                            np.zeros((4, 3)), np.zeros(4),
                            np.zeros((4, 3)), np.zeros(4), batch_size=4)
    xs = list(im.iter_split("train"))
    assert len(xs) == 3


@pytest.mark.slow
def test_audioset_strong_prep_scripts(tmp_path):
    script = os.path.join(REPO, "scripts", "audioset_strong_prep.py")
    raw = pd.DataFrame({
        "segment_id": ["a", "a", "b"],
        "start_time_seconds": [0.0, 1.5, 2.0],
        "end_time_seconds": [2.0, 3.0, 4.0],
        "label": ["Dog", "Dog", "Cat"],
    })
    csv = tmp_path / "raw.csv"
    raw.to_csv(csv, index=False)
    train_tsv = tmp_path / "train.tsv"
    r = subprocess.run([sys.executable, script, "gen_tsv", "--csv",
                        str(csv), "--out", str(train_tsv)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    df = pd.read_csv(train_tsv, sep="\t")
    assert list(df.columns) == ["filename", "onset", "offset",
                                "event_label"]
    assert os.path.exists(tmp_path / "train_durations.tsv")

    # merge overlapping Dog events 0-2 and 1.5-3 -> 0-3
    r = subprocess.run([sys.executable, script, "merge", "--tsv",
                        str(train_tsv)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    df = pd.read_csv(train_tsv, sep="\t")
    dog = df[df.event_label == "Dog"]
    assert len(dog) == 1
    assert dog.iloc[0].onset == 0.0 and dog.iloc[0].offset == 3.0

    # common labels between train and an eval with only Dog
    eval_tsv = tmp_path / "eval.tsv"
    df[df.event_label == "Dog"].to_csv(eval_tsv, sep="\t", index=False)
    labels = tmp_path / "common_labels.txt"
    r = subprocess.run([sys.executable, script, "common", "--train",
                        str(train_tsv), "--eval", str(eval_tsv),
                        "--labels_out", str(labels)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert labels.read_text().strip() == "Dog"
    assert set(pd.read_csv(train_tsv, sep="\t").event_label) == {"Dog"}


def test_dataset2ards_synth(tmp_path):
    script = os.path.join(REPO, "scripts", "dataset2ards.py")
    r = subprocess.run([sys.executable, script, "synth", "--out",
                        str(tmp_path), "--n", "5"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    from audiossl_tpu.datasets.packed import PackedReader

    pr = PackedReader(str(tmp_path / "train.ards"))
    assert len(pr) == 5


def test_init_multihost_noop_by_default(monkeypatch):
    """Without a coordinator signal the pod bootstrap must be a no-op
    (single-chip runs and CPU tests never pay the handshake)."""
    from audiossl_tpu.parallel.mesh import init_multihost
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("AUDIOSSL_MULTIHOST", raising=False)
    assert init_multihost() is False
    monkeypatch.setenv("AUDIOSSL_MULTIHOST", "0")
    assert init_multihost() is False
