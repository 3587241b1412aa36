"""Downstream suite: metrics goldens, extractors, linear probe e2e,
checkpoint roundtrip."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiossl_tpu.downstream.embedding import (
    central_crop_frames,
    make_clip_extractor,
    make_frame_extractor,
)
from audiossl_tpu.downstream.linear import (
    LinearProbeConfig,
    train_linear_probe,
)
from audiossl_tpu.downstream.metrics import (
    Metric,
    average_precision,
    mean_average_precision,
    top1_accuracy,
)
from audiossl_tpu.models.atst import AudioTransformer


def test_average_precision_matches_sklearn():
    from sklearn.metrics import average_precision_score

    rng = np.random.RandomState(0)
    for _ in range(5):
        y = (rng.rand(50) > 0.7).astype(np.float32)
        if y.sum() == 0:
            y[0] = 1
        s = rng.rand(50)
        ours = average_precision(s, y)
        want = average_precision_score(y, s)
        assert abs(ours - want) < 1e-6


def test_map_nan_class_dropped():
    scores = np.array([[0.9, 0.1], [0.2, 0.5]])
    targets = np.array([[1, 0], [0, 0]])  # class 1 has no positives
    m = mean_average_precision(scores, targets)
    assert m == 1.0  # only class 0 counts, AP=1


def test_metric_accumulation():
    m = Metric("ACC")
    m.update(np.eye(3), np.arange(3))
    m.update(np.eye(3)[::-1], np.arange(3))
    assert m.compute() == pytest.approx(4 / 6)


def test_central_crop():
    wav = jnp.tile(jnp.arange(100, dtype=jnp.float32)[None], (2, 1))
    valid = jnp.array([100, 60], jnp.int32)
    out, ov = central_crop_frames(wav, valid, 50)
    assert out.shape == (2, 50)
    np.testing.assert_array_equal(np.asarray(ov), [50, 50])
    # centered: sample 0 starts at (100-50)//2 = 25
    assert float(out[0, 0]) == 25.0
    # sample 1 starts at (60-50)//2 = 5
    assert float(out[1, 0]) == 5.0


@pytest.fixture(scope="module")
def tiny_clip_encoder():
    enc = AudioTransformer(embed_dim=32, depth=2, num_heads=2, spec_h=64,
                           spec_w=201, use_cls=True)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 201)),
                      length=jnp.asarray([201]),
                      deterministic=True)["params"]
    return enc, params


def test_clip_extractor_shapes(tiny_clip_encoder):
    enc, params = tiny_clip_encoder
    ex = make_clip_extractor(enc, params, crop_len_s=2.0, n_blocks=2,
                             chunk_len=101)
    wav = jnp.asarray(np.random.RandomState(0).randn(3, 40000)
                      .astype(np.float32) * 0.1)
    valid = jnp.array([40000, 32000, 20000], jnp.int32)
    emb = ex(wav, valid)
    # 2 blocks x (cls + avg) x 32 dims
    assert emb.shape == (3, 2 * 2 * 32)
    assert bool(jnp.isfinite(emb).all())


def test_frame_extractor_shapes():
    enc = AudioTransformer(embed_dim=32, depth=2, num_heads=2, spec_h=64,
                           spec_w=101, use_cls=False)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 101)),
                      length=jnp.asarray([101]),
                      deterministic=True)["params"]
    ex = make_frame_extractor(enc, params, crop_len_s=2.0, n_blocks=2,
                              chunk_len_s=1.0)
    wav = jnp.asarray(np.random.RandomState(0).randn(3, 40000)
                      .astype(np.float32) * 0.1)
    valid = jnp.array([40000, 32000, 17000], jnp.int32)
    emb = ex(wav, valid)
    assert emb.shape == (3, 2 * 32)
    assert bool(jnp.isfinite(emb).all())


def test_linear_probe_learns_separable_task():
    rng = np.random.RandomState(0)
    n, d, c = 400, 16, 4
    centers = rng.randn(c, d) * 3
    y = rng.randint(c, size=n)
    x = centers[y] + rng.randn(n, d)
    cfg = LinearProbeConfig(learning_rate=0.1, batch_size=100,
                            max_epochs=10, num_labels=c)
    res = train_linear_probe(x[:300], y[:300], x[300:350], y[300:350],
                             x[350:], y[350:], cfg)
    assert res["val_metric"] > 0.9
    assert res["test_metric"] > 0.9


def test_linear_probe_multilabel():
    rng = np.random.RandomState(1)
    n, d, c = 300, 12, 5
    w = rng.randn(d, c)
    x = rng.randn(n, d)
    y = (x @ w > 0.5).astype(np.float32)
    cfg = LinearProbeConfig(learning_rate=0.1, batch_size=64,
                            max_epochs=10, multi_label=True, num_labels=c)
    res = train_linear_probe(x[:200], y[:200], x[200:250], y[200:250],
                             x[250:], y[250:], cfg)
    assert res["val_metric"] > 0.8


def test_checkpoint_roundtrip(tmp_path):
    from audiossl_tpu.training.checkpoint import (
        CheckpointManager,
        restore_params,
        save_params,
    )

    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
              "b": jnp.ones((3,))}
    save_params(str(tmp_path / "p"), params)
    back = restore_params(str(tmp_path / "p"))
    np.testing.assert_array_equal(np.asarray(back["w"]),
                                  np.asarray(params["w"]))

    from typing import NamedTuple

    class S(NamedTuple):
        step: jnp.ndarray
        params: dict

    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=1)
    s = S(step=jnp.asarray(7), params=params)
    assert mgr.save(7, jax.device_get(s), force=True)
    mgr.wait()
    restored = mgr.restore_latest(s)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["b"]), 1.0)
    mgr.close()
