"""SED stack tests: encoder roundtrip, median filter vs scipy,
intersection metrics vs naive reference, PSDS/event-F1 sanity, head and
train step."""
import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from audiossl_tpu.sed.decode import (
    batched_decode_preds,
    decode_preds,
    median_filter_1d,
    preds_to_events,
)
from audiossl_tpu.sed.encoder import ManyHotEncoder
from audiossl_tpu.sed.head import SEDHead
from audiossl_tpu.sed.metrics import (
    SEDMetrics,
    clip_avg_f1,
    f1_from_stats,
    intersection_stats,
)
from audiossl_tpu.sed.psds import compute_psds, event_based_f1

LABELS = ["Cat", "Dog", "Speech"]


@pytest.fixture
def enc():
    return ManyHotEncoder(LABELS, audio_len=10.0, frame_len=1024,
                          frame_hop=160, net_pooling=4)


def test_manyhot_encode_decode_roundtrip(enc):
    assert enc.n_frames == 250
    df = pd.DataFrame([
        {"event_label": "Cat", "onset": 1.0, "offset": 2.0},
        {"event_label": "Speech", "onset": 0.0, "offset": 10.0},
    ])
    y = enc.encode_strong_df(df)
    assert y.shape == (250, 3)
    events = enc.decode_strong(y)
    d = {e[0]: (e[1], e[2]) for e in events}
    assert d["Cat"][0] == pytest.approx(1.0, abs=0.05)
    assert d["Cat"][1] == pytest.approx(2.0, abs=0.05)
    assert d["Speech"] == (0.0, 10.0)


def test_manyhot_weak_and_empty(enc):
    y = enc.encode_weak(["Dog"])
    np.testing.assert_array_equal(y, [0, 1, 0])
    assert (enc.encode_weak("empty") == -1).all()
    assert enc.decode_weak(np.array([1, 0, 1])) == ["Cat", "Speech"]


def test_median_filter_matches_scipy():
    from scipy.ndimage import median_filter

    rng = np.random.RandomState(0)
    x = (rng.rand(2, 3, 30) > 0.5).astype(np.float32)
    for k in (3, 7):
        ours = np.asarray(median_filter_1d(jnp.asarray(x), k))
        want = median_filter(x, size=(1, 1, k), mode="reflect")
        np.testing.assert_allclose(ours, want, atol=1e-6,
                                   err_msg=f"k={k}")


def test_decode_preds_shapes():
    scores = jnp.asarray(np.random.RandomState(0).rand(2, 3, 50))
    one = decode_preds(scores, [0.5], 7)
    assert one.shape == (2, 3, 50)
    many = decode_preds(scores, [0.2, 0.5, 0.8], 7)
    assert many.shape == (3, 2, 3, 50)
    # monotone: higher threshold -> fewer activations
    assert float(many[0].sum()) >= float(many[2].sum())


def _naive_intersection(preds, truths, thd):
    B, C, T = preds.shape
    tp = np.zeros((B, C))
    fp = np.zeros((B, C))
    fn = np.zeros((B, C))
    for b in range(B):
        for c in range(C):
            act = preds[b, c].astype(bool) | truths[b, c].astype(bool)
            t = 0
            while t < T:
                if act[t]:
                    e = t
                    while e < T and act[e]:
                        e += 1
                    ps = preds[b, c, t:e].sum()
                    ts = truths[b, c, t:e].sum()
                    ratio = ps / (ts + 1e-7)
                    longer = ratio >= thd
                    shorter = ratio < 1.0 / thd
                    if longer and shorter:
                        tp[b, c] += 1
                    elif longer:
                        fp[b, c] += 1
                    else:
                        fn[b, c] += 1
                    t = e
                else:
                    t += 1
    return tp, fp, fn


def test_intersection_stats_matches_naive():
    rng = np.random.RandomState(3)
    preds = (rng.rand(4, 3, 40) > 0.6).astype(np.float32)
    truths = (rng.rand(4, 3, 40) > 0.6).astype(np.float32)
    tp, fp, fn, _ = intersection_stats(jnp.asarray(preds),
                                       jnp.asarray(truths), 0.5)
    ntp, nfp, nfn = _naive_intersection(preds, truths, 0.5)
    np.testing.assert_array_equal(np.asarray(tp), ntp)
    np.testing.assert_array_equal(np.asarray(fp), nfp)
    np.testing.assert_array_equal(np.asarray(fn), nfn)


def test_perfect_predictions_give_f1_one():
    rng = np.random.RandomState(1)
    truths = (rng.rand(3, 2, 30) > 0.7).astype(np.float32)
    tp, fp, fn, _ = intersection_stats(jnp.asarray(truths),
                                       jnp.asarray(truths), 0.7)
    f1 = f1_from_stats(tp.sum(0), fp.sum(0), fn.sum(0))
    assert float(f1) == pytest.approx(1.0, abs=1e-5)
    assert float(clip_avg_f1(jnp.asarray(truths),
                             jnp.asarray(truths))) == pytest.approx(
        1.0, abs=1e-5)


def test_sed_metrics_accumulator():
    truths = np.zeros((1, 1, 20), np.float32)
    truths[0, 0, 5:10] = 1
    m = SEDMetrics(0.5)
    m.accumulate(truths, truths)
    assert m.macro_f1() == pytest.approx(1.0, abs=1e-5)


def test_preds_to_events_and_psds(enc):
    # ground truth: one Cat event 1-2s in file a, Speech 0-5s in file b
    gt = pd.DataFrame([
        {"filename": "a.wav", "onset": 1.0, "offset": 2.0,
         "event_label": "Cat"},
        {"filename": "b.wav", "onset": 0.0, "offset": 5.0,
         "event_label": "Speech"},
    ])
    durations = pd.DataFrame({"filename": ["a.wav", "b.wav"],
                              "duration": [10.0, 10.0]})
    # perfect frame predictions
    ya = enc.encode_strong_df(gt[gt.filename == "a.wav"])
    yb = enc.encode_strong_df(gt[gt.filename == "b.wav"])
    preds = np.stack([ya.T, yb.T])  # [2, C, T]
    dfs = batched_decode_preds(preds.astype(np.float32),
                               ["a.wav", "b.wav"], enc,
                               thresholds=[0.5], median_filter=3)
    events = dfs[0.5]
    assert set(events.event_label) == {"Cat", "Speech"}
    psds = compute_psds({0.5: events}, gt, durations,
                        dtc_threshold=0.7, gtc_threshold=0.7,
                        alpha_st=0.0)
    assert psds > 0.9
    ef1 = event_based_f1(events, gt)
    assert ef1 == pytest.approx(1.0, abs=1e-6)
    # empty detections -> psds 0
    empty = pd.DataFrame(columns=["event_label", "onset", "offset",
                                  "filename"])
    assert compute_psds({0.5: empty}, gt, durations) == 0.0


def test_sed_head_shapes_and_pooling():
    head = SEDHead(num_labels=5)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 20, 16)
                    .astype(np.float32))
    params = head.init(jax.random.PRNGKey(0), x)["params"]
    strong, weak = head.apply(params_wrap(params), x)
    assert strong.shape == (3, 5, 20)
    assert weak.shape == (3, 5)
    assert float(strong.min()) >= 0 and float(strong.max()) <= 1
    # weak is a convex combination of strong over time
    assert float(weak.min()) >= float(strong.min()) - 1e-6
    assert float(weak.max()) <= float(strong.max()) + 1e-6


def params_wrap(p):
    return {"params": p}


@pytest.mark.slow
def test_sed_task_train_step():
    from audiossl_tpu.models.atst import AudioTransformer
    from audiossl_tpu.sed.module import SEDConfig, SEDTask

    enc_mod = AudioTransformer(embed_dim=32, depth=2, num_heads=2,
                               spec_h=64, spec_w=101, use_cls=False)
    enc_params = enc_mod.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 101)),
        length=jnp.asarray([101]), deterministic=True)["params"]
    cfg = SEDConfig(num_labels=3, learning_rate=0.05, max_epochs=2,
                    steps_per_epoch=4, warmup_epochs=0, audio_len=1.0)
    task = SEDTask(enc_mod, cfg)
    state = task.init_state(jax.random.PRNGKey(1), enc_params)
    step = jax.jit(task.make_train_step(), donate_argnums=0)
    B, T_enc = 8, 25
    rng = np.random.RandomState(0)
    batch = {
        "wav": rng.randn(B, cfg.n_samples).astype(np.float32) * 0.1,
        "valid": np.full(B, cfg.n_samples, np.int32),
        "strong": (rng.rand(B, T_enc, 3) > 0.8).astype(np.float32),
        "source": np.array([0] * 4 + [1] * 4, np.int32),
    }
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]
    predict = jax.jit(task.make_predict_fn())
    strong, weak = predict(state, batch)
    assert strong.shape[0] == B and weak.shape == (B, 3)


def test_sed_task_distill_mode():
    from audiossl_tpu.models.atst import AudioTransformer
    from audiossl_tpu.sed.module import SEDConfig, SEDTask

    enc_mod = AudioTransformer(embed_dim=32, depth=2, num_heads=2,
                               spec_h=64, spec_w=101, use_cls=False)
    enc_params = enc_mod.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 101)),
        length=jnp.asarray([101]), deterministic=True)["params"]
    B, T_enc = 4, 25

    def teacher_fn(wav, valid):
        # frozen teacher stand-in: constant probabilities (the
        # SEDHead-output surface the driver's build_sed_teacher wraps)
        return (jnp.full((wav.shape[0], 3, T_enc), 0.5),
                jnp.full((wav.shape[0], 3), 0.5))

    cfg = SEDConfig(num_labels=3, learning_rate=0.05, max_epochs=1,
                    steps_per_epoch=2, warmup_epochs=0, audio_len=1.0,
                    distill_weight=0.5)
    task = SEDTask(enc_mod, cfg, teacher_fn=teacher_fn)
    state = task.init_state(jax.random.PRNGKey(1), enc_params)
    step = jax.jit(task.make_train_step(), donate_argnums=0)
    rng = np.random.RandomState(0)
    batch = {
        "wav": rng.randn(B, cfg.n_samples).astype(np.float32) * 0.1,
        "valid": np.full(B, cfg.n_samples, np.int32),
        "strong": (rng.rand(B, T_enc, 3) > 0.8).astype(np.float32),
        "source": np.array([0, 0, 1, 1], np.int32),
    }
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    # distill term raises the total loss vs its components
    assert float(m["loss"]) > float(m["strong_loss"]) + float(
        m["weak_loss"]) - 1e-6


def test_mixed_batch_loader_composition(tmp_path):
    """Every batch = fixed per-source counts; shorter sources cycle
    (reference ConcatDatasetSampler, SURVEY.md §4 test strategy)."""
    from audiossl_tpu.datasets.sed import MixedBatchLoader

    class FakeSet:
        def __init__(self, tag, n):
            self.tag, self.n = tag, n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            wav = np.full(100, float(i), np.float32)
            strong = np.zeros((5, 3), np.float32)
            return wav, strong, f"{self.tag}_{i}"

    a, b = FakeSet("a", 8), FakeSet("b", 3)
    loader = MixedBatchLoader([a, b], [4, 2], shuffle=False)
    assert len(loader) == 2  # primary source governs epoch length
    batches = list(loader)
    for batch in batches:
        np.testing.assert_array_equal(batch["source"],
                                      [0, 0, 0, 0, 1, 1])
        assert batch["wav"].shape == (6, 100)
        assert batch["strong"].shape == (6, 5, 3)
        # first 4 filenames from source a, last 2 from b (cycling)
        assert all(f.startswith("a_") for f in batch["filenames"][:4])
        assert all(f.startswith("b_") for f in batch["filenames"][4:])
    # source b (len 3) cycles: batch0 uses b_0,b_1; batch1 b_2 then b_0
    assert batches[1]["filenames"][4:] == ["b_2", "b_0"]
