"""Milestone-A-style end-to-end: wav -> on-device mel -> encoder
features -> linear probe learns a frequency-classification task well
above chance (exercises the whole inference + probe stack, no
pretrained weights needed — even a random frozen encoder's features
separate pure tones)."""
import jax
import jax.numpy as jnp
import pytest
import numpy as np

from audiossl_tpu.downstream.embedding import (
    extract_split,
    make_clip_extractor,
)
from audiossl_tpu.downstream.linear import (
    LinearProbeConfig,
    train_linear_probe,
)
from audiossl_tpu.models.atst import AudioTransformer


def tone_dataset(n, seed):
    """class c -> tone at (c+1)*500 Hz + noise."""
    rng = np.random.RandomState(seed)
    sr, dur = 16000, 1.0
    t = np.arange(int(sr * dur)) / sr
    X, y = [], []
    for _ in range(n):
        c = rng.randint(4)
        f = (c + 1) * 500 + rng.uniform(-30, 30)
        wav = 0.3 * np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
        wav += rng.randn(len(t)) * 0.05
        X.append(wav.astype(np.float32))
        y.append(c)
    return np.stack(X), np.asarray(y)


class _Loader:
    def __init__(self, X, y, bs=32):
        self.X, self.y, self.bs = X, y, bs

    def __iter__(self):
        for i in range(0, len(self.X), self.bs):
            xb = self.X[i: i + self.bs]
            yield {"wav": xb,
                   "valid": np.full(len(xb), xb.shape[1], np.int32),
                   "label": self.y[i: i + self.bs]}


@pytest.mark.slow
def test_probe_separates_tones():
    enc = AudioTransformer(embed_dim=32, depth=2, num_heads=2, spec_h=64,
                           spec_w=101, use_cls=True)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 101)),
                      length=jnp.asarray([101]),
                      deterministic=True)["params"]
    extract = make_clip_extractor(enc, params, crop_len_s=1.0,
                                  n_blocks=2, chunk_len=101)
    Xtr, ytr = tone_dataset(160, 0)
    Xte, yte = tone_dataset(64, 1)
    etr, ltr = extract_split(extract, _Loader(Xtr, ytr))
    ete, lte = extract_split(extract, _Loader(Xte, yte))
    cfg = LinearProbeConfig(learning_rate=0.05, batch_size=64,
                            max_epochs=30, num_labels=4)
    res = train_linear_probe(etr, ltr, ete[:32], lte[:32], ete[32:],
                             lte[32:], cfg)
    assert res["val_metric"] > 0.75  # chance = 0.25
    assert res["test_metric"] > 0.75
