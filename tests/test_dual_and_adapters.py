"""Dual method + adapter registry + ensemble/cal_norm tests."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiossl_tpu.methods.dual.method import (
    DualConfig,
    DualMethod,
    DualModel,
    variance_loss,
)
from audiossl_tpu.training.pretrain import OptimizerConfig


def tiny_dual_cfg():
    return DualConfig(arch="small", anchor_len=0.5,
                      expander_dim=64, out_dim=16,
                      optimizer=OptimizerConfig(max_steps=50,
                                                warmup_steps=2,
                                                learning_rate=1e-3))


def make_tiny_method():
    cfg = tiny_dual_cfg()
    m = DualMethod(cfg)

    # shrink the encoders for CI
    class TinyModel(DualModel):
        def setup(self):
            from audiossl_tpu.models.atst import AudioTransformer
            import flax.linen as nn
            from audiossl_tpu.methods.dual.method import _Expander

            c = self.cfg
            kw = dict(embed_dim=32, depth=2, num_heads=2,
                      spec_h=c.mel.n_mels, spec_w=c.out_frames,
                      use_cls=False)
            self.patchnet = AudioTransformer(patch_h=16, patch_w=16,
                                             name="patchnet", **kw)
            self.framenet = AudioTransformer(patch_h=64, patch_w=4,
                                             name="framenet", **kw)
            self.patch_recon = nn.Dense(16 * 16, name="patch_recon")
            self.frame_recon = nn.Dense(64 * 4, name="frame_recon")
            self.patch_expander = _Expander(64, 16,
                                            name="patch_expander")
            self.frame_expander = _Expander(64, 16,
                                            name="frame_expander")

    m.model = TinyModel(cfg)
    return m, cfg


def test_variance_loss():
    z = jnp.zeros((10, 4))  # collapsed -> loss 1
    l, s = variance_loss(z)
    assert float(l) == pytest.approx(1.0, abs=0.02)
    z = jnp.asarray(np.random.RandomState(0).randn(500, 4) * 3)
    l, _ = variance_loss(z)
    assert float(l) < 0.05


@pytest.mark.slow
def test_dual_training_step():
    m, cfg = make_tiny_method()
    state = m.init_state(jax.random.PRNGKey(0))
    step = jax.jit(m.make_step(), donate_argnums=0)
    rng = np.random.RandomState(0)
    batch = {"wav": rng.randn(8, cfg.out_samples).astype(np.float32) * 0.1,
             "valid": np.full(8, cfg.out_samples, np.int32)}
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]
    for k in ("loss_mel_patch", "loss_mel_frame", "loss_dual",
              "std_patch", "std_frame"):
        assert k in metrics


def test_adapter_registry():
    from audiossl_tpu.downstream.comparison_models import (
        get_adapter,
        list_adapters,
        register_adapter,
    )

    assert {"frameatst", "clipatst", "distillatst",
            "beats"} <= set(list_adapters())
    with pytest.raises(KeyError):
        get_adapter("ssast-not-registered")

    @register_adapter("dummy")
    def _dummy(**kw):
        return "ok"

    assert get_adapter("dummy") == "ok"


def test_ensemble_and_cal_norm():
    from audiossl_tpu.downstream.comparison_models import (
        EnsembleModel,
        cal_norm,
    )

    f1 = lambda x: np.ones((2, 3))
    f2 = lambda x: np.zeros((2, 3))
    ens = EnsembleModel([f1, f2])
    np.testing.assert_allclose(ens(None), 0.5)

    def extract(wav, valid):
        return wav[:, :4]

    loader = [{"wav": np.full((2, 8), 2.0, np.float32),
               "valid": np.full(2, 8)},
              {"wav": np.zeros((2, 8), np.float32),
               "valid": np.full(2, 8)}]
    mean, std = cal_norm(extract, loader)
    np.testing.assert_allclose(mean, 1.0)
    np.testing.assert_allclose(std, 1.0)
