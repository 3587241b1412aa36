"""BYOL-A compat family: forward parity vs the reference torch encoder
(randomly initialized, same protocol as the BEATs/AST parity tests),
plus Slaney-filterbank and adapter checks."""
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _import_ref_byola():
    # models/byola.py needs easydict (absent) only for config helpers
    if "easydict" not in sys.modules:
        ed = types.ModuleType("easydict")

        class EasyDict(dict):
            __getattr__ = dict.__getitem__

        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed
    if REF not in sys.path:
        sys.path.insert(0, REF)
    models_name = ("audiossl.methods.atstframe.downstream"
                   ".comparison_models.models")
    if models_name not in sys.modules:
        mod = types.ModuleType(models_name)
        mod.__path__ = [REF + "/audiossl/methods/atstframe/downstream"
                        "/comparison_models/models"]
        sys.modules[models_name] = mod
    import importlib

    m = importlib.import_module(models_name + ".byola")
    return m.AudioNTT2022Encoder


def test_byola_forward_parity_vs_torch():
    TorchEnc = _import_ref_byola()
    from audiossl_tpu.compat.byola import (
        AudioNTT2022Encoder,
        convert_byola_state_dict,
    )

    torch.manual_seed(0)
    tmodel = TorchEnc(n_mels=64, d=3072).eval()
    # non-trivial running stats so the BN import path is exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    enc = AudioNTT2022Encoder(n_mels=64, d=3072)
    params, stats = convert_byola_state_dict(tmodel.state_dict())
    variables = {"params": jax.tree.map(jnp.asarray, params),
                 "batch_stats": jax.tree.map(jnp.asarray, stats)}

    rng = np.random.RandomState(1)
    lms = rng.randn(2, 64, 96).astype(np.float32)  # [B, mels, T]
    with torch.no_grad():
        want = tmodel(torch.from_numpy(lms)[:, None]).numpy()
    got = np.asarray(enc.apply(variables, jnp.asarray(lms)))
    assert got.shape == want.shape == (2, 24, 3072)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_slaney_filterbank_properties():
    from audiossl_tpu.compat.byola import _slaney_filterbank
    from audiossl_tpu.ops.melspec import MelConfig

    fb = _slaney_filterbank(MelConfig())
    assert fb.shape == (64, 513)
    assert (fb >= 0).all()
    # slaney normalization: each filter integrates to ~2/bandwidth —
    # peak amplitudes decrease with center frequency
    peaks = fb.max(axis=1)
    assert peaks[0] > peaks[-1] > 0
    # every filter has support
    assert (fb.sum(axis=1) > 0).all()


@pytest.mark.slow
def test_byola_adapter_shapes():
    from audiossl_tpu.compat.byola import AudioNTT2022Encoder
    from audiossl_tpu.downstream.comparison_models import BYOLAAdapter

    enc = AudioNTT2022Encoder(n_mels=64, d=3072)
    wav = jnp.asarray(
        np.random.RandomState(0).randn(2, 32000).astype(np.float32) * 0.05)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96)))
    ad = BYOLAAdapter(encoder=enc, variables=variables)
    out = ad.frame_embeddings(ad.params, wav,
                              jnp.asarray([32000, 16000], jnp.int32))
    T = (32000 // 160 + 1) // 4
    assert out.shape == (2, T, 3072)
    assert bool(jnp.isfinite(out).all())
    assert ad.token_count(32000) == T
    assert ad.frame_rate_divisor == 4
