"""BEATs compat family: forward parity vs the reference torch model
(randomly initialized — no egress for released checkpoints, same
protocol as tests/test_encoder_parity.py), plus kaldi-fbank sanity.

The reference BEATs imports torchaudio at module scope; torchaudio is
absent in this env, so it is stubbed before import (only ta_kaldi.fbank
is referenced, and only inside preprocess(), which we don't call).
"""
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _import_ref_beats():
    # ref_stubs may already have registered a bare torchaudio stub —
    # extend whatever is present with the compliance.kaldi submodule
    ta = sys.modules.get("torchaudio")
    if ta is None:
        ta = types.ModuleType("torchaudio")
        sys.modules["torchaudio"] = ta
    if "torchaudio.compliance.kaldi" not in sys.modules:
        comp = types.ModuleType("torchaudio.compliance")
        kaldi = types.ModuleType("torchaudio.compliance.kaldi")
        kaldi.fbank = None
        comp.kaldi = kaldi
        ta.compliance = comp
        sys.modules["torchaudio.compliance"] = comp
        sys.modules["torchaudio.compliance.kaldi"] = kaldi
    # path-stub ONLY the `models` package: its __init__ imports SSAST,
    # which needs timm (absent here); every other ancestor __init__ is
    # empty/harmless
    models_name = ("audiossl.methods.atstframe.downstream"
                   ".comparison_models.models")
    if models_name not in sys.modules:
        mod = types.ModuleType(models_name)
        mod.__path__ = [REF + "/audiossl/methods/atstframe/downstream"
                        "/comparison_models/models"]
        sys.modules[models_name] = mod
    import importlib

    beats_mod = importlib.import_module(
        "audiossl.methods.atstframe.downstream.comparison_models"
        ".models.beats.BEATs")
    return beats_mod.BEATs, beats_mod.BEATsConfig


SMALL = dict(
    input_patch_size=16, embed_dim=32, conv_bias=False,
    encoder_layers=2, encoder_embed_dim=48, encoder_ffn_embed_dim=96,
    encoder_attention_heads=4, layer_norm_first=False, deep_norm=True,
    conv_pos=128, conv_pos_groups=16, relative_position_embedding=True,
    num_buckets=80, max_distance=800, gru_rel_pos=True,
    # inference-mode comparison
    dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    dropout_input=0.0, encoder_layerdrop=0.0,
)


@pytest.mark.slow
def test_beats_forward_parity_vs_torch():
    TorchBEATs, TorchCfg = _import_ref_beats()
    from audiossl_tpu.compat.beats import (
        BEATsConfig,
        BEATsEncoder,
        convert_beats_state_dict,
    )

    tcfg = TorchCfg()
    tcfg.update(SMALL)
    torch.manual_seed(0)
    tmodel = TorchBEATs(tcfg).eval()

    cfg = BEATsConfig.from_checkpoint_cfg(SMALL)
    enc = BEATsEncoder(cfg)
    params = jax.tree.map(
        jnp.asarray, convert_beats_state_dict(tmodel.state_dict(), cfg))

    rng = np.random.RandomState(1)
    fbank = rng.randn(2, 96, 128).astype(np.float32)  # [B, T, 128]
    with torch.no_grad():
        want = tmodel.extract_features(
            torch.from_numpy(fbank))[0].numpy()
    got = np.asarray(enc.apply({"params": params},
                               jnp.asarray(fbank)))
    assert got.shape == want.shape == (2, 6 * 8, 48)
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.slow
def test_beats_adapter_embeddings():
    from audiossl_tpu.compat.beats import BEATsConfig, BEATsEncoder
    from audiossl_tpu.downstream.comparison_models import BEATsAdapter

    cfg = BEATsConfig.from_checkpoint_cfg(SMALL)
    enc = BEATsEncoder(cfg)
    wav = jnp.asarray(
        np.random.RandomState(0).randn(2, 32000).astype(np.float32) * 0.05)
    valid = jnp.asarray([32000, 16000], jnp.int32)
    fb_frames = 1 + (32000 - 400) // 160
    params = enc.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 96, 128)))["params"]
    ad = BEATsAdapter(encoder=enc, params=params)
    out = ad.frame_embeddings(params, wav, valid)
    assert out.shape == (2, fb_frames // 16, 48)
    assert bool(jnp.isfinite(out).all())
    assert ad.token_count(32000) == fb_frames // 16


def test_kaldi_fbank_analytic():
    """Shape/semantics checks of the kaldi front-end (torchaudio absent
    here, so validation is analytic): snip-edges frame count, tone peak
    at the right mel bin, DC insensitivity."""
    from audiossl_tpu.compat.beats import kaldi_fbank

    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    tone = np.sin(2 * np.pi * 1000.0 * t)[None, :] * 0.3 * 2 ** 15
    fb = np.asarray(kaldi_fbank(jnp.asarray(tone)))
    assert fb.shape == (1, 1 + (sr - 400) // 160, 128)
    # peak bin stable across frames and near the 1 kHz mel position
    peaks = fb[0].argmax(axis=1)
    assert peaks.std() < 1.0
    mel_1k = 1127 * np.log(1 + 1000 / 700)
    mel_lo, mel_hi = 1127 * np.log(1 + 20 / 700), 1127 * np.log(1 + 8000 / 700)
    expect_bin = (mel_1k - mel_lo) / (mel_hi - mel_lo) * 129
    assert abs(float(peaks.mean()) - expect_bin) < 3.0
    # adding a DC offset must not change the output (remove_dc_offset);
    # small offset + energetic-bin comparison, because a large f32
    # offset quantizes the tone samples themselves
    fb_dc = np.asarray(kaldi_fbank(jnp.asarray(tone + 40.0)))
    energetic = fb[0, 0] > 5.0
    np.testing.assert_allclose(fb_dc[0][:, energetic],
                               fb[0][:, energetic], atol=5e-3)
