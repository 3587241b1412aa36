"""M2D ("mmd") compat family: forward parity vs the reference torch
model (randomly initialized — no egress for released checkpoints).

The vendored models_mae.py is imported under the tests/timm_stub.py
shim; the torch side below replicates MMDModel.forward
(mmd_module.py:17-39: per-unit forward_encoder at mask_ratio 0, drop
CLS, 'b (f t) d -> b t (f d)' rearrange, padded-tail-plus-one trim)
— MMDModel/RuntimeM2D themselves import nnAudio at module scope,
which is absent here.
"""
import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_stubs import install_reference_stubs  # noqa: E402
from timm_stub import install_timm_stub  # noqa: E402


def _import_ref_models_mae():
    install_reference_stubs()
    install_timm_stub()
    return importlib.import_module(
        "audiossl.methods.atstframe.downstream.comparison_models"
        ".models.models_mae")


def _ref_forward(model, x, unit_frames=208, patch_fbins=5, embed_d=768):
    """MMDModel.forward (mmd_module.py:17-39), x: [B, 1, 80, T]."""
    from einops import rearrange

    cur_frames = x.shape[-1]
    pad_frames = unit_frames - (cur_frames % unit_frames)
    if pad_frames > 0:
        x = torch.nn.functional.pad(x, (0, pad_frames))
    embeddings = []
    for i in range(x.shape[-1] // unit_frames):
        emb, *_ = model.forward_encoder(
            x[..., i * unit_frames:(i + 1) * unit_frames],
            mask_ratio=0.0, return_layers=False)
        emb = emb[..., 1:, :]
        emb = rearrange(emb, "b (f t) d -> b t (f d)", f=patch_fbins,
                        d=embed_d)
        embeddings.append(emb)
    x = torch.cat(embeddings, axis=-2)
    pad_emb_frames = int(embeddings[0].shape[-2] * pad_frames / unit_frames)
    if pad_emb_frames > 0:
        x = x[..., :-(pad_emb_frames + 1), :]
    return x


@pytest.mark.slow
def test_m2d_forward_parity():
    mod = _import_ref_models_mae()
    torch.manual_seed(0)
    model = mod.m2d_vit_base(img_size=(80, 208), patch_size=(16, 16),
                             decoder_depth=2)
    model.eval()

    rng = np.random.RandomState(0)
    # 300 frames: 2 units with 116 padded frames -> trims
    # int(13*116/208)+1 = 8 of 26 emb frames (the reference's exact
    # -(pad+1) slice)
    lms = rng.randn(2, 80, 300).astype(np.float32)
    with torch.no_grad():
        ref = _ref_forward(
            model, torch.from_numpy(lms).unsqueeze(1)).numpy()

    from audiossl_tpu.compat.m2d import M2DEncoder, convert_m2d_checkpoint

    params = jax.tree.map(jnp.asarray,
                          convert_m2d_checkpoint(model.state_dict()))
    out = M2DEncoder().apply({"params": params}, jnp.asarray(lms))
    assert out.shape == ref.shape == (2, 18, 5 * 768)
    assert float(np.abs(np.asarray(out) - ref).max()) < 1e-3


def test_m2d_adapter_token_count():
    from audiossl_tpu.compat.m2d import M2DAdapter, M2DEncoder, m2d_logmel
    from audiossl_tpu.compat.vit import ViTConfig

    enc = M2DEncoder(ViTConfig(embed_dim=32, depth=1, num_heads=2,
                               max_patches=65))
    wav = jnp.zeros((1, 160000))
    lms = m2d_logmel(wav)
    params = enc.init(jax.random.PRNGKey(0), lms)["params"]
    ad = M2DAdapter(enc, params)
    out = ad.frame_embeddings(params, wav, jnp.asarray([160000]))
    assert out.shape[1] == ad.token_count(160000)
    assert ad.embed_dim == out.shape[2]
