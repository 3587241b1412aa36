"""Encoder parity vs the reference PyTorch implementation.

These tests import the reference code READ-ONLY from /root/reference
(torch+einops only — no torchaudio needed), randomly initialize it,
transfer the weights through our torch->flax importer, and require the
TPU-native flax encoders to match within 1e-3 (BASELINE.md's bar for
pretrained-checkpoint embedding parity).
"""
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

# The reference frame encoder imports fairseq (unavailable) only for its
# masking helper, which these tests don't exercise — stub it out.
import types  # noqa: E402

if "fairseq" not in sys.modules:
    _fs = types.ModuleType("fairseq")
    _fsd = types.ModuleType("fairseq.data")
    _fsdu = types.ModuleType("fairseq.data.data_utils")
    _fsdu.compute_mask_indices = None
    _fs.data = _fsd
    _fsd.data_utils = _fsdu
    sys.modules["fairseq"] = _fs
    sys.modules["fairseq.data"] = _fsd
    sys.modules["fairseq.data.data_utils"] = _fsdu

from audiossl_tpu.models.atst import (  # noqa: E402
    ast_small,
    frame_ast_small,
)
from audiossl_tpu.compat.torch_import import encoder_params_from_torch  # noqa: E402

TOL = 1e-3


@pytest.fixture(scope="module")
def torch_ast():
    from audiossl.models.atst.audio_transformer import AST_small

    torch.manual_seed(0)
    m = AST_small(use_cls=True, spec_h=64, spec_w=1001)
    m.eval()
    return m


@pytest.fixture(scope="module")
def torch_frame_ast():
    from audiossl.methods.atstframe.audio_transformer import FrameAST_small

    torch.manual_seed(1)
    m = FrameAST_small(spec_h=64, spec_w=1001)
    m.eval()
    return m


def _mel(b, t, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(b, 64, t).astype(np.float32)


def test_clip_forward_parity(torch_ast):
    mel = _mel(2, 601)
    lengths = np.array([601, 480], np.int64)
    with torch.no_grad():
        ref = torch_ast(
            torch.from_numpy(mel[:, None]), length=torch.from_numpy(lengths)
        ).numpy()

    model = ast_small(spec_w=1001)
    params = encoder_params_from_torch(torch_ast.state_dict(), depth=12)
    ours = np.asarray(
        model.apply({"params": params}, jnp.asarray(mel),
                    length=jnp.asarray(lengths), deterministic=True)
    )
    assert ours.shape == ref.shape == (2, 384)
    assert np.abs(ours - ref).max() < TOL


@pytest.mark.slow
def test_clip_chunked_probe_parity(torch_ast):
    """get_intermediate_layers_chunks: the downstream linear-probe feature
    path (12 blocks, cls+avg, chunk-mark weighting over 2 chunks)."""
    mel = _mel(2, 1201, seed=3)
    lengths = np.array([1201, 700], np.int64)
    with torch.no_grad():
        ref = torch_ast.get_intermediate_layers_chunks(
            torch.from_numpy(mel[:, None]),
            length=torch.from_numpy(lengths),
            n=12,
            chunk_len=601,
            avgpool=True,
        ).numpy()

    model = ast_small(spec_w=1001)
    params = encoder_params_from_torch(torch_ast.state_dict(), depth=12)
    ours = np.asarray(
        model.apply(
            {"params": params},
            jnp.asarray(mel),
            jnp.asarray(lengths),
            12,
            601,
            True,
            method="get_intermediate_layers_chunks",
        )
    )
    assert ours.shape == ref.shape == (2, 2 * 12 * 384)
    assert np.abs(ours - ref).max() < TOL


def test_frame_forward_parity(torch_frame_ast):
    """Masked pretrain forward: reference returns selected frames
    [Nsel, D]; ours returns (frames, mask) — row-major selection must
    match."""
    mel = _mel(2, 601, seed=5)
    lengths = np.array([601, 500], np.int64)
    n_tok = 150
    rng = np.random.RandomState(2)
    mask = rng.rand(2, n_tok) < 0.65
    with torch.no_grad():
        ref = torch_frame_ast(
            torch.from_numpy(mel[:, None]),
            mask_index=torch.from_numpy(mask),
            mask_input=True,
            length=torch.from_numpy(lengths),
        ).numpy()

    model = frame_ast_small(spec_w=1001)
    params = encoder_params_from_torch(torch_frame_ast.state_dict(), depth=12)
    frames, sel = model.apply(
        {"params": params},
        jnp.asarray(mel),
        length=jnp.asarray(lengths),
        mask_index=jnp.asarray(mask),
        apply_mask=True,
        deterministic=True,
    )
    ours = np.asarray(frames)[np.asarray(sel)]
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).max() < TOL


def test_frame_scene_embedding_parity(torch_frame_ast):
    """get_intermediate_layers(scene=True, n=12): the public
    scene-embedding feature path."""
    mel = _mel(2, 601, seed=8)
    lengths = np.array([601, 401], np.int64)
    with torch.no_grad():
        ref = torch_frame_ast.get_intermediate_layers(
            torch.from_numpy(mel[:, None]),
            length=torch.from_numpy(lengths),
            n=12,
            scene=True,
        ).numpy()

    model = frame_ast_small(spec_w=1001)
    params = encoder_params_from_torch(torch_frame_ast.state_dict(), depth=12)
    ours = np.asarray(
        model.apply(
            {"params": params},
            jnp.asarray(mel),
            jnp.asarray(lengths),
            12,
            True,
            method="get_intermediate_layers",
        )
    )
    assert ours.shape == ref.shape == (2, 12 * 384)
    assert np.abs(ours - ref).max() < TOL


def test_frame_timestamp_embedding_parity(torch_frame_ast):
    mel = _mel(1, 601, seed=9)
    lengths = np.array([601], np.int64)
    with torch.no_grad():
        ref = torch_frame_ast.get_intermediate_layers(
            torch.from_numpy(mel[:, None]),
            length=torch.from_numpy(lengths),
            n=12,
            scene=False,
        ).numpy()

    model = frame_ast_small(spec_w=1001)
    params = encoder_params_from_torch(torch_frame_ast.state_dict(), depth=12)
    ours = np.asarray(
        model.apply(
            {"params": params},
            jnp.asarray(mel),
            jnp.asarray(lengths),
            12,
            False,
            method="get_intermediate_layers",
        )
    )
    assert ours.shape == ref.shape == (1, 150, 12 * 384)
    assert np.abs(ours - ref).max() < TOL
