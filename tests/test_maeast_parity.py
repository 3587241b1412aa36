"""MAE-AST compat family (frame + patch variants): forward parity vs
the reference torch modules (randomly initialized — no egress for
released checkpoints), run under the functional fairseq shim
(tests/fairseq_stub.py).

The reference MAE_AST constructor takes no arguments — the vendored
models hard-code the full ViT-base 12x768 stack (mae_ast.py:195-205)
— so parity runs at the real released-checkpoint size, on short
inputs.
"""
import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fairseq_stub import install_fairseq_stub  # noqa: E402
from ref_stubs import install_reference_stubs  # noqa: E402
from timm_stub import install_timm_stub  # noqa: E402


def _import_ref(name):
    install_reference_stubs()
    install_fairseq_stub()
    install_timm_stub()
    return importlib.import_module(
        "audiossl.methods.atstframe.downstream.comparison_models." + name)


def _parity(tmp_path, variant, T):
    mod_name = ("mae_ast_module" if variant == "frame"
                else "mae_ast_patch_module")
    ref_mod = _import_ref(mod_name)
    torch.manual_seed(0)
    tmodel = ref_mod.MAEASTModel().eval()
    # give the whole-input BatchNorm non-trivial running stats, like a
    # trained checkpoint would have
    with torch.no_grad():
        tmodel.batch_norm.running_mean.fill_(-3.1)
        tmodel.batch_norm.running_var.fill_(4.7)

    path = str(tmp_path / f"mae_ast_{variant}.pt")
    torch.save({"model": tmodel.state_dict()}, path)

    from audiossl_tpu.compat.maeast import load_maeast_checkpoint

    enc, params = load_maeast_checkpoint(path, variant=variant)

    rng = np.random.RandomState(0)
    fb = (rng.randn(2, T, 128) * 2.0 - 3.0).astype(np.float32)
    with torch.no_grad():
        want, _ = tmodel(torch.from_numpy(fb))
    out = enc.apply({"params": params}, jnp.asarray(fb))
    return np.asarray(out), want.numpy()


@pytest.mark.slow
def test_maeast_frame_forward_parity(tmp_path):
    out, want = _parity(tmp_path, "frame", T=128)
    # T=128 -> 64 tokens -> +1 repeat -> 65 -> floor-pooled pairs = 32
    assert out.shape == want.shape == (2, 32, 768)
    assert float(np.abs(out - want).max()) < 1e-3


@pytest.mark.slow
def test_maeast_patch_forward_parity(tmp_path):
    out, want = _parity(tmp_path, "patch", T=128)
    # T=128 -> 8 time x 8 freq = 64 tokens -> 8 pooled (6.25 fps)
    assert out.shape == want.shape == (2, 8, 768)
    assert float(np.abs(out - want).max()) < 1e-3


@pytest.mark.slow
def test_maeast_adapter_embeddings():
    """Adapter surface on a small synthetic config: shapes, finiteness,
    token_count consistency for both variants."""
    from audiossl_tpu.compat.maeast import (
        MAEASTAdapter,
        MAEASTConfig,
        MAEASTEncoder,
    )

    wav = jnp.asarray(
        np.random.RandomState(0).randn(2, 32000).astype(np.float32) * 0.05)
    valid = jnp.asarray([32000, 16000], jnp.int32)
    frames = 1 + (32000 - 400) // 160  # 198
    for variant, kernel, n_out in (
            ("frame", (2, 128), (frames // 2 + 1) // 2),
            ("patch", (16, 16), frames // 16)):
        cfg = MAEASTConfig(embed_dim=64, depth=2, num_heads=4,
                           ffn_dim=128, kernel=kernel, variant=variant)
        enc = MAEASTEncoder(cfg)
        fb = jnp.zeros((1, frames, 128))
        params = enc.init(jax.random.PRNGKey(0), fb)["params"]
        ad = MAEASTAdapter(encoder=enc, params=params)
        out = ad.frame_embeddings(params, wav, valid)
        assert out.shape == (2, n_out, 64)
        assert bool(jnp.isfinite(out).all())
        assert ad.token_count(32000) == n_out
