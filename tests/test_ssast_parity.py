"""SSAST compat family (frame + patch variants): forward parity vs the
reference torch modules (randomly initialized — no egress for released
checkpoints).

Goes through the reference's REAL checkpoint round-trip: build a
pretrain-stage ASTModel, save it DataParallel-wrapped (the format the
released SSAST checkpoints use, ssast.py:141-157), then load it both
through the reference's finetune-stage constructor (which rebuilds the
positional embedding with the center-cut, ssast.py:190-202) and
through our importer, and compare forwards including the modules'
AvgPool quirks (ssast_module.py:24,47 / patch_ssast_module.py:20,40-44).
"""
import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_stubs import install_reference_stubs  # noqa: E402
from timm_stub import install_timm_stub  # noqa: E402


def _import_ref(name):
    install_reference_stubs()
    install_timm_stub()
    return importlib.import_module(
        "audiossl.methods.atstframe.downstream.comparison_models." + name)


def _roundtrip(tmp_path, variant, input_tdim, p_input_tdim,
               model_size="tiny"):
    """Save a random pretrain-stage ckpt, load via reference finetune
    path + our importer, return (ref_module, our_encoder, our_params)."""
    models = _import_ref("models")
    mod_name = ("ssast_module" if variant == "frame"
                else "patch_ssast_module")
    ref_mod = _import_ref(mod_name)

    fshape, tshape = (128, 2) if variant == "frame" else (16, 16)
    torch.manual_seed(0)
    pre = models.ASTModel(
        fshape=fshape, tshape=tshape, fstride=fshape, tstride=tshape,
        input_fdim=128, input_tdim=p_input_tdim, model_size=model_size,
        pretrain_stage=True)
    path = str(tmp_path / f"ssast_{variant}.pth")
    torch.save(torch.nn.DataParallel(pre).state_dict(), path)

    ref = ref_mod.SSASTModel(
        label_dim=1, fshape=fshape, tshape=tshape, fstride=fshape,
        tstride=tshape, input_fdim=128, input_tdim=input_tdim,
        model_size=model_size, pretrain_stage=False,
        load_pretrained_mdl_path=path)
    ref.eval()

    from audiossl_tpu.compat.ssast import load_ssast_checkpoint

    enc, params = load_ssast_checkpoint(path, variant=variant,
                                        input_tdim=input_tdim)
    return ref, enc, params


@pytest.mark.slow
def test_ssast_frame_forward_parity(tmp_path):
    # pretrain grid 128 frames wider than the finetune input ->
    # exercises the pos-embed center-cut (the released-ckpt case)
    ref, enc, params = _roundtrip(tmp_path, "frame",
                                  input_tdim=200, p_input_tdim=256)
    rng = np.random.RandomState(0)
    fb = rng.randn(2, 200, 128).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(fb)).numpy()
    out = enc.apply({"params": params}, jnp.asarray(fb))
    assert out.shape == out_ref.shape == (2, 51, 192)
    assert float(np.abs(np.asarray(out) - out_ref).max()) < 1e-3


@pytest.mark.slow
def test_ssast_patch_forward_parity(tmp_path):
    # the reference patch module hardcodes 768 in its freq-major
    # reshape (patch_ssast_module.py:40) — base size only
    ref, enc, params = _roundtrip(tmp_path, "patch",
                                  input_tdim=224, p_input_tdim=256,
                                  model_size="base")
    rng = np.random.RandomState(1)
    fb = rng.randn(2, 224, 128).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(fb)).numpy()
    out = enc.apply({"params": params}, jnp.asarray(fb))
    assert out.shape == out_ref.shape == (2, 14, 768)
    assert float(np.abs(np.asarray(out) - out_ref).max()) < 1e-3


def test_ssast_adapter_token_count_contract():
    """adapter.token_count must equal the encoder's actual output rows
    for BOTH parities of the token count N (AvgPool2d((2,1),pad(1,0))
    emits N//2+1 rows; (N+1)//2 under-counted by one for even N)."""
    from audiossl_tpu.compat.ssast import SSASTAdapter, SSASTEncoder
    from audiossl_tpu.compat.vit import ViTConfig

    for variant in ("frame", "patch"):
        ps = (128, 2) if variant == "frame" else (16, 16)
        cfg = ViTConfig(embed_dim=32, depth=1, num_heads=2,
                        patch_size=ps, num_prefix=2, max_patches=512)
        enc = SSASTEncoder(vit=cfg, variant=variant)
        # frames=200 -> N=100 (even, the off-by-one case);
        # frames=198 -> N=99 (odd)   [frame variant]
        for n_samples in (400 + 199 * 160, 400 + 197 * 160):
            frames = 1 + (n_samples - 400) // 160
            fb = jnp.zeros((1, frames, 128), jnp.float32)
            params = enc.init(jax.random.PRNGKey(0), fb)["params"]
            ad = SSASTAdapter(encoder=enc, params=params)
            out = enc.apply({"params": params}, fb)
            assert out.shape[1] == ad.token_count(n_samples), (
                variant, n_samples, out.shape, ad.token_count(n_samples))


def test_timmvit_pos_grid_column_slice():
    """With pos_grid set (SSAST-patch freq-major grid), inputs shorter
    than max_patches must take pos-embed LEADING COLUMNS of the grid —
    equivalent to an encoder whose pos_embed was column-cut offline."""
    from audiossl_tpu.compat.vit import TimmViT, ViTConfig

    rows, cols0, cols = 8, 14, 10
    base = dict(embed_dim=32, depth=1, num_heads=2, patch_size=(16, 16),
                num_prefix=2)
    big = TimmViT(ViTConfig(max_patches=rows * cols0,
                            pos_grid=(rows, cols0), **base))
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 128, 16 * cols).astype(np.float32))
    pbig = big.init(jax.random.PRNGKey(0), x)["params"]

    cut = TimmViT(ViTConfig(max_patches=rows * cols, **base))
    pcut = dict(pbig)
    pos = np.asarray(pbig["pos_embed"])
    grid = pos[2:].reshape(rows, cols0, -1)[:, :cols].reshape(
        rows * cols, -1)
    pcut["pos_embed"] = jnp.asarray(np.concatenate([pos[:2], grid]))

    out_big = big.apply({"params": pbig}, x)
    out_cut = cut.apply({"params": pcut}, x)
    assert out_big.shape == out_cut.shape
    assert float(jnp.abs(out_big - out_cut).max()) == 0.0
