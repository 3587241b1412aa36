"""Torch->flax importer parity for heads and full-checkpoint loading.

Complements tests/test_encoder_parity.py: the BYOL projector/predictor
MLPs and LinearHead imported from randomly-initialized reference torch
modules must match within 1e-3, and the Lightning-checkpoint loading
path (prefix handling) must recover the teacher encoder."""
import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from audiossl_tpu.compat.torch_import import (  # noqa: E402
    encoder_params_from_torch,
    linear_head_from_torch,
    load_pretrain_checkpoint,
    mlp_head_from_torch,
)
from audiossl_tpu.models.byol import MLPHead  # noqa: E402
from audiossl_tpu.models.heads import LinearHead  # noqa: E402

TOL = 1e-3


def test_mlp_head_parity():
    from audiossl.models.atst.byol import build_mlp

    torch.manual_seed(0)
    ref = build_mlp(2, 384, 4096, 256, last_bn=False)
    ref.eval()
    params, stats = mlp_head_from_torch(ref.state_dict())
    x = np.random.RandomState(0).randn(4, 384).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    head = MLPHead(4096, 256)
    got = np.asarray(head.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=False))
    assert np.abs(got - want).max() < TOL


def test_linear_head_parity():
    from audiossl.modules.head import LinearHead as TorchLinearHead

    torch.manual_seed(1)
    ref = TorchLinearHead(dim=768, num_labels=35)
    ref.eval()
    # run a few training batches so BN stats are non-trivial
    ref.train()
    for i in range(3):
        ref(torch.randn(16, 768))
    ref.eval()
    params, stats = linear_head_from_torch(ref.state_dict())
    x = np.random.RandomState(2).randn(4, 768).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    head = LinearHead(num_labels=35)
    got = np.asarray(head.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=False))
    assert np.abs(got - want).max() < TOL


def test_lightning_checkpoint_roundtrip(tmp_path):
    """A Lightning-style ckpt (keys under model.teacher.encoder.) loads
    through load_pretrain_checkpoint and reproduces the torch forward."""
    from audiossl.models.atst.audio_transformer import AST_small

    from audiossl_tpu.models.atst import ast_small

    torch.manual_seed(3)
    enc = AST_small(use_cls=True, spec_h=64, spec_w=1001)
    enc.eval()
    sd = {f"model.teacher.encoder.{k}": v
          for k, v in enc.state_dict().items()}
    ckpt = {"state_dict": sd,
            "hyper_parameters": {"arch": "small", "anchor_len": 6.0}}
    path = str(tmp_path / "last.ckpt")
    torch.save(ckpt, path)

    params, hparams = load_pretrain_checkpoint(path, which="teacher")
    assert hparams["arch"] == "small"

    mel = np.random.RandomState(0).randn(2, 64, 601).astype(np.float32)
    lengths = np.array([601, 480], np.int64)
    with torch.no_grad():
        want = enc(torch.from_numpy(mel[:, None]),
                   length=torch.from_numpy(lengths)).numpy()
    ours = ast_small(spec_w=1001)
    got = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(mel), jnp.asarray(lengths),
        deterministic=True))
    assert np.abs(got - want).max() < TOL


def test_raw_dino_dict_roundtrip(tmp_path):
    """Raw DINO-style dict with module./backbone. prefixes (reference
    downstream/utils.py:180-194)."""
    from audiossl.models.atst.audio_transformer import AST_small

    torch.manual_seed(4)
    enc = AST_small(use_cls=True, spec_h=64, spec_w=1001)
    sd = {f"module.backbone.{k}": v for k, v in enc.state_dict().items()}
    path = str(tmp_path / "dino.ckpt")
    torch.save(sd, path)
    params, _ = load_pretrain_checkpoint(path)
    assert "patch_proj" in params and "blocks_0" in params


def test_distill_teacher_ckpt_parsing(tmp_path):
    """The distill CLI parses finetuned clip-classifier ckpts
    (encoder.encoder. prefix quirk, reference train_distill.py:50-52)."""
    from audiossl.models.atst.audio_transformer import AST_small
    from audiossl.modules.head import LinearHead as TorchLinearHead

    from audiossl_tpu.compat.torch_import import (
        linear_head_from_torch,
        strip_prefixes,
        subtree,
    )

    torch.manual_seed(5)
    enc = AST_small(use_cls=True, spec_h=64, spec_w=1001)
    head = TorchLinearHead(dim=384 * 2, num_labels=527)
    sd = {}
    for k, v in enc.state_dict().items():
        sd[f"encoder.encoder.{k}"] = v
    for k, v in head.state_dict().items():
        sd[f"head.{k}"] = v
    ckpt = {"state_dict": sd}
    path = str(tmp_path / "teacher.ckpt")
    torch.save(ckpt, path)

    loaded = torch.load(path, map_location="cpu", weights_only=False)
    sd2 = strip_prefixes(loaded["state_dict"])
    enc_sd = subtree(sd2, "encoder.encoder.") or subtree(sd2, "encoder.")
    params = encoder_params_from_torch(enc_sd)
    assert "blocks_11" in params and "cls_token" in params
    hp, hs = linear_head_from_torch(subtree(sd2, "head."))
    assert hp["linear"]["kernel"].shape == (768, 527)
    assert "norm" in hs


def test_attention_head_parity():
    """AttentionHead forward vs the reference module (pre-linear ->
    CLS-prepended Block -> BN(affine=False) -> linear)."""
    from audiossl.modules.head import AttentionHead as TorchAttentionHead

    from audiossl_tpu.compat.torch_import import attention_head_from_torch
    from audiossl_tpu.models.heads import AttentionHead

    torch.manual_seed(4)
    ref = TorchAttentionHead(dim=96, att_dim=64, num_heads=2,
                             num_labels=7)
    ref.train()
    for _ in range(3):  # non-trivial BN stats
        ref(torch.randn(8, 5, 96))
    ref.eval()
    params, stats = attention_head_from_torch(ref.state_dict())
    x = np.random.RandomState(5).randn(3, 5, 96).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    head = AttentionHead(att_dim=64, num_heads=2, num_labels=7)
    got = np.asarray(head.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=False))
    assert np.abs(got - want).max() < TOL
