"""Layer-wise LR decay / freeze_embed parity vs the reference.

Builds the reference's optimizer param groups with the REAL
``layer_wise_lr_groups`` (``/root/reference/audiossl/methods/atstframe/
downstream/model.py:149-190``) on a real torch ``FrameAST_small`` +
``LinearHead``, then asserts our ``layer_decay_factors`` produces the
identical per-parameter lr-scale for every corresponding flax leaf
(VERDICT r1 item 3).
"""
import sys

import pytest
import torch
from torch import nn

sys.path.insert(0, "tests") if "tests" not in sys.path else None
from ref_stubs import install_reference_stubs  # noqa: E402

install_reference_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import jax.tree_util as jtu  # noqa: E402

from audiossl_tpu.downstream.finetune import layer_decay_factors  # noqa: E402
from audiossl_tpu.models.atst import frame_ast_small  # noqa: E402

DECAY = 0.75
DEPTH = 12

# torch top-level prefix -> flax top-level key
PREFIX_MAP = {
    "encoder.patch_embed": "patch_proj",
    "encoder.pos_embed": "pos_embed",
    "encoder.mask_embed": "mask_embed",
    "encoder.norm_frame": "norm",
}


class _RefFinetuneStandin(nn.Module):
    """Just enough of FineTuningPLModule for layer_wise_lr_groups:
    .encoder (FrameAST), .head, .layer_wise_lr, .freeze_embed,
    .unfreeze(), .named_parameters()."""

    def __init__(self, encoder, head, freeze_embed):
        super().__init__()
        self.encoder = encoder
        self.head = head
        self.layer_wise_lr = DECAY
        self.freeze_embed = freeze_embed

    def unfreeze(self):
        for p in self.parameters():
            p.requires_grad = True


def _reference_scales(freeze_embed):
    from audiossl.methods.atstframe.downstream.model import (
        layer_wise_lr_groups,
    )
    from audiossl.methods.atstframe.audio_transformer import FrameAST_small
    from audiossl.modules.head import LinearHead

    torch.manual_seed(0)
    model = _RefFinetuneStandin(
        FrameAST_small(spec_h=64, spec_w=251),
        LinearHead(384, 10), freeze_embed)
    names = [n for n, p in model.named_parameters() if p.requires_grad]
    groups = layer_wise_lr_groups(model)
    assert len(groups) == len(names)
    return {n: g["lr_scale"] for n, g in zip(names, groups)}


def _torch_name_to_flax_key(name):
    for pref, key in PREFIX_MAP.items():
        if name.startswith(pref):
            return key
    if name.startswith("encoder.blocks."):
        return "blocks_" + name.split(".")[2]
    if name.startswith("head"):
        return "head"
    raise AssertionError(f"unmapped reference param {name}")


@pytest.mark.parametrize("freeze_embed", [False, True])
def test_layer_decay_factors_match_reference_groups(freeze_embed):
    ref = _reference_scales(freeze_embed)

    m = frame_ast_small(spec_w=251)
    variables = jax.eval_shape(
        lambda k: m.init(k, jnp.zeros((1, 64, 251)),
                         length=jnp.asarray([251]), deterministic=True),
        jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                          variables)["params"]
    factors = layer_decay_factors(params, DEPTH, DECAY,
                                  freeze_embed=freeze_embed)

    # every flax leaf's factor == the reference scale of its group
    ref_by_key = {}
    for name, scale in ref.items():
        key = _torch_name_to_flax_key(name)
        prev = ref_by_key.setdefault(key, scale)
        assert prev == scale, f"reference group {key} not uniform"

    checked = set()
    for path, f in jtu.tree_leaves_with_path(factors):
        key = jtu.keystr(path).split("'")[1]
        assert key in ref_by_key, f"flax key {key} missing upstream"
        assert f == pytest.approx(ref_by_key[key], abs=1e-12), (
            key, f, ref_by_key[key])
        checked.add(key)

    # all reference encoder groups were exercised
    missing = {k for k in ref_by_key if k != "head"} - checked
    assert not missing, missing

    # spot-check the exact formula: embeddings decay**12 (or 0 frozen),
    # block i decay**(12-i), final norm decay**1, head 1.0
    expect_embed = 0.0 if freeze_embed else DECAY ** DEPTH
    assert ref_by_key["patch_proj"] == pytest.approx(expect_embed)
    assert ref_by_key["pos_embed"] == pytest.approx(expect_embed)
    assert ref_by_key["mask_embed"] == pytest.approx(expect_embed)
    assert ref_by_key["blocks_0"] == pytest.approx(DECAY ** DEPTH)
    assert ref_by_key["blocks_11"] == pytest.approx(DECAY)
    assert ref_by_key["norm"] == pytest.approx(DECAY)
    assert ref_by_key["head"] == pytest.approx(1.0)
