"""Small shared utilities (reference ``audiossl/utils/common.py``).

The reference's distributed helpers map to SPMD primitives here:
``concat_all_gather`` -> global arrays under pjit need no gather (every
jit output is already replicated/global); inside shard_map code use
``jax.lax.all_gather``. The cosine schedules live in
``training/schedules.py``; the no-weight-decay grouping in
``training/pretrain.wd_mask``.
"""
from __future__ import annotations

import argparse


def bool_flag(s: str) -> bool:
    """Parse CLI booleans (reference utils/common.py:69-80)."""
    falsy = {"off", "false", "0"}
    truthy = {"on", "true", "1"}
    if s.lower() in falsy:
        return False
    if s.lower() in truthy:
        return True
    raise argparse.ArgumentTypeError(f"invalid boolean flag {s!r}")


def get_params_groups(params):
    """Split a flax param tree into (regularized, not_regularized) leaf
    path lists — torch ``get_params_groups`` semantics (bias/1-D params
    are not regularized, utils/common.py:41-68). Most callers want
    ``training.pretrain.wd_mask`` directly; this is the introspection
    form."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    reg, no_reg = [], []
    for k, v in flat.items():
        (no_reg if (v.ndim <= 1 or k[-1] == "bias") else reg).append(
            "/".join(map(str, k)))
    return reg, no_reg
