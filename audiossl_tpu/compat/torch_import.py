"""PyTorch checkpoint -> flax parameter importer.

Maps the reference's torch ``state_dict`` layouts onto our flax trees so
released audiossl checkpoints (atst small/base, atstframe small/base —
reference methods/atst/README.md:45-47) load directly into the TPU
encoders for parity-exact inference and finetuning.

Name maps covered:
* ``AST`` / ``FrameAST`` encoders (audio_transformer.py of both methods),
  including the CNN patch-embed variant (kernel==stride Conv2d), which is
  imported as the equivalent Dense on rearranged patches;
* BYOL projector/predictor MLPs (build_mlp: Linear/BN/ReLU/Linear);
* ``LinearHead`` downstream heads;
* Lightning checkpoints (``state_dict`` nested under the LightningModule,
  keys prefixed ``model.student.encoder.`` etc.) and raw DINO-style dicts
  with ``module.``/``backbone.`` prefixes (reference
  downstream/utils.py:180-194).
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(t):
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def strip_prefixes(sd: Mapping[str, object], prefixes=("module.", "backbone.")):
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
        out[k] = v
    return out


def subtree(sd: Mapping[str, object], prefix: str) -> Dict[str, object]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def encoder_params_from_torch(sd: Mapping[str, object],
                              depth: int = None) -> Dict[str, object]:
    """Torch AST/FrameAST state_dict (already scoped to the encoder) ->
    flax params for ``AudioTransformer``. ``depth`` is inferred from the
    block keys when not given."""
    g = {k: _np(v) for k, v in sd.items()}
    if depth is None:
        depth = 1 + max((int(k.split(".")[1]) for k in g
                         if k.startswith("blocks.")), default=-1)
    p: Dict[str, object] = {}

    if "patch_embed.patch_embed.weight" in g:  # Linear patch embed
        w = g["patch_embed.patch_embed.weight"]  # [D, ph*pw]
        p["patch_proj"] = {
            "kernel": w.T,
            "bias": g["patch_embed.patch_embed.bias"],
        }
    elif "patch_embed.proj.weight" in g:  # CNN patch embed (k == stride)
        w = g["patch_embed.proj.weight"]  # [D, 1, ph, pw]
        D = w.shape[0]
        p["patch_proj"] = {
            "kernel": w.reshape(D, -1).T,  # feature order (ph, pw) == ours
            "bias": g["patch_embed.proj.bias"],
        }
    else:
        raise KeyError("no patch embed weights found")

    p["pos_embed"] = g["pos_embed"]
    p["mask_embed"] = g["mask_embed"]
    if "cls_token" in g:
        p["cls_token"] = g["cls_token"]
    if "prompt_embed" in g:
        p["prompt_embed"] = g["prompt_embed"]

    for i in range(depth):
        b = f"blocks.{i}."
        blk = {
            "norm1": {"scale": g[b + "norm1.weight"], "bias": g[b + "norm1.bias"]},
            "norm2": {"scale": g[b + "norm2.weight"], "bias": g[b + "norm2.bias"]},
            "attn": {
                "qkv": {"kernel": g[b + "attn.qkv.weight"].T},
                "proj": {
                    "kernel": g[b + "attn.proj.weight"].T,
                    "bias": g[b + "attn.proj.bias"],
                },
            },
            "mlp": {
                "fc1": {"kernel": g[b + "mlp.fc1.weight"].T,
                        "bias": g[b + "mlp.fc1.bias"]},
                "fc2": {"kernel": g[b + "mlp.fc2.weight"].T,
                        "bias": g[b + "mlp.fc2.bias"]},
            },
        }
        if b + "attn.qkv.bias" in g:
            blk["attn"]["qkv"]["bias"] = g[b + "attn.qkv.bias"]
        p[f"blocks_{i}"] = blk

    # AST names the final LayerNorm "norm", FrameAST names it "norm_frame"
    if "norm.weight" in g:
        p["norm"] = {"scale": g["norm.weight"], "bias": g["norm.bias"]}
    elif "norm_frame.weight" in g:
        p["norm"] = {"scale": g["norm_frame.weight"],
                     "bias": g["norm_frame.bias"]}
    return p


def mlp_head_from_torch(sd: Mapping[str, object]):
    """build_mlp(2, in, 4096, out, last_bn=False) Sequential state_dict
    (keys 0.weight, 1.weight, 1.bias, 1.running_mean, 1.running_var,
    3.weight) -> (params, batch_stats) for ``MLPHead``."""
    g = {k: _np(v) for k, v in sd.items()}
    params = {
        "fc0": {"kernel": g["0.weight"].T},
        "bn0": {"scale": g["1.weight"], "bias": g["1.bias"]},
        "fc1": {"kernel": g["3.weight"].T},
    }
    stats = {"bn0": {"mean": g["1.running_mean"], "var": g["1.running_var"]}}
    return params, stats


def projector_stack_from_torch(sd: Mapping[str, object], predictor: bool):
    """state_dict scoped to a MultiCropWrapper (projector[/predictor]) ->
    (params, batch_stats) for our ``Projector`` module."""
    params, stats = {}, {}
    proj_sd = subtree(sd, "projector.")
    if "0.weight" in proj_sd:  # mlp projector
        params["projector"], stats["projector"] = mlp_head_from_torch(proj_sd)
    elif "weight" in proj_sd:  # linear projector
        params["projector_linear"] = {
            "kernel": _np(proj_sd["weight"]).T, "bias": _np(proj_sd["bias"])}
    if predictor:
        pred_sd = subtree(sd, "predictor.")
        if "0.weight" in pred_sd:
            params["predictor"], stats["predictor"] = mlp_head_from_torch(pred_sd)
    return params, stats


def linear_head_from_torch(sd: Mapping[str, object]):
    """Reference modules/head.py LinearHead state_dict -> (params, stats)."""
    g = {k: _np(v) for k, v in sd.items()}
    params = {"linear": {"kernel": g["linear.weight"].T,
                         "bias": g["linear.bias"]}}
    stats = {}
    if "norm.running_mean" in g:
        stats["norm"] = {"mean": g["norm.running_mean"],
                         "var": g["norm.running_var"]}
        if "norm.weight" in g:
            params["norm"] = {"scale": g["norm.weight"], "bias": g["norm.bias"]}
    return params, stats


def attention_head_from_torch(sd: Mapping[str, object]):
    """Reference modules/head.py AttentionHead state_dict ->
    (params, stats) for models/heads.AttentionHead: pre_linear + one
    Block + BN(affine=False) + linear + cls_token."""
    g = {k: _np(v) for k, v in sd.items()}

    def block(prefix):
        b = prefix + "."
        blk = {
            "norm1": {"scale": g[b + "norm1.weight"],
                      "bias": g[b + "norm1.bias"]},
            "norm2": {"scale": g[b + "norm2.weight"],
                      "bias": g[b + "norm2.bias"]},
            "attn": {
                "qkv": {"kernel": g[b + "attn.qkv.weight"].T},
                "proj": {"kernel": g[b + "attn.proj.weight"].T,
                         "bias": g[b + "attn.proj.bias"]},
            },
            "mlp": {
                "fc1": {"kernel": g[b + "mlp.fc1.weight"].T,
                        "bias": g[b + "mlp.fc1.bias"]},
                "fc2": {"kernel": g[b + "mlp.fc2.weight"].T,
                        "bias": g[b + "mlp.fc2.bias"]},
            },
        }
        if b + "attn.qkv.bias" in g:
            blk["attn"]["qkv"]["bias"] = g[b + "attn.qkv.bias"]
        return blk

    params = {
        "pre_linear": {"kernel": g["pre_linear.weight"].T,
                       "bias": g["pre_linear.bias"]},
        "cls_token": g["cls_token"],
        "att": block("att"),
        "linear": {"kernel": g["linear.weight"].T,
                   "bias": g["linear.bias"]},
    }
    stats = {"norm": {"mean": g["norm.running_mean"],
                      "var": g["norm.running_var"]}}
    return params, stats


def load_pretrain_checkpoint(path: str, which: str = "teacher",
                             depth: int = 12):
    """Load a reference pretraining .ckpt (Lightning) and extract the
    encoder params for `which` in {'teacher','student'}.

    Returns (encoder_params, hyper_parameters_dict)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = strip_prefixes(sd)
    enc = subtree(sd, f"model.{which}.encoder.")
    if not enc:
        enc = subtree(sd, f"{which}.encoder.")
    if not enc:  # raw DINO-style dict: encoder at the top level
        enc = sd
    params = encoder_params_from_torch(enc, depth=depth)
    return params, dict(ckpt.get("hyper_parameters", {}))
