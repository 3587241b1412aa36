"""Minimal torch `timm` shim so the reference's vendored comparison
encoders (AudioMAE models_mae.py / audioMAE_model.py, M2D mmd_model.py,
SSAST ssast.py) can be imported and run for random-init parity tests —
timm itself is absent in this environment (VERDICT r2 next #2-#4).

Implements exactly the surface those files touch:
  timm.models.vision_transformer.{PatchEmbed, Block, VisionTransformer}
  timm.models.layers.{to_2tuple, trunc_normal_, DropPath}
  timm.create_model('vit_deit_*_distilled_patch16_*')

The ViT math is the standard timm implementation (pre-LN blocks, fused
QKV, exact GELU, LayerNorm eps from norm_layer) — the same math the
published checkpoints were trained with, so a state-dict round-trip
through these modules exercises the real parity surface.
"""
import math
import sys
import types
from functools import partial

import torch
import torch.nn as nn


def to_2tuple(x):
    if isinstance(x, (tuple, list)):
        return tuple(x)
    return (x, x)


def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)


class DropPath(nn.Module):
    def __init__(self, drop_prob=0.0):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        return x


class PatchEmbed(nn.Module):
    def __init__(self, img_size=224, patch_size=16, in_chans=3,
                 embed_dim=768, norm_layer=None, flatten=True, **kw):
        super().__init__()
        img_size = to_2tuple(img_size)
        patch_size = to_2tuple(patch_size)
        self.img_size = img_size
        self.patch_size = patch_size
        self.grid_size = (img_size[0] // patch_size[0],
                          img_size[1] // patch_size[1])
        self.num_patches = self.grid_size[0] * self.grid_size[1]
        self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                              stride=patch_size)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class Mlp(nn.Module):
    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act_layer=nn.GELU, drop=0.0):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.act = act_layer()
        self.fc2 = nn.Linear(hidden_features, out_features)
        self.drop = nn.Dropout(drop)

    def forward(self, x):
        return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))


class Attention(nn.Module):
    def __init__(self, dim, num_heads=8, qkv_bias=False, attn_drop=0.0,
                 proj_drop=0.0):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.attn_drop = nn.Dropout(attn_drop)
        self.proj = nn.Linear(dim, dim)
        self.proj_drop = nn.Dropout(proj_drop)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(
            B, N, 3, self.num_heads, C // self.num_heads).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = self.attn_drop(attn.softmax(dim=-1))
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj_drop(self.proj(x))


class Block(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=False,
                 drop=0.0, attn_drop=0.0, drop_path=0.0,
                 act_layer=nn.GELU, norm_layer=nn.LayerNorm, **kw):
        super().__init__()
        self.norm1 = norm_layer(dim)
        self.attn = Attention(dim, num_heads=num_heads, qkv_bias=qkv_bias,
                              attn_drop=attn_drop, proj_drop=drop)
        self.drop_path = DropPath(drop_path)
        self.norm2 = norm_layer(dim)
        self.mlp = Mlp(dim, hidden_features=int(dim * mlp_ratio),
                       act_layer=act_layer, drop=drop)

    def forward(self, x):
        x = x + self.drop_path(self.attn(self.norm1(x)))
        return x + self.drop_path(self.mlp(self.norm2(x)))


class VisionTransformer(nn.Module):
    def __init__(self, img_size=224, patch_size=16, in_chans=3,
                 num_classes=1000, embed_dim=768, depth=12, num_heads=12,
                 mlp_ratio=4.0, qkv_bias=True, norm_layer=None,
                 distilled=False, drop_rate=0.0, attn_drop_rate=0.0,
                 drop_path_rate=0.0, **kwargs):
        super().__init__()
        norm_layer = norm_layer or partial(nn.LayerNorm, eps=1e-6)
        self.num_classes = num_classes
        self.num_features = self.embed_dim = embed_dim
        self.num_tokens = 2 if distilled else 1
        self.patch_embed = PatchEmbed(img_size, patch_size, in_chans,
                                      embed_dim)
        num_patches = self.patch_embed.num_patches
        self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
        self.dist_token = (nn.Parameter(torch.zeros(1, 1, embed_dim))
                           if distilled else None)
        self.pos_embed = nn.Parameter(
            torch.zeros(1, num_patches + self.num_tokens, embed_dim))
        self.pos_drop = nn.Dropout(p=drop_rate)
        self.blocks = nn.Sequential(*[
            Block(embed_dim, num_heads, mlp_ratio, qkv_bias=qkv_bias,
                  drop=drop_rate, attn_drop=attn_drop_rate,
                  norm_layer=norm_layer)
            for _ in range(depth)])
        self.norm = norm_layer(embed_dim)
        self.head = (nn.Linear(embed_dim, num_classes)
                     if num_classes > 0 else nn.Identity())
        trunc_normal_(self.pos_embed, std=0.02)
        trunc_normal_(self.cls_token, std=0.02)
        if self.dist_token is not None:
            trunc_normal_(self.dist_token, std=0.02)

    def forward_features(self, x):
        x = self.patch_embed(x)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        if self.dist_token is not None:
            dist = self.dist_token.expand(x.shape[0], -1, -1)
            x = torch.cat((cls, dist, x), dim=1)
        else:
            x = torch.cat((cls, x), dim=1)
        x = self.pos_drop(x + self.pos_embed)
        x = self.blocks(x)
        return self.norm(x)

    def forward(self, x):
        x = self.forward_features(x)
        return self.head(x[:, 0])


_DEIT_SIZES = {"tiny": (192, 3), "small": (384, 6), "base": (768, 12)}


def create_model(name, pretrained=False, **kwargs):
    assert not pretrained, "shim has no pretrained weights"
    parts = name.split("_")  # vit_deit_{size}[_distilled]_patch16_{img}
    size = parts[2]
    distilled = "distilled" in parts
    img = int(parts[-1])
    embed_dim, num_heads = _DEIT_SIZES[size]
    return VisionTransformer(
        img_size=img, patch_size=16, embed_dim=embed_dim, depth=12,
        num_heads=num_heads, mlp_ratio=4.0, qkv_bias=True,
        norm_layer=partial(nn.LayerNorm, eps=1e-6), distilled=distilled,
        **kwargs)


def install_timm_stub():
    """Register this shim as the `timm` package (idempotent)."""
    if "timm" in sys.modules and getattr(
            sys.modules["timm"], "_audiossl_tpu_stub", False):
        return sys.modules["timm"]
    timm = types.ModuleType("timm")
    timm._audiossl_tpu_stub = True
    timm.__version__ = "0.4.5"
    models = types.ModuleType("timm.models")
    vit = types.ModuleType("timm.models.vision_transformer")
    layers = types.ModuleType("timm.models.layers")
    vit.PatchEmbed = PatchEmbed
    vit.Block = Block
    vit.Attention = Attention
    vit.Mlp = Mlp
    vit.VisionTransformer = VisionTransformer
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath
    models.vision_transformer = vit
    models.layers = layers
    timm.models = models
    timm.create_model = create_model
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.vision_transformer"] = vit
    sys.modules["timm.models.layers"] = layers
    # numpy>=1.24 removed np.float; the vendored models_mae.py still
    # uses it (models_mae.py:61) — restore the alias for the reference
    # import only
    import numpy as np
    if not hasattr(np, "float"):
        np.float = float
    return timm
