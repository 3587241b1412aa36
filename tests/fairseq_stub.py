"""Functional fairseq shim: just enough REAL implementations to import
and run the reference's vendored MAE-AST models
(comparison_models/models/mae_ast{,_patch}.py) for forward-parity
testing. fairseq itself is not installed in this env.

Only the pieces the inference path executes are real:
``MultiheadAttention`` (separate q/k/v/out projections, q scaled by
head_dim**-0.5 — faithful to fairseq's math for self-attention with an
optional key padding mask), ``LayerNorm``, ``GradMultiply`` (identity
at inference) and ``utils.get_activation_fn``. Everything else
(quantizers, FSDP/checkpoint wrappers, conv-pos helpers) is imported
but never instantiated by MAE-AST's default config, so those are inert
placeholders.
"""
import sys
import types

import torch
import torch.nn.functional as F


class _MultiheadAttention(torch.nn.Module):
    def __init__(self, embed_dim, num_heads, dropout=0.0,
                 self_attention=True, **kw):
        super().__init__()
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.scaling = self.head_dim ** -0.5
        self.dropout = dropout
        self.q_proj = torch.nn.Linear(embed_dim, embed_dim, bias=True)
        self.k_proj = torch.nn.Linear(embed_dim, embed_dim, bias=True)
        self.v_proj = torch.nn.Linear(embed_dim, embed_dim, bias=True)
        self.out_proj = torch.nn.Linear(embed_dim, embed_dim, bias=True)

    def forward(self, query, key=None, value=None, key_padding_mask=None,
                attn_mask=None, need_weights=True, **kw):
        # fairseq convention: [T, B, C]
        T, B, C = query.shape
        H, hd = self.num_heads, self.head_dim
        q = self.q_proj(query) * self.scaling
        k = self.k_proj(query if key is None else key)
        v = self.v_proj(query if value is None else value)

        def split(t):
            return t.contiguous().view(-1, B * H, hd).transpose(0, 1)

        q, k, v = split(q), split(k), split(v)
        attn = torch.bmm(q, k.transpose(1, 2))  # [B*H, T, S]
        if attn_mask is not None:
            attn = attn + attn_mask
        if key_padding_mask is not None and bool(key_padding_mask.any()):
            attn = attn.view(B, H, T, -1).masked_fill(
                key_padding_mask[:, None, None, :].bool(),
                float("-inf")).view(B * H, T, -1)
        attn = torch.softmax(attn, dim=-1)
        attn = F.dropout(attn, p=self.dropout, training=self.training)
        out = torch.bmm(attn, v).transpose(0, 1).contiguous().view(T, B, C)
        return self.out_proj(out), None


class _GradMultiply:
    @staticmethod
    def apply(x, scale):
        return x


def install_fairseq_stub():
    """Install (or upgrade an existing bare stub of) the fairseq module
    tree. Idempotent; safe to call after ref_stubs."""
    def module(name):
        m = sys.modules.get(name)
        if m is None:
            m = types.ModuleType(name)
            m.__version__ = "99.0.0"
            sys.modules[name] = m
        return m

    fs = module("fairseq")
    data = module("fairseq.data")
    data_utils = module("fairseq.data.data_utils")
    utils = module("fairseq.utils")
    dataclass_mod = module("fairseq.dataclass")
    models = module("fairseq.models")
    modules = module("fairseq.modules")
    ckpt_act = module("fairseq.modules.checkpoint_activations")
    tse = module("fairseq.modules.transformer_sentence_encoder")
    distributed = module("fairseq.distributed")

    fs.data = data
    fs.utils = utils
    fs.modules = modules
    fs.models = models
    fs.dataclass = dataclass_mod
    fs.distributed = distributed
    data.data_utils = data_utils
    data_utils.compute_mask_indices = getattr(
        data_utils, "compute_mask_indices", None)

    utils.get_available_activation_fns = lambda: ["relu", "gelu"]
    utils.get_activation_fn = lambda name: {
        "relu": F.relu, "gelu": F.gelu}[name]
    utils.buffered_arange = torch.arange
    utils.index_put = lambda t, idx, val: t.index_put_(
        (idx,), torch.as_tensor(val, dtype=t.dtype))
    utils.is_xla_tensor = lambda t: False

    dataclass_mod.ChoiceEnum = lambda choices: str

    class FairseqDataclass:
        pass

    dataclass_mod.FairseqDataclass = FairseqDataclass

    class BaseFairseqModel(torch.nn.Module):
        def upgrade_state_dict_named(self, state_dict, name):
            return state_dict

    models.BaseFairseqModel = BaseFairseqModel
    models.register_model = lambda name: (lambda cls: cls)

    modules.MultiheadAttention = _MultiheadAttention
    modules.GradMultiply = _GradMultiply
    modules.LayerNorm = (
        lambda dim, eps=1e-5, elementwise_affine=True:
        torch.nn.LayerNorm(dim, eps=eps,
                           elementwise_affine=elementwise_affine))
    for inert in ("Fp32GroupNorm", "Fp32LayerNorm",
                  "GumbelVectorQuantizer", "SamePad", "TransposeLast"):
        setattr(modules, inert, type(inert, (torch.nn.Module,), {}))
    modules.checkpoint_activations = ckpt_act
    ckpt_act.checkpoint_wrapper = lambda m: m
    modules.transformer_sentence_encoder = tse
    tse.init_bert_params = lambda module: None
    distributed.fsdp_wrap = lambda m: m
