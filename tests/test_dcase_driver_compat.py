"""End-to-end DCASE SED driver through every newly-ported comparison
encoder family: --arch audioMAE / mmd / ssast / patchssast / maeast /
patchmaeast (reference train_dcase.py:139-161 dispatch). Each test
writes a tiny synthetic checkpoint in the released on-disk layout and
drives the full pipeline through the adapter. Forward parity vs torch
is covered separately in tests/test_{audiomae,m2d,ssast,maeast}_parity.py.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_dcase_driver import _make_dcase_dir  # noqa: E402

D, DEPTH = 64, 2  # tiny trunk; heads_for_dim(64) == 1


def _timm_sd(rng, n_pos, ph, pw, prefix="", dist=False):
    """Random timm-ViT-layout state dict (the format AudioMAE / M2D /
    SSAST released checkpoints use)."""
    def t(*s):
        return torch.from_numpy(rng.randn(*s).astype(np.float32) * 0.05)

    sd = {
        prefix + "patch_embed.proj.weight": t(D, 1, ph, pw),
        prefix + "patch_embed.proj.bias": torch.zeros(D),
        prefix + "cls_token": t(1, 1, D),
        prefix + "pos_embed": t(1, n_pos, D),
        prefix + "norm.weight": torch.ones(D),
        prefix + "norm.bias": torch.zeros(D),
    }
    if dist:
        sd[prefix + "dist_token"] = t(1, 1, D)
    for i in range(DEPTH):
        b = f"{prefix}blocks.{i}."
        sd.update({
            b + "norm1.weight": torch.ones(D),
            b + "norm1.bias": torch.zeros(D),
            b + "attn.qkv.weight": t(3 * D, D),
            b + "attn.qkv.bias": torch.zeros(3 * D),
            b + "attn.proj.weight": t(D, D),
            b + "attn.proj.bias": torch.zeros(D),
            b + "norm2.weight": torch.ones(D),
            b + "norm2.bias": torch.zeros(D),
            b + "mlp.fc1.weight": t(4 * D, D),
            b + "mlp.fc1.bias": torch.zeros(4 * D),
            b + "mlp.fc2.weight": t(D, 4 * D),
            b + "mlp.fc2.bias": torch.zeros(D),
        })
    return sd


def _maeast_sd(rng):
    """Random raw-MAE_AST-layout state dict (``{'model': sd}`` is the
    released format, mae_ast_module.py:43-46)."""
    def t(*s):
        return torch.from_numpy(rng.randn(*s).astype(np.float32) * 0.05)

    sd = {
        "batch_norm.running_mean": torch.tensor([-3.0]),
        "batch_norm.running_var": torch.tensor([4.0]),
        "post_extract_proj.weight": t(D, 256),
        "post_extract_proj.bias": torch.zeros(D),
        "encoder.layer_norm.weight": torch.ones(D),
        "encoder.layer_norm.bias": torch.zeros(D),
    }
    for i in range(DEPTH):
        b = f"encoder.layers.{i}."
        for n in ("q", "k", "v", "out"):
            sd[b + f"self_attn.{n}_proj.weight"] = t(D, D)
            sd[b + f"self_attn.{n}_proj.bias"] = torch.zeros(D)
        sd.update({
            b + "self_attn_layer_norm.weight": torch.ones(D),
            b + "self_attn_layer_norm.bias": torch.zeros(D),
            b + "fc1.weight": t(4 * D, D),
            b + "fc1.bias": torch.zeros(4 * D),
            b + "fc2.weight": t(D, 4 * D),
            b + "fc2.bias": torch.zeros(D),
            b + "final_layer_norm.weight": torch.ones(D),
            b + "final_layer_norm.bias": torch.zeros(D),
        })
    return sd


def _make_ckpt(arch, tmp_path):
    rng = np.random.RandomState(0)
    path = str(tmp_path / f"{arch}.pt")
    if arch == "audioMAE":
        # img (1024, 128) / 16 -> 64*8 = 512 patches (+CLS)
        torch.save({"model": _timm_sd(rng, 1 + 512, 16, 16)}, path)
    elif arch == "mmd":
        # input (80, 208) / 16 -> 5*13 = 65 patches (+CLS)
        torch.save({"model": _timm_sd(rng, 1 + 65, 16, 16)}, path)
    elif arch in ("ssast", "patchssast"):
        ph, pw = (128, 2) if arch == "ssast" else (16, 16)
        grid = ((128 - ph) // ph + 1) * ((1024 - pw) // pw + 1)
        sd = {"module." + k: v
              for k, v in _timm_sd(rng, 2 + grid, ph, pw, prefix="v.",
                                   dist=True).items()}
        sd["module.p_input_fdim"] = torch.tensor(128)
        sd["module.p_input_tdim"] = torch.tensor(1024)
        torch.save(sd, path)
    else:  # maeast / patchmaeast
        torch.save({"model": _maeast_sd(rng)}, path)
    return path


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["audioMAE", "mmd", "ssast",
                                  "patchssast", "maeast", "patchmaeast"])
def test_train_dcase_driver_compat_arch(arch, tmp_path):
    from audiossl_tpu.downstream.train_dcase import main

    ckpt = _make_ckpt(arch, tmp_path)
    data = str(tmp_path / "dcase")
    _make_dcase_dir(data)
    res = main([
        "--pretrained_ckpt_path", ckpt, "--data_path", data,
        "--arch", arch, "--batch_size_synth", "2",
        "--batch_size_weak", "2", "--max_epochs", "1",
        "--warmup_epochs", "0", "--learning_rate", "0.01",
    ])
    for k in ("psds1", "psds2", "event_f1"):
        assert k in res
        assert 0.0 <= res[k] <= 1.0
