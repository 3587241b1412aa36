"""Distill-other: clip->frame distillation on single-label tasks
(reference module_distill_other.py / train_distill_other.py)."""
import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests") if "tests" not in sys.path else None
from ref_stubs import install_reference_stubs  # noqa: E402

install_reference_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from audiossl_tpu.methods.distill.method import (  # noqa: E402
    DistillConfig,
    DistillMethod,
)
from audiossl_tpu.models.atst import AudioTransformer  # noqa: E402
from audiossl_tpu.models.heads import LinearHead  # noqa: E402


def _tiny_method(cfg):
    import optax
    from audiossl_tpu.training.schedules import cosine_schedule

    method = DistillMethod.__new__(DistillMethod)
    method.cfg = cfg
    method.teacher = AudioTransformer(embed_dim=32, depth=2, num_heads=2,
                                      spec_h=64, spec_w=cfg.out_frames,
                                      use_cls=True)
    method.student = AudioTransformer(embed_dim=32, depth=2, num_heads=2,
                                      spec_h=64, spec_w=cfg.out_frames,
                                      use_cls=False)
    method.t_head = LinearHead(num_labels=cfg.num_labels)
    method.s_head = LinearHead(num_labels=cfg.num_labels)
    method.lr_sched = cosine_schedule(cfg.learning_rate, 1e-6,
                                      cfg.max_steps, 0)
    method.opt = optax.trace(decay=0.9)

    mel0 = jnp.zeros((1, 64, cfg.out_frames))
    tp = method.teacher.init(jax.random.PRNGKey(0), mel0,
                             length=jnp.asarray([cfg.out_frames]),
                             deterministic=True)["params"]
    method.teacher_params = tp
    thv = method.t_head.init(jax.random.PRNGKey(1), jnp.zeros((2, 64)),
                             train=False)
    method.teacher_head_params = thv["params"]
    method.teacher_head_stats = thv.get("batch_stats", {})
    sp = method.student.init(jax.random.PRNGKey(2), mel0,
                             length=jnp.asarray([cfg.out_frames]),
                             deterministic=True)["params"]
    return method, sp


@pytest.mark.slow
def test_distill_other_single_label_step():
    """CE distill+supervised losses, central crop (single-label path)."""
    cfg = DistillConfig(num_labels=5, max_len=1.0, learning_rate=0.05,
                        max_epochs=1, steps_per_epoch=6, warmup_epochs=0,
                        chunk_len=101, multi_label=False, crop="central",
                        lambda_d=0.5)
    method, sp = _tiny_method(cfg)
    state = method.init_state(jax.random.PRNGKey(3), sp)
    step = jax.jit(method.make_step(), donate_argnums=0)
    rng = np.random.RandomState(0)
    B = 8
    batch = {
        "wav": rng.randn(B, 2 * cfg.out_samples).astype(np.float32) * .1,
        "valid": np.full(B, 2 * cfg.out_samples, np.int32),
        "label": rng.randint(0, 5, size=(B,)),
    }
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]

    evaluate = jax.jit(method.make_eval_fn())
    logits = evaluate(state, batch)
    assert logits.shape == (B, 5)
    assert bool(jnp.isfinite(logits).all())


def _make_spcv2_dir(root, labels=("yes", "no", "stop"), n_per=4):
    rng = np.random.RandomState(0)
    sr = 16000
    val_rel, test_rel = [], []
    from scipy.io import wavfile

    for lab in labels:
        os.makedirs(os.path.join(root, lab), exist_ok=True)
        for i in range(n_per):
            rel = f"{lab}/{lab}_{i}.wav"
            wavfile.write(os.path.join(root, rel), sr,
                          (rng.randn(sr) * 3000).astype(np.int16))
            if i == n_per - 2:
                val_rel.append(rel)
            elif i == n_per - 1:
                test_rel.append(rel)
    with open(os.path.join(root, "validation_list.txt"), "w") as f:
        f.write("\n".join(val_rel) + "\n")
    with open(os.path.join(root, "testing_list.txt"), "w") as f:
        f.write("\n".join(test_rel) + "\n")


@pytest.mark.slow
def test_train_distill_other_driver_e2e(tmp_path):
    """Full driver on a synthetic spcv2-shaped dataset with a real
    torch teacher checkpoint (tiny dims) parsed via the importer."""
    from functools import partial

    from audiossl.models.atst.audio_transformer import AST
    from audiossl.modules.head import LinearHead as TorchLinearHead

    from audiossl_tpu.methods.distill.train_other import main
    from audiossl_tpu.models.atst import frame_ast_tiny
    from audiossl_tpu.training.checkpoint import save_params

    # teacher: torch clip classifier at tiny dims (embed 64/depth 2)
    torch.manual_seed(0)
    enc = AST(use_cls=True, spec_h=64, spec_w=1001, patch_h=64,
              patch_w=4, embed_dim=64, depth=2, num_heads=2,
              qkv_bias=False,
              norm_layer=partial(torch.nn.LayerNorm, eps=1e-6))
    head = TorchLinearHead(dim=64 * 2, num_labels=35)
    sd = {f"encoder.encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"head.{k}": v for k, v in head.state_dict().items()})
    teacher_path = str(tmp_path / "teacher.ckpt")
    torch.save({"state_dict": sd}, teacher_path)

    # student: pretrained frame encoder (orbax params)
    fenc = frame_ast_tiny(spec_w=1001)
    fparams = fenc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 101)),
                        length=jnp.asarray([101]),
                        deterministic=True)["params"]
    student_path = str(tmp_path / "student")
    save_params(student_path, fparams)

    data = str(tmp_path / "spcv2")
    os.makedirs(data, exist_ok=True)
    _make_spcv2_dir(data)

    res = main([
        "--dataset_name", "spcv2", "--data_path", data,
        "--teacher_ckpt_path", teacher_path,
        "--student_ckpt_path", student_path,
        "--arch", "tiny", "--batch_size", "3", "--max_epochs", "1",
        "--warmup_epochs", "0", "--max_len", "1.0",
    ])
    assert 0.0 <= res["test"] <= 1.0
    assert 0.0 <= res["val"] <= 1.0
