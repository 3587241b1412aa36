"""Convergence evidence for the pretrain recipes (VERDICT r3 #3).

Runs a few hundred steps of ATST-Frame and/or ATST-Clip pretraining on
structured synthetic audio (AM harmonic stacks, packed `.ards`) and
records the loss curve plus the teacher/student feature standard
deviation — the reference's own collapse telemetry (reference
methods/atst/model.py:29-30 logs std_cls_s/t for exactly this check).

Pass criteria (also asserted by tests/test_convergence.py on a tiny
arch): the tail-mean loss is well below the head-mean loss, and the
teacher feature std never collapses toward 0.

Writes {out}/{method}_curve.json and {out}/{method}_curve.png.

Usage (real chip, ~3 min each):
    python scripts/convergence_check.py --method frame --steps 400
    python scripts/convergence_check.py --method clip  --steps 400
CPU smoke: add --tiny --steps 60.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def build(method_name: str, tiny: bool, teacher_quant: str = "none",
          student_quant: str = "none"):
    import jax

    from audiossl_tpu.training.pretrain import Branch, OptimizerConfig

    if method_name == "frame":
        from audiossl_tpu.methods.atstframe.method import (
            FrameMethod,
            FramePretrainConfig,
        )

        cfg = FramePretrainConfig(
            arch="small", anchor_len=2.0 if tiny else 6.0,
            optimizer=OptimizerConfig(learning_rate=4e-4, warmup_steps=40,
                                      max_steps=4000, ema=0.99),
            dtype="float32" if tiny else "bfloat16",
            teacher_quant=teacher_quant, student_quant=student_quant)
        method = FrameMethod(cfg)
        std_key = "std_frm_tea"
    else:
        from audiossl_tpu.methods.atst.method import (
            ClipMethod,
            ClipPretrainConfig,
        )

        ln = (2.0, 2.0) if tiny else (6.0, 6.0)
        cfg = ClipPretrainConfig(
            arch="small", anchor_len=ln, positive_len=ln,
            optimizer=OptimizerConfig(learning_rate=4e-4, warmup_steps=40,
                                      max_steps=4000, ema=0.99),
            dtype="float32" if tiny else "bfloat16",
            teacher_quant=teacher_quant, student_quant=student_quant)
        method = ClipMethod(cfg)
        std_key = "std_cls_t"
    if tiny:
        from audiossl_tpu.models.atst import AudioTransformer

        use_cls = method_name == "clip"
        enc = AudioTransformer(embed_dim=32, depth=2, num_heads=2,
                               spec_h=64, spec_w=cfg.out_frames
                               if method_name == "frame"
                               else int(ln[0] * 16000) // 160 + 1,
                               use_cls=use_cls)
        method.student = Branch(encoder=enc, projector="mlp",
                                predictor=True, hidden_dim=64, out_dim=16)
        method.teacher = Branch(encoder=enc, projector="mlp",
                                predictor=False, hidden_dim=64, out_dim=16)
    return method, cfg, std_key


def run(method_name: str, steps: int, batch: int, tiny: bool,
        out_dir: str | None, seed: int = 0, teacher_quant: str = "none",
        student_quant: str = "none"):
    import jax

    from audiossl_tpu.datasets import PackedAudioDataset, write_synthetic_pack
    from audiossl_tpu.datasets.pipeline import BatchLoader

    method, cfg, std_key = build(method_name, tiny, teacher_quant,
                                 student_quant)
    data = tempfile.mkdtemp(prefix="convergence_data_")
    n_clips = max(4 * batch, 256 if not tiny else 64)
    clip_s = cfg.anchor_len if method_name == "frame" else cfg.anchor_len[0]
    write_synthetic_pack(data, "train", n_clips, min_s=clip_s,
                         max_s=clip_s + 2.0, kind="tones", seed=seed)
    dataset = PackedAudioDataset(data, "train")

    step_fn = jax.jit(method.make_step(), donate_argnums=0)
    state = method.init_state(jax.random.PRNGKey(seed))
    pad = int((clip_s + 2.0) * 16000)

    hist = {"loss": [], "std_tea": [], "std_stu": []}
    step = 0
    t0 = time.perf_counter()
    epoch = 0
    while step < steps:
        loader = BatchLoader(dataset, batch, pad_samples=pad, shuffle=True,
                             seed=seed, epoch=epoch, num_threads=4,
                             include_labels=False)
        for b in loader:
            state, metrics = step_fn(state, b)
            hist["loss"].append(float(metrics["loss"]))
            hist["std_tea"].append(float(metrics[std_key]))
            hist["std_stu"].append(float(
                metrics[std_key.replace("_tea", "_stu")
                        .replace("_t", "_s") if "_t" == std_key[-2:]
                        else std_key.replace("tea", "stu")]))
            step += 1
            if step % 50 == 0:
                print(f"step {step}: loss {hist['loss'][-1]:.4f} "
                      f"std_tea {hist['std_tea'][-1]:.4f}", flush=True)
            if step >= steps:
                break
        epoch += 1

    k = max(len(hist["loss"]) // 10, 1)
    head = float(np.mean(hist["loss"][:k]))
    tail = float(np.mean(hist["loss"][-k:]))
    std_floor = float(np.min(hist["std_tea"][k:]))
    summary = {
        "method": method_name, "steps": steps, "batch": batch,
        "tiny": tiny, "teacher_quant": teacher_quant,
        "student_quant": student_quant,
        "head_loss": head, "tail_loss": tail,
        "loss_drop": head - tail, "min_teacher_std_after_warmup": std_floor,
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    print(json.dumps(summary))

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        suffix = "" if teacher_quant == "none" else f"_{teacher_quant}"
        if student_quant != "none":
            suffix += f"_stu{student_quant}"
        base = os.path.join(out_dir, f"{method_name}_curve{suffix}")
        with open(base + ".json", "w") as f:
            json.dump({**summary, **hist}, f)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(7, 6), sharex=True)
            ax1.plot(hist["loss"], lw=0.8)
            ax1.set_ylabel("BYOL loss")
            quant_tag = ("" if teacher_quant == "none"
                         else f", {teacher_quant} teacher")
            if student_quant != "none":
                quant_tag += f", {student_quant} student"
            ax1.set_title(f"ATST-{method_name} pretrain convergence "
                          f"({steps} steps, batch {batch}{quant_tag})")
            ax2.plot(hist["std_tea"], lw=0.8, label="teacher std")
            ax2.plot(hist["std_stu"], lw=0.8, label="student std")
            ax2.axhline(0.0, color="k", lw=0.5)
            ax2.set_ylabel("feature std (collapse telemetry)")
            ax2.set_xlabel("step")
            ax2.legend()
            fig.tight_layout()
            fig.savefig(base + ".png", dpi=110)
            print(f"curve written to {base}.png")
        except Exception as e:  # plotting is best-effort
            print(f"plot skipped: {e}")
    return summary, hist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", choices=["frame", "clip", "both"],
                    default="both")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--tiny", action="store_true",
                    help="2-block/32-dim encoder for CPU smoke runs")
    ap.add_argument("--out", default="docs/convergence")
    ap.add_argument("--teacher-quant", default="none",
                    choices=["none", "int8"],
                    help="A/B the int8-MXU teacher recipe variant; output "
                         "files gain an _int8 suffix")
    ap.add_argument("--student-quant", default="none",
                    choices=["none", "int8", "int8dx"],
                    help="A/B the int8-student-forward recipe variant "
                         "(QAT straight-through backward)")
    args = ap.parse_args()
    methods = ["frame", "clip"] if args.method == "both" else [args.method]
    for m in methods:
        summary, _ = run(m, args.steps, args.batch, args.tiny, args.out,
                         teacher_quant=args.teacher_quant,
                         student_quant=args.student_quant)
        assert summary["tail_loss"] < summary["head_loss"], \
            f"{m}: loss did not decrease"


if __name__ == "__main__":
    main()
