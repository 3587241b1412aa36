"""Capture and summarize a device-op profile of the headline train step.

Runs the same ATST-Frame base production step as bench.py under
``jax.profiler.trace`` and prints per-op device totals (ms/step),
aggregated over the steady-state steps — the tool behind
docs/PROFILE.md's breakdown table.  The reference has no profiling
story at all (SURVEY.md §5: SimpleProfiler imported but never
enabled); here it is a first-class maintained script.

Usage:
    python scripts/profile_step.py [--steps 8] [--batch 96] [--top 40]
    python scripts/profile_step.py --clip    # ATST-Clip small instead
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_frame_step(B, teacher_quant="none", student_quant="none"):
    from audiossl_tpu.methods.atstframe.method import (
        FramePretrainConfig,
        FrameMethod,
    )
    from audiossl_tpu.training.pretrain import OptimizerConfig

    cfg = FramePretrainConfig(
        arch="base", anchor_len=10.0, mask_type="block", mask_ratio=0.65,
        mask_len=5, aug_tea=False, aug_stu=True,
        optimizer=OptimizerConfig(learning_rate=8e-5, warmup_steps=19900,
                                  max_steps=398000, ema=0.9996),
        dtype="bfloat16", teacher_quant=teacher_quant,
        student_quant=student_quant)
    method = FrameMethod(cfg)
    step = jax.jit(method.make_step(), donate_argnums=0)
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(B, cfg.out_samples).astype(np.float32) * 0.1)
    valid = jnp.full((B,), cfg.out_samples, jnp.int32)
    return step, method.init_state(jax.random.PRNGKey(0)), \
        {"wav": wav, "valid": valid}


def build_clip_step(B):
    from audiossl_tpu.methods.atst.method import (
        ClipMethod,
        ClipPretrainConfig,
    )
    from audiossl_tpu.training.pretrain import OptimizerConfig

    cfg = ClipPretrainConfig(
        arch="small", anchor_len=(6.0, 6.0), positive_len=(6.0, 6.0),
        optimizer=OptimizerConfig(learning_rate=5e-4, warmup_steps=1300,
                                  max_steps=39100, ema=0.99),
        dtype="bfloat16")
    method = ClipMethod(cfg)
    step = jax.jit(method.make_step(), donate_argnums=0)
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(B, 160000).astype(np.float32) * 0.1)
    valid = jnp.full((B,), 160000, jnp.int32)
    return step, method.init_state(jax.random.PRNGKey(0)), \
        {"wav": wav, "valid": valid}


def device_op_totals(trace_dir, steps):
    """Aggregate device-plane event durations by op name -> ms/step."""
    from jax.profiler import ProfileData

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    data = ProfileData.from_serialized_xspace(
        open(sorted(paths)[-1], "rb").read())
    totals = collections.Counter()
    for plane in data.planes:
        name = plane.name
        if not ("TPU" in name or "/device" in name.lower()):
            continue
        if "SparseCore" in name:
            continue
        for line in plane.lines:
            # XLA Ops line carries one event per executed HLO op
            if line.name not in ("XLA Ops",):
                continue
            for ev in line.events:
                totals[ev.name] += ev.duration_ns
    return {k: v / 1e6 / steps for k, v in totals.items()}


def op_kind(name):
    """The op's own identity: '%copy.5 = f32[...] copy(...)' -> 'copy'."""
    lhs, _, rhs = name.partition(" = ")
    m = re.match(r"%?([a-zA-Z][\w.\-]*)", lhs.strip())
    base = m.group(1) if m else lhs
    base = re.sub(r"[.\d]+$", "", base)
    opm = re.search(r"\]\s*(?:\{[^}]*\}\s*)?([a-z][\w\-]*)\(", rhs)
    hlo = opm.group(1) if opm else ""
    if hlo == "fusion":
        return base  # named fusions keep their lhs identity
    return hlo or base


GROUPS = [
    # matched against the op's own kind (op_kind), not operand text
    ("pallas custom-calls", re.compile(r"custom-call|run_blocks|tpu_custom")),
    ("copies/transposes", re.compile(r"^(copy|transpose|bitcast|reshape|pad)")),
    ("convolutions", re.compile(r"^conv")),
    ("plain dots", re.compile(r"^dot")),
    ("fusions", re.compile(r"fusion")),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--clip", action="store_true")
    ap.add_argument("--int8-teacher", action="store_true",
                    help="profile the int8-quantized-teacher recipe variant")
    ap.add_argument("--int8-student", action="store_true",
                    help="profile the int8-student-forward recipe variant")
    ap.add_argument("--int8dx-student", action="store_true",
                    help="profile the int8 fwd + int8-dX-backward variant")
    ap.add_argument("--keep", default=None,
                    help="keep the trace under this directory")
    ap.add_argument("--filter", default=None,
                    help="only show top ops whose name matches this regex")
    args = ap.parse_args()

    if args.clip:
        step, state, batch = build_clip_step(args.batch)
    else:
        step, state, batch = build_frame_step(
            args.batch,
            teacher_quant="int8" if args.int8_teacher else "none",
            student_quant=("int8dx" if args.int8dx_student
                           else "int8" if args.int8_student else "none"))
    for _ in range(4):          # compile + settle
        state, metrics = step(state, batch)
    float(metrics["loss"])

    trace_dir = args.keep or tempfile.mkdtemp(prefix="tpu_profile_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            state, metrics = step(state, batch)
        float(metrics["loss"])

    totals = device_op_totals(trace_dir, args.steps)
    total_ms = sum(totals.values())
    print(f"device total: {total_ms:.2f} ms/step "
          f"({len(totals)} distinct ops, B={args.batch})")

    grouped = collections.Counter()
    for name, ms in totals.items():
        kind = op_kind(name)
        for gname, pat in GROUPS:
            if pat.search(kind) or ("custom-call" in name.split(" = ")[-1][:60]
                                    and gname == "pallas custom-calls"):
                grouped[gname] += ms
                break
        else:
            grouped[f"op:{kind}"] += ms
    print("\n== groups ==")
    for gname, ms in grouped.most_common():
        print(f"{ms:9.3f} ms  {gname}")

    print(f"\n== top {args.top} ops ==")
    items = sorted(totals.items(), key=lambda kv: -kv[1])
    if args.filter:
        pat = re.compile(args.filter)
        items = [kv for kv in items if pat.search(kv[0])]
        print(f"(filtered: {sum(ms for _, ms in items):.2f} ms total)")
    for name, ms in items[:args.top]:
        print(f"{ms:9.3f} ms  {name[:160]}")
    if args.keep:
        print(f"\ntrace kept at {trace_dir}")


if __name__ == "__main__":
    main()
