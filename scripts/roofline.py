"""Analytic roofline floors for the pretraining step.

Reproduces the arithmetic behind docs/PROFILE.md's "roofline ceiling"
section for any configuration: per-component matmul FLOPs, the bf16
MXU time floor, the HBM-traffic floor of the memory-bound phases, and
the implied clips/s ceiling. Pure host-side arithmetic — no device.

Usage:
    python scripts/roofline.py [--arch base] [--batch 96]
        [--anchor 10.0] [--views 2] [--peak-tflops 197]
        [--hbm-gbps 390] [--int8-teacher]

Peak defaults are the v5e: 197 bf16 TFLOP/s, ~390 GB/s effective HBM
stream rate measured in XLA fusions (docs/PROFILE.md "measured
hardware facts"). int8 MXU peak is taken as 2x bf16.
"""
from __future__ import annotations

import argparse

ARCHS = {
    "tiny": (192, 12, 3),
    "small": (384, 12, 6),
    "base": (768, 12, 12),
    "large": (1024, 24, 16),
}


def encoder_flops_per_view(B, N, C, depth):
    """Forward matmul FLOPs for one encoder pass over [B, N, C]."""
    per_layer = (
        2 * B * N * C * 3 * C        # qkv
        + 2 * B * N * N * C * 2      # scores + attn*V (all heads)
        + 2 * B * N * C * C          # proj
        + 2 * B * N * C * 4 * C * 2  # fc1 + fc2
    )
    return per_layer * depth


def head_flops_per_view(B, N, C, hidden=4096, out=256, predictor=True):
    f = 2 * B * N * (C * hidden + hidden * out)      # projector
    if predictor:
        f += 2 * B * N * (out * hidden + hidden * out)
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="base", choices=sorted(ARCHS))
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--anchor", type=float, default=10.0)
    ap.add_argument("--views", type=int, default=2)
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--hbm-gbps", type=float, default=390.0)
    ap.add_argument("--int8-teacher", action="store_true")
    ap.add_argument("--mel-passes", type=int, default=1,
                    help="mel computations per step (frame recipe: 1 - "
                         "both views augment the SAME crop's mel; clip "
                         "recipe: 2 crops -> 2)")
    ap.add_argument("--baseline", type=float, default=144.0,
                    help="reference clips/s/GPU (BASELINE.md)")
    args = ap.parse_args()

    C, depth, heads = ARCHS[args.arch]
    B = args.batch
    # tokens: 64-mel full-height patches, 4 frames each, padded to 128
    frames = int(args.anchor * 16000) // 160 + 1
    n_tok = frames // 4
    N = ((n_tok + 127) // 128) * 128  # MXU tile padding
    V = args.views

    enc = encoder_flops_per_view(B, N, C, depth)
    head = head_flops_per_view(B, N, C)
    t_head = head_flops_per_view(B, N, C, predictor=False)

    student = 3 * V * (enc + head)        # fwd + bwd(2x)
    teacher = V * (enc + t_head)          # fwd only (EMA, no grads)
    peak = args.peak_tflops * 1e12
    t_student = student / peak
    t_teacher = teacher / peak / (2.0 if args.int8_teacher else 1.0)

    # memory-bound tail (bytes): optimizer+EMA one fused pass ->
    # read p,g,mu,nu,t + write p,mu,nu,t (f32 masters, ~9 accesses).
    # per layer: qkv 3C^2 + proj C^2 + fc1 4C^2 + fc2 4C^2 = 12C^2
    # (+ ~10C biases/LN); plus pos/patch embeds and the BYOL heads.
    n_params = (depth * (12 * C * C + 10 * C)
                + (N + 1) * C + 256 * C            # pos + patch embed
                + C * 4096 + 4096 * 256            # projector
                + 256 * 4096 + 4096 * 256)         # predictor
    opt_bytes = n_params * 4 * 9
    t_opt = opt_bytes / (args.hbm_gbps * 1e9)
    # mel front-end: framed matmul [B*T,1024]x[1024,1026] per mel pass
    mel_flops = 2 * B * (frames * 4) * 1024 * 1026 / 4  # hop 160 ~ T/4 rows
    t_mel = args.mel_passes * (
        mel_flops / peak + (B * frames * 64 * 4 * 6) / (
            args.hbm_gbps * 1e9))

    t_total = t_student + t_teacher + t_opt + t_mel
    print(f"arch={args.arch} C={C} depth={depth} B={B} "
          f"N={N} ({n_tok} logical tokens), views={V}")
    print(f"student fwd+bwd matmul floor: {t_student * 1e3:8.2f} ms")
    print(f"teacher fwd matmul floor:     {t_teacher * 1e3:8.2f} ms"
          f"{'  (int8)' if args.int8_teacher else ''}")
    print(f"optimizer+EMA HBM floor:      {t_opt * 1e3:8.2f} ms "
          f"({opt_bytes / 1e9:.2f} GB)")
    print(f"mel front-end floor:          {t_mel * 1e3:8.2f} ms")
    print(f"step floor:                   {t_total * 1e3:8.2f} ms")
    cps = B / t_total
    print(f"ceiling: {cps:7.1f} clips/s/chip = "
          f"{cps / args.baseline:.2f}x of {args.baseline:.0f}")


if __name__ == "__main__":
    main()
