"""Microbenchmark the whole-block inference kernels (bf16 vs int8)
and the trainable fused-MLP pair at production shapes.

Run on the real chip to (a) validate the int8 MXU path lowers and is
numerically sane at ViT-base scale, (b) measure its speedup over the
bf16 resident-weight kernels, (c) A/B the trainable fused-MLP kernel
against the XLA per-op route. Informs docs/PROFILE.md.

Usage: python scripts/kernel_microbench.py [--batch 96] [--seq 256]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--heads", type=int, default=12)
    args = ap.parse_args()
    B, N, C, H = args.batch, args.seq, args.dim, args.heads

    from audiossl_tpu.ops.pallas_block import (
        attn_block_infer,
        mlp_block_infer,
    )

    rng = np.random.RandomState(0)

    def rnd(*shape, scale=0.02):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale)

    p = {
        "norm1": {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))},
        "norm2": {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))},
        "attn": {"qkv": {"kernel": rnd(C, 3 * C)},
                 "proj": {"kernel": rnd(C, C), "bias": jnp.zeros((C,))}},
        "mlp": {"fc1": {"kernel": rnd(C, 4 * C), "bias": jnp.zeros((4 * C,))},
                "fc2": {"kernel": rnd(4 * C, C), "bias": jnp.zeros((C,))}},
    }
    x = rnd(B, N, C, scale=1.0).astype(jnp.bfloat16)
    valid = jnp.ones((B, N), jnp.float32)

    tflops_attn = 2 * B * N * C * (4 * C) + 4 * B * H * N * N * (C // H)
    tflops_mlp = 4 * B * N * C * 4 * C

    results = {}
    for quant in (None, "int8"):
        tag = quant or "bf16"
        fa = jax.jit(lambda xx, q=quant: attn_block_infer(
            xx, valid, p, H, quant=q))
        fm = jax.jit(lambda xx, q=quant: mlp_block_infer(xx, p, quant=q))
        try:
            ta, oa = _time(fa, x)
            tm, om = _time(fm, x)
        except Exception as e:  # lowering failure is a result too
            print(f"{tag}: FAILED - {type(e).__name__}: {e}")
            continue
        results[tag] = (ta, tm, oa, om)
        print(f"attn[{tag}]: {ta:7.3f} ms  "
              f"{tflops_attn / ta / 1e9:6.1f} TF/s(eq)")
        print(f"mlp [{tag}]: {tm:7.3f} ms  "
              f"{tflops_mlp / tm / 1e9:6.1f} TF/s(eq)")

    if "bf16" in results and "int8" in results:
        ta_b, tm_b, oa_b, om_b = results["bf16"]
        ta_q, tm_q, oa_q, om_q = results["int8"]
        ra = np.abs(np.asarray(oa_q, np.float32)
                    - np.asarray(oa_b, np.float32))
        rm = np.abs(np.asarray(om_q, np.float32)
                    - np.asarray(om_b, np.float32))
        den_a = np.abs(np.asarray(oa_b, np.float32)).mean() + 1e-9
        den_m = np.abs(np.asarray(om_b, np.float32)).mean() + 1e-9
        print(f"speedup: attn {ta_b / ta_q:.2f}x  mlp {tm_b / tm_q:.2f}x")
        print(f"int8 rel err: attn mean {ra.mean() / den_a:.4f} "
              f"max {ra.max() / den_a:.4f}; "
              f"mlp mean {rm.mean() / den_m:.4f} max {rm.max() / den_m:.4f}")


if __name__ == "__main__":
    main()
