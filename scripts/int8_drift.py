"""Quantify the int8-teacher numerics cost (VERDICT r3 #2).

The opt-in ``teacher_quant="int8"`` recipe variant replaces the EMA
teacher's whole-block bf16 kernels with int8-MXU kernels
(per-output-channel weight scales x per-row activation scales,
ops/pallas_block.py). This script measures what that buys in error,
end-to-end, so the variant ships with an error budget:

1. **Teacher-target drift** — the actual BYOL targets ``t_out`` of the
   ATST-Frame method (projector output the student regresses onto),
   bf16 teacher vs int8 teacher on IDENTICAL params/inputs/rngs:
   per-frame cosine similarity (mean / p5 / min) and relative L2.
   Measured at random init AND after ``--steps`` real pretrain steps
   (trained weights develop outliers; init-only numbers flatter the
   quantizer).
2. **Probe delta** — mean-pooled frame embeddings from the same
   encoder (bf16 vs int8 path) for K synthetic classes (harmonic
   stacks, class = f0 x AM-rate cell), closed-form ridge one-vs-all
   probe: accuracy_bf16 vs accuracy_int8 and the cross condition
   (train on bf16 embeddings, test on int8) that mirrors swapping the
   serving path after training.

Writes {out}/int8_drift.json and prints a markdown table for
docs/PROFILE.md. Runs on the real chip (~2-4 min at defaults); CPU
smoke: --tiny (interpret-mode kernels, tiny arch).

Usage:
    python scripts/int8_drift.py --steps 200 --out docs/artifacts
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


def synth_class_audio(rng, n, sr, seconds, k, n_classes, noise=0.05):
    """Class-k audio: harmonic stack at f0_k, amplitude-modulated at
    rate_k — separable but not trivially so under mel pooling.
    ``noise`` sets the additive-gaussian level; raise it (and
    n_classes) to make the probe task hard enough that a random-init
    encoder does NOT already saturate it (probe_gain.py needs
    headroom above the init accuracy)."""
    f0 = 80.0 * (2.0 ** (k / max(n_classes - 1, 1) * 3.0))  # 80..640 Hz
    am = 2.0 + 6.0 * ((k * 7) % n_classes) / max(n_classes - 1, 1)
    t = np.arange(int(seconds * sr)) / sr
    out = np.zeros((n, t.size), np.float32)
    for i in range(n):
        phase = rng.uniform(0, 2 * np.pi)
        sig = np.zeros_like(t)
        for h in range(1, 6):
            sig += rng.uniform(0.5, 1.0) / h * np.sin(
                2 * np.pi * f0 * h * (1 + rng.uniform(-.02, .02)) * t
                + phase * h)
        env = 0.6 + 0.4 * np.sin(2 * np.pi * am * t + rng.uniform(0, 6.28))
        out[i] = (sig * env + rng.randn(t.size) * noise).astype(np.float32)
        out[i] *= 0.1 / max(np.abs(out[i]).max(), 1e-6)
    return out


def ridge_probe(ftr, lab, fte, lte, lam=1e-2):
    """Closed-form one-vs-all ridge on f32 features -> accuracy."""
    x = np.asarray(ftr, np.float64)
    mu, sd = x.mean(0), x.std(0) + 1e-6
    x = (x - mu) / sd
    y = np.eye(int(lab.max()) + 1)[lab]
    w = np.linalg.solve(x.T @ x + lam * x.shape[0] * np.eye(x.shape[1]),
                        x.T @ y)
    xt = (np.asarray(fte, np.float64) - mu) / sd
    return float((np.argmax(xt @ w, 1) == lte).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200,
                    help="pretrain steps before measuring (0 = init only)")
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--classes", type=int, default=10)
    ap.add_argument("--per-class", type=int, default=48)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       "/tmp/audiossl_jax_cache"))

    from audiossl_tpu.datasets import PackedAudioDataset, write_synthetic_pack
    from audiossl_tpu.datasets.pipeline import BatchLoader
    from audiossl_tpu.methods.atstframe.method import (
        FrameMethod, FramePretrainConfig, frame_train_views)
    from audiossl_tpu.training.pretrain import OptimizerConfig

    on_tpu = jax.default_backend() == "tpu"
    arch = "tiny" if args.tiny else "base"
    mk = lambda q: FramePretrainConfig(  # noqa: E731
        arch=arch, anchor_len=6.0,
        optimizer=OptimizerConfig(learning_rate=4e-4, warmup_steps=40,
                                  max_steps=4000, ema=0.99),
        dtype="bfloat16" if on_tpu else "float32",
        fused_attention=on_tpu, teacher_quant=q)
    m_bf = FrameMethod(mk("none"))
    m_q8 = FrameMethod(mk("int8"))

    state = m_bf.init_state(jax.random.PRNGKey(0))

    def measure_drift(state, tag):
        """BYOL targets from the bf16 vs int8 teacher, identical
        params/inputs/droppath stream."""
        cfg = m_bf.cfg
        rng = np.random.RandomState(7)
        wav = np.concatenate(
            [synth_class_audio(rng, 2, 16000, cfg.anchor_len + 1.0, k,
                               args.classes)
             for k in range(args.batch // 2)], 0)[:args.batch]
        valid = np.full((args.batch,), wav.shape[1], np.int32)
        k_aug, k_dpt = jax.random.split(jax.random.PRNGKey(3))
        mel2, frames2, mask2 = frame_train_views(
            k_aug, jnp.asarray(wav), jnp.asarray(valid), cfg)

        def tgt(method):
            # params passed as jit ARGUMENTS, not closed over: a
            # closure bakes the 86M-param teacher into the HLO as
            # constants, and the axon remote-compile tunnel rejects
            # the request body (HTTP 413)
            def f(tp, tbs, mel2, frames2, mask2):
                (t_out, t_sel), _ = method.teacher.apply(
                    {"params": tp, "batch_stats": tbs},
                    mel2, frames2, mask_index=mask2, apply_mask=False,
                    train=True, mutable=["batch_stats"],
                    rngs={"droppath": k_dpt})
                return t_out, t_sel
            t_out, t_sel = jax.jit(f)(
                state.teacher_params, state.teacher_batch_stats,
                mel2, frames2, mask2)
            return np.asarray(t_out, np.float32), np.asarray(t_sel)

        a, sel = tgt(m_bf)
        b, _ = tgt(m_q8)
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        sel = np.asarray(sel).astype(bool)
        av, bv = a[sel], b[sel]  # [n_frames, out_dim]
        cos = np.sum(av * bv, 1) / (
            np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1) + 1e-12)
        rel = np.linalg.norm(av - bv) / (np.linalg.norm(av) + 1e-12)
        r = {"cos_mean": float(cos.mean()), "cos_p5": float(
            np.percentile(cos, 5)), "cos_min": float(cos.min()),
            "rel_l2": float(rel)}
        print(f"[{tag}] target drift: cos mean {r['cos_mean']:.5f} "
              f"p5 {r['cos_p5']:.5f} min {r['cos_min']:.5f} "
              f"relL2 {r['rel_l2']:.4f}", flush=True)
        return r

    def measure_probe(state, tag):
        """Mean-pooled encoder frame features -> ridge probe accuracy,
        bf16 vs int8 encoder path on the SAME teacher params."""
        cfg = m_bf.cfg
        rng = np.random.RandomState(11)
        n_tr, n_te = args.per_class, max(args.per_class // 3, 8)
        wavs, labs = [], []
        for k in range(args.classes):
            wavs.append(synth_class_audio(rng, n_tr + n_te, 16000,
                                          cfg.anchor_len, k, args.classes))
            labs.append(np.full(n_tr + n_te, k))
        wav = np.concatenate(wavs)
        lab = np.concatenate(labs)
        tr = np.concatenate([np.arange(i * (n_tr + n_te),
                                       i * (n_tr + n_te) + n_tr)
                             for i in range(args.classes)])
        te = np.setdiff1d(np.arange(lab.size), tr)

        from audiossl_tpu.ops.melspec import log_melspec

        def feats(method):
            enc = method.teacher.encoder

            @jax.jit
            def fn(ep, w):   # params as args, not constants (tunnel 413)
                mel = log_melspec(w, cfg=cfg.mel)[:, :, :cfg.out_frames]
                ln = jnp.full((w.shape[0],), mel.shape[2], jnp.int32)
                frames, sel = enc.apply(
                    {"params": ep},
                    mel, ln, apply_mask=False, deterministic=True)
                selv = sel.astype(jnp.float32)[:, :, None]
                return (jnp.sum(frames.astype(jnp.float32) * selv, 1)
                        / jnp.maximum(jnp.sum(selv, 1), 1.0))

            out = []
            bs = 64
            for i in range(0, wav.shape[0], bs):
                chunk = wav[i:i + bs]
                if chunk.shape[0] < bs:  # static shapes for jit
                    chunk = np.pad(chunk, ((0, bs - chunk.shape[0]), (0, 0)))
                out.append(np.asarray(
                    fn(state.teacher_params["encoder"],
                       jnp.asarray(chunk)), np.float32))
            return np.concatenate(out)[:wav.shape[0]]

        f_bf = feats(m_bf)
        f_q8 = feats(m_q8)
        acc_bf = ridge_probe(f_bf[tr], lab[tr], f_bf[te], lab[te])
        acc_q8 = ridge_probe(f_q8[tr], lab[tr], f_q8[te], lab[te])
        acc_x = ridge_probe(f_bf[tr], lab[tr], f_q8[te], lab[te])
        cos = np.sum(f_bf * f_q8, 1) / (
            np.linalg.norm(f_bf, axis=1) * np.linalg.norm(f_q8, axis=1)
            + 1e-12)
        r = {"probe_acc_bf16": acc_bf, "probe_acc_int8": acc_q8,
             "probe_acc_cross": acc_x, "probe_delta": acc_q8 - acc_bf,
             "embed_cos_mean": float(cos.mean()),
             "embed_cos_min": float(cos.min())}
        print(f"[{tag}] probe: bf16 {acc_bf:.4f} int8 {acc_q8:.4f} "
              f"cross {acc_x:.4f} embed-cos {cos.mean():.5f}", flush=True)
        return r

    results = {"arch": arch, "backend": jax.default_backend(),
               "at_init": {**measure_drift(state, "init"),
                           **measure_probe(state, "init")}}

    if args.steps > 0:
        data = tempfile.mkdtemp(prefix="drift_data_")
        write_synthetic_pack(data, "train", max(4 * args.batch, 128),
                             min_s=6.0, max_s=8.0, kind="tones", seed=0)
        ds = PackedAudioDataset(data, "train")
        step_fn = jax.jit(m_bf.make_step(), donate_argnums=0)
        t0 = time.perf_counter()
        step = 0
        epoch = 0
        while step < args.steps:
            for b in BatchLoader(ds, args.batch,
                                 pad_samples=int(8.0 * 16000), shuffle=True,
                                 seed=0, epoch=epoch, num_threads=4,
                                 include_labels=False):
                state, metrics = step_fn(state, b)
                step += 1
                if step % 50 == 0:
                    print(f"pretrain step {step}: loss "
                          f"{float(metrics['loss']):.4f}", flush=True)
                if step >= args.steps:
                    break
            epoch += 1
        print(f"pretrained {step} steps in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        results["after_steps"] = {
            "steps": step, **measure_drift(state, f"step{step}"),
            **measure_probe(state, f"step{step}")}

    print(json.dumps(results))
    tagv = results.get("after_steps", results["at_init"])
    print("\n| condition | target cos (mean/p5) | rel L2 | probe bf16 | "
          "probe int8 | cross |\n|---|---|---|---|---|---|")
    for name, rv in [("init", results["at_init"])] + (
            [(f"step{args.steps}", tagv)] if args.steps else []):
        print(f"| {name} | {rv['cos_mean']:.5f} / {rv['cos_p5']:.5f} | "
              f"{rv['rel_l2']:.4f} | {rv['probe_acc_bf16']:.4f} | "
              f"{rv['probe_acc_int8']:.4f} | {rv['probe_acc_cross']:.4f} |")
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "int8_drift.json"), "w") as f:
            json.dump(results, f, indent=1)
        print(f"\nwrote {args.out}/int8_drift.json")


if __name__ == "__main__":
    main()
