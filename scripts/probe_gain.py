"""Pretraining -> downstream-quality tie (VERDICT r4 #6).

The convergence curves (docs/convergence/) prove the loss falls and the
teacher never collapses; this script proves the loop improves the
REPRESENTATION: it pretrains ATST-Frame small on synthetic-class audio
(harmonic stacks, class = f0 x AM-rate cell — the int8_drift.py corpus)
and runs the frozen-encoder protocol of the reference
(/root/reference/audiossl/methods/atst/downstream/train_freeze.py:75-155
— extract embeddings once, fit a linear classifier) at checkpoints
along the way: mean-pooled teacher frame embeddings -> closed-form
one-vs-all ridge probe -> held-out accuracy.

Pass criterion: probe accuracy at the final checkpoint is well above
the random-init checkpoint (the mel front end alone already separates
these classes somewhat; the gain over step 0 is the evidence).

Corpus design matters (measured 2026-08-20, docs/PROFILE.md): with
``--corpus f0am`` (class = f0 x AM-rate cell, the int8_drift corpus)
probe accuracy FALLS with training — the ATST augmentation stack
(random-resized-crop freq/time rescaling) explicitly trains
invariance to pitch and rate, i.e. to the class signal itself, so
that curve demonstrates the augmentations working, not representation
quality. The default ``--corpus shape`` therefore encodes class in
augmentation-STABLE structure — which harmonics are present (a 6-bit
comb over harmonics 2..7) — while f0 and AM rate are randomized per
sample (class-uncorrelated): freq rescaling translates the comb on
the log-mel axis but preserves its shape, the factor SSL invariance
training is supposed to surface. This mirrors real audio, where
classes ride timbre/texture, not absolute pitch.

Writes {out}/probe_gain.json (+ .png) under docs/convergence/
(``_f0am`` suffix for the legacy corpus, quant suffixes for A/Bs).

Usage (real chip, ~4-6 min at defaults):
    python scripts/probe_gain.py --steps 2000 --probe-every 400
CPU smoke: --tiny --steps 40 --probe-every 20.
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

from int8_drift import ridge_probe, synth_class_audio  # noqa: E402


def synth_shape_audio(rng, n, sr, seconds, k, n_classes, noise=0.05):
    """Class-k audio with augmentation-STABLE class structure: the
    class decides WHICH harmonics sound (bit b of k toggles harmonic
    b+2; fundamental and harmonic 8 are always-on anchors), while f0
    (80..640 Hz, log-uniform) and the AM rate are drawn per sample,
    uncorrelated with the class. Frequency rescaling (the RRC
    augmentation) translates the comb along the log-mel axis but
    preserves which teeth are present, so a representation that
    improves under the ATST augmentations can only do so by exposing
    the comb shape — the probe then measures representation quality,
    not invariance erosion (see module docstring)."""
    amp = np.array(
        [1.0] + [0.1 + 0.9 * ((k >> b) & 1) for b in range(6)] + [0.7],
        np.float32)
    t = np.arange(int(seconds * sr)) / sr
    out = np.zeros((n, t.size), np.float32)
    for i in range(n):
        f0 = 80.0 * (2.0 ** rng.uniform(0.0, 3.0))
        am = rng.uniform(2.0, 8.0)
        phase = rng.uniform(0, 2 * np.pi)
        sig = np.zeros_like(t)
        for h in range(1, 9):
            sig += (amp[h - 1] * rng.uniform(0.8, 1.2) / np.sqrt(h)
                    * np.sin(2 * np.pi * f0 * h
                             * (1 + rng.uniform(-.02, .02)) * t
                             + phase * h))
        env = 0.6 + 0.4 * np.sin(2 * np.pi * am * t
                                 + rng.uniform(0, 6.28))
        out[i] = (sig * env + rng.randn(t.size) * noise
                  ).astype(np.float32)
        out[i] *= 0.1 / max(np.abs(out[i]).max(), 1e-6)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--probe-every", type=int, default=400)
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--classes", type=int, default=24)
    ap.add_argument("--per-class", type=int, default=60)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--out", default="docs/convergence")
    ap.add_argument("--noise", type=float, default=1.2,
                    help="additive-noise level in synth_class_audio; the "
                         "default is chosen so a RANDOM-INIT encoder scores "
                         "well below 1.0 on the probe (headroom for the "
                         "gain measurement)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--corpus", default="shape",
                    choices=["shape", "f0am"],
                    help="'shape': class = harmonic comb, f0/AM "
                         "randomized (augmentation-stable class signal "
                         "— the representation-quality measurement); "
                         "'f0am': class = f0 x AM cell (augmentation-"
                         "UNSTABLE; accuracy falls as invariance is "
                         "learned — kept as the invariance demo)")
    ap.add_argument("--teacher-quant", default="none",
                    choices=["none", "int8"],
                    help="A/B the quantized-teacher recipe variant")
    ap.add_argument("--student-quant", default="none",
                    choices=["none", "int8", "int8dx"],
                    help="A/B the quantized-student recipe variant")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       "/tmp/audiossl_jax_cache"))

    from audiossl_tpu.datasets.packed import PackedWriter, PackedAudioDataset
    from audiossl_tpu.datasets.pipeline import BatchLoader
    from audiossl_tpu.methods.atstframe.method import (
        FrameMethod, FramePretrainConfig)
    from audiossl_tpu.ops.melspec import log_melspec
    from audiossl_tpu.training.pretrain import Branch, OptimizerConfig

    on_tpu = jax.default_backend() == "tpu"
    arch = "tiny" if args.tiny else "small"
    cfg = FramePretrainConfig(
        arch=arch, anchor_len=2.0 if args.tiny else 6.0,
        optimizer=OptimizerConfig(
            learning_rate=4e-4, warmup_steps=max(args.steps // 20, 10),
            max_steps=max(args.steps, 100), ema=0.99),
        dtype="bfloat16" if on_tpu else "float32",
        fused_attention=on_tpu,
        teacher_quant=args.teacher_quant,
        student_quant=args.student_quant)
    method = FrameMethod(cfg)
    if args.tiny:
        from audiossl_tpu.models.atst import AudioTransformer

        enc = AudioTransformer(embed_dim=32, depth=2, num_heads=2,
                               spec_h=64, spec_w=cfg.out_frames,
                               use_cls=False)
        method.student = Branch(encoder=enc, projector="mlp",
                                predictor=True, hidden_dim=64, out_dim=16)
        method.teacher = Branch(encoder=enc, projector="mlp",
                                predictor=False, hidden_dim=64, out_dim=16)

    # ---- corpora: pretrain pack + probe train/test sets, same classes
    rng = np.random.RandomState(args.seed)
    gen = synth_shape_audio if args.corpus == "shape" else synth_class_audio
    sec = cfg.anchor_len + 1.0
    data = tempfile.mkdtemp(prefix="probe_gain_data_")
    n_pretrain = max(8 * args.batch, 384)
    with PackedWriter(os.path.join(data, "train.ards")) as writer:
        for i in range(n_pretrain):
            k = i % args.classes
            w = gen(rng, 1, cfg.sr, sec, k, args.classes, args.noise)[0]
            writer.add(np.clip(w * 32767, -32767, 32767).astype(np.int16),
                       int(k), cfg.sr)
    dataset = PackedAudioDataset(data, "train")

    n_tr, n_te = args.per_class, max(args.per_class // 3, 8)
    wavs, labs = [], []
    for k in range(args.classes):
        wavs.append(gen(rng, n_tr + n_te, cfg.sr, cfg.anchor_len, k,
                        args.classes, args.noise))
        labs.append(np.full(n_tr + n_te, k))
    probe_wav = np.concatenate(wavs)
    probe_lab = np.concatenate(labs)
    tr = np.concatenate([np.arange(i * (n_tr + n_te),
                                   i * (n_tr + n_te) + n_tr)
                         for i in range(args.classes)])
    te = np.setdiff1d(np.arange(probe_lab.size), tr)

    enc = method.teacher.encoder

    def probe_acc(state):
        """Frozen-teacher mean-pooled frame embeddings -> ridge probe
        (the reference freeze protocol, one linear layer, no aug)."""
        @jax.jit
        def fn(w):
            mel = log_melspec(w, cfg=cfg.mel)[:, :, :cfg.out_frames]
            ln = jnp.full((w.shape[0],), mel.shape[2], jnp.int32)
            frames, sel = enc.apply(
                {"params": state.teacher_params["encoder"]},
                mel, ln, apply_mask=False, deterministic=True)
            selv = sel.astype(jnp.float32)[:, :, None]
            return (jnp.sum(frames.astype(jnp.float32) * selv, 1)
                    / jnp.maximum(jnp.sum(selv, 1), 1.0))

        bs = 64
        out = []
        for i in range(0, probe_wav.shape[0], bs):
            chunk = probe_wav[i:i + bs]
            if chunk.shape[0] < bs:
                chunk = np.pad(chunk, ((0, bs - chunk.shape[0]), (0, 0)))
            out.append(np.asarray(fn(jnp.asarray(chunk)), np.float32))
        f = np.concatenate(out)[:probe_wav.shape[0]]
        return ridge_probe(f[tr], probe_lab[tr], f[te], probe_lab[te])

    step_fn = jax.jit(method.make_step(), donate_argnums=0)
    state = method.init_state(jax.random.PRNGKey(args.seed))
    curve = [{"step": 0, "acc": probe_acc(state), "loss": None}]
    print(f"step 0: probe acc {curve[0]['acc']:.4f}", flush=True)

    pad = int(sec * cfg.sr)
    step = 0
    epoch = 0
    t0 = time.perf_counter()
    loss = None
    while step < args.steps:
        loader = BatchLoader(dataset, args.batch, pad_samples=pad,
                             shuffle=True, seed=args.seed, epoch=epoch,
                             num_threads=4, include_labels=False)
        for b in loader:
            state, metrics = step_fn(state, b)
            step += 1
            if step % args.probe_every == 0 or step == args.steps:
                loss = float(metrics["loss"])
                acc = probe_acc(state)
                curve.append({"step": step, "acc": acc, "loss": loss})
                print(f"step {step}: loss {loss:.4f} probe acc "
                      f"{acc:.4f}", flush=True)
            if step >= args.steps:
                break
        epoch += 1

    summary = {
        "arch": arch, "steps": args.steps, "batch": args.batch,
        "classes": args.classes, "noise": args.noise,
        "corpus": args.corpus,
        "teacher_quant": args.teacher_quant,
        "student_quant": args.student_quant,
        "acc_init": curve[0]["acc"], "acc_final": curve[-1]["acc"],
        "acc_gain": curve[-1]["acc"] - curve[0]["acc"],
        "wall_s": round(time.perf_counter() - t0, 1),
        "curve": curve,
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "curve"}))
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        suffix = "" if args.corpus == "shape" else f"_{args.corpus}"
        if args.teacher_quant != "none":
            suffix += f"_tea{args.teacher_quant}"
        if args.student_quant != "none":
            suffix += f"_stu{args.student_quant}"
        base = os.path.join(args.out, "probe_gain" + suffix)
        with open(base + ".json", "w") as f:
            json.dump(summary, f, indent=1)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(7, 4))
            ax.plot([c["step"] for c in curve], [c["acc"] for c in curve],
                    marker="o")
            ax.set_xlabel("pretrain step")
            ax.set_ylabel("frozen-probe accuracy (held out)")
            ax.set_title(f"ATST-Frame {arch}: linear-probe accuracy vs "
                         "pretraining")
            ax.grid(alpha=0.3)
            fig.tight_layout()
            fig.savefig(base + ".png", dpi=120)
            print(f"wrote {base}.json / .png")
        except ImportError:
            print(f"wrote {base}.json (matplotlib unavailable)")


if __name__ == "__main__":
    main()
