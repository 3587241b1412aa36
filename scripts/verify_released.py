"""Released-checkpoint parity verification (egress-gated, staged).

The BASELINE.md north star requires embeddings from the released
ATST-Frame checkpoints (reference methods/atst/README.md:45-47,
methods/atstframe/README.md:15-17) to match the PyTorch reference
within 1e-3. This build environment has no network egress, so the
released weights and true torchaudio outputs cannot be fetched here —
this script stages the check as a one-command step for when they can:

1. In a torch environment with the reference installed, record golden
   embeddings for a wav (the exact snippet is printed by
   ``--print-torch-recipe``) -> ``golden.npz``.
2. Here::

       python scripts/verify_released.py \\
           --ckpt atstframe_base.ckpt --wav clip.wav \\
           --golden golden.npz

   prints one JSON line with the scene/timestamp max-abs diffs vs the
   recorded torch outputs and exits non-zero above ``--tol`` (1e-3).

Without ``--golden`` the script writes OUR embeddings to ``--out``
(same .npz layout) for cross-build diffing or as a reference record.

``probe`` mode additionally stages LINEAR-PROBE SCORE parity
(BASELINE.json configs 1/2 — frozen-encoder eval on spcv2 / us8k /
nsynth etc., the reference's shell/downtream/freeze/eval_*.sh runs)::

    python scripts/verify_released.py probe \\
        --ckpt atst_small.ckpt --dataset_name spcv2 \\
        --data_path /data/spcv2 --model_type clip --arch small \\
        --expect 0.958 --tol 0.01

runs our ``atst_downstream_train_freeze`` driver end-to-end with the
reference recipe's hyperparameters and exits non-zero if the test
score differs from ``--expect`` (the score of the same eval on the
torch side, or the paper's published number) by more than ``--tol``.
One command closes the whole parity story once egress exists: embedding
diff (step 2 above) + probe score parity (this mode).

Reference surface being compared: ``methods/atstframe/embedding.py:
19-127`` (load_model / get_scene_embedding / get_timestamp_embedding)
and ``methods/atst/downstream/train_freeze.py`` via
``shell/downtream/freeze/eval_*.sh``.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

TORCH_RECIPE = '''\
# Run in a torch environment with the reference audiossl installed to
# record the golden embeddings this script compares against:
import numpy as np, torch, torchaudio
from audiossl.methods.atstframe.embedding import (
    load_model, get_scene_embedding, get_timestamp_embedding)
CKPT, WAV, OUT = "atstframe_base.ckpt", "clip.wav", "golden.npz"
model = load_model(CKPT)
wav, sr = torchaudio.load(WAV)   # float32 in [-1, 1]
assert sr == 16000, "resample to 16 kHz first"
wav = wav[:1]                    # mono [1, T]
with torch.no_grad():
    scene = get_scene_embedding(wav, model)
    ts, t_ms = get_timestamp_embedding(wav, model)
np.savez(OUT, scene=scene.cpu().numpy(),
         timestamp=ts.cpu().numpy(), timestamps_ms=t_ms.cpu().numpy())
'''


def load_wav(path: str) -> np.ndarray:
    """wav file -> float32 [1, T] in [-1, 1] (torchaudio.load
    normalization semantics for integer PCM)."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if sr != 16000:
        raise SystemExit(f"expected 16 kHz wav, got {sr}")
    if data.ndim > 1:
        data = data[:, 0]
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    else:
        data = data.astype(np.float32)
    return data[None, :]


def probe_main(argv):
    """Staged linear-probe score parity (see module docstring)."""
    p = argparse.ArgumentParser("verify_released probe")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--dataset_name", required=True)
    p.add_argument("--data_path", required=True)
    p.add_argument("--model_type", default="clip",
                   choices=["clip", "frame"])
    p.add_argument("--arch", default="small",
                   choices=["tiny", "small", "base"])
    p.add_argument("--expect", type=float, required=True,
                   help="test score of the reference's eval_*.sh run "
                        "(or the paper's published number)")
    p.add_argument("--tol", type=float, default=0.01)
    p.add_argument("--max_epochs", type=int, default=None,
                   help="override the recipe's probe epochs")
    args = p.parse_args(argv)

    from audiossl_tpu.downstream import train_freeze

    drv = ["--pretrained_ckpt_path", args.ckpt,
           "--data_path", args.data_path,
           "--dataset_name", args.dataset_name,
           "--model_type", args.model_type, "--arch", args.arch]
    if args.max_epochs is not None:
        drv += ["--max_epochs", str(args.max_epochs)]
    result = train_freeze.main(drv)
    score = float(result["test"])
    diff = abs(score - args.expect)
    out = {"dataset": args.dataset_name, "test_score": score,
           "expect": args.expect, "abs_diff": diff, "tol": args.tol,
           "ok": diff <= args.tol}
    print(json.dumps(out))
    return 0 if out["ok"] else 1


def main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    if argv[:1] == ["probe"]:
        return probe_main(argv[1:])
    p = argparse.ArgumentParser("verify_released")
    p.add_argument("--ckpt", help="reference .ckpt or orbax dir")
    p.add_argument("--wav", help="16 kHz wav file")
    p.add_argument("--arch", default=None,
                   help="override arch (else from ckpt hparams)")
    p.add_argument("--golden", default=None,
                   help=".npz recorded on the torch side")
    p.add_argument("--out", default=None,
                   help="write our embeddings to this .npz")
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--print-torch-recipe", action="store_true")
    args = p.parse_args(argv)

    if args.print_torch_recipe:
        print(TORCH_RECIPE)
        return 0
    if not args.ckpt or not args.wav:
        p.error("--ckpt and --wav are required (or --print-torch-recipe)")

    from audiossl_tpu.embedding import (
        get_scene_embedding,
        get_timestamp_embedding,
        load_model,
    )

    model = load_model(args.ckpt, arch=args.arch)
    wav = load_wav(args.wav)
    scene = np.asarray(get_scene_embedding(wav, model))
    ts, t_ms = get_timestamp_embedding(wav, model)
    ts, t_ms = np.asarray(ts), np.asarray(t_ms)

    if args.out:
        np.savez(args.out, scene=scene, timestamp=ts,
                 timestamps_ms=t_ms)

    result = {"scene_shape": list(scene.shape),
              "timestamp_shape": list(ts.shape)}
    ok = True
    if args.golden:
        g = np.load(args.golden)
        for key, ours in (("scene", scene), ("timestamp", ts)):
            want = np.asarray(g[key])
            if want.shape != ours.shape:
                result[f"{key}_shape_mismatch"] = list(want.shape)
                ok = False
                continue
            d = float(np.abs(ours - want).max())
            result[f"{key}_max_abs_diff"] = d
            ok = ok and d <= args.tol
        result["tol"] = args.tol
    result["ok"] = ok
    print(json.dumps(result))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
