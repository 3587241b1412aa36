"""scripts/verify_released.py: the staged released-checkpoint parity
check, exercised end-to-end on a synthetic checkpoint (the real run
needs the released weights + a torch-recorded golden, egress-gated —
see the script docstring / README)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.io import wavfile

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def _load_script():
    sys.path.insert(0, SCRIPTS)
    try:
        import verify_released
    finally:
        sys.path.pop(0)
    return verify_released


@pytest.mark.slow
def test_verify_released_roundtrip(tmp_path):
    vr = _load_script()
    from audiossl_tpu.models.atst import frame_ast_tiny
    from audiossl_tpu.training.checkpoint import save_params

    enc = frame_ast_tiny(spec_w=1001)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 1001)),
                      length=jnp.asarray([1001]),
                      deterministic=True)["params"]
    ckpt = str(tmp_path / "enc")
    save_params(ckpt, params)

    wav_path = str(tmp_path / "clip.wav")
    rng = np.random.RandomState(0)
    wavfile.write(wav_path, 16000,
                  (rng.randn(32000) * 3000).astype(np.int16))

    out = str(tmp_path / "ours.npz")
    rc = vr.main(["--ckpt", ckpt, "--arch", "tiny", "--wav", wav_path,
                  "--out", out])
    assert rc == 0 and os.path.exists(out)

    # self-comparison: our record used as golden -> exact match
    rc = vr.main(["--ckpt", ckpt, "--arch", "tiny", "--wav", wav_path,
                  "--golden", out])
    assert rc == 0

    # perturbed golden -> failure exit
    g = dict(np.load(out))
    g["scene"] = g["scene"] + 0.01
    bad = str(tmp_path / "bad.npz")
    np.savez(bad, **g)
    rc = vr.main(["--ckpt", ckpt, "--arch", "tiny", "--wav", wav_path,
                  "--golden", bad])
    assert rc == 1


def test_print_torch_recipe(capsys):
    vr = _load_script()
    assert vr.main(["--print-torch-recipe"]) == 0
    out = capsys.readouterr().out
    assert "get_scene_embedding" in out and "np.savez" in out


def test_probe_mode_scores_against_expectation(monkeypatch, capsys):
    """probe mode drives the train_freeze CLI and gates on the score
    difference (linear-probe parity staging, BASELINE.json configs
    1/2). The driver itself is mocked — its end-to-end behavior has
    its own tests (test_e2e_probe.py)."""
    vr = _load_script()
    from audiossl_tpu.downstream import train_freeze

    seen = {}

    def fake_main(argv):
        seen["argv"] = argv
        return {"test": 0.953}

    monkeypatch.setattr(train_freeze, "main", fake_main)
    base = ["probe", "--ckpt", "c", "--dataset_name", "spcv2",
            "--data_path", "d", "--model_type", "clip",
            "--arch", "small", "--tol", "0.01"]
    assert vr.main(base + ["--expect", "0.958"]) == 0
    assert "--dataset_name" in seen["argv"]
    assert vr.main(base + ["--expect", "0.90"]) == 1
