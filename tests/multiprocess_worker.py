"""Worker for the TRUE multi-process SPMD test (not a test module).

Launched by tests/test_multiprocess.py as N separate Python processes,
each with 2 virtual CPU devices; they rendezvous through
``jax.distributed`` on a localhost coordinator and run a real tiny
ATST-Frame pretrain step loop with per-process sharded input
(``BatchLoader(process_index=)`` + ``shard_batch_multiprocess``) —
the exact code path a pod-slice run takes (parallel/mesh.py,
training/runner.py). The reference exercises the analogous path with
Lightning DDP process groups (reference methods/atst/train.py:19).

Usage: python multiprocess_worker.py <out_json>
(rank/size/coordinator come from JAX_PROCESS_ID / JAX_NUM_PROCESSES /
JAX_COORDINATOR_ADDRESS, the same env contract init_multihost serves.)
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SAMPLES = 8000          # 0.5 s at 16 kHz
GLOBAL_BATCH = 8
STEPS = 3


class SyntheticWavDataset:
    """Deterministic index -> waveform map shared by all processes."""

    def __init__(self, n: int = 32):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(1000 + i)
        return rng.randn(SAMPLES).astype(np.float32) * 0.1, 0


def tiny_method():
    from audiossl_tpu.methods.atstframe.method import (
        FrameMethod,
        FramePretrainConfig,
    )
    from audiossl_tpu.models.atst import AudioTransformer
    from audiossl_tpu.training.pretrain import Branch, OptimizerConfig

    cfg = FramePretrainConfig(
        arch="small", anchor_len=0.5,
        optimizer=OptimizerConfig(max_steps=10, warmup_steps=2,
                                  learning_rate=1e-3))
    m = FrameMethod(cfg)
    enc = AudioTransformer(embed_dim=32, depth=2, num_heads=2, spec_h=64,
                           spec_w=cfg.out_frames, use_cls=False)
    m.student = Branch(encoder=enc, projector="mlp", predictor=True,
                       hidden_dim=64, out_dim=16)
    m.teacher = Branch(encoder=enc, projector="mlp", predictor=False,
                       hidden_dim=64, out_dim=16)
    return m


def run_steps(mesh, process_index: int, process_count: int):
    """The shared train-loop body: per-process loader slice ->
    global-array assembly -> jitted step. Returns per-step losses."""
    import jax

    from audiossl_tpu.datasets.pipeline import BatchLoader
    from audiossl_tpu.parallel.mesh import (replicate_tree,
                                            shard_batch_multiprocess)

    method = tiny_method()
    state = replicate_tree(mesh, method.init_state(jax.random.PRNGKey(0)))
    step_fn = jax.jit(method.make_step(), donate_argnums=0)
    loader = BatchLoader(SyntheticWavDataset(), GLOBAL_BATCH,
                         pad_samples=SAMPLES, shuffle=True, seed=7,
                         num_threads=1, include_labels=False,
                         process_index=process_index,
                         process_count=process_count)
    losses = []
    for i, batch in enumerate(loader):
        if i >= STEPS:
            break
        batch = shard_batch_multiprocess(mesh, batch)
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    return losses


def downstream_setup():
    """Tiny FinetuneTask + deterministic global batch, shared by the
    multi-process workers and the single-process reference run
    (tests/test_multiprocess.py). Mirrors
    test_integration.test_downstream_spmd_matches_single_device."""
    import jax
    import jax.numpy as jnp

    from audiossl_tpu.downstream.finetune import (
        FinetuneConfig,
        FinetuneTask,
    )
    from audiossl_tpu.models.atst import ast_tiny

    enc = ast_tiny(spec_w=1001)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 1001)),
                      length=jnp.asarray([1001]),
                      deterministic=True)["params"]
    cfg = FinetuneConfig(learning_rate=1e-2, max_epochs=1,
                         steps_per_epoch=4, warmup_steps=0,
                         multi_label=False, num_labels=5, n_blocks=2,
                         crop_len_s=1.0, mixup=False, specaug=False,
                         rrc=False)
    task = FinetuneTask(enc, cfg, enc.embed_dim * 2 * 2)
    rng = np.random.RandomState(0)
    batch = {
        "wav": rng.randn(GLOBAL_BATCH, 16000).astype(np.float32) * 0.1,
        "valid": np.full((GLOBAL_BATCH,), 16000, np.int32),
        "label": rng.randint(0, 5, GLOBAL_BATCH),
    }
    state = task.init_state(jax.random.PRNGKey(1), params)
    return task, state, batch


def run_downstream():
    """The full multi-process downstream path (parallel/mesh.py
    downstream_spmd): every process holds the FULL global batch, shard
    slices its contiguous rows into a globally-sharded array, eval runs
    replicated so its outputs are addressable on every host. Returns
    (losses, eval_logits)."""
    import jax

    from audiossl_tpu.parallel.mesh import downstream_spmd

    task, state, batch = downstream_setup()
    par = downstream_spmd(state)
    assert par.mesh.shape["data"] == len(jax.devices())
    step = jax.jit(task.make_train_step(), donate_argnums=0)
    evaluate = jax.jit(task.make_eval_fn())
    state = par.state
    losses = []
    for _ in range(STEPS):
        sb = par.shard(batch)
        assert not sb["wav"].sharding.is_fully_replicated
        state, metrics = step(state, sb)
        losses.append(float(metrics["loss"]))
    logits = np.asarray(evaluate(state, par.shard_eval(batch)))
    return losses, logits


def main():
    out_path = sys.argv[1]
    mode = sys.argv[2] if len(sys.argv) > 2 else "pretrain"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from audiossl_tpu.parallel.mesh import data_mesh, init_multihost

    assert init_multihost(), "env did not trigger distributed init"
    nproc = int(os.environ["JAX_NUM_PROCESSES"])
    assert jax.process_count() == nproc, \
        f"process_count={jax.process_count()} != {nproc}"
    record = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
    }
    if mode == "downstream":
        losses, logits = run_downstream()
        record["losses"] = losses
        record["logits"] = np.asarray(logits, np.float64).tolist()
    else:
        mesh = data_mesh()  # over GLOBAL devices
        record["losses"] = run_steps(mesh, jax.process_index(), nproc)
    with open(out_path, "w") as f:
        json.dump(record, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
