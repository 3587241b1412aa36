"""TRUE multi-process SPMD test: two real ``jax.distributed`` CPU
processes (2 virtual devices each -> a 4-device global mesh) run the
tiny ATST-Frame pretrain loop with per-process sharded input and must
reproduce the single-process loss trajectory exactly.

This is the executable counterpart of the reference's daily multi-GPU
DDP runs (reference methods/atst/train.py:19, SURVEY §2.8): the unit
tests already prove the loader-shard union equals the global stream;
here the full path — init_multihost env contract, global mesh over
non-addressable devices, jax.make_array_from_process_local_data,
jitted step with cross-process collectives — actually executes as
separate OS processes.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multiprocess_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(tmp_path, mode, nproc=2):
    """Spawn nproc jax.distributed CPU workers, return their records."""
    port = _free_port()
    env_base = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
        JAX_NUM_PROCESSES=str(nproc),
        # a black-holing axon tunnel must not stall worker startup
        PALLAS_AXON_POOL_IPS="",
    )
    procs, outs = [], []
    for pid in range(nproc):
        out = str(tmp_path / f"{mode}_proc{pid}.json")
        outs.append(out)
        env = dict(env_base, JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, out, mode], env=env, cwd=HERE,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    results = [json.load(open(o)) for o in outs]
    for r in results:
        assert r["process_count"] == nproc
        assert r["local_devices"] == 2 and r["global_devices"] == 4
    return results


@pytest.mark.slow
def test_two_process_pretrain_matches_single_process(tmp_path):
    nproc = 2
    results = _run_workers(tmp_path, "pretrain", nproc)
    # SPMD: every process computes the identical global loss sequence
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=0, atol=0)

    # single-process reference on a 4-device mesh over the same global
    # batches: multi-process sharding must not change the math
    from audiossl_tpu.parallel.mesh import data_mesh
    from tests.multiprocess_worker import STEPS, run_steps

    mesh = data_mesh(4)
    ref = run_steps(mesh, process_index=0, process_count=1)
    assert len(ref) == STEPS == len(results[0]["losses"])
    np.testing.assert_allclose(results[0]["losses"], ref,
                               rtol=0, atol=5e-6)


@pytest.mark.slow
def test_two_process_downstream_matches_single_process(tmp_path):
    """The lifted multi-host downstream path (downstream_spmd under
    process_count=2): full-batch loaders per process, train batches
    sliced per process into globally-sharded arrays, eval replicated —
    the trajectory AND the eval logits must match a plain
    single-process run (reference: multi-GPU DDP finetune,
    downstream/train_finetune.py:125)."""
    import jax

    results = _run_workers(tmp_path, "downstream")
    # SPMD: identical losses and identical (addressable) eval logits
    # on every process
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=0, atol=0)
    np.testing.assert_allclose(results[0]["logits"], results[1]["logits"],
                               rtol=0, atol=0)

    # single-process unsharded reference over the same global batches
    from tests.multiprocess_worker import STEPS, downstream_setup

    task, state, batch = downstream_setup()
    step = jax.jit(task.make_train_step(), donate_argnums=0)
    evaluate = jax.jit(task.make_eval_fn())
    ref_losses = []
    for _ in range(STEPS):
        state, metrics = step(state, batch)
        ref_losses.append(float(metrics["loss"]))
    ref_logits = np.asarray(evaluate(state, batch))
    np.testing.assert_allclose(results[0]["losses"], ref_losses,
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(results[0]["logits"]),
                               ref_logits, rtol=0, atol=2e-4)
