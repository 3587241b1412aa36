"""Pretraining run loop: data -> sharded step -> logging -> checkpoints.

Replaces the Lightning Trainer of the reference (``methods/atst/
train.py:11-49``): one Python loop around the jitted SPMD step, with
TensorBoard-compatible logging (tensorboardX), periodic orbax
checkpoints and crash-restart auto-resume. No process groups: the mesh
is the parallelism.
"""
from __future__ import annotations

import threading
import time
from typing import Optional

import jax
import numpy as np

from audiossl_tpu.datasets.pipeline import BatchLoader
from audiossl_tpu.parallel import data_mesh, replicate_tree
from audiossl_tpu.parallel.mesh import (shard_batch_multiprocess,
                                        shard_opt_state_tree)
from audiossl_tpu.training.checkpoint import CheckpointManager


class MetricLogger:
    def __init__(self, save_path: Optional[str]):
        self._tb = None
        if save_path:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(save_path)
            except ImportError:
                pass

    def log(self, step: int, metrics: dict):
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self):
        if self._tb is not None:
            self._tb.close()


def run_pretraining(method, dataset, *, batch_size_per_device: int,
                    max_steps: int, save_path: Optional[str] = None,
                    ckpt_interval: int = 5000, log_interval: int = 50,
                    seed: int = 0, n_devices: Optional[int] = None,
                    loader_threads: int = 8,
                    clip_len_s: Optional[float] = None,
                    profile_at: Optional[int] = None,
                    profile_steps: int = 10,
                    shard_optimizer: bool = False):
    """Train `method` (ClipMethod / FrameMethod) on `dataset` until
    max_steps. Returns the final PretrainState.

    profile_at: capture a jax.profiler trace (to {save_path}/profile)
    for `profile_steps` steps starting at that step count.

    On pod slices (jax.process_count() > 1) each host reads only its
    shard of every global batch and the arrays are assembled with
    jax.make_array_from_process_local_data — no cross-host input
    traffic (SURVEY §2.8).

    shard_optimizer=True shards the Adam moments over the data axis
    (ZeRO-1): m/v memory drops by the mesh size at the cost of one
    parameter-update all-gather per step."""
    mesh = data_mesh(n_devices)
    n_dev = mesh.shape["data"]
    global_bs = batch_size_per_device * n_dev
    proc_idx, proc_cnt = jax.process_index(), jax.process_count()

    state = method.init_state(jax.random.PRNGKey(seed))
    mgr = None
    if save_path:
        mgr = CheckpointManager(f"{save_path}/ckpt",
                                save_interval_steps=ckpt_interval)
        restored = mgr.restore_latest(state)
        if restored is not None:
            state = restored
            print(f"resumed from step {int(state.step)}")
    state = replicate_tree(mesh, state)
    if shard_optimizer:
        state = state._replace(
            opt_state=shard_opt_state_tree(mesh, state.opt_state))

    step_fn = jax.jit(method.make_step(), donate_argnums=0)
    logger = MetricLogger(save_path)

    # the host buffer must cover the full clip (AudioSet clips are 10 s)
    # so the on-device random crop sees all of it — not just the crop
    # width (the reference crops the full waveform, transform.py:50-60)
    if clip_len_s is not None:
        pad = max(int(clip_len_s * 16000), method.cfg.out_samples)
    else:
        pad = max(10 * 16000, method.cfg.out_samples)
    step = int(jax.device_get(state.step))
    epoch = 0
    t0 = time.perf_counter()
    done = False

    # int16 host->device emit (half the batch bytes; the step
    # dequantizes on device with the identical /32768 scale —
    # transforms.augment.wav_to_f32) whenever the pack stores int16;
    # AUDIOSSL_WAV_I16=0 forces the float32 path
    import os as _os

    wav_dtype = np.float32
    try:
        from audiossl_tpu.datasets.packed import PackedAudioDataset

        if (isinstance(dataset, PackedAudioDataset)
                and _os.environ.get("AUDIOSSL_WAV_I16", "1") != "0"
                and dataset.reader.all_int16()):
            wav_dtype = np.int16
    except Exception:
        pass

    def make_loader(epoch):
        # prefer the native C++ batched reader for packed datasets
        try:
            from audiossl_tpu.datasets.native import (
                NativeBatchLoader,
                get_lib,
            )
            from audiossl_tpu.datasets.packed import PackedAudioDataset

            if proc_cnt == 1 and isinstance(dataset, PackedAudioDataset) \
                    and get_lib() is not None:
                return NativeBatchLoader(
                    dataset, global_bs, pad_samples=pad, shuffle=True,
                    seed=seed, epoch=epoch, n_threads=loader_threads,
                    wav_dtype=wav_dtype)
        except Exception:
            pass
        return BatchLoader(dataset, global_bs, pad_samples=pad,
                           shuffle=True, seed=seed, epoch=epoch,
                           num_threads=loader_threads,
                           include_labels=False,
                           process_index=proc_idx,
                           process_count=proc_cnt,
                           wav_dtype=wav_dtype)

    profiling = False
    _save_thread = [None]
    _save_error = [None]

    def _bg_save(step_, host_state_):
        try:
            mgr.save(step_, host_state_)
        except BaseException as e:  # surfaced at the next join point
            _save_error[0] = e

    def _join_save():
        if _save_thread[0] is not None:
            _save_thread[0].join()
            _save_thread[0] = None
        if _save_error[0] is not None:
            raise _save_error[0]

    while not done:
        loader = make_loader(epoch)
        for batch in loader:
            batch = shard_batch_multiprocess(mesh, batch)
            if profile_at is not None and step == profile_at:
                jax.profiler.start_trace(
                    f"{save_path or '.'}/profile")
                profiling = True
            state, metrics = step_fn(state, batch)
            step += 1
            if profiling and step >= profile_at + profile_steps:
                jax.block_until_ready(state)
                jax.profiler.stop_trace()
                profiling = False
                print(f"profile trace written to "
                      f"{save_path or '.'}/profile", flush=True)
            if step % log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t0
                m["clips_per_sec"] = global_bs * log_interval / dt
                t0 = time.perf_counter()
                logger.log(step, m)
                print(f"step {step} " + " ".join(
                    f"{k}={v:.5g}" for k, v in sorted(m.items())),
                    flush=True)
            if mgr is not None and step % ckpt_interval == 0:
                # device_get only when actually saving — pulling the
                # full state to host every step would dominate. The
                # host copy is synchronous (it must complete before the
                # donated buffers are reused next step); the orbax
                # WRITE then runs on a background thread so serialization
                # and disk IO overlap subsequent steps.
                host_state = jax.device_get(state)
                _join_save()  # also raises a failed previous save
                th = threading.Thread(target=_bg_save,
                                      args=(step, host_state))
                th.start()
                _save_thread[0] = th
            if step >= max_steps:
                done = True
                break
        epoch += 1
    _join_save()
    if mgr is not None:
        mgr.save(step, jax.device_get(state), force=True)
        mgr.wait()
        mgr.close()
    logger.close()
    return state
