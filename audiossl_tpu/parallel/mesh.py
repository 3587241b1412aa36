"""Device mesh + sharding helpers (the SPMD replacement for DDP).

The reference's only parallelism is Lightning DDP over NCCL (reference
``methods/atst/train.py:19``, SURVEY.md §2.8): per-GPU processes, ring
all-reduce of gradients, DistributedSampler batch splitting. The
TPU-native equivalent is one SPMD program over a ``jax.sharding.Mesh``:

* batch arrays sharded over the ``data`` axis (ICI within a slice);
* parameters/optimizer state replicated;
* gradient mean, BYOL variance stats, sync-BN statistics and metric
  gathers all become plain global reductions inside ``jit`` — XLA
  inserts the collectives (psum/all-gather) automatically.

Models here are <=90M params, so data parallelism saturates; the mesh
is 1-D by default but helpers accept any axis layout for larger runs.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(force: bool = False) -> bool:
    """Initialize the JAX distributed runtime for pod-slice runs.

    Must run before any other JAX API touches the backend. On Cloud
    TPU pod slices ``jax.distributed.initialize()`` auto-discovers the
    coordinator and process ranks from the TPU metadata; elsewhere the
    standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID) configure it explicitly.

    No-op (returns False) unless ``force`` or one of those signals is
    present, so single-chip runs and CPU tests never pay the
    coordinator handshake. Idempotent: a second call is a no-op.

    This is the missing bootstrap for the per-host input sharding
    machinery (``shard_batch_multiprocess``,
    ``BatchLoader(process_index=)``) — without it
    ``jax.process_count()`` is always 1.
    """
    import os

    if jax.distributed.is_initialized():  # idempotent
        return True
    want = force or os.environ.get("JAX_COORDINATOR_ADDRESS") \
        or os.environ.get("AUDIOSSL_MULTIHOST", "") not in ("", "0")
    if not want:
        return False
    # jax.distributed.initialize() reads JAX_COORDINATOR_ADDRESS itself
    # but num_processes/process_id only come from cluster auto-detection
    # (SLURM/OpenMPI/TPU metadata) — for plain-env launches (tests,
    # bare-metal pods) pass them through explicitly.
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if (nproc is None) != (pid is None):
        missing = "JAX_PROCESS_ID" if pid is None else "JAX_NUM_PROCESSES"
        present = "JAX_NUM_PROCESSES" if pid is None else "JAX_PROCESS_ID"
        raise RuntimeError(
            f"init_multihost: {present} is set but {missing} is not — "
            "set both (explicit plain-env launch) or neither (cluster "
            "auto-detection)")
    jax.distributed.initialize(
        num_processes=int(nproc) if nproc is not None else None,
        process_id=int(pid) if pid is not None else None)
    return True


def data_mesh(n_devices: Optional[int] = None, axis_name: str = "data",
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """device_put every leaf with its batch axis sharded over `axis_name`."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_opt_state_tree(mesh: Mesh, tree, axis_name: str = "data"):
    """ZeRO-1-style optimizer-state sharding: every array leaf whose
    leading axis divides the mesh axis is sharded over it; the rest
    stay replicated.

    Under jit-SPMD this is the whole implementation: the Adam moment
    updates run sharded (elementwise ops follow their operands'
    shardings) and XLA inserts ONE all-gather of the parameter update
    per step — the ZeRO-1 communication pattern — while m/v memory
    drops by the mesh size. Use for base/large models at large batch
    (SURVEY §2.8 TPU mapping; the reference has no equivalent — DDP
    replicates optimizer state)."""
    n = mesh.shape[axis_name]

    def put(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % n == 0 \
                and x.shape[0] >= n:
            spec = P(axis_name, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def shard_batch_multiprocess(mesh: Mesh, tree, axis_name: str = "data"):
    """Assemble a GLOBAL batch from per-process local shards.

    Each process passes only its own rows (its contiguous slice of the
    global batch, as produced by ``BatchLoader(process_index=...)``);
    the returned arrays are globally sharded over `axis_name` without
    any cross-host data movement (per-host sharded input, SURVEY §2.8
    TPU mapping — the reference ships one DataLoader per DDP rank).
    Falls back to shard_batch in single-process runs so the two paths
    share call sites.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, tree, axis_name)
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        tree)


def replicate_tree(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def global_batch_size(per_device: int, mesh: Mesh, axis_name: str = "data"
                      ) -> int:
    return per_device * mesh.shape[axis_name]


_warned_unsharded = False


def maybe_shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """shard_batch when every array leaf's leading axis divides the
    mesh axis; otherwise return the tree unchanged (replicated inputs
    are correct under jit-SPMD, just not distributed — the ragged final
    eval batch takes this path). The first fallback on a >1-device
    mesh prints a warning so a systematically non-divisible batch size
    (which would silently serialize the whole run) is visible."""
    global _warned_unsharded
    n = mesh.shape[axis_name]
    ok = all(getattr(x, "ndim", 0) >= 1 and x.shape[0] % n == 0
             for x in jax.tree.leaves(tree))
    if not ok and n > 1 and not _warned_unsharded:
        _warned_unsharded = True
        shapes = [getattr(x, "shape", None)
                  for x in jax.tree.leaves(tree)]
        print(f"[parallel] batch leading dims {shapes} not divisible "
              f"by {n} devices - running this (and similar) batches "
              "REPLICATED; pick a batch size divisible by the device "
              "count for data-parallel speedup", flush=True)
    return shard_batch_multiprocess(mesh, tree, axis_name) if ok else tree


class DownstreamParallel:
    """Return value of :func:`downstream_spmd`. Iterable as the legacy
    ``(mesh, state, shard)`` triple; multi-process drivers additionally
    use ``shard_eval`` (replicated eval batches whose jit outputs stay
    host-addressable) and ``is_main`` (guard file writes)."""

    def __init__(self, mesh, state, shard, shard_eval=None, is_main=True):
        self.mesh = mesh
        self.state = state
        self.shard = shard
        self.shard_eval = shard_eval if shard_eval is not None else shard
        self.is_main = is_main

    def __iter__(self):
        return iter((self.mesh, self.state, self.shard))


def _replicate_tree_multiprocess(mesh: Mesh, tree):
    """Replicate host-identical values over a multi-process mesh: for
    P() the process-local data IS the global data, so every process
    passes its full copy. (Values are identical by construction — same
    seeded init on every process, the DDP contract.)"""
    sh = replicated(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(jax.device_get(x))), tree)


def downstream_spmd(state):
    """Data-parallel context for the downstream drivers (the SPMD
    equivalent of the reference's multi-GPU Lightning DDP finetuning,
    e.g. AudioSet finetune at batch 512 over 8 GPUs with
    sync_batchnorm — reference downstream/train_finetune.py:125).

    -> DownstreamParallel (unpacks as ``mesh, state, shard``). With one
    device everything is a passthrough; with N devices the train state
    is replicated and shard_fn shards global batches over the data
    axis — gradient means, BatchNorm statistics and metric reductions
    become global reductions inserted by XLA, reproducing DDP+sync-BN
    semantics with no code change in the task.

    Multi-process (``jax.distributed`` initialized, process_count > 1):
    every process keeps its FULL-batch loader — downstream datasets are
    small and the host does only IO+pad, so duplicating that per host
    is cheap (pretraining, the IO-heavy path, uses true per-host
    sharded loaders instead: ``BatchLoader(process_index=)``). Each
    process slices its contiguous rows out of the (identically seeded,
    hence identical) global batch and ``shard`` assembles the global
    sharded array with zero cross-host data movement; train batches
    whose leading dim does not divide the global device count fall
    back to replicated, like ``maybe_shard_batch``. ``shard_eval``
    replicates eval batches so jitted eval outputs are fully
    replicated and therefore addressable on every host (metrics are
    then computed identically everywhere — no gather needed)."""
    nproc = jax.process_count()
    if nproc > 1:
        mesh = data_mesh()  # all global devices
        ndev = mesh.shape["data"]
        pid = jax.process_index()
        state = _replicate_tree_multiprocess(mesh, state)
        data_sh = batch_sharding(mesh)
        repl_sh = replicated(mesh)

        def shard(tree):
            leaves = jax.tree.leaves(tree)
            ok = all(getattr(x, "ndim", 0) >= 1 and x.shape[0] % ndev == 0
                     for x in leaves)
            if not ok:
                return jax.tree.map(
                    lambda x: jax.make_array_from_process_local_data(
                        repl_sh, np.asarray(x)), tree)

            # Rows this process owns = the mesh positions of its
            # addressable devices (in ascending global order, which is
            # the layout make_array_from_process_local_data expects).
            # Derived rather than assumed pid-contiguous: device order
            # in a mesh can interleave processes.
            my_pos = [i for i, d in enumerate(mesh.devices.flat)
                      if d.process_index == pid]

            def put(x):
                x = np.asarray(x)
                per = x.shape[0] // ndev
                rows = np.concatenate(
                    [np.arange(i * per, (i + 1) * per) for i in my_pos])
                return jax.make_array_from_process_local_data(
                    data_sh, np.ascontiguousarray(x[rows]))

            return jax.tree.map(put, tree)

        def shard_eval(tree):
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    repl_sh, np.asarray(x)), tree)

        return DownstreamParallel(mesh, state, shard, shard_eval,
                                  is_main=pid == 0)
    mesh = data_mesh(devices=jax.local_devices())
    if mesh.shape["data"] == 1:
        return DownstreamParallel(mesh, state, lambda b: b)
    state = replicate_tree(mesh, state)
    return DownstreamParallel(mesh, state,
                              lambda b: maybe_shard_batch(mesh, b))
