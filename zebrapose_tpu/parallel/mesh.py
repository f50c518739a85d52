"""Device mesh + sharding helpers (replaces torch DDP/NCCL, train_v5.py).

Single-controller JAX data parallelism: parameters replicated, batch
sharded over the 'data' mesh axis. Gradient averaging, BatchNorm batch
statistics and metric means become XLA collectives inserted by GSPMD —
there is no hand-written allreduce anywhere (and the global-batch BN and
true metric means fix the reference's per-replica BN and its sum-vs-mean
metric bug, SURVEY.md §2.7).

Multi-host: call `jax.distributed.initialize()` before `make_mesh()` and
the same code spans hosts over DCN (the reference's --dist-url/--rank
plumbing has no equivalent here by design).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[Any]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any,
                n_processes: Optional[int] = None) -> Any:
    """Place a host batch dict onto the mesh, sharded over devices.

    Single-host: a plain device_put with the batch sharding. Multi-host
    (after jax.distributed.initialize): `batch` is this process's LOCAL
    shard and the global array is assembled across hosts — the
    DistributedSampler equivalent is each host drawing its own slice.

    `n_processes` overrides jax.process_count() so the multi-host
    assembly branch is exercisable in single-process tests (the
    reference's multi-node path was untestable; ours is not).
    """
    sh = batch_sharding(mesh)
    n = jax.process_count() if n_processes is None else n_processes
    if n == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, x), batch)


def local_batch_size(global_batch: int, n_processes: Optional[int] = None
                     ) -> int:
    """Per-process slice of the global batch (DistributedSampler
    equivalent). Requires exact divisibility — a silent floor would
    train on a smaller global batch than configured."""
    n = jax.process_count() if n_processes is None else n_processes
    if n <= 1:
        return global_batch
    if global_batch % n:
        raise ValueError(
            f"batch_size {global_batch} not divisible by process count "
            f"{n}; the global batch must split evenly across hosts")
    return global_batch // n


def validate_batch_partition(global_batch: int, accum_steps: int,
                             world: int,
                             n_processes: Optional[int] = None) -> int:
    """Validate that `global_batch` splits into shardable micro-batches
    and return the per-process micro-batch size.

    Exactly as strict as the mechanism it guards: shard_batch's
    device_put rejects a batch dimension not divisible by the mesh size
    ("global size of its dimension 0 should be divisible by N",
    verified 2026-08-20), and make_array_from_process_local_data needs
    exact per-process shards. Raises a config-level ValueError instead
    of letting the first sharded step fail with the GSPMD message.
    """
    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")
    local = local_batch_size(global_batch, n_processes)
    if local % accum_steps:
        raise ValueError(
            f"local batch {local} not divisible by accum_steps "
            f"{accum_steps}; cfg.batch_size is the EFFECTIVE batch and "
            f"must split evenly into micro-batches")
    local //= accum_steps
    n = jax.process_count() if n_processes is None else n_processes
    local_devices = max(world // max(n, 1), 1)
    if local % local_devices:
        raise ValueError(
            f"micro-batch {local} per process (batch_size "
            f"{global_batch} / accum_steps {accum_steps} / "
            f"{n} processes) not divisible by the "
            f"{local_devices} local mesh devices; batch_size must be a "
            f"multiple of accum_steps * total device count")
    return local


def initialize_multihost(coordinator_address: str = None,
                         num_processes: int = None,
                         process_id: int = None) -> None:
    """Multi-host bring-up (replaces torch dist.init_process_group /
    --dist-url plumbing, train_v5.py:52-53). With TPU pods the arguments
    are auto-detected; pass them explicitly elsewhere."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def scale_for_world(learning_rate: float, total_iteration: int,
                    world_size: int) -> tuple[float, int]:
    """The reference's DDP scaling recipe (train_v5.py:82-91):
    lr *= world_size, iterations //= world_size."""
    return learning_rate * world_size, total_iteration // world_size
