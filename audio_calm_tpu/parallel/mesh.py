"""Device mesh + sharding rules.

The reference's distributed runtime is torchrun DDP + DeepSpeed ZeRO-2 over
NCCL (train_calm.sh:13, ds_config.json:31-41). The TPU-native equivalent is
declarative: a 1-D "data" mesh over ICI, batch sharded on it, optimizer state
ZeRO-sharded on it, and XLA emits the all-reduce / reduce-scatter /
all-gather collectives (with latency-hiding overlap) that DeepSpeed
hand-schedules with buckets.

An optional "model" axis is reserved for tensor parallelism (the reference
has none; sequence budget <= ~500 tokens makes one chip per replica ample).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed_from_env() -> None:
    """jax.distributed.initialize with explicit env fallbacks.

    Argless initialize() only autodetects managed clusters (SLURM / TPU pod
    metadata). For hand-launched multi-host runs (the reference's torchrun
    analogue), read JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID and pass them explicitly.
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr and os.environ.get("JAX_NUM_PROCESSES"):
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    else:
        jax.distributed.initialize()


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh; data defaults to all devices / model."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_host_batch(batch, mesh: Mesh):
    """Assemble per-process batch shards into global jax.Arrays sharded on
    the "data" axis (multi-host data path; single-process it is equivalent
    to a device_put onto the batch sharding).

    Each process passes ONLY its local rows (global_batch/process_count);
    jax.make_array_from_process_local_data stitches them into one global
    array without any cross-host transfer — the TPU-native replacement for
    the reference's per-rank DistributedSampler + NCCL DDP feed.
    """
    sh = batch_sharding(mesh)
    return {
        k: jax.make_array_from_process_local_data(sh, np.asarray(v))
        for k, v in batch.items()
    }


def zero_leaf_spec(mesh: Mesh, leaf, min_size: int = 2**14) -> NamedSharding:
    """ZeRO sharding for one optimizer-state leaf: shard the largest
    data-axis-divisible dim; replicate scalars / small / odd shapes."""
    n = mesh.shape["data"]
    if not hasattr(leaf, "shape") or leaf.ndim == 0 or leaf.size < min_size:
        return NamedSharding(mesh, P())
    dims = list(leaf.shape)
    best = int(np.argmax(dims))
    if dims[best] % n == 0:
        pspec = [None] * leaf.ndim
        pspec[best] = "data"
        return NamedSharding(mesh, P(*pspec))
    return NamedSharding(mesh, P())


def zero_sharding(mesh: Mesh, pytree, min_size: int = 2**14):
    """ZeRO-style sharding spec for an optimizer-state pytree.

    Each array leaf whose largest dimension is divisible by the data-axis
    size (and big enough to be worth scattering) is sharded on that dim;
    everything else is replicated. Declaring this on the optimizer state
    makes XLA reduce-scatter gradients and all-gather updated params —
    DeepSpeed ZeRO-2 semantics from sharding annotations alone
    (SURVEY.md §2.6).
    """
    return jax.tree_util.tree_map(
        lambda leaf: zero_leaf_spec(mesh, leaf, min_size), pytree
    )
