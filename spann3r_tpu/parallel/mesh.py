"""Device mesh + sharding helpers.

The reference scales with DDP over NCCL (spann3r/training.py:322-325,
croco/utils/misc.py:222-259).  TPU-native equivalent: a jax.sharding.Mesh
with a 'data' axis (and an optional 'model' axis for tensor-parallel weight
sharding of the large MLP/attention matrices), batch-sharded inputs, and XLA
emitting the gradient all-reduces over ICI.

Multi-host: call `init_distributed()` once per process; samplers shard by
`jax.process_index()` exactly like the reference's rank slicing.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed() -> None:
    """Initialize JAX's multi-host runtime when launched across hosts."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1:
        jax.distributed.initialize()


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """('data', 'model') mesh; model=1 gives pure data parallelism."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def make_mesh_for_batch(batch_size: int, model: int = 1,
                        devices: Optional[Sequence] = None) -> Mesh:
    """Mesh whose 'data' axis divides batch_size (uses a device subset when
    the per-host batch is smaller than the device count)."""
    devices = list(devices if devices is not None else jax.devices())
    avail = len(devices) // model
    data = max(d for d in range(1, avail + 1) if batch_size % d == 0)
    return make_mesh(data=data, model=model, devices=devices[:data * model])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the batch axis of (T, B, ...) arrays over 'data'."""
    return NamedSharding(mesh, P(None, "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params, min_dim: int = 1024,
                   fsdp: bool = False):
    """Shard large 2-D+ weights over the 'model' axis (last dim), replicate
    the rest.  With model=1 this is full replication (pure DP).  `min_dim`
    sets the smallest dim worth sharding (lower it to shard more; tests use
    small values so tiny models still exercise the tp path).

    `fsdp=True` additionally shards the second-to-last dim of large weights
    over the 'data' axis (ZeRO-3-style fully-sharded data parallelism: each
    data rank stores 1/N of every big weight + its Adam moments; XLA inserts
    the per-layer all-gathers in forward/backward and reduce-scatters the
    grads).  Composes with tp: a stacked (L, in, out) scan weight becomes
    P(None, 'data', 'model').  The reference has no analogue (its scaling
    story is DDP with fully replicated params, spann3r/training.py:322-325).
    """
    model_n = mesh.shape["model"]
    data_n = mesh.shape["data"]

    def spec(x):
        axes = [None] * x.ndim
        if model_n > 1 and x.ndim >= 2 and x.shape[-1] % model_n == 0 \
                and x.shape[-1] >= min_dim:
            axes[-1] = "model"
        if fsdp and data_n > 1 and x.ndim >= 2 \
                and x.shape[-2] % data_n == 0 and x.shape[-2] >= min_dim:
            axes[-2] = "data"
        if not any(axes):
            return NamedSharding(mesh, P())  # replicated, comparable to P()
        return NamedSharding(mesh, P(*axes))

    return jax.tree.map(spec, params)


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the data axis sharded.

    Multi-process: each process's loader yields its RANK-LOCAL batch (the
    sampler shards by process_index), so the local array is one shard of
    the global batch — assemble it with make_array_from_process_local_data.
    A plain device_put would silently treat each rank's local batch as the
    whole global batch (found by tests/test_multiprocess.py)."""
    sh = batch_sharding(mesh)
    multiproc = jax.process_count() > 1

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 2:
            if multiproc:
                return jax.make_array_from_process_local_data(sh, x)
            return jax.device_put(x, sh)
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(put, batch)
