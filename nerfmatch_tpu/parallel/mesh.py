"""Mesh + sharding utilities.

The reference scales with PL DDP over NCCL (``nerf_trainer.py:355-362``);
here parallelism is expressed as data layout: a ``jax.sharding.Mesh`` over
the chips with named axes, batch arrays sharded over the ``data`` axis and
params replicated (optionally tensor-sharded over ``model``).  One jitted
train step over sharded inputs compiles to a single SPMD program — XLA
inserts the gradient all-reduce over ICI where DDP used NCCL hooks.

Axes:
  * ``data``  — batch/ray axis (pure DP, the reference's only parallelism);
  * ``model`` — optional second axis for tensor-sharding wide layers (the
    NeRF MLP hidden dim / attention heads) on larger meshes.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard dim 0 over 'data'; remaining dims replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a dict of host arrays onto the mesh, batch-dim sharded.

    Single-process: ``batch`` holds the GLOBAL batch and is device_put
    sharded.  Multi-process (multi-host mesh): ``batch`` holds this
    process's LOCAL row block (see ``parallel.distributed.local_slice``);
    the global ``jax.Array`` is assembled from the per-process shards
    without any cross-host data movement.
    """
    multiproc = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        arr = np.asarray(v)
        if arr.dtype.kind not in "fiub" or arr.ndim == 0:
            out[k] = v  # strings / objects / scalars stay host-side
            continue
        sharding = data_sharding(mesh, arr.ndim)
        if multiproc:
            out[k] = jax.make_array_from_process_local_data(sharding, arr)
        else:
            out[k] = jax.device_put(arr, sharding)
    return out


def replicate_params(params, mesh: Mesh):
    return jax.device_put(params, replicated(mesh))


def all_gather_host(values):
    """Gather per-host metric lists (single-process: identity; multi-host:
    jax.experimental.multihost_utils).  Mirrors the reference's
    all_gather_object val-metric gather (``nerf_trainer.py:190-198``)."""
    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(values))
    return list(np.asarray(gathered).reshape(-1))
