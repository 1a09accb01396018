"""Multi-host (multi-process) mesh wiring.

The reference scales across hosts with ``torchrun --nproc_per_node=8`` + PL
DDP over NCCL (``model_train/README.md:10-13``, ``nerf_trainer.py:355-362``).
The TPU-native equivalent: every host process calls
``jax.distributed.initialize``, after which ``jax.devices()`` spans ALL
hosts' chips, one ``Mesh`` is laid over them, and the same jitted SPMD step
runs on every process — XLA routes the gradient ``psum`` over ICI within a
slice and DCN across slices.  No per-rank code paths are needed; the only
process-dependent pieces are (a) which slice of each global batch a process
loads (``data/loaders.py``/``ray_batches`` local slicing) and (b) global
array assembly from per-process shards (``mesh.shard_batch``).

Launch contract (instead of torchrun):

* **TPU pods**: run the same CLI on every worker; ``initialize()``
  auto-discovers the coordinator from the TPU metadata — no env needed.
* **Explicit / CPU testing**: set ``NERFMATCH_COORDINATOR=host:port``,
  ``NERFMATCH_NUM_PROCESSES``, ``NERFMATCH_PROCESS_ID``.
"""

from __future__ import annotations

import os

_ENV_COORD = "NERFMATCH_COORDINATOR"
_ENV_NPROC = "NERFMATCH_NUM_PROCESSES"
_ENV_PID = "NERFMATCH_PROCESS_ID"


def maybe_initialize_distributed(env=None) -> tuple[int, int]:
    """Initialize ``jax.distributed`` when a multi-process launch is
    configured; no-op (returns (0, 1)-style info) otherwise.

    Must run before the first JAX backend use in the process (the CLIs call
    it first thing in ``main``).  Returns ``(process_index, process_count)``.
    """
    import jax

    env = os.environ if env is None else env
    coord = env.get(_ENV_COORD)
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(env[_ENV_NPROC]),
            process_id=int(env[_ENV_PID]),
        )
    elif len(env.get("TPU_WORKER_HOSTNAMES", "").split(",")) > 1:
        # Multi-worker TPU pod (hostname list has >1 entry — single-host
        # runtimes also export the var): coordinator/count/id come from
        # the TPU metadata.
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def process_info() -> tuple[int, int]:
    """(process_index, process_count) of the running (possibly
    uninitialized-single) process."""
    import jax

    return jax.process_index(), jax.process_count()


def local_slice(global_batch: int, pid: int | None = None,
                pcount: int | None = None) -> slice:
    """Contiguous rows of a size-``global_batch`` batch owned by this
    process.

    Mesh devices are laid out in ``jax.devices()`` order, which groups
    devices of one process contiguously, so with ``P('data')`` sharding a
    process owns a contiguous row block.  ``global_batch`` must divide by
    the process count (train loaders drop the remainder).
    """
    if pid is None or pcount is None:
        pid, pcount = process_info()
    assert global_batch % pcount == 0, \
        f"global batch {global_batch} % processes {pcount} != 0"
    per = global_batch // pcount
    return slice(pid * per, (pid + 1) * per)
