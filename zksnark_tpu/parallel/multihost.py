"""Multi-host runtime entry points.

The reference is a single-process library with no distributed story at all
(SURVEY.md §2 #22); in JAX the multi-host path is standard: every host
runs the SAME program, `jax.distributed.initialize` wires the processes
into one runtime, and `jax.devices()` then spans the whole slice/pod.
Every mesh-based routine in this package (`msm_sharded`,
`ntt_sharded`, `sharded_prove_step`) is written against
`jax.sharding.Mesh` + `shard_map`, so it is multi-host-ready by
construction: build the mesh over `jax.devices()` (all hosts) and keep
per-host data feeding through `jax.make_array_from_process_local_data`.

On a TPU pod slice no coordinator address is needed (the TPU runtime
discovers peers); on CPU/GPU fleets pass coordinator/num/id explicitly or
via the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env
vars this module reads.
"""

from __future__ import annotations

import os
from typing import Optional

_INITIALIZED = False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Join the multi-host runtime (idempotent).

    No-args on TPU pods (auto-discovery); explicit or env-var wiring
    elsewhere.  Must run before the first backend touch in each process.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    import jax

    kwargs = {}
    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord:
        kwargs["coordinator_address"] = coord
    npz = num_processes if num_processes is not None else os.environ.get(
        "JAX_NUM_PROCESSES")
    if npz is not None:
        kwargs["num_processes"] = int(npz)
    pid = process_id if process_id is not None else os.environ.get(
        "JAX_PROCESS_ID")
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True


def global_mesh(axis: str = "shard"):
    """A 1-D mesh over every device of every connected host."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def host_local_slice(n: int) -> slice:
    """The [lo, hi) stripe of a length-n leading axis this process feeds
    when arrays are built with make_array_from_process_local_data over
    `global_mesh()` (equal contiguous stripes per process)."""
    import jax

    per = n // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
