"""Multi-host wiring: jax.distributed initialization + global mesh.

The reference's distributed story is MPI scaffolding that never shipped
(SURVEY.md §2.6). Here the design is jax-native: each host runs the same
program, `initialize()` joins the cluster (jax.distributed), and
`global_mesh()` lays a (dp, tp) mesh over ALL devices so the shard_map
pipelines in parallel/sharded_index.py run unchanged — XLA routes psum
over ICI within a host and DCN across hosts.

On a single host (this dev environment) `initialize()` is a no-op and
the mesh covers local devices, so every code path is exercised by the
virtual-device tests; multi-host runs only change the environment
variables, not the program.
"""

from __future__ import annotations

import os


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Join a multi-host cluster. Arguments default from env
    (JAX_COORDINATOR, JAX_NUM_PROCESSES, JAX_PROCESS_ID); returns True
    if distributed mode was entered, False for single-host."""
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if not coordinator or num_processes <= 1:
        return False
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return True  # already joined (idempotent re-entry)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(tp: int | None = None):
    """(dp, tp) mesh over all devices (local + remote). tp defaults to
    the per-host device count so tensor-parallel collectives stay on ICI
    and only the dp axis crosses DCN."""
    import jax
    from jax.sharding import Mesh
    import numpy as np

    devs = np.array(jax.devices())
    n = len(devs)
    if tp is None:
        tp = max(1, jax.local_device_count())
    tp = min(tp, n)
    while n % tp:
        tp -= 1
    return Mesh(devs.reshape(n // tp, tp), ("dp", "tp"))
