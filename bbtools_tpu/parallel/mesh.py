"""Device mesh construction and sharding policies.

The reference's parallelism inventory (SURVEY.md §2.6) maps onto two mesh
axes here:

  dp — read-batch data parallelism (the reference's N worker threads
       pulling ListNum batches, shared/Shared.java:113); batches shard
       across devices on the read axis, per-device stats merge via psum.
  tp — hash-shard parallelism (the reference's kmer%WAYS table shards,
       kmer/KmerTableSet.java:273); the k-mer index shards across devices
       by key routing, lookups combine via psum (a miss contributes 0 and
       exactly one shard can hit).

Single-host multi-chip uses one Mesh over jax.devices(); multi-host extends
the same axes over jax.distributed — per-host FASTQ shards feed the dp
axis locally so input never crosses hosts (SURVEY.md §5.8 design).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: int | None = None, n_tp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh. Defaults to all devices on the dp axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_dp is None:
        n_dp = n // n_tp
    if n_dp * n_tp != n:
        raise ValueError(f"{n_dp}x{n_tp} mesh does not cover {n} devices")
    arr = np.asarray(devices).reshape(n_dp, n_tp)
    return Mesh(arr, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Reads shard across dp, replicate across tp."""
    return NamedSharding(mesh, P("dp", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def table_sharding(mesh: Mesh) -> NamedSharding:
    """Index shards across tp (leading shard axis), replicate across dp."""
    return NamedSharding(mesh, P("tp", None))
