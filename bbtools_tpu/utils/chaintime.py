"""Honest device-kernel timing through a high-latency async harness.

The dev harness reaches the TPU through a tunnel where (a) per-dispatch
round-trip is tens of ms, (b) `jax.block_until_ready` returns at dispatch
acknowledgement, not device completion, and (c) repeated identical
executions can be served from a cache. Any wall-clock timing of N
individual dispatches therefore measures the tunnel, in either
direction: fast kernels read as the ~20 ms dispatch floor (pessimistic),
and un-forced timings read as dispatch cost alone (optimistic).

The one scheme immune to all three effects is the in-graph slope: chain
M kernel invocations inside a single compiled `lax.fori_loop` (zero
per-iteration dispatch), vary the work per iteration so nothing can be
deduplicated, force completion by pulling an accumulated scalar checksum
to the host, and time two different M values — the slope
(t(M2) - t(M1)) / (M2 - M1) cancels compile, dispatch, RTT, and
transfer exactly, leaving pure per-invocation device time.
"""

from __future__ import annotations

import time


def _checksum(out):
    import jax
    import jax.numpy as jnp

    s = jnp.int32(0)
    for leaf in jax.tree_util.tree_leaves(out):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            s = s + jnp.sum(leaf).astype(jnp.int32)
        else:
            s = s + jnp.sum(leaf, dtype=jnp.int32)
    return s


def slope_time(step_fn, m1: int = 8, m2: int = 32, reps: int = 3) -> float:
    """Seconds per invocation of `step_fn`, measured as an in-graph slope.

    step_fn(i) -> pytree of device arrays; `i` is the traced loop index —
    the caller MUST make the computation depend on it (e.g. roll an input
    by `i`) so iterations stay distinct. All invariant operands should be
    captured in the closure as device-resident arrays.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(M):
        def body(i, acc):
            return acc + _checksum(step_fn(i))

        return jax.lax.fori_loop(0, M, body, jnp.int32(0))

    def wall(M):
        t0 = time.perf_counter()
        int(chained(jnp.int32(M)))  # scalar pull forces real completion
        return time.perf_counter() - t0

    wall(2)  # compile + warm
    t1 = min(wall(m1) for _ in range(reps))
    t2 = min(wall(m2) for _ in range(reps))
    return max((t2 - t1) / (m2 - m1), 1e-9)


def rtt_seconds(reps: int = 5) -> float:
    """Scalar-pull round-trip latency of the harness (context figure)."""
    import jax
    import jax.numpy as jnp

    g = jax.jit(lambda x: x + 1)
    x = jnp.float32(1.0)
    float(g(x))
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(x))
        vals.append(time.perf_counter() - t0)
    return min(vals)
