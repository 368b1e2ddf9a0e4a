"""Round-4 queued single-chip experiments on the sorted join:
(a) CHUNK size sweep for join_lookup_jnp at production query counts,
(b) fused short-scan keys (one join over full+short streams) vs two joins.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bbtools_tpu.utils.chaintime import slope_time

B, L = 32768, 151
NQ = B * L
NSHORT = 13 * B * 2   # mink=11..k=23 prefixes+suffixes
NI = 217_135


def report(name, secs):
    print(json.dumps({"exp": name, "ms": round(secs * 1e3, 3)}), flush=True)


def main():
    rng = np.random.default_rng(0)
    ik = jnp.asarray(np.sort(
        rng.choice(1 << 47, NI, replace=False).astype(np.int64)
    ))
    ids32 = jnp.asarray(rng.integers(1, 1 << 16, NI).astype(np.int32))
    q = jnp.asarray(rng.integers(0, 1 << 47, NQ, dtype=np.int64))
    qs = jnp.asarray(rng.integers(0, 1 << 47, NSHORT, dtype=np.int64))

    from bbtools_tpu.ops import sort_join

    for chunk_pow in (20,):
        sort_join.CHUNK = 1 << chunk_pow
        jl = jax.jit(sort_join.join_lookup_jnp)

        def step(i):
            return jl(ik, ids32, jnp.roll(q, i))

        report(f"join_5M_chunk_2^{chunk_pow}", slope_time(step, 2, 6))

    sort_join.CHUNK = 1 << 20
    jl = jax.jit(sort_join.join_lookup_jnp)

    def step_two(i):
        a = jl(ik, ids32, jnp.roll(q, i))
        b = jl(ik, ids32, jnp.roll(qs, i))
        return jnp.sum(a, dtype=jnp.int64), jnp.sum(b, dtype=jnp.int64)

    report("separate_full_plus_short", slope_time(step_two, 2, 6))

    def step_fused(i):
        allq = jnp.concatenate([jnp.roll(q, i), jnp.roll(qs, i)])
        r = jl(ik, ids32, allq)
        return jnp.sum(r, dtype=jnp.int64)

    report("fused_full_plus_short", slope_time(step_fused, 2, 6))


if __name__ == "__main__":
    main()
