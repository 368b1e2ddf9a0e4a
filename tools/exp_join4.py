"""Round 5: clean join timing + chunk-size sweep."""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bbtools_tpu.ops.sort_join as sj
from bbtools_tpu.utils.chaintime import slope_time

NQ = 32768 * 151
NI = 217_135


def report(name, secs):
    print(json.dumps(
        {"exp": name, "ms_per_step": round(secs * 1e3, 3)}
    ), flush=True)


def main():
    rng = np.random.default_rng(0)
    ik = jnp.asarray(np.sort(
        rng.choice(1 << 47, NI, replace=False).astype(np.int64)
    ))
    pay = jnp.asarray(
        (np.arange(NI, dtype=np.int64) << 16)
        | rng.integers(1, 1 << 16, NI).astype(np.int64)
    )
    q = jnp.asarray(rng.integers(0, 1 << 47, NQ, dtype=np.int64))

    for chunk_pow in (20, 21, 22, 23):
        sj.CHUNK = 1 << chunk_pow
        jl = jax.jit(sj.join_lookup_jnp)

        def step(i):
            return jl(ik, pay, jnp.roll(q, i))

        report(f"join_chunk_2^{chunk_pow}", slope_time(step, 2, 6))


if __name__ == "__main__":
    main()
