"""Component costs of the sorted-join bbduk step at production scale
(BATCH=32768, L=151 -> 4.95M queries vs 217k index keys)."""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

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

    from bbtools_tpu.ops.sort_join import join_lookup_jnp

    jl = jax.jit(join_lookup_jnp)

    def step_join(i):
        return jl(ik, pay, jnp.roll(q, i))

    report("join_lookup_5M", slope_time(step_join, 2, 6))

    # components
    def step_sort(i):
        keys = jnp.concatenate([ik, jnp.roll(q, i)])
        pays = jnp.concatenate(
            [pay, (jnp.int64(1) << 62) | jnp.arange(NQ, dtype=jnp.int64)]
        )
        return jax.lax.sort((keys, pays), num_keys=2)

    report("join_sort_5.2M", slope_time(step_sort, 2, 6))

    big = jnp.asarray(rng.integers(-1, 1 << 47, NQ + NI).astype(np.int64))

    def step_cummax(i):
        x = jnp.roll(big, i)
        return jax.lax.cummax(x), jax.lax.cummax(x + 1)

    report("two_cummax_5.2M", slope_time(step_cummax, 2, 6))

    p32 = jnp.asarray(rng.integers(0, 1 << 31, NQ + NI).astype(np.int32))
    v32 = jnp.asarray(rng.integers(0, 1 << 16, NQ + NI).astype(np.int32))

    def step_unsort(i):
        return jax.lax.sort((jnp.roll(p32, i), v32), num_keys=1)

    report("unsort_int32_5.2M", slope_time(step_unsort, 2, 6))

    # extraction: rolling kmers at production batch
    from bbtools_tpu.ops.kmers import rolling_kmers_jnp, canonical_keys_jnp

    bases = jnp.asarray(
        rng.integers(0, 4, (32768, 151)).astype(np.uint8)
    )

    @jax.jit
    def extract(b):
        fwd, rkm, runlen = rolling_kmers_jnp(b, 23)
        return canonical_keys_jnp(fwd, rkm, 23, -1, True), runlen

    def step_extract(i):
        return extract(jnp.roll(bases, i, axis=0))

    report("extract_rolling_32k", slope_time(step_extract, 2, 6))


if __name__ == "__main__":
    main()
