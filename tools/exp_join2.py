"""Round 3: chunked join + cummax formulations at production scale."""

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


def cummax_2level(x, C=8192):
    n = x.shape[0]
    R = -(-n // C)
    pad = R * C - n
    xp = jnp.pad(x, (0, pad), constant_values=np.int64(-(2**62)))
    m = xp.reshape(R, C)
    within = jax.lax.cummax(m, axis=1)
    rowmax = within[:, -1]
    carry = jax.lax.cummax(rowmax)
    carry = jnp.concatenate(
        [jnp.full(1, -(2**62), jnp.int64), carry[:-1]]
    )
    out = jnp.maximum(within, carry[:, None])
    return out.reshape(-1)[:n]


def main():
    rng = np.random.default_rng(0)
    big = jnp.asarray(rng.integers(-1, 1 << 47, NQ + NI).astype(np.int64))

    j2 = jax.jit(cummax_2level)

    def step_c2(i):
        x = jnp.roll(big, i)
        return j2(x), j2(x + 1)

    report("two_cummax2level_5.2M", slope_time(step_c2, 2, 6))

    def step_c1(i):
        x = jnp.roll(big, i)
        return jax.lax.cummax(x), jax.lax.cummax(x + 1)

    # correctness
    x0 = np.asarray(big)
    assert (np.asarray(j2(big)) == np.maximum.accumulate(x0)).all()

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

    report("join_chunked_5M", slope_time(step_join, 2, 6))


if __name__ == "__main__":
    main()
