"""Round 4: Pallas cummax on hardware + single-scan chunked join +
the production adapters.fa step."""

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
    v_host = rng.integers(-1, 1 << 40, NQ + NI).astype(np.int64)
    v = jnp.asarray(v_host)

    from bbtools_tpu.ops.scan_pallas import cummax_i64_pallas

    # hardware exactness first
    got = np.asarray(cummax_i64_pallas(v[: 1 << 20]))
    ok = bool((got == np.maximum.accumulate(v_host[: 1 << 20])).all())
    print(json.dumps({"pallas_cummax_exact_on_tpu": ok}), flush=True)

    def step_pc(i):
        return cummax_i64_pallas(jnp.roll(v, i))

    report("pallas_cummax_5.2M", slope_time(step_pc, 2, 8))

    ik = jnp.asarray(np.sort(
        rng.choice(1 << 47, NI, replace=False).astype(np.int64)
    ))
    pay = jnp.asarray(
        (np.arange(NI, dtype=np.int64) << 16)
        | rng.integers(1, 1 << 16, NI).astype(np.int64)
    )
    q_host = rng.integers(0, 1 << 47, NQ, dtype=np.int64)
    hit = rng.random(NQ) < 0.01
    q_host[hit] = np.asarray(ik)[rng.integers(0, NI, int(hit.sum()))]
    q = jnp.asarray(q_host)

    from bbtools_tpu.ops.sort_join import join_lookup_jnp

    jl = jax.jit(join_lookup_jnp)
    # correctness on hardware
    got = np.asarray(jl(ik, pay, q[: 1 << 20]))
    ikh = np.asarray(ik)
    p = np.minimum(np.searchsorted(ikh, q_host[: 1 << 20]), NI - 1)
    want = np.where(
        ikh[p] == q_host[: 1 << 20],
        np.asarray(pay)[p] & 0xFFFF, 0,
    ).astype(np.int32)
    print(json.dumps({"join_exact_on_tpu": bool((got == want).all())}),
          flush=True)

    def step_join(i):
        return jl(ik, pay, jnp.roll(q, i))

    report("join_singlescan_5M", slope_time(step_join, 2, 6))

    import bench

    out = bench.bench_bbduk_device()
    print(json.dumps({"bbduk_device": {
        k: (round(v2, 1) if isinstance(v2, float) else v2)
        for k, v2 in out["adapters_fa"].items()
    }}), flush=True)


if __name__ == "__main__":
    main()
