"""On-chip validation + timing for the fused overlap and MSA kernels.

Run on the real TPU (background; compiles take minutes through the
tunnel):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_kernel_check.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, warmup=2, iters=6):
    import jax

    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    rs = []
    for _ in range(iters):
        rs.append(fn())
        if len(rs) > 2:
            rs.pop(0)
    jax.block_until_ready(rs)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(42)

    # ---- overlap kernel ----
    from bbtools_tpu.ops.overlap import overlap_counts_jnp, right_justify_np
    from bbtools_tpu.ops.overlap_pallas import overlap_counts_pallas

    B, L = 8192, 151
    a = rng.integers(0, 4, (B, L)).astype(np.uint8)
    b = rng.integers(0, 4, (B, L)).astype(np.uint8)
    alens = rng.integers(90, L + 1, B).astype(np.int32)
    blens = rng.integers(90, L + 1, B).astype(np.int32)
    D = 2 * L - 2 * 12
    da, db = jnp.asarray(a), jnp.asarray(b)
    dal, dbl = jnp.asarray(alens), jnp.asarray(blens)
    t0 = time.perf_counter()
    b_rj = right_justify_np(b, blens, L)
    t_just = time.perf_counter() - t0
    db_rj = jnp.asarray(b_rj)

    print("compiling overlap XLA...", flush=True)
    ref = [np.asarray(x) for x in overlap_counts_jnp(da, db, dal, dbl, 24, D)]
    print("compiling overlap Pallas (pre-justified)...", flush=True)
    got = [
        np.asarray(x) for x in overlap_counts_pallas(
            da, db_rj, dal, dbl, 24, D, pre_justified=True
        )
    ]
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)
    print("overlap: EQUAL on chip (host right-justify "
          f"{t_just*1e3:.2f} ms)", flush=True)
    dt_x = timeit(lambda: overlap_counts_jnp(da, db, dal, dbl, 24, D))
    dt_p = timeit(lambda: overlap_counts_pallas(
        da, db_rj, dal, dbl, 24, D, pre_justified=True))
    print(
        f"overlap XLA {dt_x*1e3:.2f} ms  Pallas {dt_p*1e3:.2f} ms  "
        f"speedup {dt_x/dt_p:.2f}x  pairs/s {B/dt_p:,.0f}",
        flush=True,
    )

    # ---- MSA kernel ----
    import os

    from bbtools_tpu.ops.msa_pallas import (
        msa_fill_pallas,
        msa_fill_tb_auto,
        prepare_refp,
    )

    Bm, R = 512, 151
    Cc = R + 2 * 12
    reads = rng.integers(0, 4, (Bm, R)).astype(np.uint8)
    rlens = np.full(Bm, R, np.int32)
    refs = rng.integers(0, 4, (Bm, Cc)).astype(np.uint8)
    refs[:, 12 : 12 + R] = reads
    mut = rng.integers(0, R, (Bm, 3))
    for j in range(3):
        refs[np.arange(Bm), 12 + mut[:, j]] ^= 1
    refp = prepare_refp(refs, R)
    jr, jl, jp = jnp.asarray(reads), jnp.asarray(rlens), jnp.asarray(refp)

    print("compiling msa tile=256...", flush=True)
    s256 = msa_fill_pallas(R, Cc, jr, jl, jp, tile=256, traceback=True)
    print("computing msa XLA reference...", flush=True)
    os.environ["BBTOOLS_MSA_PALLAS"] = "0"
    sx = msa_fill_tb_auto(R, Cc, reads, rlens, refs)
    os.environ["BBTOOLS_MSA_PALLAS"] = ""
    for x, y in zip(sx[:3], s256[:3]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    print("msa: tile=256 == XLA on chip", flush=True)
    print("compiling msa tile=8...", flush=True)
    dt8 = timeit(
        lambda: msa_fill_pallas(R, Cc, jr, jl, jp, tile=8, traceback=True),
        warmup=1, iters=3,
    )
    dt256 = timeit(
        lambda: msa_fill_pallas(R, Cc, jr, jl, jp, tile=256, traceback=True),
        warmup=1, iters=3,
    )
    cells = Bm * R * Cc
    print(
        f"msa tile=8 {dt8*1e3:.2f} ms  tile=256 {dt256*1e3:.2f} ms  "
        f"speedup {dt8/dt256:.2f}x  cells/s {cells/dt256:,.0f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
