"""On-chip validation + timing for the fused overlap/MSA kernels and the
MXU k-mer matcher.

Run on the real TPU (background; compiles take minutes through the
tunnel):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_kernel_check.py

All timings use the in-graph slope method (bbtools_tpu/utils/chaintime.py):
per-dispatch wall timing through this harness measures the tunnel
(~20 ms dispatch floor, block_until_ready returns at dispatch), not the
device — the slope of a chained fori_loop is the only dispatch-,
cache- and RTT-immune number.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from bbtools_tpu.utils.chaintime import rtt_seconds, slope_time

    print("platform:", jax.devices()[0].platform, flush=True)
    print(f"harness scalar-pull RTT {rtt_seconds()*1e3:.1f} ms", flush=True)
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
    # production path: in-graph right-justify + Pallas scan in ONE jit
    from bbtools_tpu.ops.overlap import _justify_and_scan

    got2 = [np.asarray(x) for x in _justify_and_scan(da, db, dal, dbl, 24, D)]
    for r, g in zip(ref, got2):
        np.testing.assert_array_equal(r, g)
    print("overlap: fused justify+scan EQUAL on chip", flush=True)
    dt_x = slope_time(
        lambda i: overlap_counts_jnp(
            jnp.roll(da, i, axis=0), db, jnp.roll(dal, i), dbl, 24, D
        )
    )
    dt_p = slope_time(
        lambda i: _justify_and_scan(
            jnp.roll(da, i, axis=0), db, jnp.roll(dal, i), dbl, 24, D
        )
    )
    print(
        f"overlap XLA {dt_x*1e3:.2f} ms  fused Pallas {dt_p*1e3:.2f} ms  "
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
    cells = Bm * R * Cc
    for tile in (128, 256):
        dt = slope_time(
            lambda i: msa_fill_pallas(
                R, Cc, jnp.roll(jr, i, axis=0), jl, jnp.roll(jp, i, axis=0),
                tile=tile, traceback=True,
            )
        )
        print(
            f"msa pallas tile={tile} {dt*1e3:.3f} ms  "
            f"cells/s {cells/dt:,.0f}",
            flush=True,
        )
    # XLA wavefront scan path, same slope method
    from bbtools_tpu.ops import msa as msa_mod
    from bbtools_tpu.ops import msa_constants as C

    maxgain = (rlens.astype(np.int64) - 1) * C.POINTS_MATCH2 + C.POINTS_MATCH
    subfloor = -2 * maxgain
    ref_lens = np.full(Bm, Cc, np.int32)
    vert, horiz, floor, _ = msa_mod.prepare_limits_np(
        reads, rlens, refs, ref_lens, np.zeros(Bm, np.int64)
    )
    drefs = jnp.asarray(refs)
    dvert = jnp.asarray(vert.astype(np.int32))
    dhoriz = jnp.asarray(horiz.astype(np.int32))
    dfloor = jnp.asarray(floor.astype(np.int32))
    dsub = jnp.asarray(subfloor.astype(np.int32))
    dt_xla = slope_time(
        lambda i: msa_mod.msa_fill(
            R, Cc, False, True,
            jnp.roll(jr, i, axis=0), jl, jnp.roll(drefs, i, axis=0),
            jnp.asarray(ref_lens), dvert, dhoriz, dfloor, dsub,
        ),
        m1=4, m2=12,
    )
    print(f"msa XLA scan {dt_xla*1e3:.3f} ms  cells/s {cells/dt_xla:,.0f}",
          flush=True)
    # small-batch path: tile == padded B (legal because block == array dim)
    s8 = msa_fill_pallas(
        R, Cc, jr[:8], jl[:8], jp[:8], tile=8, traceback=True
    )
    for x, y in zip(sx[:3], s8[:3]):
        np.testing.assert_array_equal(np.asarray(x)[:8], np.asarray(y))
    print("msa: tile=8 (B=8) == XLA on chip", flush=True)

    # ---- MXU k-mer matcher vs gather indexes (adapters.fa, hdist=1) ----
    from bbtools_tpu.core.dna import encode
    from bbtools_tpu.io.fasta import iter_fasta
    from bbtools_tpu.ops.kmer_index import BucketKmerIndex, build_ref_keys
    from bbtools_tpu.ops.lane_index import LaneKmerIndex
    from bbtools_tpu.ops.mm_match import MMKmerIndex, mm_lookup_jnp

    res = os.path.join("/root/repo/bbtools_tpu/resources/adapters.fa")
    scafs = [encode(r.seq) for r in iter_fasta(res)]
    k, mink = 23, 11
    keys, ids = build_ref_keys(scafs, k, mink=mink, hdist=1)
    bidx = BucketKmerIndex.build(keys, ids, pack=True)
    btab = bidx.device_arrays()
    mm = MMKmerIndex.build(scafs, k, mink=mink, hdist=1)
    assert mm is not None, "adapters.fa should fit the MXU matcher"
    mtab = mm.device_arrays()
    print(
        f"mm index: {mm.Dp} cols x {mm.Kp} dims vs {len(keys):,} expanded"
        " keys", flush=True)
    # equality on a mixed query batch (ref keys + mutants + random)
    from bbtools_tpu.ops.kmers import length_mask, rc_kmer_np

    qk = keys[rng.integers(0, len(keys), 200000)]
    qm = qk ^ (
        rng.integers(1, 4, len(qk)).astype(np.int64)
        << (2 * rng.integers(0, mink, len(qk)))
    )
    tag = np.int64(length_mask(k))
    qm = np.where(qm & tag, qm, (qm & ~tag) | tag)  # keep in full-k class
    base = qm & (tag - 1)
    qm = np.maximum(base, rc_kmer_np(base, k)) | tag
    qr = (
        rng.integers(0, 1 << (2 * k), 100000, dtype=np.int64) | tag
    )
    queries = np.concatenate([qk, qm, qr])
    dq = jnp.asarray(queries)
    print("compiling mm lookup...", flush=True)
    got_mm = np.asarray(mm_lookup_jnp(*mtab, *mm.static_params(), dq))
    want_b = np.asarray(
        BucketKmerIndex.lookup_packed_jnp(btab[0], bidx.nb, dq)
    )
    np.testing.assert_array_equal(got_mm, want_b)
    print("mm: EQUAL to bucket index on chip "
          f"({len(queries):,} queries)", flush=True)
    # lookup throughput on the production query shape [32768, 151]
    Q = rng.integers(0, 1 << (2 * k), (32768, 151), dtype=np.int64) | tag
    dQ = jnp.asarray(Q)
    nq = Q.size
    dt_mm = slope_time(
        lambda i: mm_lookup_jnp(
            *mtab, *mm.static_params(), jnp.roll(dQ, i, axis=0)
        ),
        m1=2, m2=8,
    )
    dt_b = slope_time(
        lambda i: BucketKmerIndex.lookup_packed_jnp(
            btab[0], bidx.nb, jnp.roll(dQ, i, axis=0)
        ),
        m1=2, m2=8,
    )
    print(
        f"adapters.fa hdist=1 lookups: mm {dt_mm*1e3:.2f} ms "
        f"({nq/dt_mm/1e6:,.0f} M/s)  bucket {dt_b*1e3:.2f} ms "
        f"({nq/dt_b/1e6:,.0f} M/s)  speedup {dt_b/dt_mm:.2f}x",
        flush=True,
    )
    # small-panel comparison: 1 adapter, lane index vs mm
    one = [scafs[0]]
    keys1, ids1 = build_ref_keys(one, k, mink=mink, hdist=1)
    lidx = LaneKmerIndex.build(keys1, ids1)
    if lidx is not None:
        ltab = lidx.device_arrays()
        dt_l = slope_time(
            lambda i: LaneKmerIndex.lookup_jnp(
                *ltab, *lidx.static_params(), jnp.roll(dQ, i, axis=0)
            ),
            m1=2, m2=8,
        )
        mm1 = MMKmerIndex.build(one, k, mink=mink, hdist=1)
        m1tab = mm1.device_arrays()
        dt_m1 = slope_time(
            lambda i: mm_lookup_jnp(
                *m1tab, *mm1.static_params(), jnp.roll(dQ, i, axis=0)
            ),
            m1=2, m2=8,
        )
        print(
            f"1-adapter lookups: lane {dt_l*1e3:.2f} ms "
            f"({nq/dt_l/1e6:,.0f} M/s)  mm {dt_m1*1e3:.2f} ms "
            f"({nq/dt_m1/1e6:,.0f} M/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
