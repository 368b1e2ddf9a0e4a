"""Round-5 adapters.fa single-chip experiment (VERDICT r4 #4):
32-bit fingerprint pre-join.

Hypothesis: the production join chunk (ops/sort_join._join_chunk) pays a
2-operand (i64 key, i32 pay) sort; packing a 32-bit fingerprint + flag +
position into ONE i64 word turns sort1 into a single-operand 8-byte
sort.  fp misses are certain (no false negatives); the ~Nq*V/2^32
expected false positives plus genuine hits are verified exactly by the
packed-bucket gather (ops/kmer_index) on claimed rows only.

This script slope-measures, at production shapes (V=217k-ish expanded
keys, 1M-row query chunks):
  a. the current production _join_chunk            (baseline)
  b. a 2-op vs 1-op sort at the same row count     (the raw sort delta)
  c. the fp-packed join chunk prototype (sort + cummax + unsort)
  d. the bucket-gather verify cost per claimed-hit row

Decision rule: fp join wins only if (a - c) exceeds the verify cost at
realistic hit densities (~5-10% of queries).  Results recorded in
BASELINE.md either way (measured adoption or measured rejection).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import bbtools_tpu  # noqa: F401  (env handling)
import jax
import jax.numpy as jnp

from bbtools_tpu.ops.sort_join import _cummax_i64, _join_chunk
from bbtools_tpu.utils.chaintime import slope_time

V = 217_000
NQ = 1 << 20
HIT_FRAC = 0.07


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(5)
    keys = np.sort(
        rng.choice(1 << 46, V, replace=False).astype(np.int64)
    )
    ids32 = (np.arange(V) % 997).astype(np.int32)
    # queries: HIT_FRAC present, rest random misses
    nhit = int(NQ * HIT_FRAC)
    q = np.concatenate([
        keys[rng.integers(0, V, nhit)],
        rng.integers(0, 1 << 46, NQ - nhit).astype(np.int64),
    ])
    rng.shuffle(q)
    dk = jnp.asarray(keys)
    di = jnp.asarray(ids32)
    dq = jnp.asarray(q)

    # --- a. production join chunk ---
    dt_a = slope_time(lambda i: _join_chunk(dk, di, jnp.roll(dq, i)))
    print(f"a. production _join_chunk: {dt_a*1e3:.2f} ms "
          f"({NQ/dt_a/1e6:.0f} M lookups/s)", flush=True)

    # --- b. raw sort costs at the joined row count ---
    n = V + NQ
    big = jnp.asarray(rng.integers(0, 1 << 62, n).astype(np.int64))
    pay = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
    dt_1op = slope_time(lambda i: jnp.sort(jnp.roll(big, i)))
    dt_2op = slope_time(
        lambda i: jax.lax.sort((jnp.roll(big, i), pay), num_keys=1)[0]
    )
    print(f"b. sort {n} rows: 1-op {dt_1op*1e3:.2f} ms, "
          f"2-op {dt_2op*1e3:.2f} ms (delta {1e3*(dt_2op-dt_1op):.2f})",
          flush=True)

    # --- c. fp-packed join prototype ---
    # fp = 32-bit multiplicative hash; pack fp<<22 | is_idx<<21 | pos/id
    def fp32(x):
        h = x.astype(jnp.uint64) * jnp.uint64(0x9E3779B97F4A7C15)
        return ((h >> jnp.uint64(32)) & jnp.uint64(0xFFFFFFFF)).astype(
            jnp.int64
        )

    fpk = fp32(dk)

    @jax.jit
    def fp_join(q):
        # packed sort word: fp(32) << 22 | is_query(1) << 21 | pos(21);
        # index rows (flag 0) sort before query rows on fp ties.
        nq = q.shape[0]
        fq = fp32(q)
        packed = jnp.concatenate([
            (fpk << 22) | jnp.arange(V, dtype=jnp.int64),
            (fq << 22) | (jnp.int64(1) << 21)
            | jnp.arange(nq, dtype=jnp.int64),
        ])
        sp = jnp.sort(packed)
        fps = sp >> 22
        seg = jnp.concatenate([jnp.ones(1, bool), fps[1:] != fps[:-1]])
        is_idx = ((sp >> 21) & 1) == 0
        row = jnp.arange(V + nq, dtype=jnp.int64)
        # carry from each segment START: row in high bits guarantees the
        # current segment's start always wins the cummax, so the carried
        # flag says whether THIS fp segment began with an index row
        v = jnp.where(
            seg,
            (row << 22) | (is_idx.astype(jnp.int64) << 21)
            | jnp.where(is_idx, sp & jnp.int64(0x1FFFFF), 0),
            jnp.int64(-1),
        )
        c = _cummax_i64(v)
        hit = (~is_idx) & (((c >> 21) & 1) == 1)
        cand_idx = jnp.where(hit, c & jnp.int64(0x1FFFFF), 0)
        qpos = sp & jnp.int64(0x1FFFFF)
        unsort = jnp.sort(jnp.where(
            is_idx, jnp.int64(0x7FFFFFFF) << 22,
            (qpos << 22) | (hit.astype(jnp.int64) << 21) | cand_idx,
        ))
        return unsort[:nq]

    dt_c = slope_time(lambda i: fp_join(jnp.roll(dq, i)))
    print(f"c. fp-packed join: {dt_c*1e3:.2f} ms "
          f"({NQ/dt_c/1e6:.0f} M lookups/s)", flush=True)

    # sanity: candidate set superset of true hits
    out = np.asarray(fp_join(dq))
    cand = (out >> 21) & 1
    true_hit = np.isin(q, keys)
    misses_flagged = int((true_hit & (cand == 0)).sum())
    fp_rate = int(((~true_hit) & (cand == 1)).sum())
    print(f"   candidates: {int(cand.sum())} of {NQ} "
          f"(true {int(true_hit.sum())}, false+ {fp_rate}, "
          f"false- {misses_flagged})", flush=True)

    # --- d. bucket-gather verify cost per candidate row ---
    from bbtools_tpu.ops.kmer_index import BucketKmerIndex

    bidx = BucketKmerIndex.build(keys, ids32.astype(np.int64), pack=True)
    assert bidx.packed, "keys too wide for the packed layout"
    ptbl = jnp.asarray(bidx.keys)
    nb = bidx.nb
    ncand = int(NQ * (HIT_FRAC + 0.01))
    qc = jnp.asarray(q[:ncand])

    def verify(i):
        return BucketKmerIndex.lookup_packed_jnp(
            ptbl, nb, jnp.roll(qc, i)
        )

    try:
        dt_d = slope_time(verify)
        print(f"d. bucket verify {ncand} rows: {dt_d*1e3:.2f} ms "
              f"({ncand/dt_d/1e6:.0f} M rows/s)", flush=True)
    except Exception as e:
        print(f"d. bucket verify unavailable: {type(e).__name__}: {e}",
              flush=True)
        dt_d = float("nan")

    print("--- summary ---")
    print(f"baseline {dt_a*1e3:.2f} ms vs fp {dt_c*1e3:.2f} + verify "
          f"{dt_d*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
