"""Experiments round 2: sorted-join primitives for the BBDuk large-panel
lookup (vs the MXU matcher's 15.4 ms + 3.8 ms one-hot at Dp=7168).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_sort_join.py
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bbtools_tpu.utils.chaintime import slope_time

NQ = 8192 * 151
NI = 217_135


def report(name, secs, extra=None):
    d = {"exp": name, "ms_per_step": round(secs * 1e3, 3)}
    if extra:
        d.update(extra)
    print(json.dumps(d), flush=True)


def main():
    rng = np.random.default_rng(0)
    idx_keys = np.sort(
        rng.choice(1 << 47, NI, replace=False).astype(np.int64)
    )
    idx_ids = rng.integers(1, 1 << 16, NI).astype(np.int32)
    q_host = rng.integers(0, 1 << 47, NQ, dtype=np.int64)
    # make ~1% of queries real hits
    hitsel = rng.random(NQ) < 0.01
    q_host[hitsel] = idx_keys[rng.integers(0, NI, hitsel.sum())]
    q = jnp.asarray(q_host)
    ik = jnp.asarray(idx_keys)
    iv = jnp.asarray(idx_ids)
    pos = jnp.arange(NQ, dtype=jnp.int32)

    # A) 2-operand sort (key + payload), honest checksum
    def step_sort2(i):
        k2, p2 = jax.lax.sort((jnp.roll(q, i) + i, pos), num_keys=1)
        return k2, p2

    report("sort2op_1.2M", slope_time(step_sort2, 2, 6))

    # B) full sorted-join pipeline:
    #    concat(index, queries) -> 2-op sort -> last-id scan -> sort back
    IDX_PAY = jnp.asarray(
        (idx_ids.astype(np.int64) | np.int64(1 << 32)).astype(np.int64)
    )

    def join(qq):
        keys = jnp.concatenate([ik, qq])
        pay = jnp.concatenate(
            [IDX_PAY, pos.astype(jnp.int64)]
        )  # bit 32 marks index rows
        sk, sp = jax.lax.sort((keys, pay), num_keys=2)
        # scan: propagate (key, id) of the last index row
        is_idx = (sp >> 32) & 1
        carry_k = jnp.where(is_idx == 1, sk, jnp.int64(-1))
        carry_v = jnp.where(is_idx == 1, sp & 0xFFFF, jnp.int64(0))

        def comb(a, b):
            ak, av = a
            bk, bv = b
            take_b = bk >= 0
            return (jnp.where(take_b, bk, ak), jnp.where(take_b, bv, av))

        ck, cv = jax.lax.associative_scan(comb, (carry_k, carry_v))
        hit_id = jnp.where((ck == sk) & (is_idx == 0), cv, 0)
        # unsort: sort (pos, id) by pos; index rows get pos BIG
        pos_key = jnp.where(
            is_idx == 1, jnp.int64(1 << 40), sp & 0xFFFFFFFF
        ).astype(jnp.int64)
        _, ids_in_order = jax.lax.sort(
            (pos_key, hit_id.astype(jnp.int32)), num_keys=1
        )
        return ids_in_order[:NQ]

    jjoin = jax.jit(join)

    def step_join(i):
        return jjoin(jnp.roll(q, i) + 0 * i)

    report("sorted_join_full", slope_time(step_join, 2, 6))
    # correctness vs numpy
    got = np.asarray(jjoin(q))
    p = np.searchsorted(idx_keys, q_host)
    p = np.minimum(p, NI - 1)
    want = np.where(idx_keys[p] == q_host, idx_ids[p], 0)
    print(json.dumps({"join_correct": bool((got == want).all())}),
          flush=True)

    # C) searchsorted: random queries directly
    def step_ss(i):
        qq = jnp.roll(q, i)
        p2 = jnp.searchsorted(ik, qq)
        p2 = jnp.minimum(p2, NI - 1)
        return jnp.where(ik[p2] == qq, iv[p2], 0)

    report("searchsorted_unsorted", slope_time(step_ss, 2, 6))

    # D) raw gather: 1 row per query from a 217k-row int32 table
    gidx = jnp.asarray(rng.integers(0, NI, NQ).astype(np.int32))

    def step_gather(i):
        g2 = (gidx + i) % NI
        return iv[g2]

    report("gather_1x_1.2M_small_table", slope_time(step_gather, 2, 6))

    # E) gather from a big (16M-row) table
    bigtab = jnp.asarray(rng.integers(0, 1 << 31, 1 << 24).astype(np.int32))
    gbig = jnp.asarray(rng.integers(0, 1 << 24, NQ).astype(np.int32))

    def step_gather_big(i):
        g2 = (gbig + i) & ((1 << 24) - 1)
        return bigtab[g2]

    report("gather_1x_1.2M_16Mrow_table", slope_time(step_gather_big, 2, 6))

    # F) associative scan alone on 1.4M
    ck0 = jnp.asarray(rng.integers(-1, 1 << 40, NQ + NI).astype(np.int64))
    cv0 = jnp.asarray(rng.integers(0, 1 << 16, NQ + NI).astype(np.int64))

    def comb(a, b):
        ak, av = a
        bk, bv = b
        take_b = bk >= 0
        return (jnp.where(take_b, bk, ak), jnp.where(take_b, bv, av))

    def step_scan(i):
        return jax.lax.associative_scan(
            comb, (jnp.roll(ck0, i), cv0)
        )

    report("assoc_scan_1.4M", slope_time(step_scan, 2, 6))


if __name__ == "__main__":
    main()
