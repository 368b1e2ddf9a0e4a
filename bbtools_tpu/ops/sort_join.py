"""Sorted-join k-mer lookup: set-membership as sort + scan, no random access.

Large reference panels (adapters.fa: 217k expanded keys) hit this TPU
generation's per-query random-access wall from every direction: HBM row
gathers run ~70-135M rows/s, searchsorted's binary-search gather chain is
~50x worse, and the MXU one-hot matcher pays Nq x 4k x D systolic work
plus an elementwise epilogue over the [Nq, D] score matrix (measured
15.4 ms + 3.8 ms one-hot per 1.2M-query batch at D=7168,
tools/exp_mm_wall.py). The one fast primitive left is the SORT unit:
jax.lax.sort moves 1.2M (int64, payload) rows in 2.4 ms on a v5e
(tools/exp_sort_join.py) — so membership becomes a sequential-streaming
join, the same sorted-array design as the reference's own BBMap Block
index (align2/Block.java:18), executed batchwise:

  1. concatenate [sorted index keys | query keys] with payloads that
     order index rows FIRST among key ties,
  2. one 2-operand sort,
  3. propagate the last-seen index row to every later position. Because
     index keys ascend, both (key) and (rank<<16 | id) of index rows
     ascend too, so the propagation is exactly lax.cummax of the row
     values with queries masked to -1 — no generic associative_scan
     (measured 2x the cost) and no gather,
  4. a query hits iff the propagated key equals its own; un-sort the hit
     ids back to query order with one int32 sort.

Exactness: index keys are unique (first-wins dedup at build), every query
key is either present (the cummax carries its id) or absent (carried key
differs). No hashing, no collisions, any key width up to 62 bits, any
expansion (hdist/edist load-side) — the one unsupported scan feature is
qhdist>0, which multiplies the query stream ~70x (callers keep the
gather index there, as with the MXU matcher).

Multi-chip: the per-batch sort cost scales with the QUERY count, so this
backend shards over dp (reads) with the index replicated (a few MB) —
linear scaling without the tp all-to-all the gather backends need.

Reference semantics: bbduk/BBDukIndexMod.getValue canonical-key lookup
(:492-508) over the loader's expanded key set (:298-361).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

@dataclass
class SortJoinIndex:
    """Sorted unique keys + first-wins ids, joined against query batches."""

    keys: np.ndarray  # int64 [V] sorted ascending, unique
    pay: np.ndarray  # int64 [V] = (rank << 16) | id  (ascending)
    n: int

    #: device sort cost grows with V; beyond this the per-batch join is
    #: dominated by re-sorting the index and gather backends win back
    MAX_KEYS = 8_000_000

    @staticmethod
    def supports(n_keys: int, qhdist: int = 0) -> bool:
        return 0 < n_keys <= SortJoinIndex.MAX_KEYS and qhdist == 0

    @staticmethod
    def build(keys: np.ndarray, ids: np.ndarray) -> "SortJoinIndex":
        """keys must be sorted unique with first-wins ids, exactly what
        ops/kmer_index.build_ref_keys returns."""
        keys = np.asarray(keys, np.int64)
        ids = np.asarray(ids, np.int64)
        assert ids.min(initial=0) >= 0 and ids.max(initial=0) < (1 << 16)
        pay = (np.arange(len(keys), dtype=np.int64) << 16) | ids
        return SortJoinIndex(keys=keys, pay=pay, n=len(keys))

    def device_arrays(self):
        # device payload is int32 (just the id): the sort moves 12 bytes
        # per row instead of 16 — measured 2x on the TPU sort unit; row
        # order in the scan supplies the monotonicity the int64 payload
        # used to carry
        return (
            jnp.asarray(self.keys),
            jnp.asarray((self.pay & 0xFFFF).astype(np.int32)),
        )

    def static_params(self):
        return (self.n,)

    def lookup_np(self, query: np.ndarray) -> np.ndarray:
        """Host path: binary search (fast on CPU; tests + CPU backend)."""
        q = np.asarray(query, np.int64)
        pos = np.searchsorted(self.keys, q)
        pos = np.minimum(pos, max(self.n - 1, 0))
        ok = self.keys[pos] == q if self.n else np.zeros(q.shape, bool)
        return np.where(
            ok, (self.pay[np.maximum(pos, 0)] & 0xFFFF), 0
        ).astype(np.int32)


#: per-join query-chunk size: the TPU sort is superlinear past a few
#: million rows (measured 2.42 ms at 1.2M vs 28.7 ms at 5.2M,
#: tools/exp_join_profile.py), so production batches join in chunks
CHUNK = 1 << 20


QBIT32 = jnp.int32(1) << 30  # marks query rows in the int32 payload


def _join_chunk(sorted_keys, ids32, q):
    """One join pass: q int64 [nq] (may contain -1 pad rows).

    Sort payload is int32 — index rows carry just the id (16 bits),
    query rows carry (1<<30)|position (nq <= CHUNK < 2^30) — so the sort
    moves (8+4)-byte rows. Post-sort propagation is ONE cummax: equal
    keys form a segment whose FIRST row is the index row when the key is
    present (ties order index rows first — id < QBIT32 <= query pay —
    and index keys are unique), so packing
    (row << 17 | is_idx << 16 | id) at segment starts gives a value
    monotone in row position; the Pallas scan kernel carries it in one
    HBM pass (ops/scan_pallas.py, 0.17 ms at 5.2M vs lax.cummax's 17)."""
    nq = q.shape[0]
    keys = jnp.concatenate([sorted_keys, q])
    qpay = QBIT32 | jnp.arange(nq, dtype=jnp.int32)
    pays = jnp.concatenate([ids32, qpay])
    # index rows sort before query rows on key ties (id < QBIT32 <= qpay)
    sk, sp = jax.lax.sort((keys, pays), num_keys=2)
    n = sk.shape[0]
    is_idx = sp < QBIT32
    row = jnp.arange(n, dtype=jnp.int64)
    seg_start = jnp.concatenate(
        [jnp.ones(1, bool), sk[1:] != sk[:-1]]
    )
    v = jnp.where(
        seg_start,
        (row << 17)
        | (is_idx.astype(jnp.int64) << 16)
        | (sp.astype(jnp.int64) & jnp.int64(0xFFFF)),
        jnp.int64(-1),
    )
    c = _cummax_i64(v)
    hit = (~is_idx) & (((c >> 16) & 1) == 1)
    out_id = jnp.where(hit, c & jnp.int64(0xFFFF), jnp.int64(0))
    # un-sort to query order as ONE single-operand int64 sort:
    # (pos << 16 | id); index rows sink to the tail via a huge pos
    pos_key = jnp.where(
        is_idx, jnp.int32(0x7FFFFFFF), sp & ~QBIT32
    ).astype(jnp.int64)
    packed = jnp.sort((pos_key << 16) | out_id)
    return (packed[:nq] & jnp.int64(0xFFFF)).astype(jnp.int32)


def _cummax_i64(v):
    """Inclusive int64 cummax: Pallas single-pass kernel on TPU (XLA's
    lax.cummax runs ~2.7 ms/M there), lax.cummax elsewhere."""
    if jax.devices()[0].platform == "tpu":
        from .scan_pallas import cummax_i64_pallas

        return cummax_i64_pallas(v)
    return jax.lax.cummax(v)


def join_lookup_jnp(sorted_keys, pay, query):
    """ids for `query` (any shape, int64 canonical keys) against the
    sorted index — the 4-step join from the module docstring, chunked
    so each sort stays in the fast size regime. Pad rows use key -1:
    they sort before all index keys (>= 0), can never be carried into
    c_key by an index row, and their positions are sliced off."""
    shape = query.shape
    q = query.reshape(-1)
    nq = q.shape[0]
    if nq <= CHUNK + CHUNK // 2:
        return _join_chunk(sorted_keys, pay, q).reshape(shape)
    nch = -(-nq // CHUNK)
    padded = nch * CHUNK
    if padded != nq:
        q = jnp.concatenate(
            [q, jnp.full(padded - nq, -1, jnp.int64)]
        )
    outs = [
        _join_chunk(sorted_keys, pay, q[c * CHUNK : (c + 1) * CHUNK])
        for c in range(nch)
    ]
    return jnp.concatenate(outs)[:nq].reshape(shape)
