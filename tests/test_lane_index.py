"""LaneKmerIndex: VMEM lane-gather hash table vs brute force and vs
BucketKmerIndex (the HBM row-gather path it replaces for small panels)."""

import numpy as np
import pytest

from bbtools_tpu.ops.kmer_index import BucketKmerIndex
from bbtools_tpu.ops.lane_index import (
    LaneKmerIndex,
    _lookup_pallas,
    _lookup_xla,
)


def _mk_keys(rng, n, hi_bits=False, big_ids=False):
    # realistic kmer keys: 2k payload bits plus a length-tag bit well above
    # them (see ops/kmers.length_mask); hi_bits drives the unpacked layout
    top = 62 if hi_bits else 44
    keys = rng.integers(0, 1 << top, size=4 * n, dtype=np.int64) | (
        np.int64(1) << top
    )
    keys = np.unique(keys)[:n]
    lo = 1 << 17 if big_ids else 1
    ids = rng.integers(lo, lo + 1000, size=len(keys), dtype=np.int32)
    return keys, ids


@pytest.mark.parametrize("hi_bits,big_ids", [(False, False), (True, True)])
def test_lane_index_brute_force(hi_bits, big_ids):
    rng = np.random.default_rng(7)
    keys, ids = _mk_keys(rng, 3000, hi_bits, big_ids)
    idx = LaneKmerIndex.build(keys, ids)
    assert idx is not None
    assert idx.packed == (not hi_bits and not big_ids)
    truth = dict(zip(keys.tolist(), ids.tolist()))
    # queries: half present, half absent
    absent = rng.integers(0, 1 << 62, size=3000, dtype=np.int64)
    q = np.concatenate([keys[::2], absent])
    rng.shuffle(q)
    want = np.array([truth.get(int(x), 0) for x in q], dtype=np.int32)
    got = idx.lookup_np(q)
    np.testing.assert_array_equal(got, want)


def test_lane_vs_bucket_and_device_paths():
    rng = np.random.default_rng(11)
    keys, ids = _mk_keys(rng, 2000)
    lane = LaneKmerIndex.build(keys, ids)
    bucket = BucketKmerIndex.build(keys, ids)
    assert lane is not None
    q = np.concatenate(
        [keys[::3], rng.integers(0, 1 << 45, size=2000, dtype=np.int64)]
    )
    rng.shuffle(q)
    want = lane.lookup_np(q)
    kb, ib = bucket.device_arrays()
    np.testing.assert_array_equal(
        np.asarray(BucketKmerIndex.lookup_jnp(kb, ib, bucket.nb, q)), want
    )
    tlo, thi, tid = lane.device_arrays()
    params = lane.static_params()
    np.testing.assert_array_equal(
        np.asarray(_lookup_xla(tlo, thi, tid, *params, q)), want
    )
    # Pallas kernel in interpret mode (on-chip compile is exercised by
    # bench.py); 2-D query shape exercises the pad/reshape path
    q2 = q[: len(q) // 2 * 2].reshape(2, -1)
    want2 = lane.lookup_np(q2)
    got2 = np.asarray(
        _lookup_pallas(tlo, thi, tid, *params, q2, interpret=True)
    )
    np.testing.assert_array_equal(got2, want2)


def test_lane_index_zero_query_is_miss():
    rng = np.random.default_rng(3)
    keys, ids = _mk_keys(rng, 100)
    idx = LaneKmerIndex.build(keys, ids)
    got = idx.lookup_np(np.zeros(8, dtype=np.int64))
    np.testing.assert_array_equal(got, np.zeros(8, dtype=np.int32))


def test_lane_index_declines_big_tables():
    rng = np.random.default_rng(5)
    # way above MAX_COST * LANES: supports() must gate it out
    assert not LaneKmerIndex.supports(LaneKmerIndex.MAX_COST * 128 + 1)


def test_bucket_packed_layout_matches_unpacked():
    import numpy as np

    rng = np.random.default_rng(42)
    keys = np.unique(
        rng.integers(0, 1 << 46, 8000, dtype=np.int64) | (np.int64(1) << 46)
    )[:5000]
    ids = rng.integers(1, 1 << 15, len(keys), dtype=np.int32)
    up = BucketKmerIndex.build(keys, ids)
    pk = BucketKmerIndex.build(keys, ids, pack=True)
    assert pk.packed and not up.packed
    q = np.concatenate(
        [keys[::2], rng.integers(0, 1 << 47, 4000, dtype=np.int64)]
    )
    rng.shuffle(q)
    want = up.lookup_np(q)
    np.testing.assert_array_equal(pk.lookup_np(q), want)
    import jax.numpy as jnp

    pt, _ = pk.device_arrays()
    got = np.asarray(
        BucketKmerIndex.lookup_packed_jnp(pt, pk.nb, jnp.asarray(q))
    )
    np.testing.assert_array_equal(got, want)
