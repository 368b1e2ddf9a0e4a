import numpy as np
import jax.numpy as jnp
import pytest

from bbtools_tpu.ops.kmer_index import BucketKmerIndex, build_ref_keys
from bbtools_tpu.ops.sort_join import SortJoinIndex, join_lookup_jnp

rng = np.random.default_rng(42)


def test_join_matches_bucket_index_random():
    V, NQ = 50_000, 200_000
    keys = np.unique(rng.choice(1 << 47, V, replace=False).astype(np.int64))
    ids = rng.integers(1, 1 << 16, len(keys)).astype(np.int32)
    sji = SortJoinIndex.build(keys, ids)
    bki = BucketKmerIndex.build(keys, ids)
    q = rng.integers(0, 1 << 47, NQ, dtype=np.int64)
    hit_rows = rng.random(NQ) < 0.03
    q[hit_rows] = keys[rng.integers(0, len(keys), int(hit_rows.sum()))]
    want = bki.lookup_np(q)
    got_np = sji.lookup_np(q)
    assert (got_np == want).all()
    got_dev = np.asarray(
        join_lookup_jnp(*sji.device_arrays(), jnp.asarray(q))
    )
    assert (got_dev == want).all()


def test_join_shapes_and_edge_cases():
    keys = np.array([5, 9, 100], np.int64)
    ids = np.array([3, 1, 7], np.int32)
    sji = SortJoinIndex.build(keys, ids)
    q = jnp.asarray(np.array([[5, 6], [100, 0], [9, 9]], np.int64))
    out = np.asarray(join_lookup_jnp(*sji.device_arrays(), q))
    assert out.tolist() == [[3, 0], [7, 0], [1, 1]]
    # duplicate query keys, all-miss batch, boundary keys
    q2 = jnp.asarray(np.array([4, 101, 5, 5, 5], np.int64))
    out2 = np.asarray(join_lookup_jnp(*sji.device_arrays(), q2))
    assert out2.tolist() == [0, 0, 3, 3, 3]


def test_bbduk_selects_join_backend_for_large_panels(tmp_path):
    """adapters.fa-class config routes to SortJoinIndex on TPU; decisions
    must match the bucket backend bit-for-bit (CPU runs the same jitted
    join graph, so this is a backend-equality test, not a TPU test)."""
    from bbtools_tpu.models.bbduk import BBDukConfig, build_index
    from bbtools_tpu.ops.bbduk_scan import KScanConfig, kscan_full

    # synthetic panel big enough to clear the lane cap
    scafs = [rng.integers(0, 4, 40).astype(np.uint8) for _ in range(400)]
    cfg = BBDukConfig(k=23, mink=11, hdist=1, ktrim="r").resolve()
    keys, ids = build_ref_keys(
        scafs, cfg.k, mink=cfg.mink, hdist=1, mid_mask=cfg.mid_mask_bits
    )
    assert SortJoinIndex.supports(len(keys), 0)
    sji = SortJoinIndex.build(keys, ids)
    bki = BucketKmerIndex.build(keys, ids, pack=False)

    B, L = 64, 151
    bases = rng.integers(0, 4, (B, L)).astype(np.uint8)
    # plant adapter fragments
    for i in range(0, B, 3):
        s = scafs[i % len(scafs)]
        p = int(rng.integers(0, L - len(s)))
        bases[i, p : p + len(s)] = s
    lengths = np.full(B, L, np.int32)

    base_cfg = dict(
        k=cfg.k, mink=cfg.mink, mid_mask=cfg.mid_mask_bits,
        minlen2=cfg.k,
    )
    sc_join = KScanConfig(**base_cfg, join=sji.static_params())
    sc_bucket = KScanConfig(**base_cfg, nb=bki.nb)
    r_j = kscan_full(sc_join, sji.device_arrays(), jnp.asarray(bases),
                     jnp.asarray(lengths))
    r_b = kscan_full(sc_bucket, bki.device_arrays(), jnp.asarray(bases),
                     jnp.asarray(lengths))
    for key in ("nhits", "id0", "min_loc", "max_loc"):
        assert (np.asarray(r_j[key]) == np.asarray(r_b[key])).all(), key


def test_bbduk_end_to_end_join_backend(tmp_path):
    """Full BBDuk run over a panel that lands on SortJoinIndex: output
    bytes equal to a run forced onto the bucket backend."""
    import bbtools_tpu.models.bbduk as bbduk_mod
    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.models.bbduk import BBDuk, parse_args
    from bbtools_tpu.ops.lane_index import LaneKmerIndex

    scafs = [rng.integers(0, 4, 40).astype(np.uint8) for _ in range(400)]
    ref_p = tmp_path / "panel.fa"
    with open(ref_p, "w") as fh:
        for i, s in enumerate(scafs):
            fh.write(f">a{i}\n" + "".join("ACGT"[c] for c in s) + "\n")
    in_p = tmp_path / "in.fq"
    with open(in_p, "w") as fh:
        for i in range(500):
            r = rng.integers(0, 4, 151).astype(np.uint8)
            if i % 3 == 0:
                s = scafs[i % len(scafs)]
                p = int(rng.integers(20, 100))
                r[p : p + len(s)] = s
            fh.write(f"@r{i}\n" + "".join("ACGT"[c] for c in r)
                     + f"\n+\n{'F' * 151}\n")

    import unittest.mock as mock

    from bbtools_tpu.ops.sort_join import SortJoinIndex as SJI

    argv_base = [f"ref={ref_p}", "k=23", "mink=11", "hdist=1", "ktrim=r"]
    out_b = tmp_path / "bucket.fq"
    out_j = tmp_path / "join.fq"
    # bucket run: disable join + lane so the bucket table is selected
    with mock.patch.object(
        bbduk_mod, "_join_eligible", lambda cfg, n: False
    ), mock.patch.object(
        LaneKmerIndex, "supports", staticmethod(lambda *a, **k: False)
    ):
        BBDuk(parse_args([f"in={in_p}", f"out={out_b}"] + argv_base)).run()
    # join run: the eligibility gate normally needs TPU; the jitted join
    # graph itself is backend-agnostic, so force it on CPU
    with mock.patch.object(
        bbduk_mod, "_join_eligible",
        lambda cfg, n: SJI.supports(n, cfg.qhdist),
    ), mock.patch.object(
        LaneKmerIndex, "supports", staticmethod(lambda *a, **k: False)
    ):
        tool = BBDuk(parse_args([f"in={in_p}", f"out={out_j}"] + argv_base))
        assert tool.scan_cfg.join is not None, "join backend not selected"
        tool.run()
    assert out_b.read_bytes() == out_j.read_bytes()
    assert b"@r0" in out_j.read_bytes()
