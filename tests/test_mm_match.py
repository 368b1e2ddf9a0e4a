"""MXU one-hot-matmul k-mer matcher vs the gather-index oracle.

The contract: for every canonical masked tagged query key, mm lookup
returns exactly the id the expanded gather table (build_ref_keys,
first-insertion-wins) stores for that key, with NO load-side hdist
expansion on the mm side.
"""

import numpy as np
import pytest

from bbtools_tpu.ops.kmer_index import build_ref_keys
from bbtools_tpu.ops.kmers import (
    length_mask,
    middle_mask,
    rc_kmer_np,
)
from bbtools_tpu.ops.mm_match import (
    MMKmerIndex,
    _mm_pallas,
    _query_onehot_jnp,
    mm_lookup_jnp,
)

RNG = np.random.default_rng(7)


def _oracle(keys, ids, queries):
    """Exact sorted-table lookup: id or 0."""
    order = np.argsort(keys)
    sk, si = keys[order], ids[order]
    pos = np.searchsorted(sk, queries)
    pos = np.clip(pos, 0, len(sk) - 1) if len(sk) else pos
    hit = (len(sk) > 0) & (sk[pos] == queries) if len(sk) else np.zeros(len(queries), bool)
    return np.where(hit, si[pos] if len(sk) else 0, 0).astype(np.int32)


def _scan_queries(k, mink, mid_mask, ref_kmers, n_random=400):
    """Query keys shaped exactly like the scan's: canonical, masked
    (full-k only), length-tagged. Includes exact ref keys, planted
    hdist-1/2 mutants, rc forms, and random keys, for every class."""
    full = np.int64((1 << (2 * k)) - 1)
    qs = []

    def emit(vals, ln):
        vals = np.asarray(vals, np.int64) & np.int64((1 << (2 * ln)) - 1)
        rc = rc_kmer_np(vals, ln)
        mx = np.maximum(vals, rc)
        msk = np.int64(mid_mask) if ln == k else np.int64(-1)
        qs.append((mx & msk) | np.int64(length_mask(ln)))

    lens = [k] + (list(range(mink, k)) if mink else [])
    for ln in lens:
        base = ref_kmers & np.int64((1 << (2 * ln)) - 1)
        emit(base, ln)
        emit(rc_kmer_np(base, ln), ln)
        # planted mutants at distance 1 and 2
        for _ in range(2):
            pos = RNG.integers(0, ln, len(base))
            delta = RNG.integers(1, 4, len(base)).astype(np.int64)
            base = base ^ (delta << (2 * pos))
            emit(base, ln)
        emit(RNG.integers(0, 1 << (2 * ln), n_random, dtype=np.int64), ln)
    _ = full
    return np.concatenate(qs)


def _check_config(scaffolds, k, mink=0, hdist=0, hdist2=None, mid_mask=-1,
                  ids=None):
    keys, kids = build_ref_keys(
        scaffolds, k, mink=mink, hdist=hdist, hdist2=hdist2,
        mid_mask=mid_mask, ids=ids,
    )
    mm = MMKmerIndex.build(
        scaffolds, k, mink=mink, hdist=hdist, hdist2=hdist2,
        mid_mask=mid_mask, ids=ids,
    )
    assert mm is not None
    ref_kmers = []
    for s in scaffolds:
        for i in range(len(s) - k + 1):
            v = 0
            for c in s[i : i + k]:
                v = (v << 2) | int(c)
            ref_kmers.append(v)
    queries = _scan_queries(k, mink, mid_mask, np.asarray(ref_kmers, np.int64))
    want = _oracle(keys, kids, queries)
    got = mm.lookup_np(queries)
    np.testing.assert_array_equal(got, want)
    # device XLA path
    import jax.numpy as jnp

    km, pr = mm.device_arrays()
    got_x = np.asarray(
        mm_lookup_jnp(km, pr, *mm.static_params(), jnp.asarray(queries))
    )
    np.testing.assert_array_equal(got_x, want)
    return mm, queries, want


def test_exact_no_mask():
    scafs = [RNG.integers(0, 4, 80).astype(np.uint8) for _ in range(4)]
    _check_config(scafs, k=13, mid_mask=-1)


def test_hdist1_no_mask():
    scafs = [RNG.integers(0, 4, 60).astype(np.uint8) for _ in range(3)]
    _check_config(scafs, k=13, hdist=1, mid_mask=-1)


def test_hdist2_no_mask():
    scafs = [RNG.integers(0, 4, 40).astype(np.uint8) for _ in range(2)]
    _check_config(scafs, k=11, hdist=2, mid_mask=-1)


def test_shorts_hdist1():
    scafs = [RNG.integers(0, 4, 50).astype(np.uint8) for _ in range(3)]
    _check_config(scafs, k=13, mink=8, hdist=1, hdist2=0, mid_mask=-1)


def test_shorts_hdist2_both():
    scafs = [RNG.integers(0, 4, 44).astype(np.uint8) for _ in range(2)]
    _check_config(scafs, k=11, mink=7, hdist=1, hdist2=1, mid_mask=-1)


def test_masked_exact():
    k = 13
    mm_bits = middle_mask(k, 2)
    scafs = [RNG.integers(0, 4, 70).astype(np.uint8) for _ in range(3)]
    _check_config(scafs, k=k, mid_mask=mm_bits)


def test_masked_hdist1():
    k = 13
    mm_bits = middle_mask(k, 2)
    scafs = [RNG.integers(0, 4, 70).astype(np.uint8) for _ in range(3)]
    idx = MMKmerIndex.build([scafs[0]], k, hdist=1, mid_mask=mm_bits)
    if idx is None:
        pytest.skip("masked-safety gate declined this panel")
    _check_config(scafs[:1], k=k, hdist=1, mid_mask=mm_bits)


def test_first_insertion_wins_across_scaffolds():
    s0 = RNG.integers(0, 4, 40).astype(np.uint8)
    s1 = np.concatenate([s0[5:25], RNG.integers(0, 4, 30).astype(np.uint8)])
    _check_config([s0, s1], k=13, hdist=1, mid_mask=-1)


def test_rc_duplicate_scaffold():
    s0 = RNG.integers(0, 4, 40).astype(np.uint8)
    s1 = (3 - s0)[::-1].copy()  # reverse complement of s0
    _check_config([s0, s1], k=13, mid_mask=-1)


def test_custom_ids_and_bounds():
    scafs = [RNG.integers(0, 4, 40).astype(np.uint8) for _ in range(2)]
    _check_config(scafs, k=13, mid_mask=-1, ids=[7, 65535])
    assert MMKmerIndex.build(scafs, 13, ids=[0, 2]) is None
    assert MMKmerIndex.build(scafs, 13, ids=[1, 1 << 16]) is None
    assert MMKmerIndex.build(scafs, 33) is None


def test_declines_oversized_panel():
    scaf = RNG.integers(0, 4, MMKmerIndex.MAX_COLS // 2 + 40).astype(np.uint8)
    assert MMKmerIndex.build([scaf], 13) is None


def test_pallas_interpret_matches():
    import jax.numpy as jnp

    scafs = [RNG.integers(0, 4, 60).astype(np.uint8) for _ in range(3)]
    mm, queries, want = _check_config(scafs, k=13, hdist=1, mid_mask=-1)
    km, pr = mm.device_arrays()
    oh = _query_onehot_jnp(jnp.asarray(queries), mm.k, mm.mink, mm.Kp)
    got = np.asarray(_mm_pallas(km, pr, oh, interpret=True))
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# end-to-end: BBDuk on the MXU backend vs the bucket backend
# ---------------------------------------------------------------------------


def _write_panel(tmp_path, n_scafs=150, L=50):
    # 150 x 50bp -> ~4.5k raw keys -> ~290k hdist-1 expanded keys: above
    # the lane index's raised cost cap, so build_index selects the MXU
    # matcher (the point of this test); ~24k raw columns fit it
    lines = []
    for i in range(n_scafs):
        seq = bytes(b"ACGT"[x] for x in RNG.integers(0, 4, L))
        lines.append(b">s%d\n" % i + seq + b"\n")
    p = tmp_path / "panel.fa"
    p.write_bytes(b"".join(lines))
    return p


def _write_reads(tmp_path, panel, n=300, L=100):
    import itertools

    scafs = []
    with open(panel, "rb") as fh:
        for name, seq in itertools.zip_longest(*[iter(fh.read().split())] * 2):
            scafs.append(seq)
    out = []
    for i in range(n):
        insert = bytes(b"ACGT"[x] for x in RNG.integers(0, 4, 70))
        if i % 3 == 0:
            ad = bytearray(scafs[i % len(scafs)][:30])
            ad[7] ^= 1  # one substitution inside the adapter
            seq = insert + bytes(ad)
        elif i % 3 == 1:
            seq = insert + bytes(b"ACGT"[x] for x in RNG.integers(0, 4, 30))
        else:
            seq = insert[:40] + scafs[(i + 5) % len(scafs)][:35] + insert[40:]
        seq = seq[:L]
        out.append(b"@r%d\n" % i + seq + b"\n+\n" + b"F" * len(seq) + b"\n")
    p = tmp_path / "in.fq"
    p.write_bytes(b"".join(out))
    return p


@pytest.mark.parametrize("mode", ["ktrim=r", "ktrim=f"])
def test_bbduk_e2e_mxu_vs_bucket(tmp_path, mode, monkeypatch):
    from bbtools_tpu.models import bbduk as bbduk_mod
    from bbtools_tpu.models.bbduk import BBDuk, parse_args

    panel = _write_panel(tmp_path)
    fin = _write_reads(tmp_path, panel)

    def run(tag, force_bucket):
        out = tmp_path / f"out_{tag}.fq"
        outm = tmp_path / f"outm_{tag}.fq"
        stats = tmp_path / f"stats_{tag}.txt"
        args = [
            f"in={fin}", f"out={out}", f"ref={panel}",
            "k=23", "mink=11", "hdist=1", "minlength=10",
            f"stats={stats}", mode,
        ]
        if mode == "ktrim=f":
            args.append(f"outm={outm}")
        if force_bucket:
            monkeypatch.setattr(bbduk_mod, "_mm_eligible", lambda cfg: False)
        else:
            # production gate requires TPU (CPU matmuls are too slow);
            # force-enable here to exercise the backend on the CPU CI
            monkeypatch.setattr(
                bbduk_mod,
                "_mm_eligible",
                lambda cfg: (
                    cfg.rcomp and cfg.k <= 31 and cfg.edist == 0
                    and (cfg.edist2 or 0) == 0 and cfg.qhdist == 0
                    and (cfg.hdist > 0 or (cfg.hdist2 or 0) > 0)
                    and not (cfg.speed > 0 and cfg.use_short_kmers)
                ),
            )
        duk = BBDuk(parse_args(args))
        if not force_bucket:
            assert isinstance(duk.index, MMKmerIndex), (
                "panel should select the MXU backend"
            )
        duk.run()
        return out.read_bytes(), (
            outm.read_bytes() if mode == "ktrim=f" else b""
        ), stats.read_bytes()

    got = run("mxu", force_bucket=False)
    want = run("bucket", force_bucket=True)
    assert got[0] == want[0]
    assert got[1] == want[1]
    assert got[2] == want[2]
