import numpy as np
import pytest

from bbtools_tpu.core.dna import encode
from bbtools_tpu.ops.kmer_index import (
    HashKmerIndex,
    SortedKmerIndex,
    build_ref_keys,
    expand_kmers,
    scaffold_kmer_stream,
)
from bbtools_tpu.ops.kmers import (
    canonical_keys_np,
    kmer_mask,
    length_mask,
    middle_mask,
    rc_kmer,
    rc_kmer_np,
    rolling_kmers_jnp,
    rolling_kmers_np,
)

rng = np.random.default_rng(42)


def naive_rolling(codes, k):
    """Direct transliteration of the reference scan loop (BBDukProcessorS
    countSetKmers :1545-1553) as the oracle."""
    mask = kmer_mask(k)
    kmer = rkmer = 0
    ln = 0
    out = []
    for i, c in enumerate(codes):
        defined = c < 4
        x = int(c) if defined else 0
        x2 = (3 - int(c)) if defined else 0
        kmer = ((kmer << 2) | x) & mask
        rkmer = ((rkmer >> 2) | (x2 << (2 * (k - 1)))) & mask
        if not defined:
            ln = 0
            rkmer = 0
        else:
            ln += 1
        out.append((kmer, rkmer, ln))
    return out


def random_codes(n, n_prob=0.05):
    c = rng.integers(0, 4, n).astype(np.uint8)
    c[rng.random(n) < n_prob] = 4
    return c


@pytest.mark.parametrize("k", [4, 13, 23, 31])
def test_rolling_matches_reference_loop(k):
    codes = random_codes(300)
    fwd, rkm, runlen = rolling_kmers_np(codes[None, :], k)
    oracle = naive_rolling(codes, k)
    for i, (okm, ork, oln) in enumerate(oracle):
        assert fwd[0, i] == okm, f"fwd mismatch at {i}"
        # rkmer only matters where a hit is possible (runlen>=1); the
        # vectorized version reproduces the register exactly anyway
        assert rkm[0, i] == ork, f"rkm mismatch at {i} (len={oln})"
        assert runlen[0, i] == min(oln, i + 1) or runlen[0, i] == oln


def test_rolling_jnp_matches_np():
    codes = np.stack([random_codes(200) for _ in range(8)])
    k = 23
    import jax

    fwd_n, rkm_n, len_n = rolling_kmers_np(codes, k)
    fwd_j, rkm_j, len_j = jax.jit(lambda c: rolling_kmers_jnp(c, k))(codes)
    np.testing.assert_array_equal(np.asarray(fwd_j), fwd_n)
    np.testing.assert_array_equal(np.asarray(rkm_j), rkm_n)
    np.testing.assert_array_equal(np.asarray(len_j), len_n)


def test_rc_kmer():
    k = 5
    km = 0b01_10_11_00_01  # CGTAC
    assert rc_kmer(km, k) == rc_kmer_np(np.array([km]), k)[0]
    # rc of rc is identity
    assert rc_kmer(rc_kmer(km, k), k) == km


@pytest.mark.parametrize("k", [7, 23])
def test_expand_hdist1_set(k):
    km = int(rng.integers(0, kmer_mask(k)))
    keys, src = expand_kmers(np.array([km]), k, 1)
    assert len(keys) == 1 + 3 * k
    # brute-force set of canonical keys within hamming distance 1
    expected = set()
    for cand in [km] + [
        (km & ~(3 << (2 * i))) | (j << (2 * i))
        for i in range(k)
        for j in range(4)
    ]:
        expected.add(
            int(
                canonical_keys_np(
                    np.array([cand]), rc_kmer_np(np.array([cand]), k), k
                )[0]
            )
        )
    assert set(int(x) for x in keys) == expected


def test_expand_hdist2_matches_recursive_count():
    k = 5
    km = int(rng.integers(0, kmer_mask(k)))
    keys, _ = expand_kmers(np.array([km]), k, 2)
    # stream length: 1 + 3k*(1+3k)
    assert len(keys) == 1 + 3 * k * (1 + 3 * k)


def test_build_ref_keys_simple():
    seq = b"ACGTACGTGGAA"
    k = 4
    keys, ids = build_ref_keys([encode(seq)], k)
    # expected: canonical keys of all 9 windows
    expected = set()
    for i in range(len(seq) - k + 1):
        kk = 0
        for c in encode(seq[i : i + k]):
            kk = (kk << 2) | int(c)
        expected.add(
            int(
                canonical_keys_np(
                    np.array([kk]), rc_kmer_np(np.array([kk]), k), k
                )[0]
            )
        )
    assert set(int(x) for x in keys) == expected
    assert np.all(ids == 1)
    assert np.all(np.diff(keys) > 0)


def test_build_first_id_wins():
    # same sequence in two scaffolds -> id stays 1
    seq = encode(b"ACGTACGTACGTACG")
    keys, ids = build_ref_keys([seq, seq], 6)
    assert np.all(ids == 1)
    # different second scaffold gets its own id
    keys2, ids2 = build_ref_keys([seq, encode(b"TTTTTTTTTT")], 6)
    assert set(ids2.tolist()) == {1, 2}


def test_short_kmers_at_ends():
    seq = encode(b"ACGTACGTACGT")
    k, mink = 8, 4
    fwd, rkm, sf, sl, _extras = scaffold_kmer_stream(seq, k, mink)
    assert len(sf) == k - mink and len(sl) == k - mink
    # prefix short kmer of length 5 == first 5 bases
    km5 = [s for s in sf if s[2] == 5][0]
    expect = 0
    for c in seq[:5]:
        expect = (expect << 2) | int(c)
    assert km5[0] == expect
    # suffix short kmer of length 5 == last 5 bases
    km5b = [s for s in sl if s[2] == 5][0]
    expect = 0
    for c in seq[-5:]:
        expect = (expect << 2) | int(c)
    assert km5b[0] == expect
    # keys from different lengths never collide
    keys, ids = build_ref_keys([seq], k, mink=mink)
    lens = np.array([int(x).bit_length() for x in keys])
    assert set(lens.tolist()) <= {2 * L + 1 for L in range(mink, k + 1)}


def test_mask_middle():
    k = 23
    mm = middle_mask(k, 2 - (k & 1))  # default midMaskLen for odd k = 1
    # middle base (position 11 from LSB) masked
    assert mm & (3 << (2 * 11)) == 0
    assert bin(~mm & kmer_mask(k)).count("1") == 2


@pytest.mark.parametrize("builder", ["sorted", "hash"])
def test_index_lookup(builder):
    k = 23
    seqs = [random_codes(500, n_prob=0.0) for _ in range(3)]
    keys, ids = build_ref_keys(seqs, k, hdist=0)
    sidx = SortedKmerIndex(keys, ids)
    queries = np.concatenate(
        [keys[:: max(1, len(keys) // 100)], rng.integers(0, 1 << 47, 200)]
    ).astype(np.int64) | np.int64(length_mask(k))
    ref = sidx.lookup_np(queries)
    if builder == "sorted":
        kk, ii = sidx.device_arrays()
        got = np.asarray(SortedKmerIndex.lookup_jnp(kk, ii, queries))
    else:
        hidx = HashKmerIndex.build(keys, ids)
        got_np = hidx.lookup_np(queries)
        np.testing.assert_array_equal(got_np, ref)
        hi, lo, ii = hidx.device_arrays()
        import jax

        f = jax.jit(
            lambda q: HashKmerIndex.lookup_jnp(
                hi, lo, ii, hidx.cap, hidx.max_probe, q
            )
        )
        got = np.asarray(f(queries))
    np.testing.assert_array_equal(got, ref)


def test_distributed_helpers():
    from bbtools_tpu.parallel.distributed import global_mesh, initialize

    assert initialize() is False  # single-host no-op
    m = global_mesh()
    assert m.shape["dp"] * m.shape["tp"] == 8
    m2 = global_mesh(tp=4)
    assert m2.shape == {"dp": 2, "tp": 4}


def test_count_batchw_device_matches_host():
    """Device W-word sort-reduce == host radix/np path, k=62 and k=93."""
    import numpy as np

    from bbtools_tpu.ops import kmers2 as K

    rng = np.random.default_rng(11)
    bases = rng.integers(0, 4, (64, 151)).astype(np.uint8)
    bases[rng.random(bases.shape) < 0.01] = 4
    lens = np.full(64, 151, np.int32)
    lens[:5] = rng.integers(20, 151, 5)
    for k in (62, 93):
        words, rwords, runlen = K.rolling_kmersw_np(bases, k)
        i_idx = np.arange(151)[None, :]
        valid = (runlen >= k) & (i_idx < lens[:, None])
        cw = K.canonical_words(words, rwords)[valid]
        keys = K.words_to_bytes(cw)
        keys.sort()
        if len(keys):
            new = np.concatenate([[True], keys[1:] != keys[:-1]])
            starts = np.flatnonzero(new)
            want_k = keys[starts]
            want_c = np.diff(np.append(starts, len(keys))).astype(np.int64)
        else:
            want_k, want_c = keys, np.zeros(0, np.int64)
        got_k, got_c = K.count_batchw_device(bases, lens, k)
        np.testing.assert_array_equal(got_k, want_k)
        np.testing.assert_array_equal(got_c, want_c)


def test_rolling_kmersw_jnp_matches_np():
    import numpy as np

    from bbtools_tpu.ops import kmers2 as K

    rng = np.random.default_rng(12)
    bases = rng.integers(0, 4, (16, 100)).astype(np.uint8)
    bases[rng.random(bases.shape) < 0.02] = 4
    for k in (40, 62, 75):
        wn, rn, rln = K.rolling_kmersw_np(bases, k)
        import jax.numpy as jnp

        wj, rj, rlj = K.rolling_kmersw_jnp(jnp.asarray(bases), k)
        np.testing.assert_array_equal(np.asarray(wj), wn)
        np.testing.assert_array_equal(np.asarray(rj), rn)
        np.testing.assert_array_equal(np.asarray(rlj), rln)
