import numpy as np

from bbtools_tpu.ops.kmer_count import (
    KmerSpectrum,
    count_batch,
    count_batch_np,
)

rng = np.random.default_rng(5)


def random_reads(n, L, n_prob=0.02):
    c = rng.integers(0, 4, (n, L)).astype(np.uint8)
    c[rng.random((n, L)) < n_prob] = 4
    return c


def test_count_batch_matches_oracle():
    k = 31
    bases = random_reads(32, 100)
    lengths = rng.integers(10, 101, 32).astype(np.int32)
    v, c = count_batch(bases, lengths, k)
    vn, cn = count_batch_np(bases, lengths, k)
    np.testing.assert_array_equal(v, vn)
    np.testing.assert_array_equal(c, cn)


def test_spectrum_merge():
    k = 15
    spec = KmerSpectrum(k)
    all_v = []
    all_c = []
    for _ in range(5):
        bases = random_reads(16, 60)
        lengths = np.full(16, 60, np.int32)
        v, c = count_batch_np(bases, lengths, k)
        spec.add_batch(v, c)
        all_v.append(v)
        all_c.append(c)
    spec.flush()
    # oracle: merge dicts
    want: dict[int, int] = {}
    for v, c in zip(all_v, all_c):
        for kk, cc in zip(v, c):
            want[int(kk)] = want.get(int(kk), 0) + int(cc)
    assert spec.n_unique == len(want)
    got = dict(zip(spec.keys.tolist(), spec.counts.tolist()))
    assert got == want
    h = spec.histogram(100)
    assert h.sum() == len(want)
    assert int(h[1]) == sum(1 for x in want.values() if x == 1)


def test_kmercountexact_files(tmp_path):
    fin = tmp_path / "in.fq"
    seq = b"ACGTACGTTGCAGGTCAACGTTACGT"
    with open(fin, "wb") as fh:
        for i in range(10):  # same read 10x -> every kmer count=10
            fh.write(b"@r%d\n" % i + seq + b"\n+\n" + b"I" * len(seq) + b"\n")
    khist = tmp_path / "khist.txt"
    dump = tmp_path / "dump.fa"
    from bbtools_tpu.models.kmercountexact import main

    spec = main(
        [
            f"in={fin}",
            "k=15",
            f"khist={khist}",
            f"dump={dump}",
            "printzeros=f",
        ]
    )
    n_kmers = len(seq) - 15 + 1
    assert spec.n_unique == n_kmers
    lines = khist.read_bytes().splitlines()
    assert lines[0] == b"#Depth\tCount"
    assert lines[1] == b"10\t%d" % n_kmers
    dump_lines = dump.read_bytes().splitlines()
    assert len(dump_lines) == 2 * n_kmers
    assert dump_lines[0] == b">10"
    assert len(dump_lines[1]) == 15


def test_bigk_exact_spectrum():
    import numpy as np

    from bbtools_tpu.ops.kmers2 import (
        BigSpectrum,
        count_batch2_exact,
        rolling_kmers2_np,
        canonical_pair,
    )

    rng = np.random.default_rng(7)
    k = 45
    # one read repeated 3x plus a distinct read: repeat kmers count 3
    r1 = rng.integers(0, 4, 120).astype(np.uint8)
    r2 = rng.integers(0, 4, 120).astype(np.uint8)
    bases = np.stack([r1, r1, r1, r2])
    lens = np.full(4, 120, np.int64)
    hi, lo, c = count_batch2_exact(bases, lens, k)
    n_per_read = 120 - k + 1
    assert c.sum() == 4 * n_per_read
    assert sorted(set(c.tolist())) == [1, 3]
    assert (c == 3).sum() == n_per_read  # r1 kmers (assuming no overlap)

    spec = BigSpectrum(k)
    # two batches merge exactly
    spec.add_batch(*count_batch2_exact(bases[:2], lens[:2], k))
    spec.add_batch(*count_batch2_exact(bases[2:], lens[2:], k))
    spec.flush()
    assert spec.counts.sum() == 4 * n_per_read
    assert sorted(set(spec.counts.tolist())) == [1, 3]

    # exact lookup round trip
    got = spec.count_of(hi, lo)
    np.testing.assert_array_equal(got, c)
    # absent kmer -> 0
    assert spec.count_of(np.array([123456]), np.array([654321]))[0] == 0


def test_bigk_dump_text(tmp_path):
    import numpy as np

    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.models.kmercountexact import main as kce_main

    rng = np.random.default_rng(8)
    seq = CODE_TO_BASE[rng.integers(0, 4, 80)].tobytes()
    fin = tmp_path / "in.fq"
    fin.write_bytes(b"@r\n" + seq + b"\n+\n" + b"F" * 80 + b"\n")
    dump = tmp_path / "kmers.fa"
    kce_main([f"in={fin}", f"out={dump}", "k=40"])
    lines = dump.read_bytes().splitlines()
    assert len(lines) == 2 * (80 - 40 + 1)
    # each dumped kmer is 40bp and occurs in the read or its rc
    from bbtools_tpu.core.dna import reverse_complement

    rc = reverse_complement(seq)
    for j in range(1, len(lines), 2):
        km = lines[j]
        assert len(km) == 40
        assert km in seq or km in rc


def test_wordspectrum_k93_vs_bruteforce():
    import numpy as np

    from bbtools_tpu.ops.kmers2 import WordSpectrum, count_batchw_exact

    rng = np.random.default_rng(9)
    k = 93
    r1 = rng.integers(0, 4, 200).astype(np.uint8)
    r2 = rng.integers(0, 4, 200).astype(np.uint8)
    bases = np.stack([r1, r1, r2])
    lens = np.full(3, 200, np.int64)
    keys, c = count_batchw_exact(bases, lens, k)
    n_per = 200 - k + 1
    assert c.sum() == 3 * n_per
    assert (c == 2).sum() == n_per  # r1 kmers

    spec = WordSpectrum(k)
    spec.add_batch(*count_batchw_exact(bases[:1], lens[:1], k))
    spec.add_batch(*count_batchw_exact(bases[1:], lens[1:], k))
    spec.flush()
    np.testing.assert_array_equal(spec.count_of(keys), c)

    # brute-force cross-check of counts via python strings
    from collections import Counter

    comp = {0: 3, 1: 2, 2: 1, 3: 0}
    cnt = Counter()
    for row in bases:
        s = list(map(int, row))
        for p in range(len(s) - k + 1):
            f = tuple(s[p : p + k])
            r = tuple(comp[x] for x in reversed(f))
            cnt[max(f, r)] += 1
    assert sorted(cnt.values()) == sorted(c.tolist())


def test_kce_dump_k93_roundtrip(tmp_path):
    import numpy as np

    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.models.kmercountexact import main as kce_main

    rng = np.random.default_rng(10)
    codes = rng.integers(0, 4, 160)
    seq = CODE_TO_BASE[codes].tobytes()
    fin = tmp_path / "in.fq"
    fin.write_bytes(b"@r\n" + seq + b"\n+\n" + b"F" * 160 + b"\n")
    dump = tmp_path / "kmers.fa"
    k = 93
    kce_main([f"in={fin}", f"out={dump}", f"k={k}"])
    lines = dump.read_bytes().splitlines()
    assert len(lines) == 2 * (160 - k + 1)
    # every dumped kmer must be a substring of the read or its rc
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    rc = seq.translate(comp)[::-1]
    for l in lines[1::2]:
        assert len(l) == k
        assert l in seq or l in rc


def test_native_radix_count_matches_numpy():
    import numpy as np

    from bbtools_tpu.native import radix_count_native, radix_count_w_native

    rng = np.random.default_rng(17)
    keys = rng.integers(0, 1 << 62, 200_000, dtype=np.int64)
    keys[::3] = keys[1::3][: len(keys[::3])][: len(keys[::3])]  # dupes
    res = radix_count_native(keys.copy())
    if res is None:
        import pytest

        pytest.skip("no native toolchain")
    vals, counts = res
    wv, wc = np.unique(keys.astype(np.uint64), return_counts=True)
    np.testing.assert_array_equal(vals, wv)
    np.testing.assert_array_equal(counts, wc)

    rows = rng.integers(0, 1 << 60, (50_000, 3), dtype=np.int64)
    rows[::2] = rows[1::2][: len(rows[::2])]
    res = radix_count_w_native(rows.copy())
    vals, counts = res
    order = np.lexsort(
        tuple(rows[:, w].astype(np.uint64) for w in range(2, -1, -1))
    )
    rs = rows[order].astype(np.uint64)
    new = np.concatenate([[True], (rs[1:] != rs[:-1]).any(axis=1)])
    starts = np.flatnonzero(new)
    wc = np.diff(np.append(starts, len(rs)))
    np.testing.assert_array_equal(vals, rs[starts])
    np.testing.assert_array_equal(counts, wc)


def test_device_spectrum_matches_host_spectrum():
    """DeviceSpectrum (device-resident fused accumulate, incl. a
    capacity-growth retry) equals the host KmerSpectrum exactly."""
    import numpy as np

    from bbtools_tpu.ops.kmer_count import (
        DeviceSpectrum,
        KmerSpectrum,
        count_batch_np,
    )

    g = np.random.default_rng(3)
    ds = DeviceSpectrum(31, cap=1 << 10)  # tiny: forces growth mid-run
    ks = KmerSpectrum(31)
    for bi in range(3):
        bases = g.integers(0, 4, (64, 120)).astype(np.uint8)
        bases[::3] = bases[0]
        lengths = np.full(64, 120, np.int32)
        lengths[7] = 40
        ds.add_batch(bases, lengths)
        v, c = count_batch_np(bases, lengths, 31)
        ks.add_batch(v, c)
    ks.flush()
    dk, dc = ds.spectrum()
    assert (dk == ks.keys).all()
    assert (dc == ks.counts).all()
    assert (ds.histogram(100) == ks.histogram(100)).all()
    assert ds.cap > 1 << 10  # growth actually happened


def test_device_spectrum_adversarial_late_overflow():
    """Deferred-sync replay correctness under the worst case: with
    sync_every=4, every batch brings mostly-new keys so the capacity
    overflows LATE inside each sync window (on unsynced batches whose
    n_runs scalars are still on device). The checkpoint/replay must
    reproduce the host spectrum exactly, repeatedly, across several
    consecutive growth-and-replay cycles."""
    import numpy as np

    from bbtools_tpu.ops.kmer_count import (
        DeviceSpectrum,
        KmerSpectrum,
        count_batch_np,
    )

    g = np.random.default_rng(11)
    ds = DeviceSpectrum(31, cap=1 << 9, sync_every=4)  # 512-row carry
    ks = KmerSpectrum(31)
    for bi in range(10):
        # ~1.6k distinct kmers per batch -> overflow nearly every window
        bases = g.integers(0, 4, (16, 120)).astype(np.uint8)
        lengths = np.full(16, 120, np.int32)
        ds.add_batch(bases, lengths)
        v, c = count_batch_np(bases, lengths, 31)
        ks.add_batch(v, c)
    ks.flush()
    dk, dc = ds.spectrum()
    assert (dk == ks.keys).all()
    assert (dc == ks.counts).all()
    assert ds.cap >= len(ks.keys)
    assert (ds.histogram(64) == ks.histogram(64)).all()
