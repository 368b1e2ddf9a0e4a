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
