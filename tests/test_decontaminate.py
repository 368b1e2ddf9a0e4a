"""Decontaminate (crossblock) pipeline: cross-contamination removal via
joint normalization (jgi/DecontaminateByNormalization.java).

Scenario: library A's assembly contains a contig that actually belongs
to library B (deep in B's reads, shallow in A's). Joint normalization
discards most of A's few contaminating copies (the k-mers are deep in
the combined stream), so the contig's coverage in A collapses and the
ratio filter removes it — while A's genuine contig and B's own copy
survive.
"""

import numpy as np
import pytest

from bbtools_tpu.models import decontaminate
from bbtools_tpu.models import pileup


def _random_codes(n, seed):
    return np.random.default_rng(seed).integers(0, 4, n).astype(np.uint8)


def _tile_reads(codes: np.ndarray, depth: int, read_len: int, prefix: bytes,
                seed: int):
    """Deterministic ~depth-x tiling reads over one contig."""
    from bbtools_tpu.core.dna import CODE_TO_BASE

    rng = np.random.default_rng(seed)
    n = max(1, int(depth * len(codes) / read_len))
    out = []
    qual = b"I" * read_len
    for i in range(n):
        start = int(rng.integers(0, len(codes) - read_len + 1))
        r = codes[start : start + read_len]
        out.append((b"%s_%d" % (prefix, i),
                    CODE_TO_BASE[np.minimum(r, 4)].tobytes(), qual))
    return out


def _write_fq(path, reads):
    with open(path, "wb") as fh:
        for name, seq, qual in reads:
            fh.write(b"@" + name + b"\n" + seq + b"\n+\n" + qual + b"\n")


def _write_fa(path, contigs):
    with open(path, "wb") as fh:
        for name, seq in contigs:
            fh.write(b">" + name + b"\n" + seq + b"\n")


def _seqs(path):
    names = set()
    with open(path, "rb") as fh:
        for ln in fh.read().splitlines():
            if ln.startswith(b">"):
                names.add(ln[1:].split()[0])
    return names


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("decon")
    contig_a = _random_codes(600, 11)
    contig_b = _random_codes(600, 12)
    contam = _random_codes(600, 13)
    from bbtools_tpu.core.dna import CODE_TO_BASE

    def seq(codes):
        return CODE_TO_BASE[np.minimum(codes, 4)].tobytes()

    _write_fa(tmp / "libA.fa", [(b"contigA", seq(contig_a)),
                                (b"contamS", seq(contam))])
    _write_fa(tmp / "libB.fa", [(b"contigB", seq(contig_b)),
                                (b"contamS", seq(contam))])
    reads_a = (_tile_reads(contig_a, 50, 100, b"a", 1)
               + _tile_reads(contam, 3, 100, b"ac", 2))
    reads_b = (_tile_reads(contig_b, 50, 100, b"b", 3)
               + _tile_reads(contam, 50, 100, b"bc", 4))
    _write_fq(tmp / "libA.fq", reads_a)
    _write_fq(tmp / "libB.fq", reads_b)
    decontaminate.main([
        f"reads={tmp}/libA.fq,{tmp}/libB.fq",
        f"ref={tmp}/libA.fa,{tmp}/libB.fa",
        f"out={tmp}/out", "minl=200", "minr=18", "target=20", "mindepth=2",
    ])
    return tmp


def test_contaminant_removed_from_library_a(pipeline):
    tmp = pipeline
    clean = _seqs(tmp / "out" / "libA_clean.fasta")
    dirty = _seqs(tmp / "out" / "libA_dirty.fasta")
    assert b"contigA" in clean
    assert b"contamS" in dirty and b"contamS" not in clean


def test_true_contigs_survive_in_library_b(pipeline):
    tmp = pipeline
    clean = _seqs(tmp / "out" / "libB_clean.fasta")
    assert b"contigB" in clean and b"contamS" in clean


def test_results_log(pipeline):
    tmp = pipeline
    lines = (tmp / "out" / "results.txt").read_bytes().splitlines()
    assert lines[0].startswith(b"#assembly\tcontig\tcontam")
    # one header + 2 contigs per library
    assert len(lines) == 5
    rows = {tuple(l.split(b"\t")[:3]) for l in lines[1:]}
    assert (b"libA.fa", b"contamS", b"1") in rows
    assert (b"libB.fa", b"contamS", b"0") in rows


def test_pileup_under_window_column(tmp_path):
    # contig with a long zero-coverage tail: Under_5/100 counts it
    from bbtools_tpu.core.dna import CODE_TO_BASE

    codes = _random_codes(900, 7)
    seq = CODE_TO_BASE[np.minimum(codes, 4)].tobytes()
    _write_fa(tmp_path / "r.fa", [(b"s1", seq)])
    # reads covering only the first 300bp, 10x
    sam_lines = [b"@HD\tVN:1.4"]
    for i in range(30):
        pos = (i * 7) % 200 + 1
        sam_lines.append(
            b"r%d\t0\ts1\t%d\t40\t100M\t*\t0\t0\t%s\t%s"
            % (i, pos, seq[pos - 1 : pos + 99], b"I" * 100)
        )
    (tmp_path / "a.sam").write_bytes(b"\n".join(sam_lines) + b"\n")
    pileup.main([
        f"in={tmp_path}/a.sam", f"ref={tmp_path}/r.fa",
        f"out={tmp_path}/cov.txt", "covwindow=100", "covwindowavg=5",
    ])
    lines = (tmp_path / "cov.txt").read_bytes().splitlines()
    hdr = lines[0].split(b"\t")
    assert hdr[-1] == b"Under_5/100"
    under = int(lines[1].split(b"\t")[-1])
    # the uncovered tail (~600bp) must be flagged, the covered head not
    assert 450 <= under <= 750
