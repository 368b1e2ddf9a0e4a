"""Behavior tests for the round-2 third tool batch: countduplicates,
commonkmers, kmerposition, mergebarcodes, removesmartbell, filtersubs,
kmercoverage, bbrealign, fungalrelease, gradebins."""

import numpy as np

from bbtools_tpu.cli import main

ACGT = np.frombuffer(b"ACGT", np.uint8)


def _write_fq(path, recs):
    data = b"".join(
        b"@%s\n%s\n+\n%s\n" % (n, s, q if q else b"I" * len(s))
        for n, s, q in recs
    )
    with open(path, "wb") as f:
        f.write(data)


def _read_fq(path):
    lines = open(path, "rb").read().splitlines()
    return [
        (lines[i][1:], lines[i + 1], lines[i + 3])
        for i in range(0, len(lines), 4)
    ]


def test_countduplicates(tmp_path, capsys):
    rng = np.random.default_rng(0)
    uniq = [
        (b"u%d" % i, rng.choice(ACGT, 60).tobytes(), b"") for i in range(10)
    ]
    dups = [(b"d%d" % i, uniq[0][1], b"") for i in range(3)]
    _write_fq(tmp_path / "in.fq", uniq + dups)
    from bbtools_tpu.models.misctools import countduplicates

    total, uniques, dup = countduplicates([
        f"in={tmp_path}/in.fq", f"out={tmp_path}/o.fq",
        f"outd={tmp_path}/d.txt",
    ])
    assert (total, uniques, dup) == (13, 10, 3)
    kept = [n for n, _, _ in _read_fq(tmp_path / "o.fq")]
    assert len(kept) == 10 and b"d0" not in kept
    headers = (tmp_path / "d.txt").read_bytes().splitlines()
    assert headers == [b"d0", b"d1", b"d2"]


def test_commonkmers(tmp_path):
    _write_fq(tmp_path / "in.fq", [(b"r", b"AAAAACAC", b"")])
    main([
        "commonkmers", f"in={tmp_path}/in.fq", f"out={tmp_path}/o.txt",
        "k=2", "display=2",
    ])
    out = (tmp_path / "o.txt").read_bytes()
    assert out == b"r\tAA=4,AC=2\n"


def test_kmerposition(tmp_path):
    ref = b"ACGTACGTTGCAACGGTCAG"
    reads = [
        (b"a", b"TTTTT" + ref + b"TTTTT", b""),
        (b"b", b"GGGGCCCCGGGGCCCCGGGGCCCCGGGGCC", b""),
    ]
    _write_fq(tmp_path / "r.fq", reads)
    (tmp_path / "ref.fa").write_bytes(b">x\n" + ref + b"\n")
    main([
        "kmerposition", f"in={tmp_path}/r.fq", f"ref={tmp_path}/ref.fa",
        f"out={tmp_path}/o.txt", "k=20",
    ])
    rows = {
        int(r.split(b"\t")[0]): int(r.split(b"\t")[1])
        for r in (tmp_path / "o.txt").read_bytes().splitlines()[1:]
    }
    assert rows[5] == 1 and sum(rows.values()) == 1


def test_mergebarcodes(tmp_path):
    _write_fq(tmp_path / "in.fq", [(b"r1", b"ACGTACGT", b"")])
    _write_fq(tmp_path / "bar.fq", [(b"r1", b"TTGGCC", b"IIIIII")])
    main([
        "mergebarcodes", f"in={tmp_path}/in.fq", f"barcode={tmp_path}/bar.fq",
        f"out={tmp_path}/o.fq",
    ])
    assert _read_fq(tmp_path / "o.fq")[0][0] == b"r1_TTGGCC_IIIIII"


def test_removesmartbell(tmp_path):
    from bbtools_tpu.models.misctools import SMRTBELL

    rng = np.random.default_rng(1)
    left = rng.choice(ACGT, 200).tobytes()
    right = rng.choice(ACGT, 150).tobytes()
    # adapter with 2 errors
    ad = bytearray(SMRTBELL)
    ad[5] = ord("A") if ad[5] != ord("A") else ord("C")
    _write_fq(tmp_path / "in.fq", [(b"z", left + bytes(ad) + right, b"")])
    main([
        "removesmartbell", f"in={tmp_path}/in.fq", f"out={tmp_path}/o.fq",
        "split=t",
    ])
    parts = _read_fq(tmp_path / "o.fq")
    assert [p[1] for p in parts] == [left, right]
    main([
        "removesmartbell", f"in={tmp_path}/in.fq", f"out={tmp_path}/m.fq",
        "split=f",
    ])
    masked = _read_fq(tmp_path / "m.fq")[0][1]
    assert masked == left + b"X" * len(SMRTBELL) + right


def test_filtersubs(tmp_path):
    header = b"@SQ\tSN:c\tLN:100\n"
    # read with one X (sub) at read pos 5, qual '5' (phred 20)
    q = bytearray(b"I" * 10)
    q[5] = 33 + 20
    lines = [
        header,
        b"s1\t0\tc\t1\t40\t5=1X4=\t*\t0\t0\t" + b"A" * 10 + b"\t" + bytes(q) + b"\n",
        b"s2\t0\tc\t1\t40\t10=\t*\t0\t0\t" + b"A" * 10 + b"\tIIIIIIIIII\n",
    ]
    (tmp_path / "in.sam").write_bytes(b"".join(lines))
    main([
        "filtersubs", f"in={tmp_path}/in.sam", f"out={tmp_path}/o.sam",
        "minq=15", "maxq=25", "countindels=f",
    ])
    out = (tmp_path / "o.sam").read_bytes()
    assert b"s1\t" in out and b"s2\t" not in out
    main([
        "filtersubs", f"in={tmp_path}/in.sam", f"out={tmp_path}/o2.sam",
        "minq=30", "maxq=40", "countindels=f",
    ])
    assert b"s1\t" not in (tmp_path / "o2.sam").read_bytes()


def test_kmercoverage(tmp_path):
    rng = np.random.default_rng(2)
    base = rng.choice(ACGT, 100).tobytes()
    recs = [(b"r%d" % i, base, b"") for i in range(5)]
    recs.append((b"lone", rng.choice(ACGT, 100).tobytes(), b""))
    _write_fq(tmp_path / "in.fq", recs)
    main([
        "kmercoverage", f"in={tmp_path}/in.fq", f"out={tmp_path}/o.fq",
        f"hist={tmp_path}/h.txt", "k=31",
    ])
    anns = {
        n.split(b" ")[0]: n for n, _, _ in _read_fq(tmp_path / "o.fq")
    }
    assert b"min=5" in anns[b"r0"]
    assert b"min=1" in anns[b"lone"]
    assert (tmp_path / "h.txt").read_bytes().startswith(b"#depth")


def test_bbrealign(tmp_path):
    rng = np.random.default_rng(3)
    ref = rng.choice(ACGT, 400).tobytes()
    (tmp_path / "ref.fa").write_bytes(b">c\n" + ref + b"\n")
    # a read matching ref[100:160] but with a sloppy alignment record:
    # wrong position and a fully-soft-clipped-ish noisy cigar
    seg = ref[100:160]
    lines = [
        b"@SQ\tSN:c\tLN:400\n",
        b"r\t0\tc\t95\t10\t20S40M\t*\t0\t0\t" + seg + b"\t" + b"I" * 60 + b"\n",
    ]
    (tmp_path / "in.sam").write_bytes(b"".join(lines))
    from bbtools_tpu.models.bbrealign import main as bbrealign

    realigned, total = bbrealign([
        f"in={tmp_path}/in.sam", f"ref={tmp_path}/ref.fa",
        f"out={tmp_path}/o.sam",
    ])
    assert total == 1 and realigned == 1
    body = [
        ln for ln in (tmp_path / "o.sam").read_bytes().splitlines()
        if not ln.startswith(b"@")
    ]
    f = body[0].split(b"\t")
    assert int(f[3]) == 101 and f[5] == b"60="


def test_fungalrelease(tmp_path):
    rng = np.random.default_rng(4)
    c1 = rng.choice(ACGT, 120).tobytes()
    c2 = rng.choice(ACGT, 80).tobytes()
    small = rng.choice(ACGT, 30).tobytes()
    big = rng.choice(ACGT, 300).tobytes()
    (tmp_path / "asm.fa").write_bytes(
        b">sA desc\n" + c1 + b"NNN" + c2 + b"\n>sB\n" + small
        + b"\n>sC\n" + big + b"\n"
    )
    main([
        "fungalrelease", f"in={tmp_path}/asm.fa", f"out={tmp_path}/o.fa",
        f"outc={tmp_path}/c.fa", f"agp={tmp_path}/o.agp",
        f"legend={tmp_path}/leg.txt", "minscaf=50", "mingap=10",
    ])
    out = (tmp_path / "o.fa").read_bytes()
    # sB dropped (<50); sC is longest -> scaffold_1; gap expanded to 10 Ns
    assert out.index(b">scaffold_1\n") < out.index(b">scaffold_2\n")
    seqs = {}
    name = None
    for ln in out.splitlines():
        if ln.startswith(b">"):
            name = ln[1:]
            seqs[name] = b""
        else:
            seqs[name] += ln
    assert seqs[b"scaffold_1"] == big
    assert seqs[b"scaffold_2"] == c1 + b"N" * 10 + c2
    contigs = (tmp_path / "c.fa").read_bytes()
    assert b">scaffold_2_c1" in contigs and b">scaffold_2_c3" in contigs
    agp = (tmp_path / "o.agp").read_bytes()
    assert b"\tN\t10\tscaffold\t" in agp
    leg = (tmp_path / "leg.txt").read_bytes()
    assert b"sC\tscaffold_1" in leg


def test_gradebins(tmp_path):
    rng = np.random.default_rng(5)
    a = rng.choice(ACGT, 1000).tobytes()
    b = rng.choice(ACGT, 500).tobytes()
    c = rng.choice(ACGT, 1500).tobytes()
    (tmp_path / "ref.fa").write_bytes(
        b">c1 tid_7\n" + a + b"\n>c2 tid_7\n" + b + b"\n>c3 tid_9\n" + c + b"\n"
    )
    # bin1: all of tid_7's c1 plus tid_9 contamination c3
    (tmp_path / "bin1.fa").write_bytes(
        b">c1 tid_7\n" + a + b"\n>c3 tid_9\n" + c + b"\n"
    )
    from bbtools_tpu.models.gradebins import main as gradebins

    rows = gradebins([
        f"{tmp_path}/bin1.fa", f"ref={tmp_path}/ref.fa",
        f"report={tmp_path}/rep.txt",
    ])
    name, total, primary, completeness, contam = rows[0]
    # primary = tid_9 (1500 of 2500 bases)
    assert primary == 9 and total == 2500
    assert abs(completeness - 1.0) < 1e-6  # all of tid_9 present
    assert abs(contam - 1000 / 2500) < 1e-6
    rep = (tmp_path / "rep.txt").read_bytes()
    assert rep.startswith(b"#CompletenessScore")
