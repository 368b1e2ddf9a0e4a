"""Behavior tests for the round-2 second tool batch: splitsam, mergesam,
samtoroc, filtervcf, applyvariants, vcf2gff, shuffle, getreads,
replaceheaders, filterbycoverage, randomgenome, makepolymers,
tetramerfreq, callpeaks, polyfilter, repair, mergesorted, filterlines,
countsharedlines, unicode2ascii, phylip2fasta, summarizeseal."""

import numpy as np

from bbtools_tpu.cli import main


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


SAM_HEADER = (
    b"@HD\tVN:1.4\tSO:unsorted\n"
    b"@SQ\tSN:chr1\tLN:1000\n"
    b"@SQ\tSN:chr2\tLN:1000\n"
)


def _sam_line(qname, flag, rname=b"chr1", pos=100, mapq=30, cigar=b"10M",
              rnext=b"=", seq=b"A" * 10):
    return b"\t".join([
        qname, b"%d" % flag, rname, b"%d" % pos, b"%d" % mapq, cigar,
        rnext, b"0", b"0", seq, b"I" * len(seq),
    ]) + b"\n"


def test_splitsam(tmp_path):
    sam = tmp_path / "in.sam"
    sam.write_bytes(
        SAM_HEADER
        + _sam_line(b"p", 0)
        + _sam_line(b"m", 16)
        + _sam_line(b"u", 4, rname=b"*", pos=0, cigar=b"*")
    )
    main([
        "splitsam", str(sam), f"{tmp_path}/p.sam", f"{tmp_path}/m.sam",
        f"{tmp_path}/u.sam", "header",
    ])
    p = (tmp_path / "p.sam").read_bytes()
    m = (tmp_path / "m.sam").read_bytes()
    u = (tmp_path / "u.sam").read_bytes()
    assert b"\np\t0" in p and b"@SQ" in p
    assert b"\nm\t16" in m and b"p\t0" not in m
    assert b"\nu\t4" in u


def test_splitsam6way(tmp_path):
    sam = tmp_path / "in.sam"
    sam.write_bytes(
        SAM_HEADER
        + _sam_line(b"a", 0x40 | 0)        # r1 plus
        + _sam_line(b"a", 0x80 | 16)       # r2 minus
        + _sam_line(b"b", 0x80 | 4, rname=b"*", pos=0, cigar=b"*")  # r2 unmapped
    )
    outs = [f"{tmp_path}/{n}.sam" for n in
            ("r1p", "r1m", "r1u", "r2p", "r2m", "r2u")]
    main(["splitsam6way", str(sam)] + outs)
    assert b"a\t64" in open(outs[0], "rb").read()
    assert b"a\t144" in open(outs[4], "rb").read()
    assert b"b\t132" in open(outs[5], "rb").read()


def test_mergesam(tmp_path):
    s1 = tmp_path / "a.sam"
    s2 = tmp_path / "b.sam"
    s1.write_bytes(SAM_HEADER + _sam_line(b"x", 0))
    s2.write_bytes(SAM_HEADER + _sam_line(b"y", 0))
    main(["mergesam", str(s1), str(s2), f"out={tmp_path}/o.sam"])
    out = (tmp_path / "o.sam").read_bytes()
    assert out.count(b"@HD") == 1 and b"x\t0" in out and b"y\t0" in out


def test_samtoroc(tmp_path):
    # truth headers: r<i>_scaf<idx>_pos<p>_strand<s>_insert0
    sam = tmp_path / "in.sam"
    lines = [SAM_HEADER]
    for i in range(5):
        # correct: scaf0 (chr1) at the truth position
        lines.append(_sam_line(
            b"r%d_scaf0_pos%d_strand0_insert0" % (i, 100 + i),
            0, pos=101 + i, mapq=30,
        ))
    # wrong contig at low mapq
    lines.append(_sam_line(
        b"r9_scaf0_pos50_strand0_insert0", 0, rname=b"chr2", pos=51, mapq=3,
    ))
    sam.write_bytes(b"".join(lines))
    main(["samtoroc", f"in={sam}", f"out={tmp_path}/roc.txt", "reads=6"])
    txt = (tmp_path / "roc.txt").read_bytes()
    rows = [r.split(b"\t") for r in txt.splitlines()[1:]]
    # highest-mapq row: 5 strict true, 0 false
    assert rows[0][0] == b"30" and rows[0][2] == b"5" and rows[0][4] == b"0"
    # cumulative at mapq 3 includes the false mapping
    assert rows[-1][4] == b"1"


VCF = (
    b"##fileformat=VCFv4.2\n"
    b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
    b"chr1\t5\t.\tA\tT\t40.0\tPASS\tTYP=SUB;AD=10;AF=0.9\tGT:DP\t1/1:10\n"
    b"chr1\t12\t.\tCA\tC\t30.0\tPASS\tTYP=DEL;AD=4;AF=0.4\tGT:DP\t0/1:10\n"
    b"chr2\t3\t.\tG\tGTT\t20.0\tPASS\tTYP=INS;AD=2;AF=0.2\tGT:DP\t0/1:10\n"
)


def test_filtervcf(tmp_path):
    vcf = tmp_path / "in.vcf"
    vcf.write_bytes(VCF)
    main(["filtervcf", f"in={vcf}", f"out={tmp_path}/o.vcf", "del=f"])
    out = (tmp_path / "o.vcf").read_bytes()
    assert b"TYP=DEL" not in out and b"TYP=SUB" in out and b"TYP=INS" in out
    main([
        "filtervcf", f"in={vcf}", f"out={tmp_path}/o2.vcf", "minreads=5",
    ])
    out2 = (tmp_path / "o2.vcf").read_bytes()
    assert b"AD=10" in out2 and b"AD=4" not in out2
    main([
        "filtervcf", f"in={vcf}", f"out={tmp_path}/o3.vcf", "contigs=chr2",
    ])
    assert b"chr1" not in (tmp_path / "o3.vcf").read_bytes().split(
        b"#CHROM", 1)[1]
    main(["filtervcf", f"in={vcf}", f"out={tmp_path}/o4.vcf", "hom=t"])
    body = (tmp_path / "o4.vcf").read_bytes().split(b"\n#CHROM", 1)[1]
    assert b"1/1" in body and b"0/1" not in body


def test_applyvariants(tmp_path):
    ref = tmp_path / "ref.fa"
    #        123456789012345
    ref.write_bytes(b">chr1\nAAAAACAAAAACAAA\n>chr2\nGGGGGGGGGG\n")
    vcf = tmp_path / "v.vcf"
    vcf.write_bytes(
        b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        b"chr1\t6\t.\tC\tT\t40\tPASS\tAD=9\n"
        b"chr1\t12\t.\tCA\tC\t40\tPASS\tAD=9\n"
        b"chr2\t3\t.\tG\tGTT\t40\tPASS\tAD=9\n"
    )
    main([
        "applyvariants", f"in={ref}", f"vcf={vcf}", f"out={tmp_path}/o.fa",
    ])
    out = (tmp_path / "o.fa").read_bytes()
    seqs = {}
    name = None
    for ln in out.splitlines():
        if ln.startswith(b">"):
            name = ln[1:]
            seqs[name] = b""
        else:
            seqs[name] += ln
    assert seqs[b"chr1"] == b"AAAAATAAAAACAA"  # sub at 6, del of A at 13
    assert seqs[b"chr2"] == b"GGGTTGGGGGGG"


def test_vcf2gff(tmp_path):
    vcf = tmp_path / "in.vcf"
    vcf.write_bytes(VCF)
    main(["vcf2gff", f"in={vcf}", f"out={tmp_path}/o.gff"])
    out = (tmp_path / "o.gff").read_bytes()
    assert out.startswith(b"##gff-version 3")
    assert b"SNV\t5\t5" in out and b"deletion\t12\t13" in out


def test_shuffle_pairs(tmp_path):
    recs1 = [(b"r%d/1" % i, b"ACGTACGT", b"") for i in range(20)]
    recs2 = [(b"r%d/2" % i, b"TTTTACGT", b"") for i in range(20)]
    _write_fq(tmp_path / "1.fq", recs1)
    _write_fq(tmp_path / "2.fq", recs2)
    main([
        "shuffle", f"in={tmp_path}/1.fq", f"in2={tmp_path}/2.fq",
        f"out={tmp_path}/o1.fq", f"out2={tmp_path}/o2.fq", "seed=7",
    ])
    o1 = _read_fq(tmp_path / "o1.fq")
    o2 = _read_fq(tmp_path / "o2.fq")
    assert sorted(n for n, _, _ in o1) == sorted(n for n, _, _ in recs1)
    # pairs kept together, order changed
    assert [n[:-2] for n, _, _ in o1] == [n[:-2] for n, _, _ in o2]
    assert [n for n, _, _ in o1] != [n for n, _, _ in recs1]


def test_getreads(tmp_path):
    recs = [(b"r%d" % i, b"ACGTACGT", b"") for i in range(10)]
    _write_fq(tmp_path / "in.fq", recs)
    main([
        "getreads", f"in={tmp_path}/in.fq", f"out={tmp_path}/o.fq",
        "id=0,7-8,3",
    ])
    names = [n for n, _, _ in _read_fq(tmp_path / "o.fq")]
    assert names == [b"r0", b"r3", b"r7", b"r8"]


def test_replaceheaders(tmp_path):
    recs = [(b"old%d" % i, b"ACGT", b"") for i in range(3)]
    _write_fq(tmp_path / "in.fq", recs)
    (tmp_path / "h.txt").write_bytes(b"new0\nnew1\nnew2\n")
    main([
        "replaceheaders", f"in={tmp_path}/in.fq", f"hin={tmp_path}/h.txt",
        f"out={tmp_path}/o.fq",
    ])
    assert [n for n, _, _ in _read_fq(tmp_path / "o.fq")] == [
        b"new0", b"new1", b"new2",
    ]


def test_filterbycoverage(tmp_path):
    asm = tmp_path / "asm.fa"
    asm.write_bytes(b">c1\n" + b"A" * 100 + b"\n>c2\n" + b"C" * 100 + b"\n")
    cov = tmp_path / "covstats.txt"
    cov.write_bytes(
        b"#ID\tAvg_fold\tLength\tRef_GC\tCovered_percent\t"
        b"Covered_bases\tPlus_reads\tMinus_reads\n"
        b"c1\t20.0\t100\t0.0\t99.0\t99\t10\t10\n"
        b"c2\t1.0\t100\t1.0\t10.0\t10\t1\t0\n"
    )
    main([
        "filterbycoverage", f"in={asm}", f"cov={cov}",
        f"out={tmp_path}/clean.fa", f"outd={tmp_path}/dirty.fa", "minc=5",
    ])
    assert b">c1" in (tmp_path / "clean.fa").read_bytes()
    assert b">c2" in (tmp_path / "dirty.fa").read_bytes()


def test_randomgenome(tmp_path):
    main([
        "randomgenome", "len=10000", "chroms=3", "gc=0.7",
        f"out={tmp_path}/g.fa", "seed=1",
    ])
    data = (tmp_path / "g.fa").read_bytes()
    seq = b"".join(
        ln for ln in data.splitlines() if not ln.startswith(b">")
    )
    assert data.count(b">") == 3 and len(seq) == 10000
    gc = (seq.count(b"G") + seq.count(b"C")) / len(seq)
    assert 0.65 < gc < 0.75


def test_makepolymers(tmp_path):
    main(["makepolymers", "k=2", "minlen=8", f"out={tmp_path}/p.fa"])
    data = (tmp_path / "p.fa").read_bytes()
    assert data.count(b">") == 16
    assert b">poly_AC\nACACACACA\n" in data  # minlen+k-1 = 9 bases


def test_tetramerfreq(tmp_path):
    fa = tmp_path / "in.fa"
    fa.write_bytes(b">s1\n" + b"ACGT" * 300 + b"\n")
    main([
        "tetramerfreq", f"in={fa}", f"out={tmp_path}/o.txt", "window=500",
    ])
    lines = (tmp_path / "o.txt").read_bytes().splitlines()
    assert lines[0].startswith(b"#scaffold")
    rows = [ln.split(b"\t") for ln in lines[1:]]
    assert rows and rows[0][0] == b"s1"
    # ACGT-repeat has only 4 distinct tetramers
    assert sum(1 for c in rows[0][3:] if int(c) > 0) <= 4


def test_callpeaks(tmp_path):
    hist = tmp_path / "khist.txt"
    rng = np.random.default_rng(0)
    rows = []
    for d in range(1, 120):
        y = int(3000 * np.exp(-0.5 * ((d - 50) / 6) ** 2))
        y += int(20000 * np.exp(-d / 2.0))
        rows.append(b"%d\t%d" % (d, y))
    hist.write_bytes(b"\n".join(rows) + b"\n")
    main(["callpeaks", f"in={hist}", f"out={tmp_path}/peaks.txt"])
    txt = (tmp_path / "peaks.txt").read_bytes()
    assert b"#main_peak\t50" in txt or b"#main_peak\t49" in txt


def test_polyfilter(tmp_path):
    good = b"ACGTTGCAGTACCGATAGGCTAACGGTCAGT" * 4
    polyg = b"ACGTTGCAGTACCGATAGG" + b"G" * 35 + b"ACGTTGCAGTACCGATAG" * 4
    recs = [
        (b"good", good, b"I" * len(good)),
        (b"polyg", polyg, b"I" * len(polyg)),
    ]
    _write_fq(tmp_path / "in.fq", recs)
    main([
        "polyfilter", f"in={tmp_path}/in.fq", f"out={tmp_path}/o.fq",
        f"outb={tmp_path}/b.fq", "ldf=2", "ldf2=2",
    ])
    kept = [n for n, _, _ in _read_fq(tmp_path / "o.fq")]
    bad = [n for n, _, _ in _read_fq(tmp_path / "b.fq")]
    assert kept == [b"good"] and bad == [b"polyg"]


def test_repair_launcher(tmp_path):
    # out-of-order pairs with one orphan
    recs = [
        (b"a/1", b"ACGTACGT", b""),
        (b"b/1", b"CCCCAAAA", b""),
        (b"b/2", b"TTTTGGGG", b""),
        (b"c/1", b"ACACACAC", b""),
        (b"a/2", b"GGGGTTTT", b""),
    ]
    _write_fq(tmp_path / "in.fq", recs)
    main([
        "repair", f"in={tmp_path}/in.fq", f"out={tmp_path}/p1.fq",
        f"out2={tmp_path}/p2.fq", f"outs={tmp_path}/s.fq",
    ])
    p1 = [n for n, _, _ in _read_fq(tmp_path / "p1.fq")]
    p2 = [n for n, _, _ in _read_fq(tmp_path / "p2.fq")]
    s = [n for n, _, _ in _read_fq(tmp_path / "s.fq")]
    assert len(p1) == 2 and len(p2) == 2 and s == [b"c/1"]
    assert [n[:-2] for n in p1] == [n[:-2] for n in p2]


def test_mergesorted(tmp_path):
    a = [(b"a", b"ACGT", b""), (b"c", b"ACGT", b"")]
    b = [(b"b", b"ACGT", b""), (b"d", b"ACGT", b"")]
    _write_fq(tmp_path / "a.fq", a)
    _write_fq(tmp_path / "b.fq", b)
    main([
        "mergesorted", f"{tmp_path}/a.fq", f"{tmp_path}/b.fq",
        f"out={tmp_path}/o.fq",
    ])
    assert [n for n, _, _ in _read_fq(tmp_path / "o.fq")] == [
        b"a", b"b", b"c", b"d",
    ]


def test_filterlines(tmp_path):
    (tmp_path / "in.txt").write_bytes(b"alpha 1\nbeta 2\ngamma 3\n")
    (tmp_path / "names.txt").write_bytes(b"beta\n")
    main([
        "filterlines", f"in={tmp_path}/in.txt", f"out={tmp_path}/o.txt",
        f"names={tmp_path}/names.txt", "prefix=t",
    ])
    assert (tmp_path / "o.txt").read_bytes() == b"alpha 1\ngamma 3\n"
    main([
        "filterlines", f"in={tmp_path}/in.txt", f"out={tmp_path}/o2.txt",
        "names=beta", "prefix=t", "include=t",
    ])
    assert (tmp_path / "o2.txt").read_bytes() == b"beta 2\n"


def test_countsharedlines(tmp_path):
    (tmp_path / "a.txt").write_bytes(b"x\ny\nz\n")
    (tmp_path / "b.txt").write_bytes(b"y\nz\nw\n")
    import os

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        main([
            "countsharedlines", f"in1={tmp_path}/a.txt",
            f"in2={tmp_path}/b.txt", f"out={tmp_path}/o.txt",
        ])
    finally:
        os.chdir(cwd)
    out = (tmp_path / "o.txt").read_bytes()
    assert out.strip().endswith(b"\t2")


def test_unicode2ascii(tmp_path):
    (tmp_path / "in.txt").write_bytes("héllo\twörld\x07\n".encode())
    main([
        "unicode2ascii", f"in={tmp_path}/in.txt", f"out={tmp_path}/o.txt",
    ])
    out = (tmp_path / "o.txt").read_bytes()
    assert out == b"hello\tworld\n"


def test_phylip2fasta(tmp_path):
    (tmp_path / "in.phy").write_bytes(
        b" 2 12\nseqA   ACGT ACGT\nseqB   TTTT GGGG\n\nACGT\nCCCC\n"
    )
    main([
        "phylip2fasta", f"in={tmp_path}/in.phy", f"out={tmp_path}/o.fa",
    ])
    data = (tmp_path / "o.fa").read_bytes()
    assert b">seqA\nACGTACGTACGT\n" in data
    assert b">seqB\nTTTTGGGGCCCC\n" in data


def test_summarizeseal(tmp_path):
    (tmp_path / "lib1.stats").write_bytes(
        b"#name\treads\tbases\n"
        b"lib1_ref\t90\t9000\n"
        b"other_ref\t10\t1000\n"
        b"*unmatched*\t5\t500\n"
    )
    main([
        "summarizeseal", f"{tmp_path}/lib1.stats", f"out={tmp_path}/o.txt",
    ])
    out = (tmp_path / "o.txt").read_bytes()
    row = out.splitlines()[1].split(b"\t")
    assert row[1] == b"100" and row[2] == b"90" and row[3] == b"10"


def test_splitnextera(tmp_path):
    # paired reads: r1 has the junction, r2 does not -> outer LMP + singleton
    jx = b"CTGTCTCTTATACACATCTAGATGTGTATAAGAGACAG"
    left = b"ACGTACGTTGCAACGGTCAGTACCGATAGGCTAACGGTCAGTAC"  # 44 bp
    right = b"TTGCAACGGTCAGTACCGATAGGCTAACGGTCAGTACACGTACG"  # 44 bp
    r1seq = left + jx + right
    r2seq = b"CCGATAGGCTAACGGTCAGTACACGTACGACGTACGTTGCAACG"
    _write_fq(tmp_path / "1.fq", [(b"p/1", r1seq, b"")])
    _write_fq(tmp_path / "2.fq", [(b"p/2", r2seq, b"")])
    main([
        "splitnextera", f"in={tmp_path}/1.fq", f"in2={tmp_path}/2.fq",
        f"out={tmp_path}/lmp.fq", f"outf={tmp_path}/f.fq",
        f"outu={tmp_path}/u.fq", f"outs={tmp_path}/s.fq", "mask=t",
    ])
    lmp = _read_fq(tmp_path / "lmp.fq")
    # outer LMP = (r1left, r2right=whole r2); r1right -> singleton
    assert len(lmp) == 2
    assert lmp[0][1] == left and lmp[1][1] == r2seq
    s = _read_fq(tmp_path / "s.fq")
    assert len(s) == 1 and s[0][1] == right


def test_splitnextera_single_end(tmp_path):
    left = b"A" * 50
    right = b"C" * 50
    _write_fq(tmp_path / "in.fq", [
        (b"a", left + b"J" * 19 + right, b""),
        (b"b", b"ACGT" * 20, b""),
    ])
    main([
        "splitnextera", f"in={tmp_path}/in.fq", f"out={tmp_path}/lmp.fq",
        f"outs={tmp_path}/s.fq",
    ])
    lmp = _read_fq(tmp_path / "lmp.fq")
    assert [r[1] for r in lmp] == [left, right]
    assert [n for n, _, _ in _read_fq(tmp_path / "s.fq")] == [b"b"]


def test_fixgaps(tmp_path):
    # scaffold: 600 bp + 20 Ns + 600 bp; true gap is 50, insert 200
    rng = np.random.default_rng(2)
    A = rng.choice(np.frombuffer(b"ACGT", np.uint8), 600).tobytes()
    B = rng.choice(np.frombuffer(b"ACGT", np.uint8), 600).tobytes()
    scaffold = A + b"N" * 20 + B
    (tmp_path / "ref.fa").write_bytes(b">s\n" + scaffold + b"\n")
    lines = [b"@SQ\tSN:s\tLN:%d\n" % len(scaffold)]
    readlen = 50

    def pair(qname, pos, tlen):
        seq = b"A" * readlen
        q = b"I" * readlen
        l1 = b"\t".join([
            qname, b"99", b"s", b"%d" % pos, b"40", b"50M", b"=",
            b"%d" % (pos + tlen - readlen), b"%d" % tlen, seq, q,
        ])
        return l1 + b"\n"

    # non-spanning pairs with true insert 200 covering both flanks
    i = 0
    for start in range(1, 420, 4):
        lines.append(pair(b"n%d" % i, start, 200))
        i += 1
    for start in range(640, 1040, 4):
        lines.append(pair(b"n%d" % i, start, 200))
        i += 1
    # spanning pairs: true insert 200 but reference gap is 30 too small
    # -> observed tlen = 170, covering the gap pivot (~610)
    for start in range(470, 570, 2):
        lines.append(pair(b"sp%d" % i, start, 170))
        i += 1
    (tmp_path / "m.sam").write_bytes(b"".join(lines))
    main([
        "fixgaps", f"in={tmp_path}/m.sam", f"ref={tmp_path}/ref.fa",
        f"out={tmp_path}/fixed.fa",
    ])
    out = (tmp_path / "fixed.fa").read_bytes()
    seq = b"".join(
        ln for ln in out.splitlines() if not ln.startswith(b">")
    )
    gap = seq.count(b"N")
    assert seq.startswith(A) and seq.endswith(B)
    assert 40 <= gap <= 60, gap  # resized from 20 toward the true 50
