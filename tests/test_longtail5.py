"""Tool long tail batch 5: trimcontigs (+pileup rangecov),
dedupebymapping, invertvcf, fastqscan, summarizecrossblock."""

import numpy as np

from bbtools_tpu.cli import main


def _read_fa(path):
    recs, name = {}, None
    for ln in open(path, "rb").read().splitlines():
        if ln.startswith(b">"):
            name = ln[1:].split()[0]
            recs[name] = b""
        elif name is not None:
            recs[name] += ln
    return recs


def test_pileup_rangecov_and_trimcontigs(tmp_path):
    # 500bp contig covered 10x only on [100,399]; trimcontigs should
    # trim the uncovered ends (plus trimextra) and keep the middle.
    rng = np.random.default_rng(3)
    seq = bytes(b"ACGT"[c] for c in rng.integers(0, 4, 500))
    (tmp_path / "ref.fa").write_bytes(b">c1\n" + seq + b"\n")
    sam = [b"@HD\tVN:1.4"]
    for i in range(30):
        pos = 101 + (i * 7) % 200
        sam.append(
            b"r%d\t0\tc1\t%d\t40\t100M\t*\t0\t0\t%s\t%s"
            % (i, pos, seq[pos - 1 : pos + 99], b"I" * 100)
        )
    (tmp_path / "a.sam").write_bytes(b"\n".join(sam) + b"\n")
    main([
        "pileup", f"in={tmp_path}/a.sam", f"ref={tmp_path}/ref.fa",
        f"out={tmp_path}/cov.txt", f"ranges={tmp_path}/ranges.txt",
    ])
    rtext = (tmp_path / "ranges.txt").read_bytes()
    assert rtext.startswith(b"#c1\n")
    span = rtext.splitlines()[1].split(b"\t")[0]
    a, b = map(int, span.split(b"-"))
    assert a == 100 and 390 <= b <= 399
    main([
        "trimcontigs", f"in={tmp_path}/ref.fa",
        f"ranges={tmp_path}/ranges.txt", f"out={tmp_path}/clean.fa",
        f"outd={tmp_path}/dirty.fa", "mincov=2", "minlen=50",
    ])
    clean = _read_fa(tmp_path / "clean.fa")
    assert b"c1" in clean
    kept = clean[b"c1"]
    # trimmed to the covered range +- trimextra
    assert 250 <= len(kept) <= 310
    assert kept in seq and kept.startswith(seq[105:110])


def test_trimcontigs_break_and_discard(tmp_path):
    rng = np.random.default_rng(4)
    seq = bytes(b"ACGT"[c] for c in rng.integers(0, 4, 600))
    (tmp_path / "a.fa").write_bytes(
        b">good\n" + seq + b"\n>nocov\n" + seq[:300] + b"\n"
    )
    # two covered islands separated by a 200bp uncovered gap -> break
    (tmp_path / "r.txt").write_bytes(
        b"#good\n0-199\t12.00\n400-599\t9.00\n#nocov\n"
    )
    main([
        "trimcontigs", f"in={tmp_path}/a.fa", f"ranges={tmp_path}/r.txt",
        f"out={tmp_path}/clean.fa", f"outd={tmp_path}/dirty.fa",
        f"breaklist={tmp_path}/broken.txt", "mincov=2", "minlen=50",
    ])
    clean = _read_fa(tmp_path / "clean.fa")
    assert b"good_part1" in clean and b"good_part2" in clean
    assert clean[b"good_part1"] in seq[:205]
    dirty = _read_fa(tmp_path / "dirty.fa")
    assert b"nocov" in dirty
    assert (tmp_path / "broken.txt").read_bytes().strip() == b"good"


def test_dedupebymapping(tmp_path):
    # three reads at identical coords (differing quality), one unique
    q_hi, q_lo = b"I" * 10, b"#" * 10
    sam = [
        b"@SQ\tSN:c1\tLN:1000",
        b"dup1\t0\tc1\t100\t40\t10M\t*\t0\t0\tACGTACGTAC\t" + q_lo,
        b"dup2\t0\tc1\t100\t40\t10M\t*\t0\t0\tACGTACGTAC\t" + q_hi,
        b"dup3\t0\tc1\t100\t40\t10M\t*\t0\t0\tACGTACGTAC\t" + q_lo,
        b"uniq\t0\tc1\t300\t40\t10M\t*\t0\t0\tGGGGCCCCAA\t" + q_hi,
        b"unmapped\t4\t*\t0\t0\t*\t*\t0\t0\tTTTTTTTTTT\t" + q_hi,
    ]
    (tmp_path / "in.sam").write_bytes(b"\n".join(sam) + b"\n")
    main([
        "dedupebymapping", f"in={tmp_path}/in.sam",
        f"out={tmp_path}/out.fq",
    ])
    data = (tmp_path / "out.fq").read_bytes()
    names = [l[1:] for l in data.splitlines()[::4]]
    assert sorted(names) == [b"dup2", b"uniq", b"unmapped"]


def test_dedupebymapping_strand_key(tmp_path):
    # reverse-strand read keyed by its 5' end (stop), not start:
    # same leftmost pos but opposite strand is NOT a duplicate
    sam = [
        b"@SQ\tSN:c1\tLN:1000",
        b"f\t0\tc1\t100\t40\t10M\t*\t0\t0\tACGTACGTAC\t" + b"I" * 10,
        b"r\t16\tc1\t100\t40\t10M\t*\t0\t0\tACGTACGTAC\t" + b"I" * 10,
    ]
    (tmp_path / "in.sam").write_bytes(b"\n".join(sam) + b"\n")
    main([
        "dedupebymapping", f"in={tmp_path}/in.sam",
        f"out={tmp_path}/out.fq",
    ])
    data = (tmp_path / "out.fq").read_bytes()
    assert data.count(b"@") - data.count(b"\n+\n@") // 2 >= 2 or (
        len(data.splitlines()) == 8
    )


def test_invertvcf(tmp_path):
    vcf = (
        b"##fileformat=VCFv4.2\n"
        b"##contig=<ID=chr1,length=1000>\n"
        b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        b"chr1\t10\t.\tA\tACC\t50\tPASS\tTYP=INS;STA=9;STO=10\n"
        b"chr1\t100\t.\tGTT\tG\t50\tPASS\tTYP=DEL;STA=99;STO=102\n"
    )
    (tmp_path / "in.vcf").write_bytes(vcf)
    main([
        "invertvcf", f"in={tmp_path}/in.vcf", f"out={tmp_path}/out.vcf",
    ])
    out = (tmp_path / "out.vcf").read_bytes().splitlines()
    # contig length adjusted by net shift (+2 -2 = 0)
    assert b"##contig=<ID=chr1,length=1000>" in out
    d1 = [l for l in out if not l.startswith(b"#")]
    f1 = d1[0].split(b"\t")
    # first variant: REF/ALT swapped, TYP flipped, pos unshifted
    assert f1[1] == b"10" and f1[3] == b"ACC" and f1[4] == b"A"
    assert b"TYP=DEL" in f1[7] and b"STA=9" in f1[7]
    f2 = d1[1].split(b"\t")
    # second: shifted by the +2 insertion before it
    assert f2[1] == b"102" and f2[3] == b"G" and f2[4] == b"GTT"
    assert b"TYP=INS" in f2[7] and b"STA=101" in f2[7]


def test_fastqscan(tmp_path, capfd):
    (tmp_path / "in.fq").write_bytes(
        b"@r1\nACGT\n+\nIIII\n@r2\nAC\n+\nII\n"
    )
    main(["fastqscan", f"in={tmp_path}/in.fq"])
    out = capfd.readouterr().out
    assert "Records:\t2" in out and "Bases:  \t6" in out


def test_fastqscan_corrupt(tmp_path, capfd):
    (tmp_path / "bad.fq").write_bytes(
        b"@r1\nACGT\n+\nIII\n@r2\nAC\n+\nII\n@tail\nACG\n"
    )
    main(["fastqscan", f"in={tmp_path}/bad.fq"])
    out = capfd.readouterr().out
    assert "corrupt" in out or "mismatch" in out


def test_summarizecrossblock(tmp_path, capfd):
    r1 = (
        b"#assembly\tcontig\tcontam\tlength\tavgFold\treads\tpercentCovered\n"
        b"a.fa\tc1\t0\t600\t20.0\t100\t99.0\n"
        b"a.fa\tc2\t1\t400\t1.0\t5\t50.0\n"
    )
    (tmp_path / "res1.txt").write_bytes(r1)
    main([
        "summarizecrossblock", f"in={tmp_path}/res1.txt,{tmp_path}/res1.txt",
        f"out={tmp_path}/sum.txt",
    ])
    lines = (tmp_path / "sum.txt").read_bytes().splitlines()
    assert lines[0].startswith(b"#fname\tcopies")
    f = lines[1].split(b"\t")
    assert f[1:] == [b"1", b"2", b"1", b"1000", b"400"]
    assert lines[2].split(b"\t")[1] == b"2"
