import gzip

import numpy as np

from bbtools_tpu.io.bgzf import BgzfReader, BgzfWriter, compress_block
from bbtools_tpu.io.sam_read import iter_sam


def test_bgzf_roundtrip(tmp_path):
    data = bytes(np.random.default_rng(0).integers(32, 120, 300_000, np.uint8))
    p = tmp_path / "x.bgzf"
    with BgzfWriter(open(p, "wb"), threads=3) as w:
        for i in range(0, len(data), 7919):
            w.write(data[i : i + 7919])
    # any gzip reader accepts BGZF
    assert gzip.open(p).read() == data
    # our reader too
    with BgzfReader(open(p, "rb")) as r:
        assert r.read() == data
    # EOF marker present
    raw = p.read_bytes()
    assert raw.endswith(
        bytes.fromhex("1f8b08040000000000ff0600424302001b0003000000000000000000")
    )


def test_bgzf_block_format():
    blk = compress_block(b"hello world")
    # BC extra field at offset 12: 'B','C',2,bsize-1
    assert blk[12:14] == b"BC"
    bsize = int.from_bytes(blk[16:18], "little") + 1
    assert bsize == len(blk)
    import zlib

    assert zlib.decompress(blk, zlib.MAX_WBITS | 16) == b"hello world"


def test_bam_roundtrip(tmp_path):
    from bbtools_tpu.io.sam import SamWriter

    p = str(tmp_path / "out.bam")
    w = SamWriter(p, [b"chr1", b"chr2"], [1000, 2000])
    lines = (
        b"r1\t0\tchr1\t100\t37\t5=1X4=\t=\t300\t210\tACGTACGTAC\tFFFFFFFFFF\tNM:i:1\tXT:A:U\n"
        b"r2\t16\tchr2\t500\t12\t4=2I4M\t*\t0\t0\tTTTTGGCCCC\tIIIIIIIIII\n"
        b"r3\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*\n"
    )
    w.add_batch(0, lines)
    w.close()

    recs = list(iter_sam(p))
    assert len(recs) == 3
    r1, r2, r3 = recs
    assert (r1.qname, r1.flag, r1.rname, r1.pos) == (b"r1", 0, b"chr1", 100)
    assert r1.cigar == "5=1X4=" and r1.seq == b"ACGTACGTAC"
    assert r1.qual == b"FFFFFFFFFF" and r1.mapq == 37
    assert (r2.rname, r2.pos, r2.cigar) == (b"chr2", 500, "4=2I4M")
    assert r3.flag == 4 and r3.rname == b"*" and r3.cigar == "*"
    # mate reference survives the BAM roundtrip (SAM text semantics:
    # '=' for same ref) — quickbin's pair-link graph gates on rnext
    assert (r1.rnext, r2.rnext, r3.rnext) == (b"=", b"*", b"*")

    # header + refs parse
    from bbtools_tpu.io.bam import read_bam

    it = read_bam(p)
    header, refs = next(it)
    assert b"@SQ\tSN:chr1\tLN:1000" in header
    assert [(r.name, r.length) for r in refs] == [(b"chr1", 1000), (b"chr2", 2000)]


def test_bbmap_bam_output(tmp_path):
    from bbtools_tpu.io.fasta import load_reference, write_fasta
    from bbtools_tpu.models.bbmap import BBMap, BBMapConfig
    from bbtools_tpu.models.bbmap_index import SeedIndex
    from bbtools_tpu.utils.graders import grade_sam
    from bbtools_tpu.utils.synth import random_genome, random_reads, write_reads

    genome = random_genome(50_000, n_scaffolds=1, seed=3)
    write_fasta(str(tmp_path / "ref.fa"), genome)
    ref = load_reference(str(tmp_path / "ref.fa"))
    idx = SeedIndex.build(ref, k=13)
    reads = random_reads(ref, 100, read_len=100, snp_rate=0.01, seed=4)
    write_reads(str(tmp_path / "r.fq"), reads)
    bam = str(tmp_path / "out.bam")
    BBMap(
        BBMapConfig(in1=str(tmp_path / "r.fq"), out=bam, batch_reads=64),
        index=idx,
    ).run()
    g = grade_sam(bam, ref.names)
    assert g.total == 100 and g.mapped >= 98
    assert g.correct_strict >= 0.97 * g.mapped


def test_bai_index_and_fetch(tmp_path):
    import struct

    from bbtools_tpu.io.bam import BamWriter, fetch, read_bai
    from bbtools_tpu.io.sam_read import SamRecord

    p = str(tmp_path / "sorted.bam")
    refs = [(b"chr1", 200_000)]
    w = BamWriter(p, b"@HD\tVN:1.4\tSO:coordinate\n", refs, index=True)
    # coordinate-sorted records every 1000bp
    for i in range(150):
        pos = 1 + i * 1000
        w.write_record(
            SamRecord(
                qname=b"r%d" % i, flag=0, rname=b"chr1", pos=pos, mapq=40,
                cigar="100=", seq=b"A" * 100, qual=b"F" * 100,
            )
        )
    w.close()
    import os

    assert os.path.exists(p + ".bai")
    idx = read_bai(p + ".bai")
    assert len(idx) == 1
    bins, linear = idx[0]
    assert bins and linear
    # region query returns exactly the overlapping records
    got = [r.qname for r in fetch(p, b"chr1", 50_000, 55_000)]
    want = [b"r%d" % i for i in range(150) if 1 + i * 1000 + 99 > 50_000
            and i * 1000 < 55_000]
    assert got == want, (got[:3], want[:3])
    # empty region
    assert list(fetch(p, b"chr1", 190_000, 195_000)) == []
