import gzip
import os

import numpy as np
import pytest

from bbtools_tpu.core.dna import (
    decode,
    encode,
    kmer_to_text,
    reverse_complement,
    text_to_kmer,
)
from bbtools_tpu.io.batch import ReadBatch, bucket_length
from bbtools_tpu.io.fasta import load_reference, read_fasta, write_fasta
from bbtools_tpu.io.fastq import FastqReader, FastqWriter, read_fastq
from bbtools_tpu.io.fileformat import Compression, Format
from bbtools_tpu.io.fileformat import test_input as detect_input


def _write_fastq(path, records):
    with open(path, "wb") as fh:
        for name, seq, qual in records:
            fh.write(b"@" + name + b"\n" + seq + b"\n+\n" + qual + b"\n")


def test_dna_roundtrip():
    s = b"ACGTNacgtRYK"
    codes = encode(s)
    assert decode(codes) == b"ACGTNACGTNNN"
    assert reverse_complement(b"ACGTT") == b"AACGT"
    assert kmer_to_text(text_to_kmer("GATTACA"), 7) == "GATTACA"


def test_bucket_length():
    assert bucket_length(10) == 32
    assert bucket_length(150) == 256
    assert bucket_length(151) == 256
    assert bucket_length(20000) == 20480


def test_fastq_roundtrip(tmp_path):
    recs = [
        (b"r1 some description", b"ACGTACGTAC", b"IIIIIIIIII"),
        (b"r2", b"GGGG", b"!!!!"),
        (b"r3", b"A" * 200, b"F" * 200),
    ]
    p = str(tmp_path / "x.fastq")
    _write_fastq(p, recs)
    batches = read_fastq(p)
    assert len(batches) == 1
    b = batches[0]
    assert b.n == 3
    assert b.sequence(0) == b"ACGTACGTAC"
    assert b.sequence(2) == b"A" * 200
    assert b.ids[0] == b"r1 some description"
    assert b.quals[1, 0] == 0  # '!' -> phred 0
    out = str(tmp_path / "y.fastq")
    with FastqWriter(out) as w:
        w.add(b)
    assert open(out, "rb").read() == open(p, "rb").read()


def test_fastq_gzip_and_batching(tmp_path):
    recs = [(b"r%d" % i, b"ACGT" * 10, b"I" * 40) for i in range(1000)]
    p = str(tmp_path / "x.fq.gz")
    import io

    buf = io.BytesIO()
    for name, seq, qual in recs:
        buf.write(b"@" + name + b"\n" + seq + b"\n+\n" + qual + b"\n")
    with gzip.open(p, "wb") as fh:
        fh.write(buf.getvalue())
    batches = list(FastqReader(p, batch_reads=256))
    assert [b.n for b in batches] == [256, 256, 256, 232]
    assert batches[3].ids[-1] == b"r999"
    assert batches[1].ordinal == 1
    assert batches[1].numeric_id0 == 256


def test_fastq_ordered_writer(tmp_path):
    recs = [(b"r%d" % i, b"ACGT", b"IIII") for i in range(10)]
    p = str(tmp_path / "x.fastq")
    _write_fastq(p, recs)
    batches = list(FastqReader(p, batch_reads=2))
    out = str(tmp_path / "o.fastq")
    with FastqWriter(out) as w:
        for b in reversed(batches):  # add out of order
            w.add(b)
    assert open(out, "rb").read() == open(p, "rb").read()


def test_qual_offset_64(tmp_path):
    # offset-64 file: qual bytes in 64..104
    p = str(tmp_path / "x.fastq")
    _write_fastq(p, [(b"r", b"ACGT", bytes([70, 80, 90, 104]))])
    b = read_fastq(p)[0]
    assert b.quals[0, 0] == 6  # 70-64


def test_fasta(tmp_path):
    p = str(tmp_path / "ref.fa")
    write_fasta(p, [(b"chr1 desc", b"ACGT" * 30), (b"chr2", b"TTTT")], wrap=50)
    recs = read_fasta(p)
    assert recs[0].name == b"chr1 desc"
    assert recs[0].seq == b"ACGT" * 30
    ref = load_reference(p)
    assert ref.n_scaffolds == 2
    assert bytes(decode(ref.scaffold_codes(1))) == b"TTTT"
    assert ref.scaffold_of(np.array([0, 120, 121]))[2] == 1


def test_format_detection(tmp_path):
    fq = str(tmp_path / "a.fq")
    _write_fastq(fq, [(b"r", b"ACGT", b"IIII")])
    ff = detect_input(fq)
    assert ff.format is Format.FASTQ and ff.compression is Compression.NONE
    # extensionless content sniff
    anon = str(tmp_path / "anon")
    os.rename(fq, anon)
    ff = detect_input(anon)
    assert ff.format is Format.FASTQ
    fa = str(tmp_path / "b.fa.gz")
    with gzip.open(fa, "wb") as fh:
        fh.write(b">x\nACGT\n")
    ff = detect_input(fa)
    assert ff.format is Format.FASTA and ff.compression is Compression.GZIP


def test_from_sequences():
    b = ReadBatch.from_sequences([b"ACGTN", b"GG"], quals=[b"IIIII", b"##"])
    assert b.lengths.tolist() == [5, 2]
    assert b.bases[0, 4] == 4
    assert b.valid_mask()[1].tolist() == [True, True] + [False] * (b.padded_len - 2)


def test_interleaved_detect_and_roundtrip(tmp_path):
    from bbtools_tpu.io.fastq import (
        deinterleave,
        detect_interleaved,
        interleave,
        paired_reader,
        read_fastq,
    )

    fin = tmp_path / "inter.fq"
    with open(fin, "w") as f:
        for i in range(10):
            f.write(f"@r{i}/1\nACGTACGTAA\n+\nFFFFFFFFFF\n")
            f.write(f"@r{i}/2\nTTGCATGCAT\n+\nFFFFFFFFFF\n")
    assert detect_interleaved(str(fin))
    plain = tmp_path / "plain.fq"
    with open(plain, "w") as f:
        for i in range(4):
            f.write(f"@s{i}\nACGT\n+\nFFFF\n")
    assert not detect_interleaved(str(plain))
    got = list(paired_reader(str(fin)))
    assert len(got) == 1
    b1, b2 = got[0]
    assert b1.n == b2.n == 10
    assert b1.ids[0].startswith(b"r0/1") and b2.ids[0].startswith(b"r0/2")
    bi = interleave(b1, b2)
    assert bi.n == 20
    assert bi.ids[0] == b1.ids[0] and bi.ids[1] == b2.ids[0]
    h1, h2 = deinterleave(bi)
    np.testing.assert_array_equal(h1.bases, b1.bases)
    np.testing.assert_array_equal(h2.lengths, b2.lengths)
