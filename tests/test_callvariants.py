import numpy as np
import pytest

from bbtools_tpu.core.dna import CODE_TO_BASE
from bbtools_tpu.io.fasta import load_reference, write_fasta
from bbtools_tpu.models.bbmap import BBMap, BBMapConfig
from bbtools_tpu.models.bbmap_index import SeedIndex
from bbtools_tpu.models.callvariants import (
    CallVariants,
    VarFilter,
    event_prob,
    extract_vars,
    identity_skewed,
    to_phred_score,
)
from bbtools_tpu.io.sam_read import SamRecord, cigar_to_match
from bbtools_tpu.utils.synth import mutate_genome, random_genome, write_reads

rng = np.random.default_rng(55)


def test_event_prob_properties():
    assert event_prob(10, 10) == 1.0
    assert event_prob(10, 9) >= 0.99
    assert event_prob(50, 0) < 0.2
    assert 0 <= event_prob(30, 5) <= 1


def test_identity_skewed():
    assert identity_skewed(b"m" * 100) == 1000
    # 95m 5S -> 95/100
    assert identity_skewed(b"m" * 95 + b"S" * 5) == 950
    # deletion run counts once
    assert identity_skewed(b"m" * 99 + b"D" * 10 + b"m" * 0) == int(1000 * 99 / 100)


def test_cigar_to_match_and_extract():
    ref = np.array([0, 1, 2, 3] * 10, dtype=np.uint8)
    rec = SamRecord(
        qname=b"r1", flag=0, rname=b"s", pos=3, mapq=40,
        cigar="4=1X3=1I2=2D3=",
        seq=b"GTACGGTAGTCGTA"[:13], qual=b"F" * 13,
    )
    m = cigar_to_match(rec, ref)
    assert m == b"mmmmSmmmImmDDmmm"
    quals = np.full(13, 37)
    vars_ = extract_vars(rec, m, 0, quals)
    types = sorted(v.type for v in vars_)
    assert types == [0, 1, 2]  # one SUB, one INS, one DEL
    sub = [v for v in vars_ if v.type == 0][0]
    assert sub.start == 2 + 4  # pos-1 + 4 matches
    ins = [v for v in vars_ if v.type == 1][0]
    assert ins.allele == rec.seq[8:9]
    dl = [v for v in vars_ if v.type == 2][0]
    assert dl.stop - dl.start == 2


def test_callvariants_end_to_end(tmp_path):
    # original genome; reads come from a mutated copy
    genome = random_genome(60_000, n_scaffolds=1, seed=21)
    write_fasta(str(tmp_path / "ref.fa"), genome)
    ref = load_reference(str(tmp_path / "ref.fa"))
    mutated, truth = mutate_genome(ref, sub_rate=0.002, seed=22)
    # write reads sampled from mutated genome
    recs = []
    codes = mutated[0]
    for i in range(3000):
        start = int(rng.integers(0, len(codes) - 100))
        strand = int(rng.integers(0, 2))
        r = codes[start : start + 100].copy()
        if strand:
            r = (3 - r[::-1]).astype(np.uint8)
        recs.append(
            (
                b"r%d_scaf0_pos%d_strand%d_insert0" % (i, start, strand),
                CODE_TO_BASE[np.minimum(r, 4)].tobytes(),
                bytes([33 + 37]) * 100,
            )
        )
    write_reads(str(tmp_path / "reads.fq"), recs)
    idx = SeedIndex.build(ref, k=13)
    cfg = BBMapConfig(
        in1=str(tmp_path / "reads.fq"), out=str(tmp_path / "m.sam"),
        batch_reads=512,
    )
    BBMap(cfg, index=idx).run()
    cv = CallVariants(ref, VarFilter(), ploidy=1)
    cv.add_sam(str(tmp_path / "m.sam")).finish()
    n_pass = cv.write_vcf(str(tmp_path / "out.vcf"))
    # grade: passing SUB calls vs truth
    truth_set = {(s, p) for s, p, rc, alt in truth}
    called = set()
    for line in open(tmp_path / "out.vcf"):
        if line.startswith("#"):
            continue
        f = line.split("\t")
        if f[6] != "PASS":
            continue
        if "TYP=SUB" in f[7]:
            called.add((0, int(f[1]) - 1))
    tp = len(called & truth_set)
    fp = len(called - truth_set)
    fn = len(truth_set - called)
    # coverage ~5x: expect most true SNPs called, few false positives
    assert tp >= 0.8 * len(truth_set), f"tp={tp} of {len(truth_set)}"
    assert fp <= max(3, 0.05 * len(called)), f"fp={fp} called={len(called)}"
    assert n_pass >= tp


def test_to_phred_score():
    assert to_phred_score(0) == 0
    assert to_phred_score(0.9) > 20 / 2.5
    assert to_phred_score(0.999) > to_phred_score(0.9)
