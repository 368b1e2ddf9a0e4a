import numpy as np

from bbtools_tpu.io.fasta import load_reference, write_fasta
from bbtools_tpu.models.bbmap import BBMap, BBMapConfig
from bbtools_tpu.models.bbmap_index import SeedIndex
from bbtools_tpu.models.calctruequality import (
    CalcTrueQuality,
    CTQConfig,
    MatrixSet,
    Recalibrator,
)
from bbtools_tpu.utils.synth import random_genome, random_reads, write_reads


def test_count_read_basic():
    ms = MatrixSet(0, families=("q",))
    # 10bp read, all q30, one substitution at pos 4
    bases = b"ACGTACGTAC"
    quals = np.full(10, 30, dtype=np.int64)
    match = b"mmmmSmmmmm"
    ms.count_read(bases, quals, match, pairnum=0, reverse=False)
    assert ms.good["q"][0, 30] == 18  # 9 matches * 2
    assert ms.bad["q"][0, 30] == 2  # 1 sub * 2
    # position matrix always tracked
    assert ms.good["p"][0, 0] == 2 and ms.bad["p"][0, 4] == 2


def test_count_read_indel_adjacency():
    ms = MatrixSet(0, families=("q",))
    # match with deletion: m m D m m -> the m's flanking D get good+1,bad+1
    bases = b"ACGT"
    quals = np.full(4, 20, dtype=np.int64)
    ms.count_read(bases, quals, b"mmDmm", pairnum=0, reverse=False)
    # ops: m(good2) m(near D: 1/1) D(skip) m(near D: 1/1) m(good2)
    assert ms.good["q"][0, 20] == 6
    assert ms.bad["q"][0, 20] == 2


def test_roundtrip_recalibration(tmp_path):
    # genome + reads that claim q=25 but have ~10% real error rate
    genome = random_genome(40_000, n_scaffolds=1, seed=11)
    ref_fa = tmp_path / "ref.fa"
    write_fasta(str(ref_fa), genome)
    ref = load_reference(str(ref_fa))
    idx = SeedIndex.build(ref, k=13)
    rng = np.random.default_rng(5)
    recs = []
    codes = ref.scaffold_codes(0)
    from bbtools_tpu.core.dna import CODE_TO_BASE

    for i in range(500):
        start = int(rng.integers(0, len(codes) - 120))
        r = codes[start : start + 100].copy()
        errs = rng.random(100) < 0.10
        r[errs] = (r[errs] + rng.integers(1, 4, errs.sum())) % 4
        recs.append(
            (
                b"r%d_scaf0_pos%d_strand0_insert0" % (i, start),
                CODE_TO_BASE[r].tobytes(),
                bytes([33 + 25] * 100),  # claimed q25 (true ~q10)
            )
        )
    fq = tmp_path / "reads.fq"
    write_reads(str(fq), recs)
    sam = tmp_path / "out.sam"
    BBMap(
        BBMapConfig(in1=str(fq), out=str(sam), batch_reads=256), index=idx
    ).run()

    cfg = CTQConfig(in_files=[str(sam)], path=str(tmp_path), passes=2)
    CalcTrueQuality(cfg).run()
    import os

    assert os.path.exists(tmp_path / "qbpmatrix_p0.txt.gz")
    assert os.path.exists(tmp_path / "qbpmatrix_p1.txt.gz")

    # recalibrated q25 should drop to ~q10 (true error rate 10%)
    recal = Recalibrator(str(tmp_path), passes=2)
    bases = np.tile(np.array([0, 1, 2, 3], np.uint8), 25)[None, :]
    quals = np.full((1, 100), 25, dtype=np.int64)
    out = recal.recalibrate(bases, quals, np.array([100]))
    mid = out[0, 10:90]
    assert 7 <= mid.mean() <= 14, mid.mean()

    # through the BBDuk CLI surface
    from bbtools_tpu.models.bbduk import BBDuk, parse_args

    fout = tmp_path / "recal.fq"
    bcfg = parse_args(
        [
            f"in={fq}",
            f"out={fout}",
            "recalibrate=t",
            f"path={tmp_path}",
        ]
    )
    BBDuk(bcfg).run()
    data = fout.read_bytes().splitlines()
    q = np.frombuffer(data[3], np.uint8) - 33
    assert 6 <= q[10:90].mean() <= 15, q[10:90].mean()
