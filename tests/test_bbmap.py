import numpy as np
import pytest

from bbtools_tpu.io.fasta import load_reference, write_fasta
from bbtools_tpu.io.sam import match_to_cigar14, to_mapq
from bbtools_tpu.models.bbmap import BBMap, BBMapConfig
from bbtools_tpu.models.bbmap_index import SeedIndex
from bbtools_tpu.ops.score_ungapped import score_no_indels, score_no_indels_np
from bbtools_tpu.utils.graders import grade_sam
from bbtools_tpu.utils.synth import random_genome, random_reads, write_reads

rng = np.random.default_rng(2024)


def test_score_no_indels_vs_oracle():
    import jax.numpy as jnp

    B, R, W = 24, 60, 90
    reads = rng.integers(0, 4, (B, R)).astype(np.uint8)
    refs = rng.integers(0, 4, (B, W)).astype(np.uint8)
    # half the tasks: read copied into ref with some subs
    starts = rng.integers(-5, 25, B).astype(np.int32)
    for b in range(0, B, 2):
        s = int(starts[b])
        lo, hi = max(s, 0), min(s + R, W)
        refs[b, lo:hi] = reads[b, lo - s : hi - s]
    reads[3, 10] = 4
    refs[5, 30] = 4
    lens = np.full(B, R, np.int32)
    got = np.asarray(
        score_no_indels(
            R,
            jnp.asarray(reads),
            jnp.asarray(lens),
            jnp.asarray(refs),
            jnp.asarray(starts),
            jnp.asarray(np.full(B, W, np.int32)),
        )
    )
    for b in range(B):
        want = score_no_indels_np(reads[b], refs[b], int(starts[b]))
        assert got[b] == want, f"task {b}: {got[b]} vs {want}"


def test_cigar14():
    # 5m S 4m I 3m D 2m
    m = b"mmmmmSmmmmImmmDmm"
    assert match_to_cigar14(m, 10, 1000) == "5=1X4=1I3=1D2="
    # out-of-bounds left -> soft clip
    m2 = b"mmmmmmmmmm"
    assert match_to_cigar14(m2, -3, 1000) == "3S7="
    # X tail (off-end insertions) -> I per mapping then clip? X maps to I
    assert match_to_cigar14(b"XXmmmm", 0, 1000) == "2I4="


def test_mapq():
    assert to_mapq(0, 0, False, False) == 0
    assert to_mapq(15000, 150, True, False) == to_mapq(15000, 150, True, False)
    assert to_mapq(14970, 150, True, False) >= 4
    assert to_mapq(10000, 150, True, True) >= 1


@pytest.fixture(scope="module")
def ecoli_like(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bbmap")
    genome = random_genome(150_000, n_scaffolds=2, seed=7)
    ref_fa = tmp / "ref.fa"
    write_fasta(str(ref_fa), genome)
    ref = load_reference(str(ref_fa))
    idx = SeedIndex.build(ref, k=13)
    return tmp, ref, idx


def test_bbmap_end_to_end(ecoli_like):
    tmp, ref, idx = ecoli_like
    reads = random_reads(ref, 400, read_len=120, snp_rate=0.01, seed=3)
    fq = tmp / "reads.fq"
    write_reads(str(fq), reads)
    sam = tmp / "out.sam"
    cfg = BBMapConfig(in1=str(fq), out=str(sam), batch_reads=256)
    tool = BBMap(cfg, index=idx)
    tool.run()
    g = grade_sam(str(sam), ref.names)
    assert g.total == 400
    # reference-derived tight bounds: the current mapper maps and
    # strictly places ALL 400 of these reads (1% SNP, unique 150 kb
    # genome — measured 400/400/400); one read of slack guards numeric
    # jitter, so any site-selection regression trips this immediately
    assert g.mapped >= 399, f"mapped {g.mapped}"
    assert g.correct_strict >= g.mapped - 1, (
        f"strict {g.correct_strict}/{g.mapped}: {g.details[:5]}"
    )


def test_bbmap_with_indels(ecoli_like):
    tmp, ref, idx = ecoli_like
    # reads with planted small indels
    recs = []
    codes = ref.scaffold_codes(0)
    for i in range(120):
        start = int(rng.integers(0, len(codes) - 160))
        r = codes[start : start + 130].copy()
        p = int(rng.integers(20, 100))
        if i % 2 == 0:
            r = np.concatenate([r[:p], r[p + 3 :]])[:120]  # 3bp deletion
        else:
            ins = rng.integers(0, 4, 3).astype(np.uint8)
            r = np.concatenate([r[:p], ins, r[p:]])[:120]  # 3bp insertion
        from bbtools_tpu.core.dna import CODE_TO_BASE

        recs.append(
            (
                b"r%d_scaf0_pos%d_strand0_insert0" % (i, start),
                CODE_TO_BASE[np.minimum(r, 4)].tobytes(),
                b"F" * len(r),
            )
        )
    fq = tmp / "indel.fq"
    write_reads(str(fq), recs)
    sam = tmp / "indel.sam"
    cfg = BBMapConfig(in1=str(fq), out=str(sam), batch_reads=128)
    tool = BBMap(cfg, index=idx)
    tool.run()
    g = grade_sam(str(sam), ref.names, tolerance=5)
    # measured 120/120 mapped and loosely placed; one read of slack
    assert g.mapped >= 119
    assert g.correct_loose >= g.mapped - 1, g.details[:5]
    # check indel CIGARs present
    text = (sam).read_text()
    assert "D" in text and "I" in text


def test_bbmap_paired(ecoli_like):
    tmp, ref, idx = ecoli_like
    reads = random_reads(ref, 200, read_len=100, paired=True,
                         insert_range=(180, 320), snp_rate=0.005, seed=8)
    from bbtools_tpu.utils.synth import write_reads

    write_reads(str(tmp / "p1.fq"), [p[0] for p in reads])
    write_reads(str(tmp / "p2.fq"), [p[1] for p in reads])
    sam = tmp / "paired.sam"
    cfg = BBMapConfig(
        in1=str(tmp / "p1.fq"), in2=str(tmp / "p2.fq"), out=str(sam),
        batch_reads=128,
    )
    BBMap(cfg, index=idx).run()
    lines = [l for l in sam.read_bytes().splitlines() if not l.startswith(b"@")]
    assert len(lines) == 400
    proper = 0
    tlens = []
    for l in lines:
        f = l.split(b"\t")
        flag = int(f[1])
        assert flag & 0x1  # paired
        if flag & 0x2:
            proper += 1
            if int(f[8]) > 0:
                tlens.append(int(f[8]))
        if not flag & 0x4:
            assert f[6] in (b"=",) or f[6] != b"*"
    assert proper >= 380, proper
    tl = np.array(tlens)
    assert 180 <= np.median(tl) <= 320, np.median(tl)


def test_index_save_load_roundtrip(tmp_path, ecoli_like):
    _, ref, idx = ecoli_like
    p = str(tmp_path / "idx.npz")
    idx.save(p)
    idx2 = SeedIndex.load(p)
    assert idx2.k == idx.k
    np.testing.assert_array_equal(idx2.starts, idx.starts)
    np.testing.assert_array_equal(idx2.sites, idx.sites)
    np.testing.assert_array_equal(idx2.ref.codes, idx.ref.codes)
    assert idx2.ref.names == idx.ref.names
    # mapping through a loaded index gives identical SAM
    reads = random_reads(ref, 50, read_len=100, snp_rate=0.01, seed=44)
    fq = tmp_path / "rr.fq"
    write_reads(str(fq), reads)
    s1, s2 = tmp_path / "a.sam", tmp_path / "b.sam"
    BBMap(BBMapConfig(in1=str(fq), out=str(s1), batch_reads=64), index=idx).run()
    BBMap(BBMapConfig(in1=str(fq), out=str(s2), batch_reads=64), index=idx2).run()
    a = [l for l in s1.read_bytes().splitlines() if not l.startswith(b"@PG")]
    b = [l for l in s2.read_bytes().splitlines() if not l.startswith(b"@PG")]
    assert a == b


def test_mate_rescue(ecoli_like):
    tmp, ref, idx = ecoli_like
    # r2 reads carry heavy 5' corruption (seeds destroyed) but intact 3'
    rng2 = np.random.default_rng(71)
    codes = ref.scaffold_codes(0)
    from bbtools_tpu.core.dna import CODE_TO_BASE

    p1, p2 = [], []
    for i in range(60):
        start = int(rng2.integers(0, len(codes) - 400))
        insert = 300
        frag = codes[start : start + insert]
        r1 = frag[:100].copy()
        r2 = np.where(frag[-100:] < 4, 3 - frag[-100:], 4)[::-1].copy()
        # corrupt scattered bases across r2 so no 13-mer seed survives,
        # but >70% identity remains for the ungapped rescue
        pos = np.arange(4, 100, 7)
        r2[pos] = (r2[pos] + 1) % 4
        nm = b"p%d_scaf0_pos%d_strand0_insert%d" % (i, start, insert)
        p1.append((nm, CODE_TO_BASE[r1].tobytes(), b"F" * 100))
        p2.append((nm, CODE_TO_BASE[r2].tobytes(), b"F" * 100))
    write_reads(str(tmp / "mr1.fq"), p1)
    write_reads(str(tmp / "mr2.fq"), p2)
    sam = tmp / "mr.sam"
    cfg = BBMapConfig(
        in1=str(tmp / "mr1.fq"), in2=str(tmp / "mr2.fq"), out=str(sam),
        batch_reads=64,
    )
    tool = BBMap(cfg, index=idx)
    tool.run()
    assert tool.rescued >= 40, tool.rescued
    lines = [
        l for l in sam.read_bytes().splitlines() if not l.startswith(b"@")
    ]
    r2_mapped = [
        l for l in lines if int(l.split(b"\t")[1]) & 0x80
        and not int(l.split(b"\t")[1]) & 0x4
    ]
    assert len(r2_mapped) >= 40
