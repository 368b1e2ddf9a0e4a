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


def test_realign_recovers_deletion(tmp_path):
    """A read whose SAM alignment soft-clips an indel tail: realignment
    should recover the deletion variant."""
    import numpy as np

    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.io.fasta import load_reference, write_fasta
    from bbtools_tpu.io.sam import SamWriter
    from bbtools_tpu.models.callvariants import CallVariants, VarFilter
    from bbtools_tpu.utils.synth import random_genome

    write_fasta(str(tmp_path / "ref.fa"), random_genome(5_000, 1, seed=77))
    ref = load_reference(str(tmp_path / "ref.fa"))
    codes = ref.scaffold_codes(0)
    # reads spanning a 3bp deletion at ref pos 2000, but written to SAM as
    # aligned with the indel-containing tail soft-clipped (the misalignment
    # the Realigner exists to fix)
    sam = str(tmp_path / "mis.sam")
    w = SamWriter(sam, ref.names, ref.lengths)
    lines = []
    for i in range(10):
        start = 1950 - i * 4
        read = np.concatenate(
            [codes[start:2000], codes[2003 : 2003 + (100 - (2000 - start))]]
        )
        seq = CODE_TO_BASE[np.minimum(read, 4)].tobytes()
        n_pre = 2000 - start  # bases before the deletion
        cigar = b"%d=%dS" % (n_pre, 100 - n_pre)
        lines.append(
            b"\t".join(
                [
                    b"r%d" % i, b"0", ref.names[0].split()[0],
                    str(start + 1).encode(), b"40", cigar, b"*", b"0",
                    b"0", seq, b"F" * 100,
                ]
            )
            + b"\n"
        )
    w.add_batch(0, b"".join(lines))
    w.close()
    f = VarFilter()
    f.min_allele_depth = 2
    f.min_score = 0.0
    # without realignment: no deletion found
    cv0 = CallVariants(ref, f, ploidy=1).add_sam(sam).finish()
    from bbtools_tpu.models.callvariants import DEL

    dels0 = [v for v in cv0.varmap.values() if v.type == DEL]
    assert not dels0
    cv1 = CallVariants(ref, f, ploidy=1).add_sam(sam, realign=True).finish()
    assert cv1.realigned >= 8, cv1.realigned
    dels1 = [v for v in cv1.varmap.values() if v.type == DEL]
    assert any(v.start == 2000 and v.reflen() == 3 for v in dels1), [
        (v.start, v.reflen()) for v in dels1
    ]


def test_multisample_vcf(tmp_path):
    import numpy as np

    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.io.fasta import load_reference, write_fasta
    from bbtools_tpu.io.sam import SamWriter
    from bbtools_tpu.models.callvariants import main as cv_main
    from bbtools_tpu.utils.synth import random_genome

    write_fasta(str(tmp_path / "ref.fa"), random_genome(3_000, 1, seed=88))
    ref = load_reference(str(tmp_path / "ref.fa"))
    codes = ref.scaffold_codes(0)

    def write_sample(path, var_pos):
        w = SamWriter(str(path), ref.names, ref.lengths)
        rows = []
        for i in range(6):
            start = var_pos - 50 + i * 3
            read = codes[start : start + 100].copy()
            read[var_pos - start] = (read[var_pos - start] + 1) % 4
            rows.append(
                b"\t".join(
                    [
                        b"r%d" % i, b"0", ref.names[0].split()[0],
                        str(start + 1).encode(), b"40",
                        b"%d=1X%d=" % (var_pos - start, 99 - (var_pos - start)),
                        b"*", b"0", b"0",
                        CODE_TO_BASE[np.minimum(read, 4)].tobytes(),
                        b"F" * 100,
                    ]
                )
                + b"\n"
            )
        w.add_batch(0, b"".join(rows))
        w.close()

    write_sample(tmp_path / "s1.sam", 1000)  # sample 1 has var at 1000
    write_sample(tmp_path / "s2.sam", 2000)  # sample 2 has var at 2000
    vcf = tmp_path / "multi.vcf"
    cv_main(
        [
            f"in={tmp_path/'s1.sam'},{tmp_path/'s2.sam'}",
            f"ref={tmp_path/'ref.fa'}",
            f"vcf={vcf}",
            "multisample=t",
            "minscore=0",
            "minreads=2",
        ]
    )
    lines = [l for l in vcf.read_text().splitlines() if not l.startswith("##")]
    header = lines[0].split("\t")
    assert header[-2:] == ["s1", "s2"]
    rows = [l.split("\t") for l in lines[1:]]
    assert len(rows) == 2
    by_pos = {int(r[1]): r for r in rows}
    # var at 1001 present in s1, absent in s2 (and vice versa)
    assert by_pos[1001][9].startswith(("1:", "0/1:"))
    assert by_pos[1001][10].startswith("0:")
    assert by_pos[2001][10].startswith(("1:", "0/1:"))
    assert by_pos[2001][9].startswith("0:")


def test_callvariants_nn_scoring(tmp_path, capfd):
    """nn=t loads the bundled UMP45 net; QUAL becomes the cutoff-scaled
    NN score (Var.java:1040) and true variants still pass while the
    vector stays finite/reasonable."""
    import numpy as np

    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.io.fasta import load_reference, write_fasta
    from bbtools_tpu.models.bbmap import BBMap, BBMapConfig
    from bbtools_tpu.models.bbmap_index import SeedIndex
    from bbtools_tpu.models.callvariants import main as cv_main
    from bbtools_tpu.utils.synth import (
        mutate_genome,
        random_genome,
        random_reads,
        write_reads,
    )

    g = random_genome(30_000, seed=12)
    write_fasta(str(tmp_path / "ref.fa"), g)
    ref = load_reference(str(tmp_path / "ref.fa"))
    mutated, muts = mutate_genome(ref, sub_rate=0.003, seed=3)
    write_fasta(
        str(tmp_path / "mut.fa"),
        [(b"scaffold_0", CODE_TO_BASE[np.minimum(mutated[0], 4)].tobytes())],
    )
    mref = load_reference(str(tmp_path / "mut.fa"))
    reads = random_reads(mref, 3000, read_len=100, snp_rate=0.001, seed=4)
    write_reads(str(tmp_path / "r.fq"), reads)
    idx = SeedIndex.build(ref, k=13)
    BBMap(
        BBMapConfig(in1=str(tmp_path / "r.fq"), out=str(tmp_path / "m.sam"),
                    batch_reads=256),
        index=idx,
    ).run()
    cv_main([
        f"in={tmp_path}/m.sam", f"ref={tmp_path}/ref.fa",
        f"vcf={tmp_path}/nn.vcf", "nn=t", "minscore=10",
    ])
    body = [
        ln for ln in (tmp_path / "nn.vcf").read_bytes().splitlines()
        if ln and not ln.startswith(b"#")
    ]
    assert len(body) >= 10
    quals = [float(ln.split(b"\t")[5]) for ln in body]
    assert all(np.isfinite(quals))
    # net QUAL scale: 20 at the cutoff. True SNPs at ~10x coverage score
    # above it; error-derived low-depth variants score below — the net
    # discriminates (at least ~half the 97 planted SNPs confidently pass)
    assert sum(q > 20 for q in quals) >= 50, sorted(quals)[-5:]
    assert sum(q < 20 for q in quals) >= 50  # noise variants rejected
    # and differs from the composite-score run
    cv_main([
        f"in={tmp_path}/m.sam", f"ref={tmp_path}/ref.fa",
        f"vcf={tmp_path}/plain.vcf", "minscore=10",
    ])
    body2 = [
        ln for ln in (tmp_path / "plain.vcf").read_bytes().splitlines()
        if ln and not ln.startswith(b"#")
    ]
    q2 = [float(ln.split(b"\t")[5]) for ln in body2]
    assert quals != q2


def test_junction_variants(tmp_path):
    """junctions=t emits LJUNCT/RJUNCT breakpoint vars from clipped
    reads (VarHelper.toJunctions semantics)."""
    import numpy as np

    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.io.fasta import load_reference, write_fasta
    from bbtools_tpu.models.callvariants import main as cv_main
    from bbtools_tpu.utils.synth import random_genome

    g = random_genome(2000, seed=44)
    write_fasta(str(tmp_path / "ref.fa"), g)
    seq = g[0][1]
    # reads whose right half is foreign -> mapped with 30bp soft clips
    rng = np.random.default_rng(7)
    foreign = CODE_TO_BASE[rng.integers(0, 4, 30).astype(np.uint8)].tobytes()
    lines = [b"@SQ\tSN:scaffold_0\tLN:2000"]
    for i in range(6):
        body = seq[500 : 500 + 70]
        read = body + foreign
        lines.append(
            b"r%d\t0\tscaffold_0\t501\t60\t70M30S\t*\t0\t0\t%s\t%s"
            % (i, read, b"I" * 100)
        )
    (tmp_path / "in.sam").write_bytes(b"\n".join(lines) + b"\n")
    cv_main([
        f"in={tmp_path}/in.sam", f"ref={tmp_path}/ref.fa",
        f"vcf={tmp_path}/j.vcf", "junctions=t", "minscore=0", "minreads=2",
    ])
    body = (tmp_path / "j.vcf").read_bytes()
    assert b"TYP=RJUNCT" in body
    # junction position = one past the aligned span (501 + 70 - 1 = 570)
    rj = [ln for ln in body.splitlines() if b"TYP=RJUNCT" in ln][0]
    assert int(rj.split(b"\t")[1]) == 571
    # without the flag: no junction rows
    cv_main([
        f"in={tmp_path}/in.sam", f"ref={tmp_path}/ref.fa",
        f"vcf={tmp_path}/p.vcf", "minscore=0",
    ])
    assert b"JUNCT" not in (tmp_path / "p.vcf").read_bytes()


def test_invcf_forced_variants(tmp_path):
    """Round-trip: call -> a low-evidence var FAILs the filter -> feeding
    the VCF back via invcf= forces it to PASS with merged evidence
    (var2/CallVariants.java:275,481,577; AnalyzeVars.loadForcedVCF)."""
    from bbtools_tpu.models.callvariants import (
        load_forced_vcf,
        main as cv_main,
        parse_vcf_var,
    )

    genome = random_genome(20_000, n_scaffolds=1, seed=31)
    write_fasta(str(tmp_path / "ref.fa"), genome)
    ref = load_reference(str(tmp_path / "ref.fa"))
    codes = ref.scaffold_codes(0)

    # reads: good coverage everywhere; ONE read carries a lone SNP at a
    # fixed position (allele fraction ~= 1/cov -> fails min_allele_fraction)
    snp_pos = 5000
    recs = []
    for i in range(1200):
        start = int(rng.integers(0, len(codes) - 100))
        r = codes[start : start + 100].copy()
        if i == 0:
            start = snp_pos - 50
            r = codes[start : start + 100].copy()
            r[50] = (r[50] + 1) % 4
        recs.append((
            b"r%d_scaf0_pos%d_strand0_insert0" % (i, start),
            CODE_TO_BASE[np.minimum(r, 4)].tobytes(),
            bytes([33 + 37]) * 100,
        ))
    write_reads(str(tmp_path / "reads.fq"), recs)
    idx = SeedIndex.build(ref, k=13)
    BBMap(BBMapConfig(
        in1=str(tmp_path / "reads.fq"), out=str(tmp_path / "m.sam"),
        batch_reads=512,
    ), index=idx).run()

    # pass 1: normal call -> the lone SNP must FAIL
    cv1 = CallVariants(ref, VarFilter(), ploidy=1)
    cv1.add_sam(str(tmp_path / "m.sam")).finish()
    cv1.write_vcf(str(tmp_path / "pass1.vcf"))
    row = None
    for line in open(tmp_path / "pass1.vcf"):
        if line.startswith("#"):
            continue
        f = line.split("\t")
        if int(f[1]) - 1 == snp_pos and "TYP=SUB" in f[7]:
            row = f
    assert row is not None, "lone SNP not observed at all"
    assert row[6] == "FAIL", f"expected FAIL, got {row[6]}"

    # forced VCF containing just that row
    with open(tmp_path / "force.vcf", "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        fh.write("\t".join(row[:8]) + "\n")

    # pass 2: invcf= forces it through with evidence fields populated
    cv2 = cv_main([
        f"in={tmp_path}/m.sam", f"ref={tmp_path}/ref.fa",
        f"vcf={tmp_path}/pass2.vcf", f"invcf={tmp_path}/force.vcf",
    ])
    forced_keys = [k for k, v in cv2.varmap.items() if v.forced]
    assert len(forced_keys) == 1
    out_row = None
    for line in open(tmp_path / "pass2.vcf"):
        if line.startswith("#"):
            continue
        f = line.split("\t")
        if int(f[1]) - 1 == snp_pos and "TYP=SUB" in f[7]:
            out_row = f
    assert out_row is not None
    assert out_row[6] == "PASS"
    # merged evidence: the single supporting read shows up as AD=1
    assert "AD=1;" in out_row[7]
    # VCF row parse round-trip sanity for the three types
    assert parse_vcf_var(0, 11, b"A", b"C").key()[1:3] == (10, 11)
    v_ins = parse_vcf_var(0, 11, b"A", b"ACC")
    assert v_ins.type == 1 and v_ins.allele == b"CC" and v_ins.start == 11
    v_del = parse_vcf_var(0, 11, b"ACC", b"A")
    assert v_del.type == 2 and v_del.reflen() == 2 and v_del.start == 11

    # load_forced_vcf on a varmap that already has the key keeps evidence
    cv3 = CallVariants(ref, VarFilter(), ploidy=1)
    cv3.add_sam(str(tmp_path / "m.sam")).finish()
    n = load_forced_vcf(str(tmp_path / "force.vcf"), cv3)
    assert n == 1
    v = [x for x in cv3.varmap.values() if x.forced][0]
    assert v.allele_count() == 1  # pre-existing evidence preserved
