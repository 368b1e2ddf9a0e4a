"""Tests for the long-tail tools (reformat/stats/dedupe/loglog/bbmask/
seal/clumpify/splitpairs/sketch/bbnorm) and the unified CLI."""

import gzip

import numpy as np
import pytest

from bbtools_tpu.io.fasta import load_reference, write_fasta
from bbtools_tpu.utils.synth import random_genome, random_reads, write_reads

rng = np.random.default_rng(99)


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tools")
    genome = random_genome(30_000, n_scaffolds=2, seed=13)
    write_fasta(str(tmp / "ref.fa"), genome)
    ref = load_reference(str(tmp / "ref.fa"))
    reads = random_reads(ref, 500, read_len=100, snp_rate=0.01, seed=14)
    write_reads(str(tmp / "reads.fq"), reads)
    return tmp, ref, genome


def test_reformat_subsample_and_fasta(data):
    tmp, ref, genome = data
    from bbtools_tpu.models.reformat import main

    r, b = main([f"in={tmp}/reads.fq", f"out={tmp}/sub.fq", "samplerate=0.5", "sampleseed=7"])
    assert 150 < r < 350
    r2, _ = main([f"in={tmp}/reads.fq", f"out={tmp}/conv.fa"])
    assert r2 == 500
    text = (tmp / "conv.fa").read_bytes()
    assert text.startswith(b">")


def test_reformat_reads_limit(data):
    tmp, _, _ = data
    from bbtools_tpu.models.reformat import main

    r, _ = main([f"in={tmp}/reads.fq", f"out={tmp}/lim.fq", "reads=100"])
    assert r == 100


def test_assemblystats(data, capsys):
    tmp, ref, genome = data
    from bbtools_tpu.models.assemblystats import main

    res = main([f"in={tmp}/ref.fa"])
    assert res["scaffolds"] == 2
    assert res["total"] == sum(len(s) for _, s in genome)
    assert res["n50"] > 0
    out = capsys.readouterr().out
    assert "N/L50" in out


def test_dedupe(data):
    tmp, _, _ = data
    # duplicate the file content
    orig = (tmp / "reads.fq").read_bytes()
    (tmp / "dup.fq").write_bytes(orig + orig)
    from bbtools_tpu.models.dedupe import main

    kept, dupes = main([f"in={tmp}/dup.fq", f"out={tmp}/dd.fq"])
    assert kept == 500
    assert dupes == 500


def test_loglog(data):
    tmp, _, _ = data
    from bbtools_tpu.models.loglog import main

    card = main([f"in={tmp}/reads.fq", "k=31"])
    # ~500 reads x 70 kmers from a 30kb genome -> ~30k distinct (plus error kmers)
    assert 15_000 < card < 80_000


def test_bbmask(tmp_path):
    from bbtools_tpu.models.bbmask import main

    seq = b"ACGTAGGCTACGATCGTAGCTAACGGATCG" * 10 + b"A" * 120 + b"CGATCGTAGCTAGCTAGCAT" * 10
    write_fasta(str(tmp_path / "in.fa"), [(b"s", seq)])
    masked = main([f"in={tmp_path}/in.fa", f"out={tmp_path}/out.fa", "entropy=0.5"])
    assert masked >= 100  # the poly-A run is masked
    out = (tmp_path / "out.fa").read_bytes()
    assert b"NNNN" in out


def test_seal(data):
    tmp, ref, genome = data
    # two refs: scaffold_0 and scaffold_1 as separate files
    write_fasta(str(tmp / "refA.fa"), [genome[0]])
    write_fasta(str(tmp / "refB.fa"), [genome[1]])
    from bbtools_tpu.models.seal import main

    counts = main(
        [
            f"in={tmp}/reads.fq",
            f"ref={tmp}/refA.fa,{tmp}/refB.fa",
            f"stats={tmp}/sealstats.txt",
            "k=31",
            "pattern=",
        ]
    )
    assert counts[1] + counts[2] >= 490  # nearly all reads attributed
    assert counts[1] > 100 and counts[2] > 100
    stats = (tmp / "sealstats.txt").read_text()
    assert "refA" in stats and "unmatched" in stats


def test_clumpify(data):
    tmp, _, _ = data
    from bbtools_tpu.models.clumpify import main

    n, _ = main([f"in={tmp}/reads.fq", f"out={tmp}/clumped.fq.gz", "k=21"])
    assert n == 500
    # clumped output should compress better than shuffled input
    raw = (tmp / "reads.fq").read_bytes()
    clumped = gzip.decompress((tmp / "clumped.fq.gz").read_bytes())
    assert len(clumped.splitlines()) == len(raw.splitlines())


def test_splitpairs(tmp_path):
    # interleaved -> split -> re-interleave
    recs = []
    for i in range(50):
        recs.append((b"p%d/1" % i, b"ACGTACGTAC", b"IIIIIIIIII"))
        recs.append((b"p%d/2" % i, b"TTGGCCAATT", b"FFFFFFFFFF"))
    write_reads(str(tmp_path / "int.fq"), recs)
    from bbtools_tpu.models.splitpairs import main

    main([f"in={tmp_path}/int.fq", f"out={tmp_path}/r1.fq", f"out2={tmp_path}/r2.fq"])
    r1 = (tmp_path / "r1.fq").read_bytes().splitlines()
    r2 = (tmp_path / "r2.fq").read_bytes().splitlines()
    assert len(r1) == len(r2) == 200
    assert r1[0].endswith(b"/1") and r2[0].endswith(b"/2")


def test_repair(tmp_path):
    recs = [
        (b"a/1", b"AAAA", b"IIII"),
        (b"b/1", b"CCCC", b"IIII"),
        (b"a/2", b"GGGG", b"IIII"),
        (b"c/1", b"TTTT", b"IIII"),
    ]
    write_reads(str(tmp_path / "mixed.fq"), recs)
    from bbtools_tpu.models.splitpairs import main

    pairs, singles = main(
        [
            f"in={tmp_path}/mixed.fq",
            f"out={tmp_path}/p1.fq",
            f"out2={tmp_path}/p2.fq",
            f"outs={tmp_path}/s.fq",
            "repair=t",
        ]
    )
    assert pairs == 1 and singles == 2


def test_sketch(data, tmp_path):
    tmp, ref, genome = data
    from bbtools_tpu.models.sketch import compare_sketches, sketch_file

    s1 = sketch_file(f"{tmp}/ref.fa", k=31, size=2000)
    s2 = sketch_file(f"{tmp}/reads.fq", k=31, size=2000)
    j, ani, m, n = compare_sketches(s1, s2, 31)
    assert ani > 0.9  # reads came from this genome
    # different genome: low similarity
    write_fasta(str(tmp_path / "other.fa"), random_genome(30_000, 1, seed=999))
    s3 = sketch_file(str(tmp_path / "other.fa"), k=31, size=2000)
    j2, ani2, _, _ = compare_sketches(s1, s3, 31)
    assert j2 < 0.01


def test_bbnorm(data, tmp_path):
    tmp, ref, genome = data
    # high coverage of scaffold 0 only
    reads = random_reads(ref, 3000, read_len=100, snp_rate=0.0, seed=77)
    write_reads(str(tmp_path / "deep.fq"), reads)
    from bbtools_tpu.models.bbnorm import main

    kept, tossed = main(
        [
            f"in={tmp_path}/deep.fq",
            f"out={tmp_path}/norm.fq",
            "target=5",
            "mindepth=1",
            "k=31",
        ]
    )
    assert kept < 3000  # downsampled
    assert kept > 200


def test_cli_dispatch(data, capsys, tmp_path):
    tmp, _, _ = data
    from bbtools_tpu.cli import main

    rc = main(["stats", f"in={tmp}/ref.fa"])
    assert rc == 0
    assert "N/L50" in capsys.readouterr().out
    assert main(["nosuchtool"]) == 2
    assert main([]) == 0


def test_pileup_and_gradesam(data, tmp_path):
    tmp, ref, genome = data
    from bbtools_tpu.models.bbmap import BBMap, BBMapConfig
    from bbtools_tpu.models.bbmap_index import SeedIndex

    idx = SeedIndex.build(ref, k=13)
    sam = tmp_path / "m.sam"
    BBMap(BBMapConfig(in1=f"{tmp}/reads.fq", out=str(sam), batch_reads=256), index=idx).run()
    from bbtools_tpu.models.pileup import main as pileup_main

    cov = pileup_main([f"in={sam}", f"ref={tmp}/ref.fa", f"out={tmp_path}/covstats.txt"])
    stats = (tmp_path / "covstats.txt").read_text()
    assert "Avg_fold" in stats
    assert sum(int(c.sum()) for c in cov) > 0
    from bbtools_tpu.models.gradesam import main as grade_main

    g = grade_main([f"in={sam}", f"ref={tmp}/ref.fa"])
    assert g.correct_strict >= 0.95 * g.mapped


def test_sortbyname(tmp_path):
    recs = [(b"z", b"AAAA", b"IIII"), (b"a", b"CCCC", b"IIII"), (b"m", b"GGGG", b"IIII")]
    write_reads(str(tmp_path / "u.fq"), recs)
    from bbtools_tpu.models.sortbyname import main

    n = main([f"in={tmp_path}/u.fq", f"out={tmp_path}/s.fq"])
    assert n == 3
    lines = (tmp_path / "s.fq").read_bytes().splitlines()
    assert lines[0] == b"@a" and lines[4] == b"@m" and lines[8] == b"@z"


def test_bbmerge_ecco(tmp_path):
    rng2 = np.random.default_rng(5)
    insert, rl = 140, 100
    r1s, r2s, mols = [], [], []
    for i in range(100):
        mol = rng2.integers(0, 4, insert)
        mols.append(mol)
        r1 = mol[:rl].copy()
        r2f = mol[insert - rl:]
        r2 = (3 - r2f[::-1]).copy()
        # plant one error in the overlap region of r1 (low qual) so the
        # consensus fixes it using r2's higher quality
        p = rl - 10  # inside overlap (overlap = 60)
        r1[p] = (r1[p] + 1) % 4
        q1 = bytearray(b"F" * rl); q1[p] = ord("#")
        conv = lambda a: bytes(b"ACGT"[x] for x in a)
        r1s.append((b"p%d" % i, conv(r1), bytes(q1)))
        r2s.append((b"p%d" % i, conv(r2), b"F" * rl))
    write_reads(str(tmp_path / "e1.fq"), r1s)
    write_reads(str(tmp_path / "e2.fq"), r2s)
    from bbtools_tpu.models.bbmerge import main

    tool = main(
        [
            f"in={tmp_path}/e1.fq", f"in2={tmp_path}/e2.fq",
            f"out={tmp_path}/c1.fq", f"outu2={tmp_path}/c2.fq", "ecco=t",
        ]
    )
    assert tool.merged >= 90
    out1 = (tmp_path / "c1.fq").read_bytes().splitlines()
    fixed = 0
    for i in range(len(out1) // 4):
        name = out1[i * 4][1:]
        idx = int(name[1:])
        mol = mols[idx]
        seq = out1[i * 4 + 1]
        conv = bytes(b"ACGT"[x] for x in mol[:rl])
        if seq == conv:
            fixed += 1
    assert fixed >= 85, fixed


def test_demux_barcode(tmp_path):
    from bbtools_tpu.models.demux import Demux, parse_args as demux_parse

    fin = tmp_path / "in.fq"
    recs = []
    bcs = ["ACGTAC", "TTGGCA", "GGATCC"]
    for i in range(30):
        bc = bcs[i % 3]
        if i == 9:
            bc = "ACGTAA"  # 1-mismatch of ACGTAC
        recs.append(
            (f"@m:{i}:{bc}".encode(), b"ACGTACGTAC", b"FFFFFFFFFF")
        )
    with open(fin, "wb") as fh:
        for n, s, q in recs:
            fh.write(n + b"\n" + s + b"\n+\n" + q + b"\n")
    out = tmp_path / "out_%.fq"
    cfg = demux_parse(
        [
            f"in={fin}",
            f"out={out}",
            f"outu={tmp_path/'un.fq'}",
            "barcode=t",
            "names=" + ",".join(bcs),
            "hdist=1",
        ]
    )
    d = Demux(cfg).run()
    assert d.counts["ACGTAC"] == 10  # includes the 1-mismatch read
    assert d.counts["TTGGCA"] == 10
    assert (tmp_path / "out_ACGTAC.fq").exists()
    n_lines = len((tmp_path / "out_ACGTAC.fq").read_bytes().splitlines())
    assert n_lines == 40


def test_dedupe_fuzzy_and_containment(tmp_path):
    import numpy as np

    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.models import dedupe as dd

    rng = np.random.default_rng(12)
    base = rng.integers(0, 4, 120).astype(np.uint8)
    sub1 = base.copy()
    sub1[60] = (sub1[60] + 1) % 4  # 1 substitution
    rc = (3 - base)[::-1].copy()  # rc duplicate
    inner = base[20:90].copy()  # contained substring
    other = rng.integers(0, 4, 120).astype(np.uint8)  # unrelated
    reads = [base, sub1, rc, inner, other]
    fin = tmp_path / "in.fq"
    with open(fin, "wb") as fh:
        for i, r in enumerate(reads):
            s = CODE_TO_BASE[r].tobytes()
            fh.write(b"@r%d\n" % i + s + b"\n+\n" + b"F" * len(s) + b"\n")
    fout = tmp_path / "out.fq"
    kept, dupes = dd.main(
        [f"in={fin}", f"out={fout}", "s=2", "ac=t"]
    )
    # base kept; sub1 fuzzy-dupe; rc dupe; inner contained; other kept
    assert kept == 2, (kept, dupes)
    assert dupes == 3
    names = [
        l[1:] for l in fout.read_bytes().splitlines()[::4]
    ]
    assert names == [b"r0", b"r4"]


def test_dedupe_edist(tmp_path):
    import numpy as np

    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.models import dedupe as dd

    rng = np.random.default_rng(13)
    base = rng.integers(0, 4, 100).astype(np.uint8)
    withdel = np.delete(base, 50)  # 1bp deletion
    reads = [base, withdel]
    fin = tmp_path / "in.fq"
    with open(fin, "wb") as fh:
        for i, r in enumerate(reads):
            s = CODE_TO_BASE[r].tobytes()
            fh.write(b"@r%d\n" % i + s + b"\n+\n" + b"F" * len(s) + b"\n")
    fout = tmp_path / "e.fq"
    kept, dupes = dd.main([f"in={fin}", f"out={fout}", "e=2"])
    assert (kept, dupes) == (1, 1)
    # without edist they are distinct
    fout2 = tmp_path / "x.fq"
    kept2, dupes2 = dd.main([f"in={fin}", f"out={fout2}"])
    assert (kept2, dupes2) == (2, 0)


def test_consensus_maker(tmp_path):
    import numpy as np

    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.io.fasta import load_reference, write_fasta
    from bbtools_tpu.models.bbmap import BBMap, BBMapConfig
    from bbtools_tpu.models.bbmap_index import SeedIndex
    from bbtools_tpu.models.consensus import main as consensus_main
    from bbtools_tpu.utils.synth import random_genome, write_reads

    # truth genome; the given reference has 3 planted errors
    genome = random_genome(12_000, n_scaffolds=1, seed=5)
    write_fasta(str(tmp_path / "truth.fa"), genome)
    truth = load_reference(str(tmp_path / "truth.fa")).scaffold_codes(0)
    wrong = truth.copy()
    err_pos = [3000, 6000, 9000]
    for p in err_pos:
        wrong[p] = (wrong[p] + 1) % 4
    write_fasta(
        str(tmp_path / "ref.fa"),
        [(b"scaffold_0", CODE_TO_BASE[np.minimum(wrong, 4)].tobytes())],
    )
    # reads sampled from the TRUTH at ~15x
    rng = np.random.default_rng(6)
    recs = []
    for i in range(1800):
        s0 = int(rng.integers(0, len(truth) - 110))
        r = truth[s0 : s0 + 100]
        recs.append(
            (b"r%d" % i, CODE_TO_BASE[np.minimum(r, 4)].tobytes(), b"F" * 100)
        )
    write_reads(str(tmp_path / "r.fq"), recs)
    ref = load_reference(str(tmp_path / "ref.fa"))
    idx = SeedIndex.build(ref, k=13)
    sam = str(tmp_path / "m.sam")
    BBMap(
        BBMapConfig(in1=str(tmp_path / "r.fq"), out=sam, batch_reads=512),
        index=idx,
    ).run()
    stats = consensus_main(
        [f"in={sam}", f"ref={tmp_path/'ref.fa'}", f"out={tmp_path/'cons.fa'}"]
    )
    assert stats["sub"] >= 3  # the planted errors got corrected
    cons = load_reference(str(tmp_path / "cons.fa")).scaffold_codes(0)
    assert len(cons) == len(truth)
    # consensus equals the truth at the planted positions
    for p in err_pos:
        assert cons[p] == truth[p]
    # and essentially everywhere (covered regions)
    assert (cons == truth).mean() > 0.995


def test_bbsplit(tmp_path):
    import numpy as np

    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.io.fasta import load_reference, write_fasta
    from bbtools_tpu.models.bbsplit import BBSplit, parse_args as sp_parse
    from bbtools_tpu.utils.synth import random_genome, write_reads

    ga = random_genome(20_000, n_scaffolds=1, seed=31)
    gb = random_genome(20_000, n_scaffolds=1, seed=32)
    write_fasta(str(tmp_path / "orgA.fa"), ga)
    write_fasta(str(tmp_path / "orgB.fa"), gb)
    ca = load_reference(str(tmp_path / "orgA.fa")).scaffold_codes(0)
    cb = load_reference(str(tmp_path / "orgB.fa")).scaffold_codes(0)
    rng = np.random.default_rng(33)
    recs = []
    for i in range(120):
        src = ca if i % 2 == 0 else cb
        s0 = int(rng.integers(0, len(src) - 110))
        recs.append(
            (
                b"%s_%d" % (b"A" if i % 2 == 0 else b"B", i),
                CODE_TO_BASE[np.minimum(src[s0 : s0 + 100], 4)].tobytes(),
                b"F" * 100,
            )
        )
    # plus unmappable reads
    for i in range(10):
        recs.append(
            (b"X_%d" % i,
             CODE_TO_BASE[rng.integers(0, 4, 100)].tobytes(), b"F" * 100)
        )
    write_reads(str(tmp_path / "r.fq"), recs)
    cfg = sp_parse(
        [
            f"in={tmp_path/'r.fq'}",
            f"ref={tmp_path/'orgA.fa'},{tmp_path/'orgB.fa'}",
            f"basename={tmp_path/'out_%.fq'}",
            f"outu={tmp_path/'un.fq'}",
            f"refstats={tmp_path/'refstats.txt'}",
        ]
    )
    BBSplit(cfg, tmpdir=str(tmp_path)).run()
    a_names = (tmp_path / "out_orgA.fq").read_bytes().splitlines()[::4]
    b_names = (tmp_path / "out_orgB.fq").read_bytes().splitlines()[::4]
    assert len(a_names) >= 55 and all(n.startswith(b"@A_") for n in a_names)
    assert len(b_names) >= 55 and all(n.startswith(b"@B_") for n in b_names)
    stats = (tmp_path / "refstats.txt").read_text()
    assert "orgA" in stats and "orgB" in stats


def test_seal_shared_kmers_multivalued(tmp_path):
    import numpy as np

    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.models import seal

    rng = np.random.default_rng(41)
    shared = rng.integers(0, 4, 200).astype(np.uint8)  # region in BOTH refs
    a_only = rng.integers(0, 4, 200).astype(np.uint8)
    b_only = rng.integers(0, 4, 200).astype(np.uint8)
    refa = np.concatenate([a_only, shared])
    refb = np.concatenate([shared, b_only])

    def fa(path, name, codes):
        with open(path, "wb") as fh:
            fh.write(
                b">" + name + b"\n" + CODE_TO_BASE[codes].tobytes() + b"\n"
            )

    fa(tmp_path / "a.fa", b"A", refa)
    fa(tmp_path / "b.fa", b"B", refb)
    # reads: from shared region (hits both), from a_only, from b_only
    reads = [
        (b"shared", shared[50:150]),
        (b"aonly", a_only[50:150]),
        (b"bonly", b_only[50:150]),
    ]
    with open(tmp_path / "r.fq", "wb") as fh:
        for n, c in reads:
            s = CODE_TO_BASE[c].tobytes()
            fh.write(b"@" + n + b"\n" + s + b"\n+\n" + b"F" * len(s) + b"\n")
    # ambig=all: the shared read lands in BOTH outputs
    counts = seal.main(
        [
            f"in={tmp_path/'r.fq'}",
            f"ref={tmp_path/'a.fa'},{tmp_path/'b.fa'}",
            f"pattern={tmp_path/'s_%.fq'}",
            "ambig=all",
            "k=31",
        ]
    )
    a_out = (tmp_path / "s_a.fq").read_bytes().splitlines()[::4]
    b_out = (tmp_path / "s_b.fq").read_bytes().splitlines()[::4]
    assert b"@shared" in a_out and b"@aonly" in a_out
    assert b"@shared" in b_out and b"@bonly" in b_out
    # ambig=toss: shared read unmatched
    counts2 = seal.main(
        [
            f"in={tmp_path/'r.fq'}",
            f"ref={tmp_path/'a.fa'},{tmp_path/'b.fa'}",
            "ambig=toss",
            "k=31",
        ]
    )
    assert counts2[0] == 1 and counts2[1] == 1 and counts2[2] == 1


def test_clumpify_external_groups(tmp_path):
    import numpy as np

    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.models import clumpify

    rng = np.random.default_rng(51)
    with open(tmp_path / "in.fq", "wb") as fh:
        for i in range(300):
            c = rng.integers(0, 4, 100).astype(np.uint8)
            s = CODE_TO_BASE[c].tobytes()
            fh.write(b"@r%d\n" % i + s + b"\n+\n" + b"F" * 100 + b"\n")
    clumpify.main(
        [f"in={tmp_path/'in.fq'}", f"out={tmp_path/'g1.fq'}", "groups=1"]
    )
    clumpify.main(
        [f"in={tmp_path/'in.fq'}", f"out={tmp_path/'g4.fq'}", "groups=4"]
    )
    # external sort produces the same global clump order as in-memory
    assert (tmp_path / "g1.fq").read_bytes() == (tmp_path / "g4.fq").read_bytes()


def test_filterbytile(tmp_path):
    import numpy as np

    from bbtools_tpu.models.filterbytile import FilterByTile, parse_args as fbt

    rng = np.random.default_rng(81)
    # tile 1101 region (0,0) is bad (q12); everything else q35
    with open(tmp_path / "in.fq", "wb") as fh:
        for i in range(3000):
            tile = 1101 if i % 3 == 0 else 1102
            x = int(rng.integers(0, 2000))
            y = int(rng.integers(0, 2000))
            bad = tile == 1101 and x < 500 and y < 500
            q = 12 if bad else 35
            name = b"M01:5:FC1:1:%d:%d:%d" % (tile, x, y)
            seq = b"ACGT" * 25
            fh.write(
                b"@" + name + b"\n" + seq + b"\n+\n"
                + bytes([33 + q]) * 100 + b"\n"
            )
    cfg = fbt(
        [f"in={tmp_path/'in.fq'}", f"out={tmp_path/'good.fq'}",
         f"outb={tmp_path/'bad.fq'}"]
    )
    t = FilterByTile(cfg).run()
    assert (1101, 0, 0) in t.bad_keys
    assert len(t.bad_keys) <= 2
    bad_names = (tmp_path / "bad.fq").read_bytes().splitlines()[::4]
    for n in bad_names:
        f = n.split(b":")
        assert int(f[4]) == 1101 and int(f[5]) < 500 and int(f[6]) < 500
    good = (tmp_path / "good.fq").read_bytes().splitlines()[::4]
    assert len(good) + len(bad_names) == 3000
    assert len(bad_names) >= 40  # ~1000/16 reads land in the bad cell


def test_icecream_detection(tmp_path):
    import numpy as np

    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.models.icecream import IceCreamFinder, parse_args as ic

    rng = np.random.default_rng(91)
    reads = []
    # normal long reads
    for i in range(6):
        reads.append((b"good%d" % i, rng.integers(0, 4, 1600).astype(np.uint8)))
    # triangle reads: fwd + rc(fwd) mirrored at the middle (missed adapter)
    for i in range(6):
        half = rng.integers(0, 4, 800).astype(np.uint8)
        tri = np.concatenate([half, np.where(half < 4, 3 - half, 4)[::-1]])
        reads.append((b"ice%d" % i, tri))
    fin = tmp_path / "zmw.fq"
    with open(fin, "wb") as fh:
        for n, c in reads:
            s = CODE_TO_BASE[c].tobytes()
            fh.write(b"@" + n + b"\n" + s + b"\n+\n" + b"F" * len(s) + b"\n")
    cfg = ic([f"in={fin}", f"outg={tmp_path/'good.fq'}", f"outb={tmp_path/'bad.fq'}"])
    t = IceCreamFinder(cfg).run()
    good = (tmp_path / "good.fq").read_bytes().splitlines()[::4]
    bad = (tmp_path / "bad.fq").read_bytes().splitlines()[::4]
    assert all(n.startswith(b"@good") for n in good), good
    assert all(n.startswith(b"@ice") for n in bad), bad
    assert len(bad) == 6 and len(good) == 6
    # trim mode: triangle reads cut at the junction (~800)
    cfg2 = ic([f"in={fin}", f"outg={tmp_path/'t.fq'}", "trim=t"])
    IceCreamFinder(cfg2).run()
    lines = (tmp_path / "t.fq").read_bytes().splitlines()
    lens = {lines[j][1:]: len(lines[j + 1]) for j in range(0, len(lines), 4)}
    for i in range(6):
        assert lens[b"good%d" % i] == 1600
        assert 640 <= lens[b"ice%d" % i] <= 960, lens[b"ice%d" % i]


def test_smalltools(tmp_path):
    import numpy as np

    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.io.fasta import write_fasta
    from bbtools_tpu.models.smalltools import (
        count_uniqueness,
        fuse,
        partition,
        shred,
    )

    rng = np.random.default_rng(99)
    seqs = [
        (b"s1", CODE_TO_BASE[rng.integers(0, 4, 1250)].tobytes()),
        (b"s2", CODE_TO_BASE[rng.integers(0, 4, 300)].tobytes()),
    ]
    write_fasta(str(tmp_path / "in.fa"), seqs)
    recs = shred(
        [f"in={tmp_path/'in.fa'}", f"out={tmp_path/'sh.fa'}",
         "length=500", "minlength=100"]
    )
    lens = [len(s) for _, s in recs]
    assert lens == [500, 500, 250, 300]
    assert recs[0][0] == b"s1_0-500"

    fused = fuse(
        [f"in={tmp_path/'in.fa'}", f"out={tmp_path/'fu.fa'}", "pad=10"]
    )
    assert len(fused) == 1250 + 10 + 300

    with open(tmp_path / "r.fq", "wb") as fh:
        for i in range(10):
            fh.write(b"@r%d\nACGTACGTAC\n+\nFFFFFFFFFF\n" % i)
    n = partition(
        [f"in={tmp_path/'r.fq'}", f"out={tmp_path/'p_%.fq'}", "ways=3"]
    )
    assert n == 10
    sizes = [
        len((tmp_path / f"p_{w}.fq").read_bytes().splitlines()) // 4
        for w in range(3)
    ]
    assert sorted(sizes) == [3, 3, 4]

    # uniqueness: duplicated reads drive percent down in second interval
    with open(tmp_path / "u.fq", "wb") as fh:
        seqs100 = [
            CODE_TO_BASE[rng.integers(0, 4, 50)].tobytes() for _ in range(100)
        ]
        for s in seqs100:  # first 100: all unique
            fh.write(b"@a\n" + s + b"\n+\n" + b"F" * 50 + b"\n")
        for s in seqs100:  # next 100: all repeats
            fh.write(b"@b\n" + s + b"\n+\n" + b"F" * 50 + b"\n")
    rows = count_uniqueness(
        [f"in={tmp_path/'u.fq'}", f"out={tmp_path/'uu.txt'}", "interval=100"]
    )
    assert rows[0][1] == 100.0  # first interval fully unique
    assert rows[1][1] == 0.0  # second interval fully duplicate


def test_grade_vcf_and_merged(tmp_path):
    from bbtools_tpu.utils.graders2 import grade_vcf, parse_insert

    truth = tmp_path / "truth.vcf"
    truth.write_text(
        "#chrom\tpos\tid\tref\talt\n"
        "s0\t100\t.\tA\tT\t50\tPASS\t.\n"
        "s0\t200\t.\tG\tGA\t50\tPASS\t.\n"
        "s0\t300\t.\tCT\tC\t50\tPASS\t.\n"
    )
    called = tmp_path / "called.vcf"
    called.write_text(
        "#c\n"
        "s0\t100\t.\tA\tT\t44\tPASS\t.\n"  # TP
        "s0\t300\t.\tCT\tC\t31\tPASS\t.\n"  # TP
        "s0\t400\t.\tA\tG\t10\tPASS\t.\n"  # FP
    )
    g = grade_vcf(str(called), str(truth))
    assert (g.tp, g.fp, g.fn) == (2, 1, 1)
    assert abs(g.precision - 2 / 3) < 1e-9
    assert abs(g.recall - 2 / 3) < 1e-9
    assert parse_insert(b"r5_scaf0_pos7_strand0_insert240") == 240
    assert parse_insert(b"pair insert=311 x") == 311
    assert parse_insert(b"noinfo") == -1


def test_contamination_tools(tmp_path):
    from bbtools_tpu.models.contam import cross_contaminate, make_contaminated

    for nm in ("x", "y"):
        with open(tmp_path / f"{nm}.fq", "wb") as fh:
            for i in range(200):
                fh.write(
                    b"@%s%d\nACGTACGTAC\n+\nFFFFFFFFFF\n" % (nm.encode(), i)
                )
    swapped, total = cross_contaminate(
        [
            f"in={tmp_path/'x.fq'},{tmp_path/'y.fq'}",
            f"out={tmp_path/'x2.fq'},{tmp_path/'y2.fq'}",
            "rate=0.05",
            "seed=7",
        ]
    )
    assert total == 400 and 5 <= swapped <= 50
    x2 = (tmp_path / "x2.fq").read_bytes().splitlines()[::4]
    assert any(n.startswith(b"@y") for n in x2)

    with open(tmp_path / "h.fa", "wb") as fh:
        fh.write(b">h\n" + b"ACGT" * 2500 + b"\n")
    with open(tmp_path / "c.fa", "wb") as fh:
        fh.write(b">c\n" + b"TTGG" * 2500 + b"\n")
    ins, tot = make_contaminated(
        [
            f"ref={tmp_path/'h.fa'}",
            f"contam={tmp_path/'c.fa'}",
            f"out={tmp_path/'m.fa'}",
            "fraction=0.1",
            "fragsize=500",
        ]
    )
    assert tot == 10000 and 500 <= ins <= 2000
    data = (tmp_path / "m.fa").read_bytes()
    assert b"TTGGTTGG" in data


def test_callgenes(tmp_path):
    import numpy as np

    from bbtools_tpu.core.dna import BASE_TO_CODE
    from bbtools_tpu.models.callgenes import call_scaffold, main as cg_main, translate

    rng = np.random.default_rng(101)
    # build a synthetic gene: ATG + 120 sense codons (no stops) + TAA
    sense = [c for c in range(64) if c not in (48, 50, 56)]
    gene = [14] + list(rng.choice(sense, 120)) + [48]

    def codon_to_bases(c):
        return [c >> 4, (c >> 2) & 3, c & 3]

    gene_nt = np.array(sum((codon_to_bases(c) for c in gene), []), np.uint8)
    pad1 = rng.integers(0, 4, 47).astype(np.uint8)
    pad2 = rng.integers(0, 4, 53).astype(np.uint8)
    scaf = np.concatenate([pad1, gene_nt, pad2])
    genes = call_scaffold(scaf, 0, minlen_nt=300)
    assert any(
        g.start == 47 and g.stop == 47 + len(gene_nt) - 1 and g.strand == 0
        for g in genes
    ), [(g.start, g.stop, g.strand) for g in genes]
    # translation starts with M, has no internal stops
    aa = translate(scaf[47 : 47 + len(gene_nt)])
    assert aa[0] == "M" and aa[-1] == "*" and "*" not in aa[:-1]

    # reverse-strand gene detected too
    rc = np.where(scaf < 4, 3 - scaf, 4)[::-1].copy()
    genes_rc = call_scaffold(rc, 0, minlen_nt=300)
    assert any(g.strand == 1 for g in genes_rc)

    # end-to-end with GFF + protein outputs
    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.io.fasta import write_fasta

    write_fasta(
        str(tmp_path / "g.fa"), [(b"chr", CODE_TO_BASE[scaf].tobytes())]
    )
    # model=f: this synthetic random-codon gene tests the STRUCTURAL
    # caller; the real FrameStats model rightly scores it as non-gene
    out = cg_main(
        [f"in={tmp_path/'g.fa'}", f"out={tmp_path/'g.gff'}",
         f"outa={tmp_path/'g.faa'}", "model=f"]
    )
    gff = (tmp_path / "g.gff").read_text()
    assert "##gff-version 3" in gff and "\tCDS\t48\t" in gff
    faa = (tmp_path / "g.faa").read_bytes()
    assert faa.startswith(b">gene_1\nM")


def test_quickclade(tmp_path):
    import numpy as np

    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.io.fasta import write_fasta
    from bbtools_tpu.models.clade import classify, profile_fasta
    from bbtools_tpu.utils.synth import mutate_genome, random_genome

    # two genomes with different composition biases
    rng = np.random.default_rng(111)
    ga = rng.choice(4, 40_000, p=[0.35, 0.15, 0.15, 0.35]).astype(np.uint8)
    gb = rng.choice(4, 40_000, p=[0.15, 0.35, 0.35, 0.15]).astype(np.uint8)
    write_fasta(str(tmp_path / "a.fa"), [(b"A", CODE_TO_BASE[ga].tobytes())])
    write_fasta(str(tmp_path / "b.fa"), [(b"B", CODE_TO_BASE[gb].tobytes())])
    ra = profile_fasta(str(tmp_path / "a.fa"))
    rb = profile_fasta(str(tmp_path / "b.fa"))
    # query: a diverged fragment of A (5% substitutions)
    frag = ga[5000:25000].copy()
    m = rng.random(len(frag)) < 0.05
    frag[m] = (frag[m] + 1) % 4
    write_fasta(str(tmp_path / "q.fa"), [(b"q", CODE_TO_BASE[frag].tobytes())])
    q = profile_fasta(str(tmp_path / "q.fa"))
    scored = classify(q, [ra, rb])
    assert scored[0][1].name.endswith("a.fa")
    assert scored[0][0] < 0.5 * scored[1][0]


def test_quickbin(tmp_path):
    import numpy as np

    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.io.fasta import write_fasta
    from bbtools_tpu.models.quickbin import main as qb_main

    rng = np.random.default_rng(121)
    # two organisms with distinct composition; contigs are fragments
    ga = rng.choice(4, 60_000, p=[0.32, 0.18, 0.18, 0.32]).astype(np.uint8)
    gb = rng.choice(4, 60_000, p=[0.18, 0.32, 0.32, 0.18]).astype(np.uint8)
    recs = []
    truth = {}
    for j in range(6):
        for src, g, depth in (("A", ga, 30.0), ("B", gb, 8.0)):
            s0 = j * 9000
            nm = b"%s_ctg%d" % (src.encode(), j)
            recs.append((nm, CODE_TO_BASE[g[s0 : s0 + 8000]].tobytes()))
            truth[nm] = src
    write_fasta(str(tmp_path / "asm.fa"), recs)
    cov = tmp_path / "cov.txt"
    with open(cov, "w") as fh:
        fh.write("#ID\tAvg_fold\n")
        for nm, src in truth.items():
            fh.write(f"{nm.decode()}\t{30.0 if src == 'A' else 8.0}\n")
    bins = qb_main(
        [f"in={tmp_path/'asm.fa'}", f"cov={cov}",
         f"out={tmp_path/'bin_%.fa'}"]
    )
    assert len(bins) == 2
    for members in bins:
        srcs = {truth[c.name.split()[0]] for c in members}
        assert len(srcs) == 1, srcs  # no mixed bins
        assert len(members) == 6


def test_clumpify_optical_dedupe(tmp_path):
    from bbtools_tpu.models import clumpify

    seq = b"ACGTAGGCTACGATCGTAGCTAACGGATCGAT" * 3
    with open(tmp_path / "in.fq", "wb") as fh:
        # same sequence: close pair (optical dup) + far copy (PCR-ish)
        for name in (
            b"M:1:FC:1:1101:1000:2000",
            b"M:1:FC:1:1101:1010:2015",  # within 40px -> optical dup
            b"M:1:FC:1:1101:9000:9000",  # far -> kept
            b"M:1:FC:1:2203:1000:2000",  # other tile -> kept
        ):
            fh.write(b"@" + name + b"\n" + seq + b"\n+\n" + b"F" * len(seq) + b"\n")
    n, d = clumpify.main(
        [f"in={tmp_path/'in.fq'}", f"out={tmp_path/'o1.fq'}",
         "dedupe=t", "optical=t", "dupedist=40"]
    )
    assert (n, d) == (4, 1)
    # plain dedupe removes all 3 copies
    n2, d2 = clumpify.main(
        [f"in={tmp_path/'in.fq'}", f"out={tmp_path/'o2.fq'}", "dedupe=t"]
    )
    assert (n2, d2) == (4, 3)


def test_dedupe_cluster_mode(tmp_path):
    import numpy as np

    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.models import dedupe as dd

    rng = np.random.default_rng(131)
    a = rng.integers(0, 4, 120).astype(np.uint8)
    a_sub = a.copy()
    a_sub[60] = (a_sub[60] + 1) % 4
    a_rc = (3 - a)[::-1].copy()
    b = rng.integers(0, 4, 120).astype(np.uint8)
    reads = [(b"a0", a), (b"a1", a_sub), (b"a2", a_rc), (b"b0", b)]
    fin = tmp_path / "in.fq"
    with open(fin, "wb") as fh:
        for n, c in reads:
            s = CODE_TO_BASE[c].tobytes()
            fh.write(b"@" + n + b"\n" + s + b"\n+\n" + b"F" * len(s) + b"\n")
    ncl, nreads = dd.main(
        [f"in={fin}", f"pattern={tmp_path/'c_%.fq'}", "cluster=t", "s=2"]
    )
    assert (ncl, nreads) == (2, 4)
    sizes = sorted(
        len((tmp_path / f"c_{i}.fq").read_bytes().splitlines()) // 4
        for i in range(2)
    )
    assert sizes == [1, 3]  # {a0,a1,a2} and {b0}


def test_lilypad_scaffolding(tmp_path):
    import numpy as np

    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.io.fasta import load_reference, write_fasta
    from bbtools_tpu.models.bbmap import BBMap, BBMapConfig
    from bbtools_tpu.models.bbmap_index import SeedIndex
    from bbtools_tpu.models.lilypad import main as lp_main
    from bbtools_tpu.utils.synth import random_genome, write_reads

    write_fasta(str(tmp_path / "g.fa"), random_genome(12_000, 1, seed=171))
    g = load_reference(str(tmp_path / "g.fa")).scaffold_codes(0)
    # two contigs with a 200bp unsequenced gap between them
    write_fasta(
        str(tmp_path / "ctg.fa"),
        [
            (b"ctgA", CODE_TO_BASE[g[:5000]].tobytes()),
            (b"ctgB", CODE_TO_BASE[g[5200:11000]].tobytes()),
        ],
    )
    # paired reads spanning the gap (insert 600)
    rng = np.random.default_rng(172)
    p1, p2 = [], []
    for i in range(60):
        s0 = 4600 + int(rng.integers(0, 150))
        frag = g[s0 : s0 + 800]
        r1 = frag[:100]
        r2 = np.where(frag[-100:] < 4, 3 - frag[-100:], 4)[::-1]
        p1.append((b"p%d" % i, CODE_TO_BASE[r1].tobytes(), b"F" * 100))
        p2.append((b"p%d" % i, CODE_TO_BASE[r2].tobytes(), b"F" * 100))
    write_reads(str(tmp_path / "p1.fq"), p1)
    write_reads(str(tmp_path / "p2.fq"), p2)
    ctg = load_reference(str(tmp_path / "ctg.fa"))
    idx = SeedIndex.build(ctg, k=13)
    sam = str(tmp_path / "m.sam")
    BBMap(
        BBMapConfig(in1=str(tmp_path / "p1.fq"), in2=str(tmp_path / "p2.fq"),
                    out=sam, batch_reads=64),
        index=idx,
    ).run()
    scaffolds, joins = lp_main(
        [f"ref={tmp_path/'ctg.fa'}", f"in={sam}",
         f"out={tmp_path/'sc.fa'}", "ns=200", "mindepth=4"]
    )
    assert joins == 1
    assert len(scaffolds) == 1
    sc = load_reference(str(tmp_path / "sc.fa")).scaffold_codes(0)
    assert len(sc) == 5000 + 200 + 5800
    # contig content preserved on both sides of the N gap
    assert (sc[:5000] == g[:5000]).all()
    assert (sc[5200:] == g[5200:11000]).all()
    assert (sc[5000:5200] >= 4).all()  # the gap is Ns


def test_dedupe_batch_equals_sequential(tmp_path):
    """judge_batch (fused device banded verification) must produce the
    exact verdict sequence of per-read judge() calls."""
    import numpy as np

    from bbtools_tpu.models.dedupe import Dedupe

    rng = np.random.default_rng(77)
    base = rng.integers(0, 4, 120).astype(np.uint8)
    reads = []
    for i in range(60):
        r = base.copy() if i % 3 else rng.integers(0, 4, 120).astype(np.uint8)
        if i % 3 == 1:  # near-duplicate with 1-2 edits
            p = int(rng.integers(10, 110))
            r = np.concatenate([r[:p], r[p + 1 :], rng.integers(0, 4, 1).astype(np.uint8)])
        if i % 3 == 2:
            r = r.copy()
            r[int(rng.integers(0, 120))] ^= 1
        reads.append(r)
    d1 = Dedupe(subs=1, edist=2, rcomp=True)
    seq_verdicts = [d1.judge(r.copy()) for r in reads]
    d2 = Dedupe(subs=1, edist=2, rcomp=True)
    # two batches to exercise the snapshot boundary
    bat_verdicts = d2.judge_batch([r.copy() for r in reads[:30]])
    bat_verdicts += d2.judge_batch([r.copy() for r in reads[30:]])
    assert bat_verdicts == seq_verdicts
    assert d1.dupes == d2.dupes


def test_clumpify_pivot_device_equals_host():
    import numpy as np

    from bbtools_tpu.models.clumpify import _pivot_kmers_jnp, _pivot_kmers_np

    rng = np.random.default_rng(4)
    bases = rng.integers(0, 4, (64, 90)).astype(np.uint8)
    bases[rng.random((64, 90)) < 0.02] = 4
    lengths = rng.integers(40, 91, 64).astype(np.int32)
    pn, on = _pivot_kmers_np(bases, lengths, 31)
    pj, oj = _pivot_kmers_jnp(bases, lengths, 31)
    np.testing.assert_array_equal(np.asarray(pj).astype(np.uint64), pn)
    np.testing.assert_array_equal(np.asarray(oj), on)


def test_icecream_batch_equals_sequential():
    import numpy as np

    from bbtools_tpu.models.icecream import ICConfig, check_batch, check_read

    rng = np.random.default_rng(21)
    cfg = ICConfig()
    reads = []
    for i in range(12):
        n = int(rng.integers(900, 1800))
        r = rng.integers(0, 4, n).astype(np.uint8)
        if i % 2 == 0:  # plant an inverted-repeat (ice cream) artifact
            half = n // 2
            r[half:] = np.where(r[:n - half] < 4, 3 - r[:n - half], 4)[::-1]
        reads.append(r)
    got = check_batch(reads, cfg)
    want = [check_read(r, cfg) for r in reads]
    assert got == want
    assert any(v[0] for v in want)  # some artifacts detected


def test_seal_many_reference_files(tmp_path):
    """>30 reference files (the old bitset-width cap) attribute reads
    correctly via the combo-bitset table."""
    import numpy as np

    from bbtools_tpu.models.seal import main as seal_main

    rng = np.random.default_rng(55)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    n_refs = 40
    seqs = []
    for r in range(n_refs):
        seq = ACGT[rng.integers(0, 4, 400)].tobytes()
        p = tmp_path / f"ref{r:02d}.fa"
        p.write_bytes(b">r%d\n%s\n" % (r, seq))
        seqs.append(seq)
    recs = []
    for i in range(120):
        src = i % n_refs
        start = int(rng.integers(0, 300))
        recs.append(
            b"@q%d_src%d\n%s\n+\n%s\n"
            % (i, src, seqs[src][start : start + 100], b"I" * 100)
        )
    (tmp_path / "reads.fq").write_bytes(b"".join(recs))
    refs = ",".join(str(tmp_path / f"ref{r:02d}.fa") for r in range(n_refs))
    seal_main([
        f"in={tmp_path}/reads.fq", f"ref={refs}",
        f"stats={tmp_path}/refstats.txt", "k=31",
    ])
    rows = [
        ln.split(b"\t")
        for ln in (tmp_path / "refstats.txt").read_bytes().splitlines()[1:]
        if ln and not ln.startswith(b"#")
    ]
    by_ref = {r[0].rsplit(b"/", 1)[-1]: int(r[1]) for r in rows}
    # every ref (incl. index > 30) got its 3 reads
    for r in range(n_refs):
        assert by_ref.get(b"ref%02d.fa" % r, 0) == 3, (r, by_ref)


def test_reference_blacklist_sketch_parses():
    """The bundled reference blacklist sketches (A48-delta coding)
    parse into sorted hash arrays, and blacklisting changes sketches."""
    import numpy as np

    from bbtools_tpu.models.sketch import (
        load_blacklist,
        read_reference_sketch,
        sketch_sequences,
    )

    hashes, header = read_reference_sketch(
        "/root/repo/bbtools_tpu/resources/blacklist_refseq_merged.sketch"
    )
    assert len(hashes) == int(header["SZ"])
    assert (np.diff(hashes.astype(np.uint64)) > 0).all()
    bl = load_blacklist("refseq")
    np.testing.assert_array_equal(bl, hashes)
    # blacklisting excludes listed hashes from a sketch
    rng = np.random.default_rng(31)
    seqs = [rng.integers(0, 4, 5000).astype(np.uint8)]
    s0 = sketch_sequences(iter(seqs), k=31, size=500)
    s1 = sketch_sequences(iter(seqs), k=31, size=500, blacklist=s0[:100])
    assert not np.intersect1d(s1, s0[:100]).size


def test_phase_timer_and_profile_flag(tmp_path, capsys):
    import numpy as np

    from bbtools_tpu.utils.timer import PhaseTimer, device_profile

    t = PhaseTimer()
    with t.phase("A"):
        sum(range(1000))
    t.split("B")
    assert [n for n, _ in t.phases] == ["A", "B"]
    t.report()
    err = capsys.readouterr().err
    assert "A:" in err and "Total Time:" in err
    # device_profile writes a trace directory when given a path
    with device_profile(str(tmp_path / "prof")):
        import jax.numpy as jnp

        jnp.arange(8).sum().block_until_ready()
    import os

    assert os.path.isdir(tmp_path / "prof")
    # bbduk showtimes=t prints the phase block end-to-end
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    rng = np.random.default_rng(0)
    recs = b"".join(
        b"@r%d\n%s\n+\n%s\n"
        % (i, ACGT[rng.integers(0, 4, 100)].tobytes(), b"I" * 100)
        for i in range(50)
    )
    (tmp_path / "in.fq").write_bytes(recs)
    from bbtools_tpu.cli import main

    main([
        "bbduk", f"in={tmp_path}/in.fq", f"out={tmp_path}/o.fq",
        "literal=ACGTACGTACGTACGTACGTACG", "k=23", "showtimes=t",
    ])
    err = capsys.readouterr().err
    assert "Processing:" in err and "Total Time:" in err


def test_reformat_flag_matrix(tmp_path):
    """Round-3 depth: the ~20 most-used ReformatReads flags behave
    (jgi/ReformatReads.java surface)."""
    import numpy as np

    from bbtools_tpu.models.reformat import main as reformat

    rng = np.random.default_rng(1)
    src = tmp_path / "in.fq"
    with open(src, "w") as f:
        for i in range(100):
            gc_hi = i % 2
            base_pool = "GC" if gc_hi else "AT"
            seq = "".join(
                base_pool[int(x)] for x in rng.integers(0, 2, 60)
            )
            q = "".join(chr(33 + 20 + (i % 3)) for _ in range(60))
            chast = "1:Y:0" if i % 10 == 0 else "1:N:0"
            f.write(f"@r{i} {chast} extra\n{seq}\n+\n{q}\n")

    def run(out, extra):
        return reformat([f"in={src}", f"out={out}"] + extra)

    # ftr: keep positions [0, 39] -> 40bp reads
    out = tmp_path / "ftr.fq"
    run(out, ["ftr=39"])
    assert all(len(l) == 40 for l in out.read_text().splitlines()[1::4])
    # mingc/maxgc split the two pools
    out = tmp_path / "gc.fq"
    ro, _ = run(out, ["mingc=0.9"])
    assert ro == 50
    # invert flips it
    out = tmp_path / "inv.fq"
    ro, _ = run(out, ["mingc=0.9", "invert=t"])
    assert ro == 50
    assert b"AT" in out.read_bytes() or b"TA" in out.read_bytes()
    # chastityfilter drops the :Y: headers
    out = tmp_path / "ch.fq"
    ro, _ = run(out, ["ch=t"])
    assert ro == 90
    # trimreaddescription
    out = tmp_path / "trd.fq"
    run(out, ["trd=t"])
    assert out.read_text().splitlines()[0] == "@r0"
    # skipreads
    out = tmp_path / "skip.fq"
    ro, _ = run(out, ["skipreads=95"])
    assert ro == 5
    # qin/qout offset conversion: phred+33 -> phred+64
    out = tmp_path / "q64.fq"
    run(out, ["qout=64"])
    qline = out.read_text().splitlines()[3]
    assert qline[0] == chr(64 + 20)
    back = tmp_path / "q33.fq"
    reformat([f"in={out}", f"out={back}", "qin=64", "qout=33"])
    assert back.read_text().splitlines()[3] == chr(33 + 20) * 60
    # t2u / u2t round trip
    out = tmp_path / "u.fq"
    run(out, ["t2u=t"])
    assert "T" not in "".join(out.read_text().splitlines()[1::4])
    back = tmp_path / "t.fq"
    reformat([f"in={out}", f"out={back}", "u2t=t"])
    assert "U" not in "".join(back.read_text().splitlines()[1::4])
    # mbq: all quals are 20..22 -> mbq=22 keeps only the i%3==2 third
    out = tmp_path / "mbq.fq"
    ro, _ = run(out, ["mbq=22"])
    assert ro == 33
    # fasta out with fastawrap
    out = tmp_path / "o.fa"
    run(out, ["fastawrap=25"])
    lines = out.read_text().splitlines()
    assert len(lines[1]) == 25
    # histograms
    run(tmp_path / "h.fq", [
        f"lhist={tmp_path}/l.txt", f"qhist={tmp_path}/q.txt",
        f"gchist={tmp_path}/g.txt", f"aqhist={tmp_path}/aq.txt",
        f"bhist={tmp_path}/b.txt",
    ])
    assert (tmp_path / "l.txt").read_text().startswith("#")
    assert "60" in (tmp_path / "l.txt").read_text()
    for nm in ("q.txt", "g.txt", "aq.txt", "b.txt"):
        assert (tmp_path / nm).stat().st_size > 0
    # iupacton
    src2 = tmp_path / "iupac.fq"
    src2.write_text("@x\nACGRYSWB\n+\nFFFFFFFF\n")
    out = tmp_path / "iu.fq"
    reformat([f"in={src2}", f"out={out}", "iupacton=t"])
    assert out.read_text().splitlines()[1] == "ACGNNNNN"


def test_reformat_sam_scarf_pad_barcode(tmp_path):
    """Round-4 surface: SAM input (mappedonly/rc-restore), scarf input
    (phred+64), padleft/padright/padsymbol, and barcode filters
    (jgi/ReformatReads.java:226-237,305,778; stream/ScarfStreamer:223;
    stream/Read.failsBarcode:2100)."""
    from bbtools_tpu.models.reformat import main as reformat

    # --- SAM input: minus-strand read restores original orientation
    sam = tmp_path / "in.sam"
    sam.write_text(
        "@HD\tVN:1.4\n@SQ\tSN:chr\tLN:1000\n"
        "r0\t0\tchr\t1\t40\t4=\t*\t0\t0\tACGT\tFFFF\n"
        "r1\t16\tchr\t5\t40\t4=\t*\t0\t0\tACGT\tFFIB\n"
        "r2\t4\t*\t0\t0\t*\t*\t0\t0\tGGGG\tFFFF\n"
        "r3\t256\tchr\t9\t40\t4=\t*\t0\t0\tTTTT\tFFFF\n"
    )
    out = tmp_path / "sam.fq"
    reformat([f"in={sam}", f"out={out}"])
    lines = out.read_text().splitlines()
    assert lines[0] == "@r0" and lines[1] == "ACGT"
    # r1 was stored as ACGT on minus strand -> original read is ACGT rc'd
    assert lines[4] == "@r1" and lines[5] == "ACGT".translate(
        str.maketrans("ACGT", "TGCA")
    )[::-1]
    assert lines[7] == "BIFF"  # quals reversed
    assert "@r2" in out.read_text()  # unmapped kept by default
    out2 = tmp_path / "sam_mapped.fq"
    reformat([f"in={sam}", f"out={out2}", "mappedonly", "primaryonly"])
    t = out2.read_text()
    assert "@r2" not in t and "@r3" not in t and "@r0" in t

    # --- scarf input: Header:Seq:Qual with phred+64 quals
    scarf = tmp_path / "in.scarf"
    q64 = "".join(chr(64 + 30) for _ in range(6))
    scarf.write_text(f"HWI:1:X:8#0/1:ACGTAC:{q64}\n")
    out3 = tmp_path / "scarf.fq"
    reformat([f"in={scarf}", f"out={out3}"])
    lines = out3.read_text().splitlines()
    assert lines[0] == "@HWI:1:X:8#0/1"
    assert lines[1] == "ACGTAC"
    assert lines[3] == "".join(chr(33 + 30) for _ in range(6))

    # --- padding
    fq = tmp_path / "p.fq"
    fq.write_text("@a\nACGT\n+\nFFFF\n")
    outp = tmp_path / "pad.fq"
    reformat([f"in={fq}", f"out={outp}", "padleft=3", "padright=2"])
    lines = outp.read_text().splitlines()
    assert lines[1] == "NNNACGTNN"
    assert lines[3] == "!!!FFFF!!"  # padq=0 -> '!'
    outp2 = tmp_path / "pad2.fq"
    reformat([f"in={fq}", f"out={outp2}", "pad=2", "padsymbol=A"])
    lines = outp2.read_text().splitlines()
    assert lines[1] == "AAACGTAA"
    assert lines[3] == '##FFFF##'  # defined symbol -> padq >= 2

    # --- barcode filter
    bfq = tmp_path / "b.fq"
    bfq.write_text(
        "@r0 1:N:0:ACGT\nAAAA\n+\nFFFF\n"
        "@r1 1:N:0:ACNT\nCCCC\n+\nFFFF\n"
        "@r2 1:N:0:TTTT\nGGGG\n+\nFFFF\n"
    )
    outb = tmp_path / "bc.fq"
    reformat([f"in={bfq}", f"out={outb}", "barcodefilter=t"])
    t = outb.read_text()
    assert "@r0" in t and "@r2" in t and "@r1" not in t  # N in barcode
    outb2 = tmp_path / "bc2.fq"
    reformat([f"in={bfq}", f"out={outb2}", "barcodes=ACGT"])
    t = outb2.read_text()
    assert "@r0" in t and "@r1" not in t and "@r2" not in t
