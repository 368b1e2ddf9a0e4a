"""Behavior tests for the round-2 fourth tool batch: muxbyname,
removebadbarcodes, filterbarcodes, cutgff, comparegff, alltoall/idmatrix,
kmutate, picksubset, summarizecoverage, summarizescafstats, and bbmap
scafstats= output."""

import numpy as np

from bbtools_tpu.cli import main

ACGT = np.frombuffer(b"ACGT", np.uint8)


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


def test_muxbyname(tmp_path):
    _write_fq(tmp_path / "s1.fq", [(b"a", b"ACGT", b"")])
    _write_fq(tmp_path / "s2.fq", [(b"b", b"TTTT", b"")])
    main([
        "muxbyname", f"{tmp_path}/s1.fq", f"{tmp_path}/s2.fq",
        f"out={tmp_path}/mux.fq",
    ])
    names = [n for n, _, _ in _read_fq(tmp_path / "mux.fq")]
    assert names == [b"s1_a", b"s2_b"]


def test_removebadbarcodes(tmp_path):
    recs = [
        (b"m:1:GATTACA", b"ACGT", b""),
        (b"m:2:GANTACA", b"ACGT", b""),
        (b"m:3:ACGT+TTGG", b"ACGT", b""),
    ]
    _write_fq(tmp_path / "in.fq", recs)
    main([
        "removebadbarcodes", f"in={tmp_path}/in.fq", f"out={tmp_path}/o.fq",
    ])
    names = [n for n, _, _ in _read_fq(tmp_path / "o.fq")]
    assert names == [b"m:1:GATTACA", b"m:3:ACGT+TTGG"]


def test_filterbarcodes(tmp_path):
    hi = (np.full(6, 35, np.uint8) + 33).tobytes()
    lo = (np.full(6, 5, np.uint8) + 33).tobytes()
    recs = [
        (b"good_AACCGG_" + hi, b"ACGTACGT", b""),
        (b"bad_TTGGCC_" + lo, b"ACGTACGT", b""),
    ]
    _write_fq(tmp_path / "in.fq", recs)
    main([
        "filterbarcodes", f"in={tmp_path}/in.fq", f"out={tmp_path}/o.fq",
        "maq=20", f"baqhist={tmp_path}/h.txt",
    ])
    names = [n for n, _, _ in _read_fq(tmp_path / "o.fq")]
    assert len(names) == 1 and names[0].startswith(b"good")
    assert (tmp_path / "h.txt").read_bytes().startswith(b"#quality")


def test_cutgff(tmp_path):
    rng = np.random.default_rng(0)
    seq = rng.choice(ACGT, 100).tobytes()
    (tmp_path / "g.fna").write_bytes(b">c1\n" + seq + b"\n")
    (tmp_path / "g.gff").write_bytes(
        b"##gff-version 3\n"
        b"c1\tx\tCDS\t11\t40\t.\t+\t0\tID=f1\n"
        b"c1\tx\tCDS\t51\t80\t.\t-\t0\tID=f2\n"
        b"c1\tx\trRNA\t5\t9\t.\t+\t.\tID=r1\n"
    )
    main([
        "cutgff", f"in={tmp_path}/g.fna", f"out={tmp_path}/o.fa",
        "types=CDS",
    ])
    out = (tmp_path / "o.fa").read_bytes()
    recs = {}
    name = None
    for ln in out.splitlines():
        if ln.startswith(b">"):
            name = ln[1:]
            recs[name] = b""
        else:
            recs[name] += ln
    assert recs[b"c1_11_40_CDS"] == seq[10:40]
    rc = seq[50:80].translate(
        bytes.maketrans(b"ACGT", b"TGCA"))[::-1]
    assert recs[b"c1_51_80_CDS"] == rc
    assert b"rRNA" not in out


def test_comparegff(tmp_path):
    (tmp_path / "ref.gff").write_bytes(
        b"c1\tx\tCDS\t10\t40\t.\t+\t0\tID=a\n"
        b"c1\tx\tCDS\t60\t90\t.\t-\t0\tID=b\n"
    )
    (tmp_path / "q.gff").write_bytes(
        b"c1\ty\tCDS\t10\t40\t.\t+\t0\tID=a\n"     # exact
        b"c1\ty\tCDS\t66\t90\t.\t-\t0\tID=b2\n"    # wrong start... but
        # on '-' the 3' end is the start field, so this is stopOnly=0;
        # use same start for stop-match semantics below
        b"c1\ty\tCDS\t200\t260\t.\t+\t0\tID=c\n"   # false positive
    )
    from bbtools_tpu.models.gfftools import comparegff

    res = comparegff([
        f"in={tmp_path}/q.gff", f"ref={tmp_path}/ref.gff",
        f"out={tmp_path}/o.txt",
    ])
    q, r, exact, stop_only, fp, recall = res[b"CDS"]
    assert (q, r, exact) == (3, 2, 1)
    assert fp == 2 - stop_only + 1 - 1  # one fp for ID=c; b2 depends on 3' rule
    assert (tmp_path / "o.txt").read_bytes().startswith(b"#type")


def test_alltoall(tmp_path):
    rng = np.random.default_rng(1)
    s1 = rng.choice(ACGT, 80).tobytes()
    s2 = bytearray(s1)
    for p in (10, 30, 50):
        s2[p] = ord("A") if s2[p] != ord("A") else ord("C")
    s3 = rng.choice(ACGT, 80).tobytes()
    (tmp_path / "in.fa").write_bytes(
        b">a\n" + s1 + b"\n>b\n" + bytes(s2) + b"\n>c\n" + s3 + b"\n"
    )
    from bbtools_tpu.models.alltoall import main as alltoall

    ident = alltoall([f"in={tmp_path}/in.fa", f"out={tmp_path}/m.txt"])
    assert ident[0, 1] > 0.9  # 3 subs in 80
    assert ident[0, 2] < ident[0, 1]
    txt = (tmp_path / "m.txt").read_bytes()
    assert txt.startswith(b"#name\ta\tb\tc")


def test_kmutate(tmp_path):
    (tmp_path / "in.fa").write_bytes(b">x\nACGTACGTACG\n")
    from bbtools_tpu.models.synthtools import kmutate

    n = kmutate([
        f"in={tmp_path}/in.fa", f"out={tmp_path}/o.fa", "k=11", "hdist=1",
    ])
    # 1 kmer * (1 + 11*3) mutants = 34 raw; canonical dedup may merge a few
    assert 30 <= n <= 34
    out = (tmp_path / "o.fa").read_bytes()
    assert out.count(b">") == n


def test_picksubset(tmp_path):
    (tmp_path / "ani.tsv").write_bytes(
        b"f1\tf2\t99.0\nf1\tf3\t80.0\nf2\tf3\t81.0\nf3\tf4\t60.0\n"
    )
    from bbtools_tpu.models.texttools import picksubset

    kept, removed = picksubset([
        f"in={tmp_path}/ani.tsv", f"out={tmp_path}/keep.txt", "ani=90",
    ])
    # f1/f2 pair exceeds 90 -> one of them dropped; others stay
    assert len(kept) == 3 and len(removed) == 1
    assert removed[0] in (b"f1", b"f2")


def test_summarize_coverage_and_scafstats(tmp_path):
    (tmp_path / "s1_basecov.txt").write_bytes(
        b"#RefName\tPos\tCoverage\n" + b"".join(
            b"c\t%d\t%d\n" % (i, 10 if i < 80 else 0) for i in range(100)
        )
    )
    from bbtools_tpu.models.texttools import (
        summarizecoverage,
        summarizescafstats,
    )

    res = summarizecoverage([
        f"{tmp_path}/s1_basecov.txt", f"out={tmp_path}/sc.txt",
    ])
    path, mean, med, sd, covered, nbases = res[0]
    assert nbases == 100 and abs(mean - 8.0) < 1e-9 and covered == 80.0

    (tmp_path / "lib1.scafstats").write_bytes(
        b"#name\t%unambiguousReads\tunambiguousMB\t%ambiguousReads\t"
        b"ambiguousMB\tunambiguousReads\tambiguousReads\n"
        b"orgA\t90\t1.0\t0\t0\t90\t0\n"
        b"orgB\t10\t0.1\t0\t0\t8\t2\n"
    )
    res2 = summarizescafstats([
        f"{tmp_path}/lib1.scafstats", f"out={tmp_path}/ss.txt",
    ])
    path, total, primary, nonprim, pct, pname = res2[0]
    assert (total, primary, nonprim, pname) == (100, 90, 10, b"orgA")


def test_bbmap_scafstats(tmp_path):
    rng = np.random.default_rng(3)
    g1 = rng.choice(ACGT, 3000).tobytes()
    g2 = rng.choice(ACGT, 3000).tobytes()
    (tmp_path / "ref.fa").write_bytes(
        b">s1\n" + g1 + b"\n>s2\n" + g2 + b"\n"
    )
    reads = []
    for i in range(20):
        p = int(rng.integers(0, 2900))
        src = g1 if i < 15 else g2
        reads.append((b"r%d" % i, src[p : p + 100], b""))
    _write_fq(tmp_path / "r.fq", reads)
    main([
        "bbmap", f"ref={tmp_path}/ref.fa", f"in={tmp_path}/r.fq",
        f"out={tmp_path}/o.sam", f"scafstats={tmp_path}/scaf.txt",
        "nodisk=t",
    ])
    txt = (tmp_path / "scaf.txt").read_bytes()
    rows = {
        ln.split(b"\t")[0]: ln.split(b"\t")
        for ln in txt.splitlines()[1:]
    }
    assert int(rows[b"s1"][5]) >= 14
    assert int(rows[b"s2"][5]) >= 4


def test_filterbytile_polyg_metric(tmp_path):
    from bbtools_tpu.models.filterbytile import FilterByTile, parse_args

    rng = np.random.default_rng(7)
    with open(tmp_path / "in.fq", "wb") as fh:
        for i in range(2000):
            tile = 1101 if i % 2 == 0 else 1102
            x = int(rng.integers(0, 1000))
            y = int(rng.integers(0, 1000))
            # tile 1101 cell (0,0): heavy poly-G tails, same quality
            bad = tile == 1101 and x < 500 and y < 500
            seq = rng.choice(ACGT, 100).tobytes()
            if bad and i % 3:
                seq = seq[:70] + b"G" * 30
            name = b"M01:5:FC1:1:%d:%d:%d" % (tile, x, y)
            fh.write(b"@" + name + b"\n" + seq + b"\n+\n" + b"I" * 100 + b"\n")
    cfg = parse_args([
        f"in={tmp_path}/in.fq", f"out={tmp_path}/good.fq",
        f"outb={tmp_path}/bad.fq",
    ])
    t = FilterByTile(cfg).run()
    assert (1101, 0, 0) in t.bad_keys
    assert len(t.bad_keys) <= 2


def test_quickbin_sketch_refine(tmp_path):
    from bbtools_tpu.models.quickbin import (
        Contig,
        bin_contigs,
        sketch_refine,
        tetramer_profile,
    )
    from bbtools_tpu.core.dna import BASE_TO_CODE

    rng = np.random.default_rng(9)
    genome = rng.choice(ACGT, 12000).tobytes()
    # two halves of the same genome, forced into separate bins
    c1 = genome[:6000]
    c2 = genome[6000:]
    other = rng.choice(np.frombuffer(b"GC", np.uint8), 6000).tobytes()
    mk = lambda n, s, d: Contig(
        n, s, tetramer_profile(BASE_TO_CODE[np.frombuffer(s, np.uint8)]), d
    )
    bins = [[mk(b"a", c1, 10.0)], [mk(b"b", c2, 10.0)],
            [mk(b"c", other, 10.0)]]
    merged = sketch_refine(bins, depth_limit=1.6, min_ani=0.9)
    # halves of one genome share no sketch kmers (disjoint sequence), so
    # they stay split; but identical copies merge:
    bins2 = [[mk(b"a", c1, 10.0)], [mk(b"b", c1, 10.0)]]
    merged2 = sketch_refine(bins2, depth_limit=1.6, min_ani=0.9)
    assert len(merged2) == 1
    assert len(merged) == 3


def test_icecream_kzt(tmp_path):
    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.models.icecream import IceCreamFinder, parse_args

    rng = np.random.default_rng(13)
    reads = []
    # ZMW 7: one clean subread + one triangle subread
    clean = rng.integers(0, 4, 1600).astype(np.uint8)
    half = rng.integers(0, 4, 800).astype(np.uint8)
    tri = np.concatenate([half, np.where(half < 4, 3 - half, 4)[::-1]])
    reads.append((b"m1/7/0_1600", clean))
    reads.append((b"m1/7/1700_3300", tri))
    # ZMW 9: clean only
    reads.append((b"m1/9/0_1600", rng.integers(0, 4, 1600).astype(np.uint8)))
    with open(tmp_path / "in.fq", "wb") as fh:
        for n, c in reads:
            s = CODE_TO_BASE[c].tobytes()
            fh.write(b"@" + n + b"\n" + s + b"\n+\n" + b"F" * len(s) + b"\n")
    cfg = parse_args([
        f"in={tmp_path}/in.fq", f"outg={tmp_path}/g.fq",
        f"outb={tmp_path}/b.fq", "kzt=t",
    ])
    IceCreamFinder(cfg).run()
    good = (tmp_path / "g.fq").read_bytes().splitlines()[::4]
    bad = (tmp_path / "b.fq").read_bytes().splitlines()[::4]
    # the clean subread of ZMW 7 goes bad too (whole-ZMW discard)
    assert good == [b"@m1/9/0_1600"]
    assert sorted(bad) == [b"@m1/7/0_1600", b"@m1/7/1700_3300"]


def test_quickbin_purify_and_residue(tmp_path):
    """Binner purify/residue semantics (bin/Binner.java:715,642): a
    contaminant contig planted into a bin gets ejected by the tighter
    leave-one-out gate and re-placed (or isolated) by the residue pass."""
    import numpy as np

    from bbtools_tpu.models.quickbin import (
        Contig,
        purify_pass,
        residue_pass,
        tetramer_profile,
    )
    from bbtools_tpu.core.dna import CODE_TO_BASE

    rng = np.random.default_rng(12)

    def genome_contigs(seed, n, depth):
        g = np.random.default_rng(seed)
        # biased composition so tetramer profiles separate
        probs = g.dirichlet(np.ones(4) * 0.7)
        out = []
        for i in range(n):
            codes = g.choice(4, 4000, p=probs).astype(np.uint8)
            seq = CODE_TO_BASE[codes].tobytes()
            out.append(Contig(b"c%d_%d" % (seed, i), seq,
                              tetramer_profile(codes), depth))
        return out

    bin_a = genome_contigs(1, 8, 10.0)
    bin_b = genome_contigs(2, 8, 40.0)
    # plant one B contig into A's bin
    planted = bin_b.pop()
    bins = [bin_a + [planted], bin_b]
    cleaned, residue = purify_pass(bins, stringency=0.9)
    ejected = [c for grp in residue for c in grp]
    assert planted in ejected, "contaminant not ejected"
    assert all(planted not in b for b in cleaned)
    # residue pass re-places it into the matching bin (b)
    final = residue_pass(cleaned, residue)
    homes = [i for i, b in enumerate(final) if planted in b]
    assert len(homes) == 1
    home = final[homes[0]]
    assert any(c.name.startswith(b"c2_") for c in home if c is not planted), (
        "re-placed into the wrong bin"
    )


def test_quickbin_multisample_depth():
    """Multi-sample depth vectors (bin/DataLoader one column per input):
    same-composition contigs with ANTI-CORRELATED per-sample depths must
    land in different bins even though their MEAN depths are equal."""
    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.models.quickbin import (
        Contig,
        bin_contigs,
        tetramer_profile,
    )

    g = np.random.default_rng(4)
    probs = g.dirichlet(np.ones(4) * 0.7)
    mk = []
    for i in range(12):
        codes = g.choice(4, 4000, p=probs).astype(np.uint8)
        seq = CODE_TO_BASE[codes].tobytes()
        # organisms A and B: same composition bias, mean depth 25 in
        # both, but sample profiles (40, 10) vs (10, 40)
        d = np.array([40.0, 10.0]) if i % 2 == 0 else np.array([10.0, 40.0])
        mk.append(Contig(b"m%d" % i, seq, tetramer_profile(codes), d))
    bins = bin_contigs(mk, tetra_limit=0.35, depth_limit=1.6,
                       refine_passes=0)
    assert len(bins) == 2
    for b in bins:
        firsts = {float(c.depth[0]) for c in b}
        assert firsts in ({40.0}, {10.0})
    # scalar mean depth would have merged them: one bin with vector
    # depths replaced by their means
    flat = [Contig(c.name, c.seq, c.profile, float(np.mean(c.depth)))
            for c in mk]
    bins_flat = bin_contigs(flat, tetra_limit=0.35, depth_limit=1.6,
                            refine_passes=0)
    assert len(bins_flat) == 1


def test_quickbin_crystal_chamber():
    """CrystalChamber recluster (bin/CrystalChamber.java): a bin holding
    two organisms splits; a pure bin survives the shouldMergeBack
    guard."""
    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.models.quickbin import (
        Contig,
        crystal_split,
        tetramer_profile,
    )

    g = np.random.default_rng(6)

    def org(seed, n, depth):
        gg = np.random.default_rng(seed)
        probs = gg.dirichlet(np.ones(4) * 0.5)
        out = []
        for i in range(n):
            codes = gg.choice(4, 5000, p=probs).astype(np.uint8)
            out.append(Contig(b"o%d_%d" % (seed, i),
                              CODE_TO_BASE[codes].tobytes(),
                              tetramer_profile(codes),
                              np.array([depth])))
        return out

    mixed = org(3, 6, 10.0) + org(8, 6, 80.0)
    halves = crystal_split(mixed, tetra_limit=0.18, depth_limit=1.6)
    assert halves is not None
    names = [{c.name[:2] for c in h} for h in halves]
    assert names[0] != names[1]
    assert all(len(s) == 1 for s in names), names  # clean separation
    pure = org(3, 10, 10.0)
    assert crystal_split(pure, tetra_limit=0.18, depth_limit=1.6) is None


def test_quickbin_follow_edges_unit():
    """Binner.followEdges (bin/Binner.java:261,391-431): bins connected
    by strong read-pair edges merge when composition/depth agree; weak
    edges (below max(minEdgeWeight, minEdgeRatio*top)) and
    composition-incompatible targets do not merge."""
    from bbtools_tpu.core.dna import BASE_TO_CODE
    from bbtools_tpu.models.quickbin import (
        Contig,
        follow_edges_pass,
        tetramer_profile,
    )

    rng = np.random.default_rng(31)
    genome = rng.choice(ACGT, 16000).tobytes()
    gc = rng.choice(np.frombuffer(b"GC", np.uint8), 8000).tobytes()
    mk = lambda n, s: Contig(
        n, s,
        tetramer_profile(BASE_TO_CODE[np.frombuffer(s, np.uint8)]),
        np.array([10.0]),
    )
    a1 = mk(b"a1", genome[:6000])
    a2 = mk(b"a2", genome[6000:12000])
    b1 = mk(b"b1", gc[:4000])
    b2 = mk(b"b2", gc[4000:])
    bins = [[a1], [a2], [b1], [b2]]
    edges = {
        (b"a1", b"a2"): 12, (b"a2", b"a1"): 12,  # strong same-genome link
        (b"a1", b"b1"): 1,                        # noise below minweight
        (b"b1", b"b2"): 9, (b"b2", b"b1"): 9,     # strong link, compatible
    }
    out, merges = follow_edges_pass(bins, edges)
    names = sorted(
        tuple(sorted(c.name for c in m)) for m in out
    )
    assert (b"a1", b"a2") in names  # strong edge + compatible -> merged
    assert (b"b1", b"b2") in names
    assert merges == 2 and len(out) == 2
    # incompatible composition blocks a merge even with a strong edge
    bins2 = [[mk(b"a1", genome[:6000])], [mk(b"b1", gc[:4000])]]
    out2, merges2 = follow_edges_pass(
        bins2, {(b"a1", b"b1"): 50, (b"b1", b"a1"): 50}
    )
    assert merges2 == 0 and len(out2) == 2


def test_quickbin_follow_edges_e2e_gradebins(tmp_path):
    """End-to-end: a two-genome metagenome whose contigs carry pair-link
    SAM evidence bins MORE completely with followedges=t than without,
    without adding contamination (graded by the gradebins harness)."""
    from bbtools_tpu.models.quickbin import main as quickbin

    rng = np.random.default_rng(5)
    # genome 1: balanced composition; genome 2: GC-skewed
    g1 = rng.choice(ACGT, 24000).tobytes()
    g2 = rng.choice(
        np.frombuffer(b"GGCCAT", np.uint8), 24000
    ).tobytes()
    contigs = []
    for tid, g in ((1, g1), (2, g2)):
        for i in range(6):
            contigs.append(
                (b"tid_%d_c%d" % (tid, i), g[i * 4000 : (i + 1) * 4000])
            )
    with open(tmp_path / "asm.fa", "wb") as f:
        for n, s in contigs:
            f.write(b">" + n + b"\n" + s + b"\n")
    # SAM: depth reads per contig + cross-contig pairs WITHIN each genome
    lines = [b"@HD\tVN:1.4"]
    for n, s in contigs:
        lines.append(b"@SQ\tSN:" + n + b"\tLN:%d" % len(s))
    rid = 0
    for tid, g in ((1, g1), (2, g2)):
        names = [n for n, _ in contigs if n.startswith(b"tid_%d" % tid)]
        for i, n in enumerate(names):
            nxt = names[(i + 1) % len(names)]
            for j in range(6):  # 6 linking pairs per adjacent contig pair
                lines.append(
                    b"p%d\t67\t%s\t%d\t40\t50=\t%s\t100\t0\t%s\t%s"
                    % (rid, n, 100 + j, nxt, b"A" * 50, b"F" * 50)
                )
                lines.append(
                    b"p%d\t131\t%s\t%d\t40\t50=\t%s\t100\t0\t%s\t%s"
                    % (rid, nxt, 100 + j, n, b"A" * 50, b"F" * 50)
                )
                rid += 1
    (tmp_path / "m.sam").write_bytes(b"\n".join(lines) + b"\n")

    for tag, flag in (("e", "followedges=t"), ("ne", "followedges=f")):
        d = tmp_path / tag
        d.mkdir()
        quickbin([f"in={tmp_path}/asm.fa", f"sam={tmp_path}/m.sam",
                  f"out={d}/bin_%.fa", flag,
                  "mincontig=1000", "sketch=f"])

    def stats(d):
        import glob as _g

        files = sorted(_g.glob(str(d / "bin_*.fa")))
        per_bin = []
        for fp in files:
            tids = []
            sizes = {}
            for line in open(fp, "rb").read().splitlines():
                if line.startswith(b">"):
                    t = int(line.split(b"_")[1])
                    tids.append(t)
            for t in tids:
                sizes[t] = sizes.get(t, 0) + 1
            per_bin.append(sizes)
        return per_bin

    with_e = stats(tmp_path / "e")
    without = stats(tmp_path / "ne")
    # no bin mixes taxa in either mode (contamination unchanged at 0)
    assert all(len(s) == 1 for s in with_e), with_e
    # edge following must not increase bin count; completeness
    # (contigs of a taxon per bin) must not decrease
    assert len(with_e) <= len(without)
    best_e = {max(s): max(s.values()) for s in with_e}
    best_n = {}
    for s in without:
        t = max(s)
        best_n[t] = max(best_n.get(t, 0), max(s.values()))
    for t, v in best_e.items():
        assert v >= best_n.get(t, 0), (best_e, best_n)


def test_quickbin_fuse_pass():
    """Binner.fuse (bin/Binner.java:1053,1661-67): mid-size fragments of
    one genome fuse under the relaxed (1.6x) gates; a composition-
    distant bin does not; bins below fuseLowerLimit are not sources."""
    from bbtools_tpu.core.dna import BASE_TO_CODE
    from bbtools_tpu.models.quickbin import (
        Contig,
        fuse_pass,
        tetramer_profile,
    )

    rng = np.random.default_rng(77)
    genome = rng.choice(ACGT, 40_000).tobytes()
    gc = rng.choice(np.frombuffer(b"GC", np.uint8), 20_000).tobytes()
    mk = lambda n, s: Contig(
        n, s,
        tetramer_profile(BASE_TO_CODE[np.frombuffer(s, np.uint8)]),
        np.array([10.0]),
    )
    bins = [
        [mk(b"a1", genome[:15_000])],
        [mk(b"a2", genome[15_000:30_000])],
        [mk(b"b", gc)],
        [mk(b"tiny", genome[30_000:33_000])],  # below fuseLowerLimit
    ]
    out, merges = fuse_pass(bins)
    sets = sorted(tuple(sorted(c.name for c in m)) for m in out)
    assert (b"a1", b"a2") in sets, sets
    assert (b"b",) in sets
    assert (b"tiny",) in sets  # 3 kb: not a fusion source
    assert merges == 1
