"""Tool long tail batch 7: randomreadsmg, kmerfilterset, gbff2gff,
icecreammaker."""

import numpy as np

from bbtools_tpu.cli import main


def _rand_fa(path, n, seed, name=b"c0"):
    rng = np.random.default_rng(seed)
    seq = bytes(b"ACGT"[c] for c in rng.integers(0, 4, n))
    path.write_bytes(b">" + name + b"\n" + seq + b"\n")
    return seq


def test_randomreadsmg(tmp_path):
    _rand_fa(tmp_path / "tid_77_a.fa", 3000, 1)
    _rand_fa(tmp_path / "b.fa", 3000, 2)
    main([
        "randomreadsmg", f"{tmp_path}/tid_77_a.fa", f"{tmp_path}/b.fa",
        f"out={tmp_path}/r.fq", "depth=10", "paired=t", "seed=5",
    ])
    data = (tmp_path / "r.fq").read_bytes().splitlines()
    names = [l for l in data[::4]]
    assert len(names) >= 100  # ~10x over 6kb at 2x150 per pair
    # header style f_ c_ s_ p_ i_ r_ d_ with tid on the first file
    h = names[0].split()
    assert h[0].startswith(b"@f_0") and h[1].startswith(b"c_")
    assert any(b"tid_77" in n for n in names)
    assert all(len(data[i]) == 150 for i in range(1, 40, 4))
    # custom depth form: file=depth
    main([
        "randomreadsmg", f"{tmp_path}/b.fa=2",
        f"out={tmp_path}/r2.fq", "paired=f", "seed=5",
    ])
    n2 = len((tmp_path / "r2.fq").read_bytes().splitlines()) // 4
    assert 30 <= n2 <= 50  # ~2x over 3kb at 150bp = 40 reads


def test_kmerfilterset(tmp_path):
    # 10 sequences sharing one common kmer + unique tails: greedy set
    # must cover every sequence
    rng = np.random.default_rng(9)
    core = bytes(b"ACGT"[c] for c in rng.integers(0, 4, 31))
    recs = []
    for i in range(10):
        tail = bytes(b"ACGT"[c] for c in rng.integers(0, 4, 40))
        recs.append(b">s%d\n%s\n" % (i, tail[:20] + core + tail[20:]))
    (tmp_path / "in.fa").write_bytes(b"".join(recs))
    main([
        "kmerfilterset", f"in={tmp_path}/in.fa", f"out={tmp_path}/set.fa",
        "k=31", "maxkpp=1",
    ])
    kmers = [
        l for l in (tmp_path / "set.fa").read_bytes().splitlines()
        if not l.startswith(b">")
    ]
    assert len(kmers) == 1  # the shared core kmer covers everything
    rc = core.translate(bytes.maketrans(b"ACGT", b"TGCA"))[::-1]
    assert kmers[0] in (core, rc)


def test_gbff2gff(tmp_path):
    gbff = (
        b"LOCUS       NC_001422             5386 bp    DNA\n"
        b"ACCESSION   NC_001422\n"
        b"FEATURES             Location/Qualifiers\n"
        b"     source          1..5386\n"
        b"     gene            100..500\n"
        b"                     /locus_tag=\"tag1\"\n"
        b"     CDS             100..500\n"
        b"                     /product=\"test protein\"\n"
        b"                     /locus_tag=\"tag1\"\n"
        b"     CDS             complement(600..900)\n"
        b"                     /product=\"rev protein\"\n"
        b"     rRNA            1000..2000\n"
        b"                     /product=\"16S ribosomal RNA\"\n"
        b"     CDS             3000..3200\n"
        b"                     /pseudo\n"
        b"ORIGIN\n"
        b"        1 acgtacgtac\n"
        b"//\n"
    )
    (tmp_path / "t.gbff").write_bytes(gbff)
    main([
        "gbff2gff", f"in={tmp_path}/t.gbff", f"out={tmp_path}/t.gff",
    ])
    lines = (tmp_path / "t.gff").read_bytes().splitlines()
    assert lines[0] == b"##gff-version 3"
    assert b"##sequence-region NC_001422 1 5386" in lines
    rows = [l.split(b"\t") for l in lines if l and not l.startswith(b"#")]
    # gene rows are not printed; pseudo CDS skipped
    assert len(rows) == 3
    assert rows[0][2] == b"CDS" and rows[0][3:5] == [b"100", b"500"]
    assert b"product=test protein" in rows[0][8]
    assert rows[1][6] == b"-" and rows[1][3:5] == [b"600", b"900"]
    assert rows[2][2] == b"rRNA"


def test_icecreammaker_feeds_icecream(tmp_path):
    main([
        "icecreammaker", f"out={tmp_path}/pb.fq", "zmws=30",
        "minlen=300", "maxlen=600", "minmovie=2000", "maxmovie=4000",
        "missingrate=1.0", "miner=0.01", "maxer=0.02", "seed=11",
        "genomesize=20000",
    ])
    data = (tmp_path / "pb.fq").read_bytes().splitlines()
    names = data[::4]
    assert len(names) >= 30
    assert all(n.count(b"/") == 2 for n in names)
    # every ZMW had a missing adapter -> at least one long fused read
    lens = [len(s) for s in data[1::4]]
    assert max(lens) >= 550  # fused fwd+rev pass
    # clean reads (missingrate=0) should NOT produce fused subreads
    main([
        "icecreammaker", f"out={tmp_path}/ok.fq", "zmws=20",
        "minlen=300", "maxlen=400", "minmovie=1500", "maxmovie=2000",
        "missingrate=0.0", "miner=0.01", "maxer=0.02", "seed=12",
        "genomesize=20000",
    ])
    lens_ok = [
        len(s) for s in (tmp_path / "ok.fq").read_bytes().splitlines()[1::4]
    ]
    assert max(lens_ok) <= 400


def _consensus_seq(t):
    import os
    from bbtools_tpu.models.ribo import RES_DIR

    path = os.path.join(RES_DIR, f"{t}_consensus_sequence.fa")
    seqs = []
    cur = []
    for ln in open(path, "rb").read().splitlines():
        if ln.startswith(b">"):
            if cur:
                seqs.append(b"".join(cur))
                cur = []
        else:
            cur.append(ln)
    if cur:
        seqs.append(b"".join(cur))
    return seqs[0]


def test_splitribo(tmp_path):
    # fragments of the real consensus sequences must route to their type
    rng = np.random.default_rng(21)
    s16 = _consensus_seq("16S")[100:900]
    s5 = _consensus_seq("5S")[:100]
    junk = bytes(b"ACGT"[c] for c in rng.integers(0, 4, 400))
    (tmp_path / "in.fa").write_bytes(
        b">a16\n" + s16 + b"\n>b5\n" + s5 + b"\n>noise\n" + junk + b"\n"
    )
    main([
        "splitribo", f"in={tmp_path}/in.fa", f"out={tmp_path}/out_#.fa",
        "types=16S,5S,23S",
    ])
    assert b">a16" in (tmp_path / "out_16S.fa").read_bytes()
    assert b">b5" in (tmp_path / "out_5S.fa").read_bytes()
    assert b">noise" in (tmp_path / "out_junk.fa").read_bytes()


def test_mergeribo(tmp_path):
    s16 = _consensus_seq("16S")
    rng = np.random.default_rng(22)
    # taxid 7: a full-length clean copy vs a short fragment -> full wins
    full = s16[:1500]
    frag = s16[200:600]
    # taxid 9: only one (mutated) copy
    arr = np.frombuffer(s16[:1200], np.uint8).copy()
    idx = rng.choice(len(arr), 60, replace=False)
    arr[idx] = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 60)]
    other = arr.tobytes()
    (tmp_path / "a.fa").write_bytes(
        b">tid|7|full\n" + full + b"\n>tid|7|frag\n" + frag
        + b"\n>tid|9|only\n" + other + b"\n"
    )
    main([
        "mergeribo", f"in={tmp_path}/a.fa", f"out={tmp_path}/best.fa",
        "types=16S",
    ])
    out = (tmp_path / "best.fa").read_bytes()
    assert b">tid|7|full" in out and b">tid|7|frag" not in out
    assert b">tid|9|only" in out


def test_icecream_maker_filter_grader_roundtrip(tmp_path, capfd):
    # maker -> icecream filter -> grader: filtering must reduce the
    # bad (fused) read count in the kept stream
    main([
        "icecreammaker", f"out={tmp_path}/pb.fq", "zmws=40",
        "minlen=400", "maxlen=700", "minmovie=3000", "maxmovie=5000",
        "missingrate=0.5", "miner=0.01", "maxer=0.03", "seed=33",
        "genomesize=30000",
    ])
    main(["icecreamgrader", f"in={tmp_path}/pb.fq"])
    err = capfd.readouterr().err
    bad_before = int(
        [l for l in err.splitlines() if l.startswith("Bad")][0].split("\t")[1]
    )
    assert bad_before >= 10
    main([
        "icecream", f"in={tmp_path}/pb.fq", f"out={tmp_path}/keep.fq",
        f"outb={tmp_path}/toss.fq",
    ])
    capfd.readouterr()
    main(["icecreamgrader", f"in={tmp_path}/keep.fq"])
    err2 = capfd.readouterr().err
    bad_after = int(
        [l for l in err2.splitlines() if l.startswith("Bad")][0].split("\t")[1]
    )
    assert bad_after < bad_before
