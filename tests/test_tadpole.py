import numpy as np

from bbtools_tpu.io.fasta import load_reference, write_fasta
from bbtools_tpu.models.tadpole import Tadpole, TadpoleConfig, second_highest_position
from bbtools_tpu.utils.synth import random_genome, random_reads, write_reads


def test_second_highest_position():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 100, (200, 4)).astype(np.int64)
    got = second_highest_position(a)
    for i in range(200):
        # oracle: Tools.secondHighestPosition transliteration
        arr = a[i]
        if arr[0] >= arr[1]:
            mp, m2 = 0, 1
        else:
            mp, m2 = 1, 0
        for j in (2, 3):
            x = arr[j]
            if x > arr[m2]:
                if x >= arr[mp]:
                    m2 = mp
                    mp = j
                else:
                    m2 = j
        assert got[i] == m2, f"row {i}: {arr}"


def test_assemble_simple_genome(tmp_path):
    # unique-ish random genome, deep even coverage -> few long contigs
    genome = random_genome(20_000, n_scaffolds=1, seed=5)
    write_fasta(str(tmp_path / "g.fa"), genome)
    ref = load_reference(str(tmp_path / "g.fa"))
    reads = random_reads(ref, 4000, read_len=100, snp_rate=0.0, seed=6)
    write_reads(str(tmp_path / "reads.fq"), reads)
    cfg = TadpoleConfig(
        in1=str(tmp_path / "reads.fq"), out=str(tmp_path / "contigs.fa"), k=31
    ).resolve()
    tool = Tadpole(cfg)
    tool.run()
    assert len(tool.contigs) >= 1
    total = sum(len(c) for c in tool.contigs)
    # should reconstruct most of the genome
    assert total > 18_000, total
    longest = max(len(c) for c in tool.contigs)
    assert longest > 5_000, longest
    # contigs must be substrings of genome (or its rc)
    g = genome[0][1]
    from bbtools_tpu.core.dna import reverse_complement

    grc = reverse_complement(g)
    for c in tool.contigs[:5]:
        assert c in g or c in grc or reverse_complement(c) in g, len(c)


def test_branch_stops(tmp_path):
    # two scaffolds sharing a 40bp core -> contigs must break at the branch
    rng = np.random.default_rng(8)
    core = bytes(b"ACGT"[x] for x in rng.integers(0, 4, 60))
    left1 = bytes(b"ACGT"[x] for x in rng.integers(0, 4, 400))
    left2 = bytes(b"ACGT"[x] for x in rng.integers(0, 4, 400))
    right1 = bytes(b"ACGT"[x] for x in rng.integers(0, 4, 400))
    right2 = bytes(b"ACGT"[x] for x in rng.integers(0, 4, 400))
    g1 = left1 + core + right1
    g2 = left2 + core + right2
    write_fasta(str(tmp_path / "g.fa"), [(b"a", g1), (b"b", g2)])
    ref = load_reference(str(tmp_path / "g.fa"))
    reads = random_reads(ref, 3000, read_len=80, snp_rate=0.0, seed=9)
    write_reads(str(tmp_path / "reads.fq"), reads)
    cfg = TadpoleConfig(
        in1=str(tmp_path / "reads.fq"), out=None, k=31, min_contig_len=100
    ).resolve()
    cfg.min_contig_len = 100
    tool = Tadpole(cfg)
    tool.load_kmers(cfg.in1)
    tool.build_contigs()
    # no contig may span from a unique left flank into a unique right flank
    for c in tool.contigs:
        in1 = c in g1 or _rc(c) in g1
        in2 = c in g2 or _rc(c) in g2
        assert in1 or in2, f"chimeric contig of length {len(c)}"


def _rc(s):
    from bbtools_tpu.core.dna import reverse_complement

    return reverse_complement(s)


def test_assemble_bigk(tmp_path):
    genome = random_genome(15_000, n_scaffolds=1, seed=42)
    write_fasta(str(tmp_path / "g.fa"), genome)
    ref = load_reference(str(tmp_path / "g.fa"))
    reads = random_reads(ref, 3000, read_len=120, snp_rate=0.0, seed=43)
    write_reads(str(tmp_path / "reads.fq"), reads)
    cfg = TadpoleConfig(
        in1=str(tmp_path / "reads.fq"), out=str(tmp_path / "c.fa"), k=62
    ).resolve()
    from bbtools_tpu.models.tadpole import Tadpole

    tool = Tadpole(cfg)
    tool.run()
    assert len(tool.contigs) >= 1
    total = sum(len(c) for c in tool.contigs)
    assert total > 13_000, total
    g = genome[0][1]
    from bbtools_tpu.core.dna import reverse_complement

    for c in tool.contigs[:3]:
        assert c in g or reverse_complement(c) in g, len(c)


def test_ecc_corrects_substitutions(tmp_path):
    import numpy as np

    from bbtools_tpu.core.dna import BASE_TO_CODE, CODE_TO_BASE
    from bbtools_tpu.io.fasta import load_reference, write_fasta
    from bbtools_tpu.models.tadpole import Tadpole, parse_args as tadparse
    from bbtools_tpu.utils.synth import random_genome

    genome = random_genome(8_000, n_scaffolds=1, seed=21)
    write_fasta(str(tmp_path / "g.fa"), genome)
    codes = load_reference(str(tmp_path / "g.fa")).scaffold_codes(0)
    rng = np.random.default_rng(3)
    recs = []
    mutated = {}
    for i in range(600):
        s0 = int(rng.integers(0, len(codes) - 110))
        r = codes[s0 : s0 + 100].copy()
        if i % 5 == 0:  # 20% of reads get one substitution mid-read
            p = int(rng.integers(40, 60))
            r[p] = (r[p] + 1) % 4
            mutated[i] = s0
        recs.append(
            (b"r%d" % i, CODE_TO_BASE[np.minimum(r, 4)].tobytes(), b"F" * 100)
        )
    fin = tmp_path / "in.fq"
    with open(fin, "wb") as fh:
        for n, s, q in recs:
            fh.write(b"@" + n + b"\n" + s + b"\n+\n" + q + b"\n")
    fout = tmp_path / "ecc.fq"
    cfg = tadparse([f"in={fin}", f"out={fout}", "mode=correct", "k=31"])
    t = Tadpole(cfg).run()
    assert t.errors_corrected >= 0.7 * len(mutated), (
        t.errors_corrected,
        len(mutated),
    )
    # corrected mutant reads should now match the genome exactly
    out = fout.read_bytes().splitlines()
    fixed = total = 0
    for j in range(0, len(out), 4):
        ridx = int(out[j][2:])
        if ridx not in mutated:
            continue
        total += 1
        s0 = mutated[ridx]
        want = CODE_TO_BASE[np.minimum(codes[s0 : s0 + 100], 4)].tobytes()
        if out[j + 1] == want:
            fixed += 1
    assert total == len(mutated)
    assert fixed >= 0.7 * total, (fixed, total)


def test_ecc_reassemble_only():
    """Reassemble pass alone corrects an interior substitution when the
    pincer/tail passes are disabled."""
    import numpy as np

    from bbtools_tpu.models.tadpole import SpectrumTable
    from bbtools_tpu.models.tadpole_ecc import EccConfig, EccEngine
    from bbtools_tpu.ops.kmer_count import KmerSpectrum, count_batch_np

    rng = np.random.default_rng(41)
    genome = rng.integers(0, 4, 4000).astype(np.uint8)
    # clean coverage
    reads = np.stack(
        [genome[s : s + 100] for s in range(0, 3000, 10)]
    )
    v, c = count_batch_np(reads, np.full(len(reads), 100, np.int64), 31)
    spec = KmerSpectrum(31)
    spec.add_batch(v, c * 5)  # boost depth
    spec.flush()
    eng = EccEngine(
        SpectrumTable(spec, 31),
        31,
        EccConfig(pincer=False, tail=False, reassemble=True, rollback=False),
    )
    codes = genome[500:600].copy()
    codes[50] = (codes[50] + 2) % 4
    fixed = eng.correct_read(codes, None)
    assert fixed >= 1
    assert (codes == genome[500:600]).all()


def test_assemble_k93_exact_words(tmp_path):
    """k=93 (3-word exact keys): assembles a synthetic genome with zero
    collision-induced misassemblies — every contig is a genome substring."""
    genome = random_genome(12_000, n_scaffolds=1, seed=77)
    write_fasta(str(tmp_path / "g.fa"), genome)
    ref = load_reference(str(tmp_path / "g.fa"))
    reads = random_reads(ref, 2500, read_len=150, snp_rate=0.0, seed=78)
    write_reads(str(tmp_path / "reads.fq"), reads)
    cfg = TadpoleConfig(
        in1=str(tmp_path / "reads.fq"), out=str(tmp_path / "c.fa"), k=93
    ).resolve()
    from bbtools_tpu.models.tadpole import Tadpole, WordSpectrumTable

    tool = Tadpole(cfg)
    tool.run()
    assert isinstance(tool.table, WordSpectrumTable)
    assert len(tool.contigs) >= 1
    total = sum(len(c) for c in tool.contigs)
    assert total > 9_000, total
    g = genome[0][1]
    from bbtools_tpu.core.dna import reverse_complement

    for c in tool.contigs:
        assert c in g or reverse_complement(c) in g, len(c)


def test_shave_removes_hair(tmp_path):
    """A low-coverage dead-end branch (hair) breaks the contig at the
    branch point; shave=t removes it and the backbone assembles through
    (assemble/Shaver.java semantics)."""
    import numpy as np

    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.models.tadpole import Tadpole, parse_args

    rng = np.random.default_rng(61)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    genome = ACGT[rng.integers(0, 4, 3000)].tobytes()
    # clean 10x coverage of the backbone
    reads = []
    for i in range(0, 3000 - 100, 10):
        for _ in range(10):
            reads.append(genome[i : i + 100])
    # hair: ONE read that matches the backbone for 50bp then diverges
    hair = genome[1500:1550] + ACGT[rng.integers(0, 4, 50)].tobytes()
    reads.append(hair)
    with open(tmp_path / "r.fq", "wb") as f:
        for i, r in enumerate(reads):
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, r, b"I" * len(r)))

    def asm(extra):
        out = tmp_path / ("c_%s.fa" % ("shave" if extra else "plain"))
        cfg = parse_args(
            [f"in={tmp_path}/r.fq", f"out={out}", "k=31", "mincount=1"]
            + (["shave=t"] if extra else [])
        )
        t = Tadpole(cfg)
        t.run()
        seqs = []
        cur = []
        for ln in open(out, "rb").read().splitlines():
            if ln.startswith(b">"):
                if cur:
                    seqs.append(b"".join(cur))
                cur = []
            else:
                cur.append(ln)
        if cur:
            seqs.append(b"".join(cur))
        return max((len(x) for x in seqs), default=0)

    longest_shaved = asm(True)
    assert longest_shaved >= 2900, longest_shaved  # full backbone


def test_mode_extend(tmp_path):
    """mode=extend (er=/el=): reads extend through the kmer graph up to
    the requested distances."""
    import numpy as np

    from bbtools_tpu.models.tadpole import Tadpole, parse_args

    rng = np.random.default_rng(77)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    genome = ACGT[rng.integers(0, 4, 2000)].tobytes()
    reads = [genome[i : i + 80] for i in range(0, 1900, 5)]
    with open(tmp_path / "r.fq", "wb") as f:
        for i, r in enumerate(reads):
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, r, b"I" * len(r)))
    cfg = parse_args([
        f"in={tmp_path}/r.fq", f"out={tmp_path}/e.fq", "k=31",
        "mincount=1", "er=50", "el=20",
    ])
    assert cfg.mode == "extend"
    Tadpole(cfg).run()
    lines = open(tmp_path / "e.fq", "rb").read().splitlines()
    seqs = lines[1::4]
    # interior reads extend fully and stay genome-consistent
    mid = seqs[len(seqs) // 2]
    assert len(mid) == 80 + 50 + 20
    assert mid in genome
