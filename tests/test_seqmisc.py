"""Misc sequence/SAM/interval tools (seqmisc batch)."""

import numpy as np

from bbtools_tpu.cli import main as cli
from bbtools_tpu.models.seqmisc import _adjust_read, _hash64shift


def test_adjust_read_expand_contract():
    # AdjustHomopolymers.java:430-460 appends expansion AFTER the next
    # differing base (quirk preserved): AAAAACGT rate=.4 -> AAAAACAAGT
    b, q = _adjust_read(b"AAAAACGT", b"IIIIIIII", 0.4)
    assert b == b"AAAAACAAGT"
    assert len(q) == len(b)
    b, q = _adjust_read(b"AAAAACGT", b"IIIIIIII", -0.4)
    assert b == b"AAAAGT"


def test_restorebases(tmp_path):
    sam = (b"@SQ\tSN:c1\tLN:100\n"
           b"r1\t0\tc1\t1\t60\t10M\t*\t0\t0\tACGTACGTAC\tIIIIJJJJKK\n"
           b"r1\t256\tc1\t20\t0\t10M\t*\t0\t0\t*\t*\n"
           b"r1\t272\tc1\t40\t0\t10M\t*\t0\t0\t*\t*\n")
    src = tmp_path / "in.sam"
    src.write_bytes(sam)
    out = tmp_path / "out.sam"
    cli(["restorebases", f"in={src}", f"out={out}"])
    lines = out.read_bytes().split(b"\n")
    f2 = lines[2].split(b"\t")
    f3 = lines[3].split(b"\t")
    assert f2[9] == b"ACGTACGTAC" and f2[10] == b"IIIIJJJJKK"
    # strand flip: rc seq, reversed qual
    assert f3[9] == b"GTACGTACGT" and f3[10] == b"KKJJJJIIII"


def test_bedset_modes(tmp_path):
    (tmp_path / "a.bed").write_text("c1\t0\t100\nc1\t200\t300\n")
    (tmp_path / "b.bed").write_text("c1\t50\t250\n")
    for mode, want in (
        ("union", [(0, 300)]),
        ("intersection", [(50, 100), (200, 250)]),
        ("subtract", [(0, 50), (250, 300)]),
    ):
        out = tmp_path / f"{mode}.bed"
        cli(["bedset", f"in={tmp_path}/a.bed,{tmp_path}/b.bed",
             f"out={out}", f"mode={mode}"])
        got = [(int(l.split(b"\t")[1]), int(l.split(b"\t")[2]))
               for l in out.read_bytes().split(b"\n") if l]
        assert got == want, (mode, got)


def test_representative(tmp_path):
    src = tmp_path / "e.tsv"
    src.write_text("a\tb\t0.01\nb\tc\t0.01\nc\td\t0.5\n")
    out = tmp_path / "r.txt"
    cli(["representative", f"in={src}", f"out={out}", "thresh=0.02"])
    reps = set(out.read_bytes().split())
    assert b"b" in reps and b"d" in reps and len(reps) == 2


def test_kmercountshort(tmp_path):
    fq = tmp_path / "r.fq"
    fq.write_bytes(b"@r\nAAAACG\n+\nIIIIII\n")
    out = tmp_path / "k.tsv"
    cli(["kmercountshort", f"in={fq}", f"out={out}", "k=2"])
    rows = dict(l.split("\t") for l in out.read_text().strip().split("\n"))
    assert rows == {"AA": "3", "AC": "1", "CG": "1"}


def test_hash64shift_deterministic():
    x = np.array([1, 2, 3], np.int64)
    h1, h2 = _hash64shift(x), _hash64shift(x)
    assert (h1 == h2).all() and len(set(h1.tolist())) == 3


def test_renamers(tmp_path):
    fa = tmp_path / "in.fa"
    fa.write_bytes(b">old1 d\nACGT\n")
    mp = tmp_path / "map.tsv"
    mp.write_bytes(b"old1\tnew1\n")
    out = tmp_path / "out.fa"
    cli(["renameref", f"in={fa}", f"out={out}", f"map={mp}"])
    assert out.read_bytes().startswith(b">new1 d\n")
    key = tmp_path / "key.tsv"
    key.write_bytes(b"ctg1\t562\n")
    cami = tmp_path / "cami.fa"
    cami.write_bytes(b">ctg1\nACGT\n")
    out2 = tmp_path / "cami_out.fa"
    cli(["renamecami", f"in={cami}", f"key={key}", f"out={out2}"])
    assert out2.read_bytes().startswith(b">ctg1_tid_562\n")
    img = tmp_path / "img.fa"
    img.write_bytes(b">2001 x\nACGT\n")
    mp2 = tmp_path / "img.tsv"
    mp2.write_bytes(b"2001\t1280\n")
    out3 = tmp_path / "img_out.fa"
    cli(["renameimg", f"in={img}", f"img={mp2}", f"out={out3}"])
    assert out3.read_bytes().startswith(b">tid|1280|2001 x\n")


def test_synthmda_amplifies(tmp_path):
    out = tmp_path / "mda.fa"
    cli(["synthmda", "ref=/root/repo/bbtools_tpu/resources/phix2.fa.gz",
         f"out={out}", "depth=2", "minfrag=300", "seed=3"])
    total = sum(len(l) for l in out.read_bytes().split(b"\n")
                if l and not l.startswith(b">"))
    assert total >= 2 * 5386  # >= depth * genome
