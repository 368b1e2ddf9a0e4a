"""Protein family (proteinsearch/clusterproteins/markers) + PGM training."""

import numpy as np
import pytest

from bbtools_tpu.cli import main as cli
from bbtools_tpu.models.prottools import (
    GAP_EXTEND,
    GAP_OPEN,
    MATRIX,
    encode_protein,
    pident,
    sw_align,
)

AAS = "ARNDCQEGHILKMFPSTWYV"


def _brute_sw(q, t):
    m, n = len(q), len(t)
    NEG = -(10 ** 9)
    M = [[0] * (n + 1) for _ in range(m + 1)]
    Ix = [[NEG] * (n + 1) for _ in range(m + 1)]
    Iy = [[NEG] * (n + 1) for _ in range(m + 1)]
    best = 0
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            d = max(M[i - 1][j - 1], Ix[i - 1][j - 1],
                    Iy[i - 1][j - 1]) + MATRIX[q[i - 1]][t[j - 1]]
            M[i][j] = max(d, 0)
            Ix[i][j] = max(M[i - 1][j] - GAP_OPEN - GAP_EXTEND,
                           Ix[i - 1][j] - GAP_EXTEND)
            Iy[i][j] = max(M[i][j - 1] - GAP_OPEN - GAP_EXTEND,
                           Iy[i][j - 1] - GAP_EXTEND)
            best = max(best, M[i][j])
    return best


def test_sw_vs_brute_force():
    rng = np.random.default_rng(2)
    for _ in range(20):
        q = rng.integers(0, 20, int(rng.integers(5, 35))).astype(np.int8)
        t = rng.integers(0, 20, int(rng.integers(5, 35))).astype(np.int8)
        h = sw_align(q, t)
        assert (h["rawScore"] if h else 0) == _brute_sw(q, t)


def test_sw_self_alignment():
    q = encode_protein(b"MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ")
    h = sw_align(q, q)
    assert pident(h) == 100.0 and h["length"] == len(q)
    assert h["gapOpens"] == 0 and h["mismatches"] == 0


def test_proteinsearch_outfmt6(tmp_path):
    q = tmp_path / "q.faa"
    db = tmp_path / "db.faa"
    seq = "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQAPILSRVGDGTQDNLSGAEKAVQ"
    q.write_text(f">q0\n{seq}\n")
    db.write_text(f">t0\n{seq}\n>t1\n{seq[::-1]}\n")
    out = tmp_path / "hits.tsv"
    cli(["proteinsearch", f"query={q}", f"db={db}", f"out={out}",
         "evalue=1e-5"])
    rows = [l.split("\t") for l in out.read_text().strip().split("\n")]
    assert rows[0][0] == "q0" and rows[0][1] == "t0"
    assert float(rows[0][2]) == 100.0
    assert len(rows[0]) == 12  # outfmt 6


@pytest.fixture(scope="module")
def marker_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("markers")
    rng = np.random.default_rng(1)

    def rand_prot(n):
        return "".join(AAS[i] for i in rng.integers(0, 20, n))

    def mutate(s, n=3):
        s = list(s)
        for p in rng.integers(0, len(s), n):
            s[p] = AAS[int(rng.integers(0, 20))]
        return "".join(s)

    markers = [rand_prot(60) for _ in range(3)]
    for g in range(3):
        with open(d / f"g{g}.faa", "w") as f:
            for mi, m in enumerate(markers):
                f.write(f">m{mi}_g{g}\n{mutate(m)}\n")
            f.write(f">extra_g{g}\n{rand_prot(50)}\n")
    mk = d / "markers.tsv"
    cli(["markerfactory", f"in={d}/g0.faa,{d}/g1.faa,{d}/g2.faa",
         f"out={mk}", "minid=80"])
    return d, mk, markers


def test_markerfactory_finds_single_copy(marker_setup):
    d, mk, markers = marker_setup
    rows = [l for l in mk.read_text().strip().split("\n")
            if not l.startswith("#")]
    assert len(rows) == 3  # exactly the planted single-copy markers


def test_markervector_magqc(marker_setup, tmp_path):
    d, mk, markers = marker_setup
    vec = tmp_path / "vec.tsv"
    cli(["markervector", f"in={d}/g0.faa", f"markers={mk}", f"out={vec}",
         "minid=80"])
    text = vec.read_text()
    assert "#completeness\t100.00" in text
    assert "#contamination\t0.00" in text
    half = tmp_path / "half.faaa.fa"
    with open(half, "w") as f:
        f.write(f">m0\n{markers[0]}\n")
    vec2 = tmp_path / "vec2.tsv"
    cli(["markervector", f"in={half}", f"markers={mk}", f"out={vec2}",
         "minid=80"])
    assert "#completeness\t33.33" in vec2.read_text()
    rpt = tmp_path / "qc.tsv"
    cli(["magqc", f"in={vec}", f"out={rpt}"])
    assert "completeness\t100.00" in rpt.read_text()


def test_pgm_train_roundtrip(tmp_path):
    """analyzegenes -> parse_pgm -> callgenes consumes trained model."""
    from bbtools_tpu.models.pgm import parse_pgm

    ref = "/root/repo/bbtools_tpu/resources/phix2.fa.gz"
    gff = tmp_path / "p.gff"
    cli(["callgenes", f"in={ref}", f"outgff={gff}"])
    model = tmp_path / "trained.pgm"
    cli(["analyzegenes", f"in={ref}", f"gff={gff}", f"out={model}"])
    m = parse_pgm(str(model))
    for name in ("CDS inner", "CDS start", "CDS stop"):
        assert name in m
    gff2 = tmp_path / "p2.gff"
    cli(["callgenes", f"in={ref}", f"outgff={gff2}", f"model={model}"])
    n1 = sum(1 for l in open(gff) if not l.startswith("#"))
    n2 = sum(1 for l in open(gff2) if not l.startswith("#"))
    assert n1 >= 3 and abs(n1 - n2) <= 2
    merged = tmp_path / "m.pgm"
    cli(["mergepgm", f"in={model},{model}", f"out={merged}"])
    assert "CDS inner" in parse_pgm(str(merged))
