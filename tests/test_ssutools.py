"""SSU/Silva family, clade DB, and file utilities."""

import numpy as np

from bbtools_tpu.cli import main as cli
from bbtools_tpu.models.ssutools import _tid_of, upgma_newick


def test_tid_of():
    assert _tid_of(b"tid|123|foo bar") == 123
    assert _tid_of(b"x tid_77_y") == 77
    assert _tid_of(b"noid here") == -1


def test_filtersilva(tmp_path):
    src = tmp_path / "s.fa"
    src.write_bytes(
        b">A1 Bacteria;Proteobacteria;Ecoli\nACGT\n"
        b">A2 Eukaryota;Plants;Chloroplast;X\nACGT\n"
        b">A3 Eukaryota;Fungi;Yeast\nACGT\n"
        b">A4 nodesc\nACGT\n"
    )
    out = tmp_path / "o.fa"
    cli(["filtersilva", f"in={src}", f"out={out}"])
    names = [l for l in out.read_bytes().split(b"\n") if l.startswith(b">")]
    assert names == [b">A1 Bacteria;Proteobacteria;Ecoli",
                     b">A3 Eukaryota;Fungi;Yeast"]


def test_reducesilva(tmp_path):
    src = tmp_path / "s.fa"
    src.write_bytes(
        b">a;GenusX;sp1\nAAAA\n>b;GenusX;sp2\nCCCC\n>c;GenusY;sp3\nGGGG\n")
    out = tmp_path / "o.fa"
    # column=1 -> second-from-last field (the genus)
    cli(["reducesilva", f"in={src}", f"out={out}", "column=1"])
    names = [l for l in out.read_bytes().split(b"\n") if l.startswith(b">")]
    assert len(names) == 2  # one per genus


def test_comparessu_identity(tmp_path):
    rng = np.random.default_rng(0)
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, 200))
    mut = list(base)
    mut[5] = "A" if mut[5] != "A" else "C"
    src = tmp_path / "ssu.fa"
    src.write_bytes(
        b">tid|1|x\n" + base.encode() + b"\n>tid|2|y\n"
        + "".join(mut).encode() + b"\n")
    out = tmp_path / "cmp.tsv"
    cli(["comparessu", f"in={src}", "ata=t", f"out={out}"])
    rows = [l.split("\t") for l in out.read_text().strip().split("\n")]
    assert len(rows) == 2
    assert abs(float(rows[0][1]) - 199 / 200) < 1e-3


def test_upgma_newick():
    d = 1 - np.array([[1.0, 0.9, 0.7],
                      [0.9, 1.0, 0.72],
                      [0.7, 0.72, 1.0]])
    nwk = upgma_newick(d, ["a", "b", "c"])
    # a and b cluster first (closest pair)
    assert nwk.startswith("(c:") and "(a:" in nwk and nwk.endswith(";")


def test_clade_db_roundtrip(tmp_path):
    from bbtools_tpu.models.clade import compare, load_db, profile_fasta

    ref = "/root/repo/bbtools_tpu/resources/phix2.fa.gz"
    db = tmp_path / "db.npz"
    cli(["cladeloader", f"ref={ref}", f"out={db}"])
    clades = load_db(str(db))
    assert len(clades) == 1
    direct = profile_fasta(ref)
    assert compare(direct, clades[0]) < 1e-5


def test_file_utils(tmp_path):
    src = tmp_path / "x.txt"
    src.write_text("a\nb\nc\n")
    gz = tmp_path / "x.txt.gz"
    import gzip

    gz.write_bytes(gzip.compress(src.read_bytes()))
    out = tmp_path / "y.txt"
    cli(["unzip", str(gz), str(out)])
    assert out.read_text() == "a\nb\nc\n"
    cat_out = tmp_path / "cat.txt"
    cli(["cat", str(src), str(src), f"out={cat_out}"])
    assert cat_out.read_text() == "a\nb\nc\na\nb\nc\n"
    stamp = tmp_path / "stamp"
    cli(["printtime", str(stamp)])
    assert stamp.read_text().isdigit()
    copy = tmp_path / "copy.txt"
    cli(["copyfile", str(src), str(copy)])
    assert copy.read_text() == "a\nb\nc\n"


def test_sample_mt_roundtrip(tmp_path):
    fq = tmp_path / "in.fq"
    fq.write_bytes(b"@r0\nACGT\n+\nIIII\n@r1\nGGCC\n+\nIIII\n")
    out = tmp_path / "out.fq"
    cli(["a_sample_mt", f"in={fq}", f"out={out}"])
    assert out.read_bytes() == fq.read_bytes()


def test_runhmm_domtbl_parser(tmp_path, capsys):
    """hmm/HMMSearchReport: parse a domtbl report (comments skipped),
    build the per-protein max-length summary, echo name\\tlen\\thmm per
    line (HMMSearchLine.toText)."""
    from bbtools_tpu.models.ssutools import parse_domtbl

    dom = tmp_path / "dom.txt"
    dom.write_bytes(
        b"#                        --- full sequence ---\n"
        b"# target name  accession  tlen query name  accession  qlen ...\n"
        b"protein_1 - 257 ATP-synt_A PF00119.18 211 1.9e-49 159.6 27.5 "
        b"1 1 7.3e-51 2.5e-49 159.2 27.5 3 210 41 250 38 251 0.87 - extra\n"
        b"protein_1 - 300 ATP-synt_C PF00137.16 76 3e-10 40.1 5.0 "
        b"1 2 1e-11 4e-10 39.0 5.0 1 70 10 85 8 88 0.91 desc words\n"
        b"protein_2 - 120 ATP-synt_A PF00119.18 211 1e-20 70.0 1.0 "
        b"1 1 1e-21 2e-20 69.0 1.0 5 200 6 115 4 118 0.80 -\n"
    )
    lines, summaries, nlines, nbytes = parse_domtbl(str(dom))
    assert nlines == 5 and len(lines) == 3
    l0 = lines[0]
    assert (l0.name, l0.length, l0.hmm_name) == (
        b"protein_1", 257, b"ATP-synt_A"
    )
    assert l0.accession == b"PF00119.18" and l0.qlen == 211
    assert abs(l0.evalue - 1.9e-49) < 1e-55 and l0.score == np.float32(159.6)
    assert (l0.hmm_from, l0.hmm_to, l0.ali_from, l0.ali_to,
            l0.env_from, l0.env_to) == (3, 210, 41, 250, 38, 251)
    assert l0.field22 == b"-" and lines[1].field22 == b"desc"
    # ProteinSummary: keyed by line.name (reference quirk), max length
    assert summaries[b"protein_1"].map == {b"protein_1": 300}
    assert summaries[b"protein_2"].map == {b"protein_2": 120}
    # CLI surface echoes toText lines to stderr
    assert cli(["runhmm", f"in={dom}"]) == 0
    err = capsys.readouterr().err
    assert "protein_1\t257\tATP-synt_A" in err
    assert "Lines Processed" in err
