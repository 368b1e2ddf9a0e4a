"""hiseq flowcell plumbing tools."""

import numpy as np

from bbtools_tpu.cli import main as cli
from bbtools_tpu.models.hiseqtools import bgi_to_illumina


def test_bgi_to_illumina_reference_examples():
    # BGIHeaderParser2.java documented formats
    assert (bgi_to_illumina(b"E200008112L1C001R00100063962/1")
            == b"CG:0:E200008112:1:63962:1:1 1:N:0:")
    assert (bgi_to_illumina(b"v300056266_run28L3C001R0010057888/2", b"AC")
            == b"CG:0:v300056266:3:57888:1:1 2:N:0:AC")
    # non-BGI headers pass through
    assert bgi_to_illumina(b"plain_header") == b"plain_header"


def _write_fc(path, n=200):
    rng = np.random.default_rng(0)
    with open(path, "wb") as f:
        for i in range(n):
            tile = 1101 + (i % 2)
            x, y = int(rng.integers(0, 2000)), int(rng.integers(0, 2000))
            q = "I" if tile == 1101 else "5"
            s = "".join("ACGT"[j] for j in rng.integers(0, 4, 40))
            f.write(f"@M:1:FC:1:{tile}:{x}:{y} 1:N:0:ACGT\n{s}\n"
                    f"+\n{q * 40}\n".encode())


def test_tiledump_and_plotflowcell(tmp_path):
    fq = tmp_path / "fc.fq"
    _write_fc(fq)
    dump = tmp_path / "dump.tsv"
    cli(["tiledump", f"in={fq}", f"out={dump}", "xsize=1000",
         "ysize=1000"])
    rows = [l.split("\t") for l in dump.read_text().strip().split("\n")[1:]]
    assert sum(int(r[3]) for r in rows) == 200
    q1101 = [float(r[4]) for r in rows if r[0] == "1101"]
    q1102 = [float(r[4]) for r in rows if r[0] == "1102"]
    assert min(q1101) > max(q1102)  # tile 1102 has low quality
    fcq = tmp_path / "fcq.tsv"
    cli(["plotflowcell", f"in={fq}", f"out={fcq}"])
    lines = fcq.read_text().strip().split("\n")
    assert len(lines) == 3  # header + 2 tiles


def test_plothist(tmp_path):
    src = tmp_path / "m.tsv"
    src.write_text("#a\tb\n" + "\n".join(f"{i}\t{i * 2}"
                                         for i in range(50)) + "\n")
    cli(["plothist", f"in={src}", f"out={tmp_path}/h_#.tsv", "bins=5"])
    hist = (tmp_path / "h_a.tsv").read_text().strip().split("\n")[1:]
    assert sum(int(l.split("\t")[1]) for l in hist) == 50


def test_cg2illumina(tmp_path):
    fq = tmp_path / "bgi.fq"
    fq.write_bytes(b"@E200008112L1C001R00100063962/1\nACGT\n+\nIIII\n")
    out = tmp_path / "o.fq"
    cli(["cg2illumina", f"in={fq}", f"out={out}"])
    assert out.read_bytes().startswith(
        b"@CG:0:E200008112:1:63962:1:1 1:N:0:\n")
