"""CRISPR finder, CBCL codec, and infra tools."""

import os
import struct

import numpy as np

from bbtools_tpu.cli import main as cli
from bbtools_tpu.core.dna import encode
from bbtools_tpu.models.crispr import find_crisprs
from bbtools_tpu.models.illuminatools import (
    read_cbcl_tile,
    read_filter,
    read_locs,
    write_cbcl,
)


def _array_read(rng, rep_len=30, spacer_len=30, copies=4):
    rep = "".join("ACGT"[i] for i in rng.integers(0, 4, rep_len))
    parts = [rep]
    for _ in range(copies - 1):
        parts.append("".join("ACGT"[i]
                             for i in rng.integers(0, 4, spacer_len)))
        parts.append(rep)
    return rep, "".join(parts)


def test_find_crisprs_planted():
    rng = np.random.default_rng(7)
    rep, seq = _array_read(rng)
    found = find_crisprs(encode(seq.encode()))
    assert len(found) == 1
    c = found[0]
    assert c.copies == 4
    assert c.a_stop - c.a_start + 1 == 30
    assert c.period == 60


def test_find_crisprs_negative():
    rng = np.random.default_rng(8)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
    # random sequence: no exact 22+bp repeat at CRISPR periodicity
    assert find_crisprs(encode(seq.encode())) == []


def test_crispr_cli(tmp_path):
    rng = np.random.default_rng(9)
    rep, seq = _array_read(rng)
    neg = "".join("ACGT"[i] for i in rng.integers(0, 4, len(seq)))
    fq = tmp_path / "r.fq"
    fq.write_text(f"@hit\n{seq}\n+\n{'I' * len(seq)}\n"
                  f"@miss\n{neg}\n+\n{'I' * len(neg)}\n")
    outc = tmp_path / "c.tsv"
    cons = tmp_path / "cons.fa"
    cli(["bbcrisprfinder", f"in={fq}", f"outc={outc}",
         f"consensus={cons}", f"out={tmp_path}/h.fq",
         f"outu={tmp_path}/u.fq"])
    rows = [l for l in outc.read_text().strip().split("\n")[1:]]
    assert len(rows) == 1 and rows[0].startswith("hit\t")
    assert rep in cons.read_text()
    assert "@hit" in (tmp_path / "h.fq").read_text()
    assert "@miss" in (tmp_path / "u.fq").read_text()


def test_cbcl_roundtrip(tmp_path):
    bases = b"ACGTACGTACGTACG"
    qb = np.array([3, 2, 1, 3, 3, 2, 1, 3, 3, 2, 1, 3, 3, 2, 1])
    p = tmp_path / "t.cbcl"
    write_cbcl(str(p), 1101, bases, qb, remap=(2, 12, 23, 37))
    b, q = read_cbcl_tile(str(p), 1101)
    assert bytes(b) == bases
    want_q = [37, 23, 12, 37, 37, 23, 12, 37, 37, 23, 12, 37, 37, 23, 12]
    assert list(q) == want_q


def test_locs_filter_parsers(tmp_path):
    locs = tmp_path / "s.locs"
    with open(locs, "wb") as f:
        f.write(struct.pack("<iii", 1, 0, 3))
        for i in range(3):
            f.write(struct.pack("<ff", float(i), float(i * 2)))
    pos = read_locs(str(locs))
    assert pos.shape == (3, 2) and pos[2][1] == 4.0
    filt = tmp_path / "s_1_1101.filter"
    with open(filt, "wb") as f:
        f.write(struct.pack("<iii", 0, 3, 4))
        f.write(bytes([1, 0, 1, 1]))
    flags = read_filter(str(filt))
    assert list(flags) == [True, False, True, True]


def test_processspeed_and_summarizecontam(tmp_path):
    log = tmp_path / "t.log"
    log.write_text("real\t1m23.456s\nuser\t0m3.2s\nsys\t0m0.8s\n")
    out = tmp_path / "o.tsv"
    cli(["processspeed", f"in={log}", f"out={out}"])
    rows = dict(l.split("\t") for l in out.read_text().strip().split("\n")
                if not l.startswith("#"))
    assert abs(float(rows["real"]) - 83.456) < 1e-3
    rpt = tmp_path / "c.txt"
    rpt.write_text("CONTAM SUMMARY\nExamined 100\n|Taxonomy|SeqUnits|Reads\n"
                   "|E.coli|5|1000\n|Human|2|50\n|TOTAL|7|1050\n")
    out2 = tmp_path / "s.tsv"
    cli(["summarizecontam", str(rpt), "minreads=100", f"out={out2}"])
    body = [l for l in out2.read_text().strip().split("\n")[1:]]
    assert body == ["E.coli\t5\t1000"]


def test_all_reference_launchers_covered():
    """Every reference *.sh launcher resolves to a registered tool."""
    import glob

    from bbtools_tpu.cli import TOOLS

    ours = {k.lower() for k in TOOLS}
    ref = sorted(os.path.basename(p)[:-3]
                 for p in glob.glob("/root/reference/*.sh"))
    missing = [r for r in ref if r.lower() not in ours]
    assert not missing, f"unregistered launchers: {missing}"


def test_output_guard_universal(tmp_path):
    """The output-collision contract (shared/Tools.testOutputFiles,
    applied in every reference tool's setup) holds for EVERY registered
    launcher via the central CLI guard: duplicate outputs and
    output==input are refused before the tool runs."""
    import pytest

    from bbtools_tpu.cli import TOOLS, guard_output_files, main as cli_main

    inp = tmp_path / "in.fq"
    inp.write_text("@r\nACGT\n+\nFFFF\n")
    # guard itself: all three contract violations
    with pytest.raises(ValueError, match="[Dd]uplicate"):
        guard_output_files([f"in={inp}", "out=x.fq", "out2=x.fq"])
    with pytest.raises(ValueError, match="also an input"):
        guard_output_files([f"in={inp}", f"out={inp}"])
    exists = tmp_path / "e.fq"
    exists.write_text("")
    with pytest.raises(ValueError, match="exists"):
        guard_output_files([f"in={inp}", f"out={exists}", "ow=f"])
    # non-paths and sinks never trip it
    guard_output_files(["out=stdout.fq", "outm=t", "out2=null"])
    # per-launcher: the guard runs before ANY tool body (parametrized
    # over the full table; tool bodies never execute on the bad args)
    bad = [f"in={inp}", f"out={inp}"]
    checked = 0
    for name in sorted(set(TOOLS)):
        with pytest.raises(ValueError, match="also an input"):
            cli_main([name] + bad)
        checked += 1
    assert checked >= 315
