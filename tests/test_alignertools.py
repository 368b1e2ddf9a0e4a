"""Aligner launcher family (idaligner/Test.java surfaces)."""

import numpy as np
import pytest

from bbtools_tpu.models.alignertools import (
    _mutate_to_ani,
    _to_seq,
    validate_engine,
)
from bbtools_tpu.ops.idalign import make_id_aligner


@pytest.mark.parametrize("name", ["glocal", "banded", "drifting",
                                  "wavefront"])
def test_validation_ladder(name):
    """Test.validate identity ladder (idaligner/Test.java:100-200)."""
    validate_engine(name)


def test_reference_tie_break():
    """align(AA, AGA) = 2/3 requires gap=-1 (GlocalAligner.java:196-199):
    the gapped path must beat the substitution path."""
    ida = make_id_aligner("glocal")
    q = np.array([0, 0], np.uint8)  # AA
    r = np.array([0, 2, 0], np.uint8)  # AGA
    assert abs(ida.align(q, r) - 2 / 3) < 1e-6


def test_mutate_to_ani_tracks_target():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 4, 2000).astype(np.uint8)
    ida = make_id_aligner("glocal")
    for ani in (1.0, 0.95, 0.85):
        mut = _mutate_to_ani(base, ani, rng, False, False)
        got = ida.align(base, mut)
        assert abs(got - ani) < 0.04, (ani, got)


def test_to_seq_literal_and_file(tmp_path):
    s = _to_seq("ACGT")
    assert list(s) == [0, 1, 2, 3]
    p = tmp_path / "x.fa"
    p.write_bytes(b">a\nACG\nT\n>b\nGGGG\n")
    assert list(_to_seq(str(p))) == [0, 1, 2, 3]


def test_cli_rows_registered():
    from bbtools_tpu.cli import TOOLS

    for t in ("glocalaligner", "bandedaligner", "driftingaligner",
              "wavefrontaligner", "quantumaligner", "wobblealigner",
              "testaligners", "testaligners2", "testalignersbatch",
              "testalignerslength", "alignrandom", "alignerbenchmark",
              "visualizealignment", "wavefrontalignerviz", "microalign",
              "smithwaterman", "parallelogram", "bbduks", "bbmap5"):
        assert t in TOOLS, t


def test_microalign_end_to_end(tmp_path):
    """Map synthetic phiX reads with the micro index aligner -> SAM."""
    from bbtools_tpu.cli import main as cli_main

    ref = "/root/repo/bbtools_tpu/resources/phix2.fa.gz"
    reads = tmp_path / "r.fq"
    sam = tmp_path / "o.sam"
    cli_main(["randomreads", f"ref={ref}", f"out={reads}", "reads=50",
              "len=100", "snprate=0.01", "seed=11"])
    cli_main(["microalign", f"in={reads}", "ref=phix", f"out={sam}"])
    lines = [l for l in sam.read_bytes().split(b"\n")
             if l and not l.startswith(b"@")]
    assert len(lines) >= 48  # ~all reads map
    assert lines[0].split(b"\t")[2] == b"phiX174"
