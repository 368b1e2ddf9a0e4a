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
                                  "wavefront", "crosscut", "xdrop"])
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


def test_alignerbenchmark_engines_dominate(tmp_path, capsys):
    """alignerbenchmark end-to-end over randomreads truth data: all four
    production engines recover the planted identity at every ANI level.
    This is the dominance evidence for mapping the reference's ~10
    idaligner variants (Quantum/CrossCut/XDrop/..., idaligner/Factory.java)
    onto these four: the accuracy axis is saturated (every engine within
    tolerance of truth), so the variants differ only in constant-factor
    speed, which ops/idalign's engines cover by construction (banded /
    drifting band / glocal / WFA are the four distinct cost models)."""
    import numpy as np

    from bbtools_tpu.models.alignertools import benchmark_main
    from bbtools_tpu.io.fasta import write_fasta
    from bbtools_tpu.utils.synth import random_genome

    genome = random_genome(8_000, n_scaffolds=1, seed=4)
    write_fasta(str(tmp_path / "ref.fa"), genome)
    rng = np.random.default_rng(9)
    from bbtools_tpu.io.fasta import load_reference

    ref = load_reference(str(tmp_path / "ref.fa"))
    codes = ref.scaffold_codes(0)
    with open(tmp_path / "reads.fq", "w") as fh:
        for i in range(40):
            start = int(rng.integers(0, len(codes) - 120))
            r = codes[start : start + 120].copy()
            nmut = i % 4  # 0..3 substitutions -> ANI 1.0 .. 0.975
            pos = rng.choice(120, nmut, replace=False)
            r[pos] = (r[pos] + 1) % 4
            seq = "".join("ACGT"[c] for c in r)
            fh.write(f"@r{i}_scaf0_pos{start}_strand0_insert0\n"
                     f"{seq}\n+\n{'F' * 120}\n")
    # pad=0: banded is a global (similar-length) cost model, so window
    # padding would count as end gaps for it by definition
    rc = benchmark_main([
        f"ref={tmp_path}/ref.fa", f"in={tmp_path}/reads.fq", "pad=0",
        "aligners=glocal,banded,drifting,wavefront,crosscut,xdrop,"
        "quantum,wobble",
    ])
    assert rc == 0
    cap = capsys.readouterr().out
    rows = [l.split("\t") for l in cap.splitlines()[1:] if l.startswith("r")]
    assert len(rows) == 40
    hdr = cap.splitlines()[0].split("\t")
    hdr_l = [h.lower() for h in hdr]
    for eng in ("glocal", "banded", "drifting", "wavefront",
                "crosscut", "xdrop", "quantum", "wobble"):
        col = [i for i, h in enumerate(hdr_l)
               if h.endswith("_id") and eng in h][0]
        ids = np.array([float(r[col]) for r in rows])
        n_mut = np.array([int(r[0][1:].split("_")[0]) % 4 for r in rows])
        want = 1.0 - n_mut / 120.0
        # every engine at/above planted identity minus slack
        assert (ids >= want - 0.02).all(), eng
