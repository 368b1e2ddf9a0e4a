"""Error-correction family: device CMS, BBNorm ecc=, BBCMS."""

import numpy as np
import pytest

from bbtools_tpu.core.dna import CODE_TO_BASE
from bbtools_tpu.ops.cms import CMSTable, CountMinSketch


def _write_reads(path, seqs, qual=35):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f"@r{i}\n{s}\n+\n{chr(33+qual)*len(s)}\n")


def _planted_error_reads(n=900, L=100, glen=1500, err_every=4, seed=3):
    """Deep-coverage reads from a random genome; every err_every-th read
    carries one substitution at a known position."""
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, glen).astype(np.uint8)
    reads, truths, errpos = [], [], []
    for i in range(n):
        p = int(rng.integers(0, glen - L))
        codes = genome[p : p + L].copy()
        truth = codes.copy()
        ep = -1
        if i % err_every == 0:
            ep = int(rng.integers(10, L - 10))
            codes[ep] = (codes[ep] + 1 + int(rng.integers(3))) % 4
        reads.append(codes)
        truths.append(truth)
        errpos.append(ep)
    return reads, truths, errpos


def test_cms_device_counts():
    cms = CountMinSketch(cells_per_hash=1 << 16, hashes=3)
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 60, 3000).astype(np.int64)
    cms.add(keys)
    cms.add(keys)
    q = cms.query(keys)
    assert (q >= 2).all()
    absent = rng.integers(0, 1 << 60, 1000).astype(np.int64)
    assert (cms.query(absent) > 0).mean() < 0.2
    # duplicate keys within one batch accumulate
    cms2 = CountMinSketch(cells_per_hash=1 << 16, hashes=2)
    cms2.add(np.array([7, 7, 7, 9], np.int64))
    got = cms2.query(np.array([7, 9], np.int64))
    assert got[0] >= 3 and got[1] >= 1


def test_bbnorm_ecc_corrects_planted_errors(tmp_path):
    from bbtools_tpu.models.bbnorm import main as bbnorm_main

    reads, truths, errpos = _planted_error_reads()
    fin = tmp_path / "in.fq"
    _write_reads(fin, [CODE_TO_BASE[r].tobytes().decode() for r in reads])
    fout = tmp_path / "out.fq"
    bbnorm_main([f"in={fin}", f"out={fout}", "ecc=t", "keepall=t", "k=25"])
    out_seqs = [
        l.strip().decode()
        for i, l in enumerate(open(fout, "rb"))
        if i % 4 == 1
    ]
    assert len(out_seqs) == len(reads)
    fixed = broken = still = 0
    for s, truth, ep in zip(out_seqs, truths, errpos):
        tr = CODE_TO_BASE[truth].tobytes().decode()
        if ep < 0:
            assert s == tr  # clean reads untouched
            continue
        if s == tr:
            fixed += 1
        elif s[ep] != tr[ep]:
            still += 1
        else:
            broken += 1
    total_err = sum(1 for e in errpos if e >= 0)
    assert fixed / total_err > 0.9, (fixed, still, broken, total_err)
    assert broken == 0


def test_bbcms_corrects_and_filters(tmp_path):
    from bbtools_tpu.models.bbcms import main as bbcms_main

    reads, truths, errpos = _planted_error_reads(seed=11)
    rng = np.random.default_rng(12)
    # append junk reads (random, depth ~1) that mincount filtering removes
    junk = [rng.integers(0, 4, 100).astype(np.uint8) for _ in range(20)]
    fin = tmp_path / "in.fq"
    _write_reads(
        fin,
        [CODE_TO_BASE[r].tobytes().decode() for r in reads + junk],
    )
    fout = tmp_path / "out.fq"
    kept, tossed, errors = bbcms_main(
        [f"in={fin}", f"out={fout}", "ecc=t", "mincount=3", "hcf=0.6",
         "k=25"]
    )
    assert errors > 50
    out_seqs = [
        l.strip().decode()
        for i, l in enumerate(open(fout, "rb"))
        if i % 4 == 1
    ]
    # junk removed, real reads kept
    assert len(out_seqs) <= len(reads)
    assert len(out_seqs) >= len(reads) * 0.95
    # most planted errors corrected
    truth_set = {CODE_TO_BASE[t].tobytes().decode() for t in truths}
    n_match = sum(1 for s in out_seqs if s in truth_set)
    assert n_match / len(out_seqs) > 0.9
