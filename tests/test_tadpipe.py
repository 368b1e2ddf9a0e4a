"""TadPipe / TadpoleWrapper pipeline tests."""

import numpy as np
import pytest

from bbtools_tpu.cli import main


def _contig_lens(path):
    lens, cur = [], 0
    for l in open(path, "rb").read().splitlines():
        if l.startswith(b">"):
            if cur:
                lens.append(cur)
            cur = 0
        else:
            cur += len(l)
    if cur:
        lens.append(cur)
    return lens


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(17)
    return bytes(b"ACGT"[c] for c in rng.integers(0, 4, 6000))


def _paired_reads(genome, n, insert, rl, seed):
    rng = np.random.default_rng(seed)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    r1s, r2s = [], []
    q = b"I" * rl
    for i in range(n):
        p = int(rng.integers(0, len(genome) - insert))
        frag = genome[p : p + insert]
        r1 = frag[:rl]
        r2 = frag[-rl:].translate(comp)[::-1]
        r1s.append(b"@r%d /1\n%s\n+\n%s\n" % (i, r1, q))
        r2s.append(b"@r%d /2\n%s\n+\n%s\n" % (i, r2, q))
    return b"".join(r1s), b"".join(r2s)


def test_tadpolewrapper_picks_usable_k(genome, tmp_path):
    r1, _ = _paired_reads(genome, 1500, 150, 150, 3)
    (tmp_path / "r1.fq").write_bytes(r1)
    main([
        "tadwrapper", f"in={tmp_path}/r1.fq",
        f"out={tmp_path}/contigs_%.fa", "k=21,31,62",
    ])
    import glob

    outs = glob.glob(f"{tmp_path}/contigs_*.fa")
    assert len(outs) == 3
    # the best assembly should reconstruct most of the genome
    assert max(max(_contig_lens(p), default=0) for p in outs) >= 2000


def test_tadpipe_end_to_end(genome, tmp_path):
    r1, r2 = _paired_reads(genome, 1200, 240, 150, 4)
    (tmp_path / "r1.fq").write_bytes(r1)
    (tmp_path / "r2.fq").write_bytes(r2)
    main([
        "tadpipe", f"in={tmp_path}/r1.fq", f"in2={tmp_path}/r2.fq",
        f"out={tmp_path}/asm.fa", f"tmpdir={tmp_path}/tmp",
        "k=31,62", "trim=f",
    ])
    lens = _contig_lens(tmp_path / "asm.fa")
    assert lens and max(lens) >= 1500
