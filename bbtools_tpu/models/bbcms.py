"""BBCMS — error correction / depth filtering via a count-min sketch
(bbcms.sh -> bloom/BloomFilterCorrectorWrapper.java over BloomFilter +
BloomFilterCorrector).

Flow (wrapper semantics): count all input kmers into the memory-bounded
sketch (device scatter kernel, ops/cms.py), then stream reads back
through the corrector and optional depth filters:
  ecc=t       pincer+tail correction (BloomFilterCorrector's two modes —
              the same decision structure as Tadpole's corrector, here
              driven by sketch counts; tadpole_ecc.EccEngine over CMSTable)
  mincount=N  discard reads whose median kmer depth < N (tossjunk analog)
  hcf=F       high-count fraction needed to keep (fraction of kmers with
              count >= mincount)
"""

from __future__ import annotations

import sys
import time

import numpy as np

from ..core.parser import tokenize
from ..io.fastq import FastqWriter, paired_reader
from ..ops.cms import CMSTable, CountMinSketch
from ..ops.kmer_count import PAD, batch_kmers_jnp


def _count_pass(paths, k, hashes, cells):
    import jax.numpy as jnp

    from ..io.fastq import FastqReader

    cms = CountMinSketch(cells_per_hash=cells, hashes=hashes)
    reads = 0
    for path in paths:
        r = FastqReader(path)
        for b in r:
            keys = np.asarray(
                batch_kmers_jnp(jnp.asarray(b.bases), jnp.asarray(b.lengths), k)
            )
            keys = keys[keys != PAD]
            if len(keys):
                cms.add(keys)
        reads += r.reads_in
    return cms, reads


def _read_depth_stats(cms, bases, lengths, k):
    """(median depth, fraction of kmers >= 1) per read."""
    import jax.numpy as jnp

    B, L = bases.shape
    keys = np.asarray(
        batch_kmers_jnp(jnp.asarray(bases), jnp.asarray(lengths), k)
    ).reshape(B, L)
    valid = keys != PAD
    counts = np.zeros((B, L), np.int64)
    fv = valid.reshape(-1)
    if fv.any():
        counts.reshape(-1)[fv] = cms.query(keys.reshape(-1)[fv])
    med = np.zeros(B, np.int64)
    for i in range(B):
        c = counts[i][valid[i]]
        if len(c):
            med[i] = np.median(c)
    return med, counts, valid


def main(argv=None):
    a = tokenize(argv if argv is not None else sys.argv[1:])
    in1 = a.get("in", "in1")
    in2 = a.get("in2")
    out1 = a.get("out", "out1")
    out2 = a.get("out2")
    outb = a.get("outb", "outbad", "outlow")
    k = a.get_int("k", default=31)
    ecc = a.get_bool("ecc", default=True)
    mincount = a.get_int("mincount", default=0)
    hcf = a.get_float("hcf", "highcountfraction", default=1.0)
    hashes = a.get_int("hashes", default=3)
    cells = a.get_int("cells", "bits", default=1 << 22)
    if cells & (cells - 1):
        cells = 1 << int(cells - 1).bit_length()
    tossjunk = a.get_bool("tossjunk", default=False)
    t0 = time.time()
    paths = [p for p in (in1, in2) if p]
    cms, reads_in = _count_pass(paths, k, hashes, cells)
    table = CMSTable(cms, k)
    ecc_engine = None
    if ecc:
        from .tadpole_ecc import EccConfig, EccEngine

        ecc_engine = EccEngine(table, k, EccConfig())
    w1 = FastqWriter(out1) if out1 else None
    w2 = FastqWriter(out2) if out2 else None
    wb = FastqWriter(outb) if outb else None
    kept = tossed = 0
    errors = 0
    for b1, b2 in paired_reader(in1, in2):
        sides = [b1] + ([b2] if b2 is not None else [])
        keep = np.ones(b1.n, bool)
        for b in sides:
            if ecc_engine is not None:
                nc = ecc_engine.correct_batch(b.bases, b.lengths, b.quals)
                errors += int(nc.sum())
                if (nc > 0).any():
                    b.ascii_bases = None
            if mincount > 0 or tossjunk:
                med, counts, valid = _read_depth_stats(
                    cms, b.bases, b.lengths, k
                )
                if mincount > 0:
                    nk = valid.sum(axis=1)
                    ok_frac = np.where(
                        nk > 0,
                        (counts >= mincount).sum(axis=1) / np.maximum(nk, 1),
                        0.0,
                    )
                    keep &= ok_frac >= hcf
                if tossjunk:
                    keep &= med >= 1
        kept += int(keep.sum())
        tossed += int((~keep).sum())
        if w1:
            w1.add(b1, keep)
        if w2 and b2 is not None:
            w2.add(b2, keep)
        if wb:
            wb.add(b1, ~keep)
    for w in (w1, w2, wb):
        if w:
            w.close()
    el = time.time() - t0
    print(f"Reads In:           \t{reads_in}", file=sys.stderr)
    print(f"Reads Out:          \t{kept}", file=sys.stderr)
    if ecc:
        print(f"Errors Corrected:   \t{errors}", file=sys.stderr)
    print(f"Time:               \t{el:.3f} seconds.", file=sys.stderr)
    return kept, tossed, errors


if __name__ == "__main__":
    main()
