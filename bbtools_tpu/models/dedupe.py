"""Dedupe — duplicate read removal (jgi/Dedupe.java, exact + rc modes).

Round-1 scope: exact-duplicate and reverse-complement-duplicate removal
(the `ac=f exact` hot path of the reference; containment/overlap
clustering are later-round features). Canonical form = min(seq, rc(seq)),
hashed batch-wise; first occurrence wins (absorbcontainment=f semantics).
"""

from __future__ import annotations

import hashlib
import sys
import time

import numpy as np

from ..core.parser import tokenize
from ..io.fastq import FastqReader, FastqWriter


def main(argv=None):
    a = tokenize(argv if argv is not None else sys.argv[1:])
    in1 = a.get("in", "in1")
    out1 = a.get("out", "out1")
    outd = a.get("outd", "outduplicate")
    rcomp = a.get_bool("rcomp", "absorbrc", "arc", default=True)
    t0 = time.time()
    seen: set[bytes] = set()
    reader = FastqReader(in1)
    w = FastqWriter(out1) if out1 else None
    wd = FastqWriter(outd) if outd else None
    dupes = 0
    kept = 0
    for b in reader:
        keep = np.zeros(b.n, dtype=bool)
        for i in range(b.n):
            seq = b.sequence(i)
            if rcomp:
                from ..core.dna import reverse_complement

                key = min(seq, reverse_complement(seq))
            else:
                key = seq
            h = hashlib.blake2b(key, digest_size=16).digest()
            if h in seen:
                dupes += 1
            else:
                seen.add(h)
                keep[i] = True
                kept += 1
        if w:
            w.add(b, keep)
        if wd:
            wd.add(b, ~keep)
    for x in (w, wd):
        if x:
            x.close()
    print(f"Input:               \t{reader.reads_in} reads", file=sys.stderr)
    print(f"Duplicates:          \t{dupes} reads ({100.0*dupes/max(reader.reads_in,1):.2f}%)", file=sys.stderr)
    print(f"Result:              \t{kept} reads", file=sys.stderr)
    print(f"Time:                \t{time.time()-t0:.3f} seconds.", file=sys.stderr)
    return kept, dupes


if __name__ == "__main__":
    main()
