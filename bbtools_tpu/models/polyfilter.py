"""PolyFilter — remove reads with suspicious homopolymers (polyfilter.sh,
jgi/PolyFilter.java role).

Filtering rules (reference usage contract):
  - a read is ALWAYS discarded if it fails ldf2, entropy2, quality2, or
    minpolymer2;
  - a read is ALSO discarded if it fails minpolymer AND any of
    (ldf, entropy, quality);
  - a pair is discarded if either read is discarded.

Depth analysis counts read k-mers against a count-min sketch loaded from
`extra=` (set extra= to the input for self-depth, as the reference
recommends); a k-mer is low-depth when its count < mincount. The
homopolymer length is the longest window of the read in which at least
`purity` of the bases are the polymer symbol (e.g. GGGGGGAGGG is a
length-10 poly-G at purity 0.9).
"""

from __future__ import annotations

import sys

import numpy as np

from ..core.parser import tokenize
from ..io.fastq import FastqReader, FastqWriter, interleave, paired_reader
from ..ops.cms import CountMinSketch
from ..ops.entropy import EntropyModel
from ..ops.kmers import canonical_keys_np, rolling_kmers_np


def _max_pure_run(codes: np.ndarray, length: int, symbol: int,
                  purity: float) -> int:
    """Longest window with >= purity fraction equal to `symbol` whose
    first and last base are the symbol (two-pointer, O(L))."""
    x = codes[:length] == symbol
    best = lo = ones = 0
    for hi in range(length):
        if x[hi]:
            ones += 1
        while lo <= hi and (
            not x[lo] or (ones < purity * (hi - lo + 1))
        ):
            if x[lo]:
                ones -= 1
            lo += 1
        if x[hi] and ones >= purity * (hi - lo + 1):
            best = max(best, hi - lo + 1)
    return best


def _read_keys(batch, k: int) -> list[np.ndarray]:
    fwd, rkm, runlen = rolling_kmers_np(batch.bases, k)
    keys = canonical_keys_np(fwd, rkm, k)
    valid = (runlen >= k) & (
        np.arange(batch.padded_len)[None, :] < batch.lengths[:, None]
    )
    return [keys[i][valid[i]] for i in range(batch.n)]


def main(argv=None):
    a = tokenize(argv if argv is not None else sys.argv[1:])
    in1, in2 = a.get("in", "in1"), a.get("in2")
    out1, out2 = a.get("out", "out1"), a.get("out2")
    outb = a.get("outb", "outbad")
    k = a.get_int("k", default=31)
    mincount = a.get_int("mincount", default=2)
    ldf = a.get_float("ldf", "lowdepthfraction", default=0.24)
    ldf2 = a.get_float("ldf2", default=1.1)
    entropy_lo = a.get_float("entropy", default=0.67)
    entropy2 = a.get_float("entropy2", default=0.2)
    quality = a.get_float("quality", default=12.5)
    quality2 = a.get_float("quality2", default=7.5)
    polymers = (a.get("polymers", default="G") or "G").upper()
    minpolymer = a.get_int("minpolymer", default=20)
    minpolymer2 = a.get_int("minpolymer2", default=29)
    purity = a.get_float("purity", default=0.85)
    extra = a.get("extra")

    symbol_codes = [b"ACGT".index(c.encode()) for c in polymers if c in "ACGT"]

    depth_on = ldf <= 1.0 or ldf2 <= 1.0
    cms = None
    if depth_on and extra:
        cms = CountMinSketch(hashes=a.get_int("hashes", default=2))
        for path in extra.split(","):
            for b in FastqReader(path):
                for keys in _read_keys(b, k):
                    if len(keys):
                        cms.add(keys)
    ent_model = EntropyModel()

    w1 = FastqWriter(out1) if out1 else None
    w2 = FastqWriter(out2) if out2 else None
    wb = FastqWriter(outb) if outb else None
    kept = removed = 0

    def judge(batch) -> np.ndarray:
        """bool [n]: True = discard."""
        n = batch.n
        ent = ent_model.average_entropy_batch(batch.bases, batch.lengths)
        if batch.quals is not None:
            vm = batch.valid_mask()
            avgq = (batch.quals * vm).sum(1) / np.maximum(batch.lengths, 1)
        else:
            avgq = np.full(n, 41.0)
        if cms is not None:
            ldfrac = np.zeros(n)
            for i, keys in enumerate(_read_keys(batch, k)):
                if len(keys):
                    counts = cms.query(keys)
                    ldfrac[i] = float((counts < mincount).mean())
        else:
            ldfrac = np.zeros(n)
        poly = np.zeros(n, dtype=np.int64)
        for i in range(n):
            L = int(batch.lengths[i])
            poly[i] = max(
                (_max_pure_run(batch.bases[i], L, s, purity)
                 for s in symbol_codes),
                default=0,
            )
        hard = (
            (ldfrac >= ldf2) | (ent < entropy2) | (avgq < quality2)
            | (poly >= minpolymer2)
        )
        soft = (poly >= minpolymer) & (
            (ldfrac >= ldf) | (ent < entropy_lo) | (avgq < quality)
        )
        return hard | soft

    if in2:
        stream = paired_reader(in1, in2)
        for b1, b2 in stream:
            bad = judge(b1) | judge(b2)
            good = ~bad
            if w2 is not None:
                w1.add(b1, good)
                w2.add(b2, good)
            elif w1 is not None:
                w1.add(interleave(b1, b2), np.repeat(good, 2))
            if wb:
                wb.add(interleave(b1, b2), np.repeat(bad, 2))
            kept += int(good.sum())
            removed += int(bad.sum())
    else:
        for b in FastqReader(in1):
            bad = judge(b)
            good = ~bad
            if w1:
                w1.add(b, good)
            if wb:
                wb.add(b, bad)
            kept += int(good.sum())
            removed += int(bad.sum())
    for w in (w1, w2, wb):
        if w:
            w.close()
    print(f"Kept {kept} reads; removed {removed}.", file=sys.stderr)
    return kept, removed


if __name__ == "__main__":
    main()
