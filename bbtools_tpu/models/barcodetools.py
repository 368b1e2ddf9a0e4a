"""Barcode/mux utilities: muxbyname, removebadbarcodes, filterbarcodes.

References (semantics source, no code reuse):
  - driver/MultiplexByName.java (muxbyname.sh) — merge reads from many
    files, renaming each read with its source-file stem prefix
    (the inverse of demuxbyname).
  - jgi/RemoveBadBarcodes.java (removebadbarcodes.sh) — drop reads
    whose Illumina-header barcode (text after the last ':') contains
    non-ACGT characters ('+' dual-index separators allowed).
  - jgi/FilterBarcodes.java (filterbarcodes.sh) — filter reads muxed
    with barcode qualities (mergebarcodes format name_SEQ_QUAL) by
    minimum average barcode quality maq=; baqhist= average-quality and
    bmqhist= min-quality histograms.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from ..core.parser import tokenize
from ..io.fastq import FastqReader
from ..io.readwrite import open_output


def _records(path: str):
    for b in FastqReader(path):
        for i in range(b.n):
            yield b.ids[i], b.sequence(i), b.quality_string(i)


def muxbyname(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    a = tokenize([t for t in argv if "=" in t])
    files = [t for t in argv if "=" not in t]
    spec = a.get("in", "in1")
    if spec:
        files = spec.split(",") + files
    out1 = a.get("out", "out1")
    n = 0
    with open_output(out1) as fh:
        for path in files:
            stem = os.path.basename(path).split(".")[0].encode()
            for name, seq, qual in _records(path):
                fh.write(
                    b"@%s_%s\n%s\n+\n%s\n"
                    % (stem, name, seq, qual or b"I" * len(seq))
                )
                n += 1
    print(f"Muxed {n} reads from {len(files)} files.", file=sys.stderr)
    return n


def removebadbarcodes(argv=None):
    a = tokenize(argv if argv is not None else sys.argv[1:])
    in1 = a.get("in", "in1")
    out1 = a.get("out", "out1")
    ok_chars = set(b"ACGT+")
    kept = total = 0
    with open_output(out1) as fh:
        for name, seq, qual in _records(in1):
            total += 1
            barcode = name.rsplit(b":", 1)[-1].strip()
            if barcode and all(c in ok_chars for c in barcode):
                fh.write(b"@%s\n%s\n+\n%s\n" % (name, seq, qual or b"I" * len(seq)))
                kept += 1
    print(f"Kept {kept} of {total} reads.", file=sys.stderr)
    return kept, total


def filterbarcodes(argv=None):
    a = tokenize(argv if argv is not None else sys.argv[1:])
    in1 = a.get("in", "in1")
    out1 = a.get("out", "out1")
    maq = a.get_float("maq", default=0.0)
    baqhist = a.get("baqhist")
    bmqhist = a.get("bmqhist")
    kept = total = 0
    avg_hist = np.zeros(64, dtype=np.int64)
    min_hist = np.zeros(64, dtype=np.int64)
    fh = open_output(out1) if out1 else None
    for name, seq, qual in _records(in1):
        total += 1
        parts = name.rsplit(b"_", 2)
        if len(parts) == 3 and parts[1] and parts[2]:
            bqual = np.frombuffer(parts[2], dtype=np.uint8).astype(
                np.int32
            ) - 33
            avg = float(bqual.mean())
            mn = int(bqual.min())
        else:
            avg, mn = 0.0, 0
        avg_hist[min(int(avg), 63)] += 1
        min_hist[min(mn, 63)] += 1
        if avg >= maq:
            kept += 1
            if fh:
                fh.write(b"@%s\n%s\n+\n%s\n" % (name, seq, qual or b"I" * len(seq)))
    if fh:
        fh.close()
    for path, hist in ((baqhist, avg_hist), (bmqhist, min_hist)):
        if path:
            top = int(np.nonzero(hist)[0].max()) if hist.any() else 0
            with open_output(path) as hf:
                hf.write(b"#quality\treads\n")
                for q in range(top + 1):
                    hf.write(b"%d\t%d\n" % (q, int(hist[q])))
    print(f"Kept {kept} of {total} reads.", file=sys.stderr)
    return kept, total


if __name__ == "__main__":
    muxbyname()
