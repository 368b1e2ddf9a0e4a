"""Small reporting/conversion utilities: readlength, countgc,
testformat, translate6frames, statswrapper.

References (semantics source):
  - jgi/MakeLengthHistogram.java (readlength.sh) — binned read-length
    histogram with the reference's #Reads/#Bases/#Max/#Min/#Avg/#Median
    header block.
  - jgi/CountGC.java (countgc.sh) — per-sequence GC fraction and summary.
  - fileIO/FileFormat test mode (testformat.sh) — report format,
    compression, quality offset and interleaving per file.
  - jgi/TranslateSixFrames.java (translate6frames.sh) — all six reading
    frames to amino acids, frame tagged in the header.
  - driver/StatsWrapper.java (statswrapper.sh) — assemblystats over many
    files, one table row each.
"""

from __future__ import annotations

import sys

import numpy as np

from ..core.parser import tokenize
from ..io.fasta import iter_fasta, write_fasta
from ..io.fastq import FastqReader
from ..io.fileformat import Format, test_input
from ..io.readwrite import open_output


def _iter_lengths(path: str):
    if test_input(path).format is Format.FASTA:
        for rec in iter_fasta(path):
            yield len(rec.seq)
    else:
        for b in FastqReader(path):
            for i in range(b.n):
                yield int(b.lengths[i])


def readlength(argv=None):
    a = tokenize(argv if argv is not None else sys.argv[1:])
    in1 = a.get("in", "in1")
    out = a.get("out", "hist")
    binsz = a.get_int("bin", default=10)
    lens = np.fromiter(_iter_lengths(in1), dtype=np.int64)
    n = len(lens)
    total = int(lens.sum()) if n else 0
    lines = [
        b"#Reads:\t%d" % n,
        b"#Bases:\t%d" % total,
        b"#Max:\t%d" % (int(lens.max()) if n else 0),
        b"#Min:\t%d" % (int(lens.min()) if n else 0),
        b"#Avg:\t%.1f" % (total / n if n else 0.0),
        b"#Median:\t%d" % (int(np.median(lens)) if n else 0),
        b"#Length\treads\tpct_reads\tcum_reads\tcum_pct_reads\tbases\tpct_bases\tcum_bases\tcum_pct_bases",
    ]
    if n:
        bins = (lens // binsz) * binsz
        uniq, counts = np.unique(bins, return_counts=True)
        bsum = np.array(
            [int(lens[bins == u].sum()) for u in uniq], dtype=np.int64
        )
        cum_r = np.cumsum(counts)
        cum_b = np.cumsum(bsum)
        for u, c, bs, cr, cb in zip(uniq, counts, bsum, cum_r, cum_b):
            lines.append(
                b"%d\t%d\t%.3f\t%d\t%.3f\t%d\t%.3f\t%d\t%.3f"
                % (u, c, 100 * c / n, cr, 100 * cr / n,
                   bs, 100 * bs / total, cb, 100 * cb / total)
            )
    text = b"\n".join(lines) + b"\n"
    if out:
        with open_output(out) as fh:
            fh.write(text)
    else:
        sys.stdout.buffer.write(text)
    print(f"Reads:               \t{n}", file=sys.stderr)
    return lens


def countgc(argv=None):
    a = tokenize(argv if argv is not None else sys.argv[1:])
    in1 = a.get("in", "in1")
    out = a.get("out")
    rows = []
    total_gc = total_at = 0
    if test_input(in1).format is Format.FASTA:
        it = ((rec.name.split()[0], np.frombuffer(rec.seq.upper(), np.uint8))
              for rec in iter_fasta(in1))
    else:
        def gen():
            for b in FastqReader(in1):
                for i in range(b.n):
                    yield b.ids[i].split()[0], np.frombuffer(
                        b.sequence(i).upper(), np.uint8
                    )
        it = gen()
    for name, arr in it:
        gc = int(np.isin(arr, np.frombuffer(b"GC", np.uint8)).sum())
        at = int(np.isin(arr, np.frombuffer(b"AT", np.uint8)).sum())
        total_gc += gc
        total_at += at
        rows.append((name, len(arr), gc / max(gc + at, 1)))
    if out:
        with open_output(out) as fh:
            for name, ln, frac in rows:
                fh.write(b"%s\t%d\t%.4f\n" % (name, ln, frac))
    frac = total_gc / max(total_gc + total_at, 1)
    print(f"Overall GC:          \t{frac:.4f}", file=sys.stderr)
    return rows, frac


def testformat(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    paths = [t for t in argv if "=" not in t] or [
        tokenize(argv).get("in", "in1")
    ]
    out = []
    for p in paths:
        ff = test_input(p)
        parts = [ff.format.value, ff.compression.value]
        if ff.format is Format.FASTQ:
            from ..io.fastq import FastqReader

            b = next(iter(FastqReader(p, batch_reads=256)), None)
            if b is not None:
                qo = getattr(b, "qual_offset", 33)
                parts.append(f"sanger" if qo == 33 else f"illumina")
                names = [b.ids[i] for i in range(min(b.n, 2))]
                inter = (
                    len(names) == 2
                    and names[0].split()[0] == names[1].split()[0]
                )
                parts.append("interleaved" if inter else "single-ended")
        line = "\t".join([p] + parts)
        print(line)
        out.append(line)
    return out


def translate6frames(argv=None):
    from .callgenes import translate

    a = tokenize(argv if argv is not None else sys.argv[1:])
    in1 = a.get("in", "in1")
    out = a.get("out", "out1")
    from ..core.dna import encode

    recs = []
    for rec in iter_fasta(in1):
        codes = encode(rec.seq)
        rc = np.where(codes < 4, 3 - codes, 4)[::-1]
        for strand, c in ((0, codes), (1, rc)):
            for frame in range(3):
                aa = translate(c[frame:])
                tag = b" fr%d%s" % (frame + 1, b"+" if strand == 0 else b"-")
                recs.append((rec.name.split()[0] + tag, aa.encode()))
    if out:
        write_fasta(out, recs)
    print(f"Frames Out:          \t{len(recs)}", file=sys.stderr)
    return recs


def statswrapper(argv=None):
    from .assemblystats import analyze, n_metrics

    a = tokenize(argv if argv is not None else sys.argv[1:])
    ins = a.get_list("in") or [
        t for t in (argv or []) if "=" not in t
    ]
    rows = []
    print("n_scaffolds\tscaf_bp\tscaf_N50\tscaf_L50\tscaf_max\tgc_avg\tfilename")
    for p in ins:
        scafs, contigs, gc, at, ns = analyze(p)
        n50, l50 = n_metrics(scafs, 0.5)
        row = (
            len(scafs), int(scafs.sum()), n50, l50,
            int(scafs.max(initial=0)), gc / max(gc + at, 1), p,
        )
        print("%d\t%d\t%d\t%d\t%d\t%.4f\t%s" % row)
        rows.append(row)
    return rows


def sketchblacklist(argv=None):
    """sketchblacklist.sh (sketch/BlacklistMaker.java role): build a
    blacklist of sketch hashes shared by >= mintaxcount input
    sequences/files — keys so widely shared they carry no taxonomic
    signal. Output is this repo's TSV sketch format, consumable by
    sketch blacklist= (models/sketch.load_blacklist)."""
    from .sketch import sketch_sequences, write_sketch
    from ..core.dna import encode

    a = tokenize(argv if argv is not None else sys.argv[1:])
    ins = a.get_list("in") or []
    out = a.get("out")
    k = a.get_int("k", default=31)
    size = a.get_int("size", default=100000)
    mintax = a.get_int("mintaxcount", default=2)
    per_seq = a.get_bool("perseq", "persequence", default=True)
    counts: dict[int, int] = {}
    n_units = 0
    for path in ins:
        units = []
        if per_seq:
            for rec in iter_fasta(path):
                units.append([encode(rec.seq)])
        else:
            units.append([encode(rec.seq) for rec in iter_fasta(path)])
        for u in units:
            n_units += 1
            for h in sketch_sequences(iter(u), k, size).tolist():
                counts[h] = counts.get(h, 0) + 1
    bl = np.sort(
        np.array(
            [h for h, c in counts.items() if c >= mintax], dtype=np.uint64
        )
    )
    if out:
        write_sketch(out, bl, "blacklist", k)
    print(f"Units Sketched:      \t{n_units}", file=sys.stderr)
    print(f"Blacklisted Keys:    \t{len(bl)}", file=sys.stderr)
    return bl


def bloomfilter(argv=None):
    """bloomfilter.sh (bloom/BloomFilterWrapper role): build a counting
    filter from ref= k-mers on device (ops/cms.CountMinSketch), then
    keep (or with include=f toss) reads with >= minhits k-mer hits."""
    from ..core.dna import encode
    from ..io.fastq import FastqWriter
    from ..ops.cms import CountMinSketch
    from ..ops.kmers import rolling_kmers_np

    a = tokenize(argv if argv is not None else sys.argv[1:])
    in1 = a.get("in", "in1")
    ref = a.get("ref")
    out1 = a.get("out", "out1")
    outm = a.get("outm", "outmatch")
    k = a.get_int("k", default=31)
    minhits = a.get_int("minhits", default=1)
    include = a.get_bool("include", default=False)
    cms = CountMinSketch()
    for rec in iter_fasta(ref):
        codes = encode(rec.seq)
        if len(codes) < k:
            continue
        fwd, rkm, runlen = rolling_kmers_np(codes[None, :], k)
        ok = runlen[0] >= k
        cms.add(np.maximum(fwd[0][ok], rkm[0][ok]))
    kept = total = 0
    w = FastqWriter(out1) if out1 else None
    wm = FastqWriter(outm) if outm else None
    for b in FastqReader(in1):
        fwd, rkm, runlen = rolling_kmers_np(b.bases, k)
        i_idx = np.arange(b.bases.shape[1])[None, :]
        ok = (runlen >= k) & (i_idx < b.lengths[:, None])
        keys = np.maximum(fwd, rkm)
        hits = np.zeros(b.n, np.int64)
        flat_ok = ok.reshape(-1)
        if flat_ok.any():
            counts = np.zeros(ok.size, np.int64)
            counts[flat_ok] = cms.query(keys.reshape(-1)[flat_ok])
            hits = (counts.reshape(ok.shape) > 0).sum(axis=1)
        matched = hits >= minhits
        keep = matched if include else ~matched
        total += b.n
        kept += int(keep.sum())
        if w:
            w.add(b, keep)
        if wm:
            wm.add(b, matched)
    for x in (w, wm):
        if x:
            x.close()
    print(f"Reads Processed:    \t{total}", file=sys.stderr)
    print(f"Reads Out:          \t{kept}", file=sys.stderr)
    return kept, total


def rename(argv=None):
    """rename.sh (jgi/RenameReads.java): rename reads with prefix= and a
    running number (or addprefix=t to keep the old name after it)."""
    from ..io.batch import ReadBatch
    from ..io.fastq import FastqWriter

    a = tokenize(argv if argv is not None else sys.argv[1:])
    in1 = a.get("in", "in1")
    out1 = a.get("out", "out1")
    prefix = (a.get("prefix") or "").encode()
    addprefix = a.get_bool("addprefix", default=False)
    renumber = a.get_bool("renumber", default=True)
    n = 0
    with FastqWriter(out1) as w:
        for b in FastqReader(in1):
            ids = []
            for i in range(b.n):
                if addprefix:
                    ids.append(prefix + b" " + b.ids[i])
                elif renumber:
                    ids.append(
                        (prefix + b"_" if prefix else b"") + b"%d" % n
                    )
                else:
                    ids.append(prefix or b.ids[i])
                n += 1
            b.ids = ids
            w.add(b)
    print(f"Reads Renamed:       \t{n}", file=sys.stderr)
    return n


def kmercountmulti(argv=None):
    """kmercountmulti.sh (jgi/KmerCountMulti.java): HLL cardinality
    estimates for a sweep of k values in one pass."""
    from .loglog import LogLog

    a = tokenize(argv if argv is not None else sys.argv[1:])
    in1 = a.get("in", "in1")
    ks = [
        int(x) for x in (a.get("k") or "17,24,31").replace("-", ",").split(",")
    ]
    sweep = a.get("sweep")
    if sweep:
        lo, hi, step = (int(x) for x in sweep.split(","))
        ks = list(range(lo, hi + 1, step))
    out = a.get("out")
    lls = {k: LogLog(k=k) for k in ks}
    for b in FastqReader(in1):
        for k in ks:
            lls[k].add_batch(b.bases, b.lengths)
    rows = [(k, int(lls[k].cardinality())) for k in ks]
    lines = ["#k\tunique_kmers"] + [f"{k}\t{c}" for k, c in rows]
    text = "\n".join(lines) + "\n"
    if out:
        with open_output(out) as fh:
            fh.write(text.encode())
    else:
        print(text, end="")
    return rows
