"""File/stream utility launchers (the jgi/fun/driver/stream long tail).

Reference mains:
  - unzip.sh -> jgi.Unzip: transparent-decompress a file (in=, out=;
    any compression the ReadWrite layer understands).
  - filescan.sh -> stream.FileScanMT: scan a file, report lines/bytes
    and throughput.
  - printtime.sh -> align2.PrintTime: positional timestamp file; prints
    elapsed seconds since the stamp it last wrote, then rewrites it
    (PrintTime.java:27-56).
  - stream.sh -> stream.StreamerWrapper / samstreamer.sh ->
    stream.SamStreamerWrapper: drive the read-streaming layer over an
    input and report reads/bases/sec (I/O benchmark surface).
  - diskbench.sh -> fun.DiskBench: sequential write+read disk bench.
  - testfilesystem.sh -> jgi.TestFilesystem: latency/ops probe of a
    directory (create/stat/delete round-trips).
  - a_sample_mt.sh -> template.A_SampleMT: the documented tool template
    (copies reads in->out; the canonical skeleton every tool follows).
  - copyfile.sh: byte copy. cat.sh: concatenate files to stdout/out.
  - textfile.sh -> fileIO.TextFile: print a (compressed) text file,
    optionally a line range.
"""

from __future__ import annotations

import os
import sys
import time

from ..core.parser import tokenize


def unzip_main(args):
    a = tokenize(args)
    pos = [t for t in args if "=" not in t]
    inp = a.get("in", "in1") or (pos[0] if pos else None)
    out = a.get("out", "out1") or (pos[1] if len(pos) > 1 else None)
    if not inp:
        print("Usage: unzip <in> [out]  (out default: strip .gz/.bz2)",
              file=sys.stderr)
        return 1
    if not out:
        out = inp
        for ext in (".gz", ".bz2", ".zst", ".xz"):
            if out.endswith(ext):
                out = out[: -len(ext)]
                break
        if out == inp:
            out = inp + ".raw"
    from ..io.readwrite import open_input

    n = 0
    with open_input(inp) as src, open(out, "wb") as dst:
        while True:
            chunk = src.read(1 << 20)
            if not chunk:
                break
            dst.write(chunk)
            n += len(chunk)
    print(f"Wrote {n} bytes to {out}", file=sys.stderr)
    return 0


def cat_main(args):
    a = tokenize(args)
    pos = [t for t in args if "=" not in t]
    ins = (a.get("in", "in1") or ",".join(pos)).split(",")
    out = a.get("out", "out1")
    from ..io.readwrite import open_input, open_output

    dst = open_output(out) if out else sys.stdout.buffer
    n = 0
    for p in ins:
        if not p:
            continue
        with open_input(p) as src:
            while True:
                chunk = src.read(1 << 20)
                if not chunk:
                    break
                dst.write(chunk)
                n += len(chunk)
    if out:
        dst.close()
    print(f"Concatenated {n} bytes from {len(ins)} files.", file=sys.stderr)
    return 0


def copyfile_main(args):
    pos = [t for t in args if "=" not in t]
    a = tokenize(args)
    src = a.get("in") or (pos[0] if pos else None)
    dst = a.get("out") or (pos[1] if len(pos) > 1 else None)
    if not src or not dst:
        print("Usage: copyfile <src> <dst>", file=sys.stderr)
        return 1
    import shutil

    shutil.copyfile(src, dst)
    print(f"Copied {os.path.getsize(dst)} bytes.", file=sys.stderr)
    return 0


def textfile_main(args):
    """textfile.sh <file> [firstLine] [lastLine] (0-based, inclusive)."""
    pos = [t for t in args if "=" not in t]
    if not pos:
        print("Usage: textfile <file> [first] [last]", file=sys.stderr)
        return 1
    first = int(pos[1]) if len(pos) > 1 else 0
    last = int(pos[2]) if len(pos) > 2 else (1 << 62)
    from ..io.readwrite import read_bytes

    for i, line in enumerate(read_bytes(pos[0]).split(b"\n")):
        if i > last:
            break
        if i >= first:
            sys.stdout.buffer.write(line + b"\n")
    return 0


def filescan_main(args):
    a = tokenize(args)
    pos = [t for t in args if "=" not in t]
    inp = a.get("in", "in1") or (pos[0] if pos else None)
    if not inp:
        print("Usage: filescan in=<file>", file=sys.stderr)
        return 1
    from ..io.readwrite import open_input

    t0 = time.time()
    lines = bytes_ = 0
    with open_input(inp) as fh:
        while True:
            chunk = fh.read(1 << 20)
            if not chunk:
                break
            bytes_ += len(chunk)
            lines += chunk.count(b"\n")
    dt = max(time.time() - t0, 1e-9)
    print(f"Lines: {lines}\tBytes: {bytes_}\t"
          f"{bytes_ / dt / 1e6:.1f} MB/s", file=sys.stderr)
    return 0


def printtime_main(args):
    """printtime.sh <stampfile> [print=t] (PrintTime.java:27-56)."""
    pos = [t for t in args if "=" not in t]
    millis = int(time.time() * 1000)
    if not pos:
        print(f"Time:\t{millis}", file=sys.stderr)
        return 0
    path = pos[0]
    if os.path.exists(path):
        old = int(open(path).read().strip())
        elapsed = (millis - old) / 1000.0
        show = len(pos) < 2 or pos[1].lower() in ("t", "true", "1")
        if show:
            print(f"Elapsed:\t{elapsed:.2f}")
            print(f"Elapsed:\t{elapsed:.2f}", file=sys.stderr)
    with open(path, "w") as fh:
        fh.write(str(millis))
    return 0


def streamer_main(args, sam: bool = False):
    """stream.sh / samstreamer.sh: benchmark the streaming layer."""
    a = tokenize(args)
    inp = a.get("in", "in1")
    if not inp:
        print("Usage: stream in=<reads file>", file=sys.stderr)
        return 1
    t0 = time.time()
    reads = bases = 0
    if sam or inp.endswith((".sam", ".bam", ".sam.gz")):
        from ..io.sam_read import iter_sam

        for rec in iter_sam(inp):
            reads += 1
            bases += len(rec.seq) if rec.seq != b"*" else 0
    else:
        from ..io.fastq import FastqReader

        for batch in FastqReader(inp):
            reads += batch.n
            bases += int(batch.lengths.sum())
    dt = max(time.time() - t0, 1e-9)
    print(f"Reads: {reads}\tBases: {bases}\t"
          f"{reads / dt:.0f} reads/s\t{bases / dt / 1e6:.1f} Mbases/s",
          file=sys.stderr)
    return 0


def samstreamer_main(args):
    return streamer_main(args, sam=True)


def diskbench_main(args):
    """diskbench.sh -> fun.DiskBench: sequential write + read timing."""
    a = tokenize(args)
    path = a.get("path", default=".")
    size = int(float(a.get("data", "size", default="64000000")))
    block = 1 << 20
    buf = os.urandom(block)
    tmp = os.path.join(path, f".diskbench_{os.getpid()}.tmp")
    t0 = time.time()
    with open(tmp, "wb") as fh:
        n = 0
        while n < size:
            fh.write(buf)
            n += block
        fh.flush()
        os.fsync(fh.fileno())
    wt = time.time() - t0
    t0 = time.time()
    with open(tmp, "rb") as fh:
        while fh.read(block):
            pass
    rt = time.time() - t0
    os.unlink(tmp)
    print(f"Write: {n / wt / 1e6:.1f} MB/s\tRead: {n / rt / 1e6:.1f} MB/s",
          file=sys.stderr)
    return 0


def testfilesystem_main(args):
    """testfilesystem.sh: create/stat/delete latency probe."""
    a = tokenize(args)
    path = a.get("path", default=".")
    rounds = int(a.get("rounds", "iters", default="100"))
    t_create = t_stat = t_delete = 0.0
    for i in range(rounds):
        p = os.path.join(path, f".fstest_{os.getpid()}_{i}")
        t0 = time.time()
        with open(p, "w") as fh:
            fh.write("x")
        t_create += time.time() - t0
        t0 = time.time()
        os.stat(p)
        t_stat += time.time() - t0
        t0 = time.time()
        os.unlink(p)
        t_delete += time.time() - t0
    print(f"create: {t_create / rounds * 1e6:.1f}us\t"
          f"stat: {t_stat / rounds * 1e6:.1f}us\t"
          f"delete: {t_delete / rounds * 1e6:.1f}us", file=sys.stderr)
    return 0


def sample_mt_main(args):
    """a_sample_mt.sh -> template.A_SampleMT: the documented tool
    skeleton — stream reads in, apply a (no-op) per-read function,
    write them out in order. Kept runnable as the template reference
    (template/A_SampleMT.java:31)."""
    a = tokenize(args)
    inp, out = a.get("in", "in1"), a.get("out", "out1")
    if not inp or not out:
        print("Usage: a_sample_mt in=<reads> out=<reads>", file=sys.stderr)
        return 1
    from ..io.fastq import FastqReader, FastqWriter

    w = FastqWriter(out)
    reads = 0
    for batch in FastqReader(inp):
        # per-read processing hook goes here (template processReadPair)
        w.add(batch)
        reads += batch.n
    w.close()
    print(f"Processed {reads} reads.", file=sys.stderr)
    return 0
