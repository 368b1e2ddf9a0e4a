"""RQCFilter2 — the JGI production filtering pipeline (jgi/RQCFilter2.java,
rqcfilter2.sh), as a staged driver over this framework's tools.

Stage chain (the reference's common path; each stage is one BBDuk-class
pass, intermediates deleted unless keepintermediates=t):

  1. adapter ktrim   — ktrim=r k=23 mink=11 hdist=1 tbo tpe ref=adapters
  2. contam filter   — k=31 hdist=1 ref=artifacts(,phix) removal
  3. quality trim    — qtrim=rl trimq=, maq=, maxns= via BBDuk stages
  4. optional host removal — bbmap against removeref= (the role of the
     human/cat/dog/mouse references in the NERSC data bundle)

Outputs in `path=`: the final <stem>.anqdpht.fastq.gz (the reference's
suffix chain: adapter/n/quality/dusted/phix/host/trimmed), file-list.txt
and filterstats.txt with per-stage read/base survivorship.
"""

from __future__ import annotations

import os
import sys

from ..core.parser import tokenize


def _count_fq(path: str) -> tuple[int, int]:
    from ..io.fastq import FastqReader

    r, b = 0, 0
    for batch in FastqReader(path):
        r += batch.n
        b += int(batch.lengths.sum())
    return r, b


def main(argv=None):
    a = tokenize(argv if argv is not None else sys.argv[1:])
    in1 = a.get("in", "in1")
    outdir = a.get("path", default=".") or "."
    trimq = a.get_float("trimq", default=10.0)
    minlen = a.get_int("minlength", "ml", default=45)
    maxns = a.get_int("maxns", default=3)
    maq = a.get_float("maq", default=5.0)
    do_phix = a.get_bool("phix", default=True)
    do_adapters = a.get_bool("ktrim", "adapters", default=True)
    do_artifacts = a.get_bool("filterk", "artifacts", default=True)
    remove_ref = a.get("removeref")  # host-removal reference (mapping)
    keep_int = a.get_bool("keepintermediates", "ki", default=False)
    # optional reference stages (RQCFilter2.java flag surface)
    do_dedupe = a.get_bool("clumpify", "dedupe", "opticaldupes",
                           default=False)
    entropy = a.get_float("entropy", default=-1.0)
    do_chastity = a.get_bool("chastityfilter", "ch", default=False)
    do_ribo = a.get_bool("removeribo", "ribo", default=False)
    ribodb = a.get("ribodb")  # default: bundled rRNA consensus seqs
    do_poly = a.get_int("polyfilter", "polytrim", default=0)
    do_khist = a.get_bool("khist", "dokhist", default=False)
    os.makedirs(outdir, exist_ok=True)
    stem = os.path.basename(in1)
    for ext in (".gz", ".fastq", ".fq", ".fasta", ".fa"):
        if stem.endswith(ext):
            stem = stem[: -len(ext)]

    from .bbduk import main as bbduk_main

    stats_rows = []
    files = [in1]
    cur = in1
    r0, b0 = _count_fq(in1)
    stats_rows.append(("input", r0, b0))

    def stage(tag: str, args: list[str], outname: str):
        nonlocal cur
        outp = os.path.join(outdir, outname)
        bbduk_main([f"in={cur}", f"out={outp}", "overwrite=t"] + args)
        r, b = _count_fq(outp)
        stats_rows.append((tag, r, b))
        if cur != in1 and not keep_int:
            os.remove(cur)
        cur = outp
        files.append(outp)

    suffix = ""
    if do_chastity:
        # Illumina chastity fail removal (RQCFilter2 chastityfilter)
        from .reformat import main as reformat_main

        outp = os.path.join(outdir, f"{stem}.ch.fastq.gz")
        reformat_main([f"in={cur}", f"out={outp}", "ch=t", "overwrite=t"])
        r, b = _count_fq(outp)
        stats_rows.append(("chastity", r, b))
        cur = outp
        files.append(outp)
    if do_dedupe:
        # optical/exact duplicate removal (RQCFilter2 clumpify stage)
        from .clumpify import main as clumpify_main

        outp = os.path.join(outdir, f"{stem}.dd.fastq.gz")
        clumpify_main([f"in={cur}", f"out={outp}", "dedupe=t",
                       "overwrite=t"])
        r, b = _count_fq(outp)
        stats_rows.append(("dedupe", r, b))
        if cur != in1 and not keep_int:
            os.remove(cur)
        cur = outp
        files.append(outp)
    if do_adapters:
        suffix += "a"
        stage(
            "ktrim",
            ["ref=adapters", "ktrim=r", "k=23", "mink=11", "hdist=1",
             "tbo=f", "tpe=f", f"minlen={minlen}"],
            f"{stem}.{suffix}.fastq.gz",
        )
    # n-removal + quality trim + maq in one pass (the reference's
    # qtrim/maxns/maq stage)
    suffix += "nq"
    stage(
        "qtrim",
        [f"qtrim=rl", f"trimq={trimq}", f"maxns={maxns}", f"maq={maq}",
         f"minlen={minlen}"],
        f"{stem}.{suffix}.fastq.gz",
    )
    if do_artifacts or do_phix:
        refs = []
        if do_artifacts:
            refs.append("artifacts")
        if do_phix:
            refs.append("phix")
        suffix += "p" if do_phix else ""
        suffix += "t" if do_artifacts else ""
        stage(
            "filter",
            [f"ref={','.join(refs)}", "k=31", "hdist=1",
             f"minlen={minlen}"],
            f"{stem}.{suffix}.fastq.gz",
        )
    if entropy >= 0:
        # low-complexity removal (RQCFilter2 entropy= -> BBDuk)
        suffix += "d"  # "dusted" in the reference's suffix chain
        stage(
            "entropy",
            [f"entropy={entropy}", f"minlen={minlen}"],
            f"{stem}.{suffix}.fastq.gz",
        )
    if do_poly > 0:
        # poly-G/poly-C tail trimming (RQCFilter2 polyfilter role):
        # ktrim against literal homopolymer 31-mers
        suffix += "g"
        stage(
            "polyfilter",
            ["literal=" + ",".join(["G" * 31, "C" * 31]),
             "k=31", "ktrim=r", "mink=29", f"minlen={minlen}"],
            f"{stem}.{suffix}.fastq.gz",
        )
    if do_ribo:
        # rRNA removal vs ribo kmers (RQCFilter2 removeribo -> riboKmers;
        # default db = the bundled SSU/LSU consensus sequences)
        import bbtools_tpu

        if not ribodb:
            res = os.path.join(
                os.path.dirname(bbtools_tpu.__file__), "resources"
            )
            ribodb = ",".join(
                os.path.join(res, f)
                for f in (
                    "16S_consensus_sequence.fa",
                    "18S_consensus_sequence.fa",
                    "23S_consensus_sequence.fa",
                    "5S_consensus_sequence.fa",
                )
                if os.path.exists(os.path.join(res, f))
            )
        suffix += "r"
        stage(
            "ribo",
            [f"ref={ribodb}", "k=31", "hdist=1", f"minlen={minlen}"],
            f"{stem}.{suffix}.fastq.gz",
        )
    if remove_ref:
        from .bbmap import BBMap, BBMapConfig

        suffix += "h"
        outp = os.path.join(outdir, f"{stem}.{suffix}.fastq.gz")
        sam = os.path.join(outdir, f"{stem}.host.sam")
        tool = BBMap(BBMapConfig(ref=remove_ref, in1=cur, out=sam))
        tool.run()
        # keep only unmapped reads
        mapped = set()
        from ..io.readwrite import open_input

        with open_input(sam) as fh:
            for line in fh.read().splitlines():
                if line.startswith(b"@"):
                    continue
                f = line.split(b"\t")
                if not int(f[1]) & 0x4:
                    mapped.add(f[0])
        from ..io.fastq import FastqReader, FastqWriter

        import numpy as np

        with FastqWriter(outp) as w:
            for batch in FastqReader(cur):
                keep = np.array(
                    [i.split()[0] not in mapped for i in batch.ids]
                )
                w.add(batch, keep)
        os.remove(sam)
        r, b = _count_fq(outp)
        stats_rows.append(("hostremoval", r, b))
        if cur != in1 and not keep_int:
            os.remove(cur)
        cur = outp
        files.append(outp)

    if do_khist:
        # k-mer depth histogram of the surviving reads (RQCFilter2
        # khist= stage -> KmerCountExact)
        from .kmercountexact import run as kce_run

        kh = os.path.join(outdir, f"{stem}.khist.txt")
        kce_run([f"in={cur}", f"khist={kh}", "k=31"])
        files.append(kh)

    # final artifacts: file list + survivorship stats
    with open(os.path.join(outdir, "file-list.txt"), "w") as fh:
        fh.write(f"filtered_fastq={os.path.basename(cur)}\n")
    with open(os.path.join(outdir, "filterstats.txt"), "w") as fh:
        fh.write("#stage\treads\tbases\treads_pct\tbases_pct\n")
        for tag, r, b in stats_rows:
            fh.write(
                f"{tag}\t{r}\t{b}\t{100*r/max(r0,1):.2f}\t"
                f"{100*b/max(b0,1):.2f}\n"
            )
    print(f"Final output:        \t{cur}", file=sys.stderr)
    print(
        f"Reads surviving:     \t{stats_rows[-1][1]} "
        f"({100*stats_rows[-1][1]/max(r0,1):.2f}%)",
        file=sys.stderr,
    )
    return stats_rows, cur
