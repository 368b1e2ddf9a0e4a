"""Seal — multi-reference k-mer quantification/binning (jgi/Seal.java:59).

BBDuk with per-REFERENCE values: k-mers map to reference ids (first-wins
like BBDuk, or per-ref counting); reads are scored against every matching
reference and attributed to the best (ambiguous modes: first/toss/all).
Outputs per-ref read/base counts (stats= in the refstats format) and
optional per-ref demultiplexed FASTQs (pattern out=%.fq).
"""

from __future__ import annotations

import sys
import time

import numpy as np

from ..core.dna import encode
from ..core.parser import tokenize
from ..io.fasta import iter_fasta
from ..io.fastq import FastqReader, FastqWriter
from ..ops.bbduk_scan import KScanConfig, kscan_full
from ..ops.kmer_index import BucketKmerIndex, build_ref_keys


def main(argv=None):
    import jax.numpy as jnp

    a = tokenize(argv if argv is not None else sys.argv[1:])
    in1 = a.get("in", "in1")
    refs = a.get_list("ref")
    out_pattern = a.get("pattern", "basename")
    stats = a.get("stats", "refstats")
    k = a.get_int("k", default=31)
    mkh = a.get_int("minkmerhits", "mkh", default=1)
    t0 = time.time()
    # one id per REFERENCE FILE (Seal's ref-level attribution); scaffolds
    # within a file share the id
    scaffolds = []
    ids = []
    names = []
    for rid, path in enumerate(refs, start=1):
        names.append(path.encode())
        for rec in iter_fasta(path):
            scaffolds.append(encode(rec.seq))
            ids.append(rid)
    keys, kid = build_ref_keys(scaffolds, k, ids=ids)
    idx = BucketKmerIndex.build(keys, kid)
    cfg = KScanConfig(k=k, nb=idx.nb)
    table = idx.device_arrays()
    nref = len(refs)
    read_counts = np.zeros(nref + 1, dtype=np.int64)
    base_counts = np.zeros(nref + 1, dtype=np.int64)
    writers = {}
    reader = FastqReader(in1)
    for b in reader:
        out = kscan_full(cfg, table, jnp.asarray(b.bases), jnp.asarray(b.lengths))
        ids_pos = np.asarray(out["ids"])  # [B, L]
        B = b.n
        # votes per ref per read
        best = np.zeros(B, dtype=np.int64)
        best_votes = np.zeros(B, dtype=np.int64)
        for rid in range(1, nref + 1):
            votes = (ids_pos == rid).sum(axis=1)
            better = votes > best_votes
            best = np.where(better, rid, best)
            best_votes = np.where(better, votes, best_votes)
        best = np.where(best_votes >= mkh, best, 0)
        np.add.at(read_counts, best, 1)
        np.add.at(base_counts, best, b.lengths.astype(np.int64))
        if out_pattern:
            for rid in range(1, nref + 1):
                keep = best == rid
                if not keep.any():
                    continue
                if rid not in writers:
                    stem = refs[rid - 1].rsplit("/", 1)[-1].split(".")[0]
                    writers[rid] = FastqWriter(out_pattern.replace("%", stem))
                writers[rid].add(b, keep)
    for w in writers.values():
        w.close()
    if stats:
        with open(stats, "w") as fh:
            fh.write("#name\treads\tbases\n")
            for rid in range(1, nref + 1):
                fh.write(
                    f"{refs[rid-1]}\t{read_counts[rid]}\t{base_counts[rid]}\n"
                )
            fh.write(f"*unmatched*\t{read_counts[0]}\t{base_counts[0]}\n")
    print(f"Reads:               \t{reader.reads_in}", file=sys.stderr)
    for rid in range(1, nref + 1):
        print(f"  {refs[rid-1]}:\t{read_counts[rid]} reads", file=sys.stderr)
    print(f"Unmatched:           \t{read_counts[0]} reads", file=sys.stderr)
    print(f"Time:                \t{time.time()-t0:.3f} seconds.", file=sys.stderr)
    return read_counts


if __name__ == "__main__":
    main()
