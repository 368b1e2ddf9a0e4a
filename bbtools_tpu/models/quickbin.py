"""QuickBin — metagenome contig binning by composition + depth.

Reference: bin/ package (quickbin.sh): QuickBin groups assembly contigs
into genome bins using tetramer composition, coverage depth, and sketch
refinement (Binner/Oracle). Round-1 scope: the core signal subset —
canonical tetramer frequency vectors (the clade profile machinery) plus
per-contig mean depth (from a SAM/BAM via pileup, or `cov=` table),
greedy agglomerative binning: seeds in size order, a contig joins a bin
when both the tetramer absdif and the log-depth ratio are under
thresholds (Binner's dual-gate merge test). Outputs per-bin fastas and
a TSV summary.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass

import numpy as np

from ..core.dna import BASE_TO_CODE
from ..core.parser import tokenize
from ..io.fasta import iter_fasta, write_fasta

TETRA_DIF_LIMIT = 0.18
DEPTH_RATIO_LIMIT = 1.6
MIN_CONTIG = 1000


def tetramer_profile(codes: np.ndarray) -> np.ndarray:
    from .clade import _CANON

    from ..ops.kmers import rolling_kmers_np

    fwd, _, runlen = rolling_kmers_np(codes[None, :], 4)
    valid = runlen[0] >= 4
    counts = np.bincount(fwd[0][valid], minlength=256).astype(np.float64)
    folded = np.bincount(_CANON[4], weights=counts, minlength=256)
    vec = folded[np.unique(_CANON[4])]
    s = vec.sum()
    return vec / s if s else vec


@dataclass
class Contig:
    name: bytes
    seq: bytes
    profile: np.ndarray
    depth: float
    bin_id: int = -1


def load_depths(path: str) -> dict:
    """covstats table (pileup.sh format: #ID  Avg_fold ...)."""
    out = {}
    with open(path) as fh:
        for line in fh:
            if line.startswith("#") or not line.strip():
                continue
            f = line.split("\t")
            out[f[0].encode()] = float(f[1])
    return out


def bin_contigs(contigs: list[Contig],
                tetra_limit: float = TETRA_DIF_LIMIT,
                depth_limit: float = DEPTH_RATIO_LIMIT):
    """Greedy agglomeration: largest contig seeds a bin; others join the
    closest qualifying bin (dual gate on composition and depth)."""
    contigs = sorted(contigs, key=lambda c: -len(c.seq))
    bins: list[list[Contig]] = []
    bin_profiles: list[np.ndarray] = []
    bin_depths: list[float] = []
    bin_sizes: list[int] = []
    for c in contigs:
        best = -1
        best_dif = tetra_limit
        for bi in range(len(bins)):
            dif = float(np.abs(c.profile - bin_profiles[bi]).sum())
            ratio = max(c.depth, bin_depths[bi], 1e-9) / max(
                min(c.depth, bin_depths[bi]), 1e-9
            )
            if dif < best_dif and ratio <= depth_limit:
                best = bi
                best_dif = dif
        if best < 0:
            bins.append([c])
            bin_profiles.append(c.profile.copy())
            bin_depths.append(c.depth)
            bin_sizes.append(len(c.seq))
            c.bin_id = len(bins) - 1
        else:
            c.bin_id = best
            bins[best].append(c)
            w0 = bin_sizes[best]
            w1 = len(c.seq)
            bin_profiles[best] = (
                bin_profiles[best] * w0 + c.profile * w1
            ) / (w0 + w1)
            bin_depths[best] = (bin_depths[best] * w0 + c.depth * w1) / (
                w0 + w1
            )
            bin_sizes[best] = w0 + w1
    return bins


def main(argv=None):
    a = tokenize(argv if argv is not None else sys.argv[1:])
    in1 = a.get("in", "in1", "contigs")
    out_pat = a.get("out", "pattern", default="bin_%.fa")
    cov = a.get("cov", "covstats")
    sam = a.get("sam", "bam", "reads")
    min_contig = a.get_int("mincontig", "minlen", default=MIN_CONTIG)
    tetra_limit = a.get_float("tetradif", default=TETRA_DIF_LIMIT)
    depth_limit = a.get_float("depthratio", default=DEPTH_RATIO_LIMIT)

    depths = {}
    if cov:
        depths = load_depths(cov)
    elif sam:
        # derive depth from alignments via the pileup machinery
        from ..io.sam_read import iter_sam, parse_cigar

        span: dict[bytes, int] = {}
        for rec in iter_sam(sam):
            if not rec.mapped or rec.secondary:
                continue
            n = sum(x for x, op in parse_cigar(rec.cigar) if op in "M=XDN")
            span[rec.rname] = span.get(rec.rname, 0) + n
        depths = span  # normalized by length below

    contigs = []
    for rec in iter_fasta(in1):
        if len(rec.seq) < min_contig:
            continue
        codes = BASE_TO_CODE[np.frombuffer(rec.seq, np.uint8)]
        key = rec.name.split()[0]
        d = depths.get(key, 1.0)
        if sam and not cov:
            d = d / max(len(rec.seq), 1)
        contigs.append(
            Contig(rec.name, rec.seq, tetramer_profile(codes), float(d))
        )
    bins = bin_contigs(contigs, tetra_limit, depth_limit)
    for bi, members in enumerate(bins):
        if out_pat:
            write_fasta(
                out_pat.replace("%", str(bi)),
                [(c.name, c.seq) for c in members],
            )
    print(f"Contigs binned:      \t{len(contigs)}", file=sys.stderr)
    print(f"Bins:                \t{len(bins)}", file=sys.stderr)
    for bi, members in enumerate(bins):
        size = sum(len(c.seq) for c in members)
        print(
            f"bin_{bi}\t{len(members)} contigs\t{size} bp"
            f"\tdepth {np.mean([c.depth for c in members]):.1f}",
            file=sys.stderr,
        )
    return bins
