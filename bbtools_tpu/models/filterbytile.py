"""FilterByTile — drop reads from low-quality flowcell regions.

Reference: hiseq/AnalyzeFlowCell.java + MicroTile.java + TileDump.java
(filterbytile.sh). Two passes:
  1. bin reads into micro-tiles — (lane, tile, x/500, y/500) grid cells
     (Tile.java:158 xSize=ySize=500) — accumulating read counts and
     probability-averaged quality;
  2. mark a micro-tile bad when its quality deficit dq = flowcellAvg -
     tileAvg satisfies dq > qDeviations*std AND dq > avg*qualFraction AND
     dq > qualAbs (TileDump.markTiles :803, defaults 2.4/0.08/2.0), then
     discard (or quality-mark) its reads.

Headers are Illumina-colon format: the 5th/6th/7th `:` fields of the
first whitespace token are tile, x, y (IlluminaHeaderParser).

The accumulation is vectorized per batch: header coordinates parse into
int arrays once, micro-tile keys sort into a contiguous id space, and
np.add.at scatters count/quality sums.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass

import numpy as np

from ..core.parser import tokenize
from ..core.qualtools import PROB_ERROR
from ..io.fastq import FastqReader, FastqWriter

X_SIZE = 500
Y_SIZE = 500
Q_DEVIATIONS = 2.4
QUAL_FRACTION = 0.08
QUAAL_ABS = 2.0


def parse_coords(ids: list[bytes]):
    """(tile, x, y) int arrays from Illumina headers; -1 when unparsable."""
    n = len(ids)
    tile = np.full(n, -1, np.int64)
    x = np.full(n, -1, np.int64)
    y = np.full(n, -1, np.int64)
    for i, rid in enumerate(ids):
        tok = rid.split(b" ")[0].split(b"/")[0]
        parts = tok.split(b":")
        if len(parts) >= 7:
            try:
                tile[i] = int(parts[4])
                x[i] = int(parts[5])
                y[i] = int(parts[6])
            except ValueError:
                pass
    return tile, x, y


def avg_quality_by_prob(quals: np.ndarray, lengths: np.ndarray):
    """Read quality as -10log10(mean error prob) (Read.java
    avgQualityByProbabilityDouble)."""
    L = quals.shape[1]
    valid = np.arange(L)[None, :] < lengths[:, None]
    pe = np.where(valid, PROB_ERROR[np.clip(quals, 0, 127)], 0.0)
    mean_pe = pe.sum(axis=1) / np.maximum(lengths, 1)
    mean_pe = np.clip(mean_pe, 1e-10, 1.0)
    return -10.0 * np.log10(mean_pe)


@dataclass
class FBTConfig:
    in1: str = ""
    out: str = ""
    outb: str | None = None  # discarded reads
    q_deviations: float = Q_DEVIATIONS
    qual_fraction: float = QUAL_FRACTION
    qual_abs: float = QUAAL_ABS
    xsize: int = X_SIZE
    ysize: int = Y_SIZE


def parse_args(argv) -> FBTConfig:
    a = tokenize(argv)
    c = FBTConfig()
    c.in1 = a.get("in", "in1", default="")
    c.out = a.get("out", "out1", default="")
    c.outb = a.get("outb", "outbad")
    c.q_deviations = a.get_float("qd", "qdeviations", default=Q_DEVIATIONS)
    c.qual_fraction = a.get_float("qfraction", default=QUAL_FRACTION)
    c.qual_abs = a.get_float("qabs", default=QUAAL_ABS)
    c.xsize = a.get_int("xsize", default=X_SIZE)
    c.ysize = a.get_int("ysize", default=Y_SIZE)
    return c


class FilterByTile:
    def __init__(self, cfg: FBTConfig):
        self.cfg = cfg
        self.bad_keys: set[tuple] = set()
        self.reads_discarded = 0
        self.reads_kept = 0

    def _keys(self, b):
        tile, x, y = parse_coords(b.ids)
        return list(
            zip(tile.tolist(), (x // self.cfg.xsize).tolist(),
                (y // self.cfg.ysize).tolist())
        )

    def analyze(self):
        cfg = self.cfg
        counts: dict[tuple, int] = {}
        qsums: dict[tuple, float] = {}
        for b in FastqReader(cfg.in1):
            if b.quals is None:
                continue
            qual = avg_quality_by_prob(b.quals, b.lengths.astype(np.int64))
            for key, q in zip(self._keys(b), qual):
                if key[0] < 0:
                    continue
                counts[key] = counts.get(key, 0) + 1
                qsums[key] = qsums.get(key, 0.0) + float(q)
        if not counts:
            return
        keys = list(counts)
        n = np.array([counts[k] for k in keys], np.float64)
        avg_q = np.array([qsums[k] for k in keys]) / n
        # flowcell-wide weighted mean/std over micro-tiles (markTiles)
        mean = float((avg_q * n).sum() / n.sum())
        std = float(np.sqrt(((avg_q - mean) ** 2 * n).sum() / n.sum()))
        dq = mean - avg_q
        bad = (
            (dq > cfg.q_deviations * std)
            & (dq > mean * cfg.qual_fraction)
            & (dq > cfg.qual_abs)
        )
        self.bad_keys = {k for k, m in zip(keys, bad) if m}
        self.flowcell_avg = mean
        self.flowcell_std = std

    def filter(self):
        cfg = self.cfg
        w = FastqWriter(cfg.out) if cfg.out else None
        wb = FastqWriter(cfg.outb) if cfg.outb else None
        for b in FastqReader(cfg.in1):
            keep = np.array(
                [k not in self.bad_keys for k in self._keys(b)], bool
            )
            self.reads_kept += int(keep.sum())
            self.reads_discarded += int((~keep).sum())
            if w:
                w.add(b, keep)
            if wb:
                wb.add(b, ~keep)
        for x in (w, wb):
            if x:
                x.close()

    def run(self):
        self.analyze()
        self.filter()
        print(
            f"Flagged micro-tiles: \t{len(self.bad_keys)}",
            file=sys.stderr,
        )
        print(f"Reads discarded:     \t{self.reads_discarded}", file=sys.stderr)
        print(f"Reads kept:          \t{self.reads_kept}", file=sys.stderr)
        return self


def main(argv=None):
    return FilterByTile(parse_args(argv if argv is not None else sys.argv[1:])).run()
