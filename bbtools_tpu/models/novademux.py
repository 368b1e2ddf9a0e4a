"""NovaDemux — probability-model barcode demultiplexing.

Re-design of barcode/NovaDemux.java (+ PCRMatrix probability mode, the
novademux.sh mode=prob default): instead of fixed-hdist matching, an
error model is learned from the run's own barcode population and each
observed barcode is assigned to the expected barcode with the highest
log-probability, if above `minprob` (default -5.6, log10 — the
reference's cutoff).

Model (PCRMatrix spirit, vectorized):
  1. tally observed barcodes (header text after the last ':')
  2. provisional assignment: nearest expected by Hamming distance
  3. per-position 4(+N) x 4(+N) substitution counts from provisional
     assignments -> normalized probability matrix per position
  4. final scoring: log10 P(observed | expected) = sum_pos log10
     M[pos][expected_base][observed_base]; argmax over expected
Scoring runs once per UNIQUE observed barcode (thousands), not per read.

Flags: in/in2, out/out2 (% patterns), outu/outu2, expected= (list or
files), minprob=, rename=, nosplit=, stats=, delimiter handling for
dual indices ('+' kept as its own symbol).
"""

from __future__ import annotations

import os
import sys

import numpy as np

from ..core.parser import tokenize
from ..io.fastq import FastqReader, FastqWriter
from ..io.readwrite import open_input, open_output

SYMS = b"ACGTN+"
SYM_IDX = {c: i for i, c in enumerate(SYMS)}


def _encode_bc(bc: bytes, L: int) -> np.ndarray:
    a = np.full(L, SYM_IDX[ord("N")], np.int8)
    for i, c in enumerate(bc[:L]):
        a[i] = SYM_IDX.get(c, SYM_IDX[ord("N")])
    return a


def _load_expected(spec: str) -> list[bytes]:
    out = []
    for tok in spec.split(","):
        if os.path.exists(tok):
            with open_input(tok) as fh:
                for line in fh.read().splitlines():
                    line = line.strip().split(b"\t")[0]
                    if line and not line.startswith(b"#"):
                        out.append(line)
        elif tok:
            out.append(tok.encode())
    return out


class PCRMatrix:
    """Per-position substitution probability model."""

    def __init__(self, expected: list[bytes]):
        self.L = max(len(e) for e in expected)
        self.expected = expected
        self.exp_mat = np.stack([_encode_bc(e, self.L) for e in expected])

    def fit(self, observed: dict[bytes, int]):
        """Counts-weighted per-position substitution tallies from
        nearest-expected provisional assignments (2 passes max)."""
        E, L = self.exp_mat.shape
        obs = list(observed.items())
        counts = np.zeros((L, len(SYMS), len(SYMS)), np.float64)
        for bc, n in obs:
            o = _encode_bc(bc, L)
            d = (self.exp_mat != o[None, :]).sum(axis=1)
            j = int(np.argmin(d))
            if d[j] > max(2, L // 4):
                continue  # too far from anything: ambient noise
            e = self.exp_mat[j]
            for p in range(L):
                counts[p, e[p], o[p]] += n
        counts += 0.5  # Laplace floor so unseen transitions stay finite
        self.logm = np.log10(
            counts / counts.sum(axis=2, keepdims=True)
        ).astype(np.float32)

    def score(self, observed: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
        """(best_expected_index, log10_prob) per observed barcode —
        vectorized: gather the per-position log-probs for every
        (expected, observed) pair and sum."""
        E, L = self.exp_mat.shape
        O = len(observed)
        obs_mat = np.stack([_encode_bc(b, L) for b in observed])  # [O, L]
        pos = np.arange(L)
        # [E, O, L] log-probs via fancy indexing
        lp = self.logm[pos[None, None, :], self.exp_mat[:, None, :],
                       obs_mat[None, :, :]]
        tot = lp.sum(axis=2)  # [E, O]
        best = tot.argmax(axis=0)
        return best, tot[best, np.arange(O)]


def main(argv=None):
    a = tokenize(argv if argv is not None else sys.argv[1:])
    in1 = a.get("in", "in1")
    out = a.get("out", "out1")
    outu = a.get("outu")
    stats = a.get("stats")
    minprob = a.get_float("minprob", default=-5.6)
    rename = a.get_bool("rename", default=False)
    nosplit = a.get_bool("nosplit", default=False)
    expected = _load_expected(a.get("expected", "barcodes", default="") or "")
    if not expected:
        raise SystemExit("novademux: expected= is required")
    if out and "%" not in out and not nosplit:
        raise SystemExit("novademux: out= must contain %")

    # pass 1: tally observed barcodes
    observed: dict[bytes, int] = {}
    for b in FastqReader(in1):
        for rid in b.ids:
            bc = rid.rsplit(b":", 1)[-1].strip()
            observed[bc] = observed.get(bc, 0) + 1
    model = PCRMatrix(expected)
    model.fit(observed)
    obs_list = list(observed)
    best, logp = model.score(obs_list)
    assign = {
        bc: (expected[int(b)] if lp >= minprob else None)
        for bc, b, lp in zip(obs_list, best, logp)
    }

    # pass 2: route reads
    writers: dict[bytes, FastqWriter] = {}
    counts: dict[bytes, int] = {e: 0 for e in expected}
    unknown = 0

    def writer_for(label: bytes) -> FastqWriter | None:
        if nosplit or not out:
            return None
        if label not in writers:
            writers[label] = FastqWriter(
                out.replace("%", label.decode())
            )
        return writers[label]

    wu = FastqWriter(outu) if outu else None
    from ..io.batch import ReadBatch

    for b in FastqReader(in1):
        routes: dict[bytes | None, list[int]] = {}
        for i, rid in enumerate(b.ids):
            bc = rid.rsplit(b":", 1)[-1].strip()
            routes.setdefault(assign.get(bc), []).append(i)
        for label, idxs in routes.items():
            keep = np.zeros(b.n, bool)
            keep[idxs] = True
            if rename:
                for i in idxs:
                    b.ids[i] = b.ids[i] + b" bc=" + (label or b"unknown")
            if label is None:
                unknown += len(idxs)
                if wu is not None:
                    wu.add(b, keep)
            else:
                counts[label] += len(idxs)
                w = writer_for(label)
                if w is not None:
                    w.add(b, keep)
    for w in writers.values():
        w.close()
    if wu is not None:
        wu.close()
    if stats:
        with open_output(stats) as fh:
            fh.write(b"#barcode\treads\n")
            for e in expected:
                fh.write(b"%s\t%d\n" % (e, counts[e]))
            fh.write(b"unknown\t%d\n" % unknown)
    total = sum(counts.values()) + unknown
    print(f"Reads Processed:    \t{total}", file=sys.stderr)
    print(f"Assigned:           \t{total - unknown}", file=sys.stderr)
    print(f"Unknown:            \t{unknown}", file=sys.stderr)
    return counts, unknown
