"""BBMap — seed-and-extend read mapping (BASELINE config #3).

TPU-native redesign of align2/BBMap.java + AbstractMapThread (call stack
SURVEY.md §3.2): the per-read quickMap loop becomes staged batch phases —

  1. seed:    k=13 keys at spaced offsets, fwd + rcomp (KeyRing analog)
  2. cluster: candidate diagonals from the CSR SeedIndex, grouped within
              a max-indel window, ranked by seed votes (the Quad-heap
              sweep of BBIndex.findAdvanced :433, done as a sort)
  3. score:   batched ungapped scoreNoIndels on every candidate site
              (ops/score_ungapped.py, exact reference scoring)
  4. extend:  batched banded DP (ops/msa.py, exact MultiStateAligner11ts)
              on sites that aren't resolved ungapped
  5. emit:    traceback -> match string -> CIGAR 1.4 / MAPQ / SAM

Site-selection heuristics are a faithful but simplified subset of
AbstractMapThread (top-N clusters by votes; clearzone ambiguity by score
gap) — the DP/scoring kernels themselves are bit-exact. Alignment
correctness is validated by the synthesize->grade loop (utils/synth.py,
utils/graders.py), the reference's own test strategy (SURVEY.md §4).
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass, field

import numpy as np

from ..core.dna import CODE_TO_BASE
from ..core.parser import tokenize
from ..io.fasta import load_reference
from ..io.fastq import FastqReader
from ..io.sam import (
    FREVERSE,
    FUNMAPPED,
    SamRecord,
    SamWriter,
    match_to_cigar14,
    to_mapq,
)
from ..ops import msa_constants as MC
from ..ops.kmers import rolling_kmers_np
from ..ops.msa import (
    match_strings_np,
    msa_fill,
    msa_walk,
    prepare_limits_np,
)
from ..ops.score_ungapped import score_no_indels
from .bbmap_index import SeedIndex

BIG = 1 << 30


@dataclass
class BBMapConfig:
    ref: str | None = None
    in1: str | None = None
    in2: str | None = None
    out: str | None = None
    k: int = 13
    min_ratio: float = 0.56  # BBMap.java:62 minratio
    max_indel: int = 100  # window for diagonal clustering (ref: 16000)
    max_sites: int = 8  # candidate clusters per read/strand
    key_density: float = 1.9  # keys per (len-k+1)/... (KeyRing density)
    ambig: str = "best"  # best/toss
    batch_reads: int = 4096
    pad: int = 12  # DP window slack each side
    max_hits_per_key: int = 2000


def parse_args(argv):
    a = tokenize(argv)
    c = BBMapConfig()
    c.ref = a.get("ref")
    c.in1 = a.get("in", "in1")
    c.in2 = a.get("in2")
    c.out = a.get("out", "outm")
    c.k = a.get_int("k", default=13)
    c.min_ratio = a.get_float("minratio", "minid", default=0.56)
    c.max_indel = a.get_int("maxindel", default=100)
    c.max_sites = a.get_int("maxsites", default=8)
    c.ambig = a.get("ambiguous", "ambig", default="best") or "best"
    c.batch_reads = a.get_int("batchreads", default=4096)
    return c


def max_quality(length) -> np.ndarray:
    """MSA.maxQuality: perfect-read score."""
    return MC.POINTS_MATCH + (np.asarray(length, dtype=np.int64) - 1) * MC.POINTS_MATCH2


@dataclass
class MapResult:
    mapped: bool = False
    flat_start: int = 0  # 0-based flat ref coordinate of alignment start
    strand: int = 0
    score: int = 0
    match: bytes = b""
    ambig: bool = False


class BBMap:
    def __init__(self, cfg: BBMapConfig, index: SeedIndex | None = None):
        self.cfg = cfg
        if index is None:
            ref = load_ref(cfg.ref)
            index = SeedIndex.build(ref, k=cfg.k, max_hits=cfg.max_hits_per_key)
        self.index = index
        self.ref = index.ref
        self.reads_mapped = 0
        self.reads_unmapped = 0
        self.reads_in = 0

    # ------------------------------------------------------------------
    def seed_offsets(self, length: int) -> np.ndarray:
        k = self.cfg.k
        n_slots = max(length - k + 1, 1)
        n_keys = max(2, min(n_slots, int(length * self.cfg.key_density / k)))
        return np.unique(np.linspace(0, n_slots - 1, n_keys).astype(np.int64))

    def candidates_for_batch(self, bases: np.ndarray, lengths: np.ndarray):
        """Seed + cluster phase. Returns list per read of
        (diag_start, strand, votes) candidate arrays."""
        cfg = self.cfg
        k = cfg.k
        B, L = bases.shape
        fwd, rkm, runlen = rolling_kmers_np(bases, k)
        space_mask = (1 << (2 * k)) - 1
        out = []
        for b in range(B):
            n = int(lengths[b])
            if n < k:
                out.append([])
                continue
            offs = self.seed_offsets(n)
            cands = []
            for strand in (0, 1):
                # fwd keys at offset o cover read[o:o+k] -> key index o+k-1
                if strand == 0:
                    keys = fwd[b, offs + k - 1]
                    valid = runlen[b, offs + k - 1] >= k
                    key_off = offs
                else:
                    # rc read: key of rc(read) at offset o equals rkm of the
                    # window ending at n-1-o; rc-read offset o covers
                    # rc_read[o:o+k] = rc(read[n-o-k:n-o])
                    keys = rkm[b, (lengths[b] - 1 - offs).astype(np.int64)]
                    valid = runlen[b, (lengths[b] - 1 - offs).astype(np.int64)] >= k
                    key_off = offs
                keys = keys[valid] & space_mask
                koff = key_off[valid]
                if len(keys) == 0:
                    continue
                sites, owner = self.index.expand(keys.astype(np.int64))
                if len(sites) == 0:
                    continue
                diags = sites.astype(np.int64) - koff[owner]
                order = np.argsort(diags, kind="stable")
                dsort = diags[order]
                # cluster within max_indel
                boundary = np.ones(len(dsort), dtype=bool)
                boundary[1:] = np.diff(dsort) > cfg.max_indel
                cid = np.cumsum(boundary) - 1
                votes = np.bincount(cid)
                firsts = dsort[boundary]
                top = np.argsort(-votes, kind="stable")[: cfg.max_sites]
                for t in top:
                    cands.append((int(firsts[t]), strand, int(votes[t])))
            out.append(cands)
        return out

    # ------------------------------------------------------------------
    def map_batch(self, batch) -> list[MapResult]:
        import jax.numpy as jnp

        cfg = self.cfg
        bases = batch.bases
        lengths = batch.lengths.astype(np.int64)
        B, L = bases.shape
        self.reads_in += B
        cand = self.candidates_for_batch(bases, lengths)
        # flatten tasks
        t_read = []
        t_diag = []
        t_strand = []
        for b, cl in enumerate(cand):
            for diag, strand, votes in cl:
                t_read.append(b)
                t_diag.append(diag)
                t_strand.append(strand)
        results = [MapResult() for _ in range(B)]
        if not t_read:
            self.reads_unmapped += B
            return results
        t_read = np.asarray(t_read)
        t_diag = np.asarray(t_diag, dtype=np.int64)
        t_strand = np.asarray(t_strand)
        T = len(t_read)
        # task reads (rc for strand 1)
        rc = np.where(bases < 4, 3 - bases.astype(np.int16), 4).astype(np.uint8)
        task_reads = np.full((T, L), 4, dtype=np.uint8)
        for i, (b, s) in enumerate(zip(t_read, t_strand)):
            n = int(lengths[b])
            if s == 0:
                task_reads[i, :n] = bases[b, :n]
            else:
                task_reads[i, :n] = rc[b, :n][::-1]
        task_lens = lengths[t_read]
        # ungapped scoring at the exact diagonal
        W = L + 2 * cfg.pad
        refwins = np.zeros((T, W), dtype=np.uint8)
        win_start = t_diag - cfg.pad
        ref_codes = self.ref.codes
        G = len(ref_codes)
        idx = win_start[:, None] + np.arange(W)[None, :]
        np.clip(idx, 0, G - 1, out=idx)
        refwins = ref_codes[idx]
        oob = (win_start[:, None] + np.arange(W)[None, :] < 0) | (
            win_start[:, None] + np.arange(W)[None, :] >= G
        )
        refwins[oob] = 4
        ug = np.asarray(
            score_no_indels(
                L,
                jnp.asarray(task_reads),
                jnp.asarray(task_lens.astype(np.int32)),
                jnp.asarray(refwins),
                jnp.asarray(np.full(T, cfg.pad, np.int32)),
                jnp.asarray(np.full(T, W, np.int32)),
            )
        )
        maxq = max_quality(task_lens)
        min_sc = (maxq * cfg.min_ratio).astype(np.int64)
        # DP pass for tasks that are below perfect but above hopeless
        need_dp = (ug < maxq) & (task_lens >= cfg.k)
        dp_score = ug.astype(np.int64).copy()
        dp_col = np.full(T, -1, np.int64)  # end col within window
        if need_dp.any():
            sel = np.flatnonzero(need_dp)
            sreads = task_reads[sel]
            slens = task_lens[sel].astype(np.int32)
            srefs = refwins[sel]
            sreflens = np.full(len(sel), W, np.int32)
            ms = min_sc[sel]
            vert, horiz, floor, subfloor = prepare_limits_np(
                sreads, slens, srefs, sreflens, ms - MC.MIN_SCORE_ADJUST
            )
            bs, bc, bst = msa_fill(
                L,
                W,
                True,
                False,
                jnp.asarray(sreads),
                jnp.asarray(slens),
                jnp.asarray(srefs),
                jnp.asarray(sreflens),
                jnp.asarray(vert.astype(np.int32)),
                jnp.asarray(horiz.astype(np.int32)),
                jnp.asarray(floor.astype(np.int32)),
                jnp.asarray(subfloor.astype(np.int32)),
            )
            bs = np.asarray(bs).astype(np.int64)
            dp_score[sel] = np.maximum(bs, ug[sel])
            dp_col[sel] = np.asarray(bc)
        # pick best + second best per read
        best = {}
        second = {}
        for i in range(T):
            b = t_read[i]
            s = dp_score[i]
            if b not in best or s > best[b][0]:
                second[b] = best.get(b, (-BIG, -1))
                best[b] = (s, i)
            elif s > second.get(b, (-BIG, -1))[0]:
                second[b] = (s, i)
        # traceback for winners that need a match string
        win_tasks = []
        for b, (s, i) in best.items():
            if s >= min_score_for(int(lengths[b]), cfg.min_ratio):
                win_tasks.append((b, i, s))
        # build final results with traceback via DP (always run fill with
        # traceback for the winning site to obtain the match string)
        if win_tasks:
            wi = np.asarray([w[1] for w in win_tasks])
            wreads = task_reads[wi]
            wlens = task_lens[wi].astype(np.int32)
            wrefs = refwins[wi]
            wreflens = np.full(len(wi), W, np.int32)
            vert, horiz, floor, subfloor = prepare_limits_np(
                wreads, wlens, wrefs, wreflens, np.zeros(len(wi), np.int64)
            )
            maxgain = (wlens.astype(np.int64) - 1) * MC.POINTS_MATCH2 + MC.POINTS_MATCH
            bs, bc, bst, planes = msa_fill(
                L,
                W,
                False,
                True,
                jnp.asarray(wreads),
                jnp.asarray(wlens),
                jnp.asarray(wrefs),
                jnp.asarray(wreflens),
                jnp.asarray(vert.astype(np.int32)),
                jnp.asarray(horiz.astype(np.int32)),
                jnp.asarray(floor.astype(np.int32)),
                jnp.asarray((-2 * maxgain).astype(np.int32)),
            )
            ops, nsteps = msa_walk(L, W, planes, jnp.asarray(wlens), bc, bst)
            matches = match_strings_np(
                np.asarray(ops),
                np.asarray(nsteps),
                wreads,
                wlens,
                wrefs,
                wreflens,
                np.asarray(bc),
            )
            bs = np.asarray(bs)
            bc = np.asarray(bc)
            for j, (b, i, s) in enumerate(win_tasks):
                m = matches[j]
                ndiag = sum(m.count(x) for x in (b"m", b"S", b"N", b"D"))
                start_col = int(bc[j]) - ndiag  # 0-based within window
                r = results[b]
                r.mapped = True
                r.score = int(bs[j])
                r.strand = int(t_strand[i])
                r.flat_start = int(win_start[i] + start_col)
                r.match = m
                sec = second.get(b, (-BIG, -1))[0]
                r.ambig = sec >= r.score
        for b in range(B):
            if results[b].mapped:
                self.reads_mapped += 1
            else:
                self.reads_unmapped += 1
        return results

    # ------------------------------------------------------------------
    def run(self):
        cfg = self.cfg
        t0 = time.time()
        reader = FastqReader(cfg.in1, batch_reads=cfg.batch_reads, pad_to=None)
        writer = (
            SamWriter(
                cfg.out,
                self.ref.names,
                self.ref.lengths,
                cmdline=b"bbmap " + " ".join(sys.argv[1:]).encode(),
            )
            if cfg.out
            else None
        )
        for batch in reader:
            results = self.map_batch(batch)
            if writer:
                payload = self.to_sam(batch, results)
                writer.add_batch(batch.ordinal, payload)
        if writer:
            writer.close()
        self.elapsed = time.time() - t0
        return self

    def to_sam(self, batch, results) -> bytes:
        out = []
        ref = self.ref
        for b, r in enumerate(results):
            n = int(batch.lengths[b])
            name = batch.ids[b].split()[0]
            if not r.mapped:
                out.append(
                    SamRecord(
                        qname=name,
                        flag=FUNMAPPED,
                        rname=b"*",
                        pos=0,
                        mapq=0,
                        cigar="*",
                        seq=batch.sequence(b),
                        qual=batch.quality_string(b),
                    ).to_bytes()
                )
                continue
            scaf = int(ref.scaffold_of(np.array([max(r.flat_start, 0)]))[0])
            scaf_start = int(ref.starts[scaf])
            scaf_len = int(ref.lengths[scaf])
            rstart0 = r.flat_start - scaf_start
            cigar = match_to_cigar14(r.match, rstart0, scaf_len)
            mapq = to_mapq(r.score, n, True, r.ambig)
            flag = FREVERSE if r.strand else 0
            seq = batch.sequence(b)
            qual = batch.quality_string(b)
            if r.strand:
                from ..core.dna import reverse_complement

                seq = reverse_complement(seq)
                qual = qual[::-1]
            out.append(
                SamRecord(
                    qname=name,
                    flag=flag,
                    rname=ref.names[scaf].split()[0],
                    pos=max(rstart0, 0) + 1,
                    mapq=mapq,
                    cigar=cigar,
                    seq=seq,
                    qual=qual,
                    tags=[b"AS:i:%d" % r.score, b"NM:i:%d" % _nm(r.match)],
                ).to_bytes()
            )
        return b"".join(out)

    def print_stats(self, stream=sys.stderr):
        t = getattr(self, "elapsed", 0) or 1e-9
        print(f"Reads Used:          \t{self.reads_in}", file=stream)
        pct = 100.0 * self.reads_mapped / max(self.reads_in, 1)
        print(f"mapped:              \t{pct:.4f}% \t{self.reads_mapped} reads", file=stream)
        print(
            f"Reads/sec:           \t{self.reads_in / t:.2f}",
            file=stream,
        )


def _nm(match: bytes) -> int:
    return (
        match.count(b"S") + match.count(b"I") + match.count(b"D")
    )


def min_score_for(length: int, min_ratio: float) -> int:
    return int(max_quality(length) * min_ratio)


def load_ref(path: str):
    from ..io.fasta import load_reference as _lr

    return _lr(path)


def main(argv=None):
    cfg = parse_args(argv if argv is not None else sys.argv[1:])
    tool = BBMap(cfg)
    tool.run()
    tool.print_stats()
    return tool


if __name__ == "__main__":
    main()
