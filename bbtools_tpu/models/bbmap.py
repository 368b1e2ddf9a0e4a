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
    FFIRST,
    FPAIRED,
    FREVERSE,
    FSECOND,
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
    msa_walk,
)
from ..ops.msa_pallas import msa_fill_tb_auto
from ..ops.score_ungapped import score_no_indels
from .bbmap_index import SeedIndex

BIG = 1 << 30


@dataclass
class BBMapConfig:
    ref: str | None = None
    index_path: str | None = None
    overwrite_index: bool = False
    in1: str | None = None
    in2: str | None = None
    out: str | None = None
    k: int = 13
    min_ratio: float = 0.56  # BBMap.java:62 minratio
    rescue_mates: bool = True  # AbstractMapThread rescue (paired only)
    rescue_dist: int = 800  # ungapped mate-search window beyond the anchor
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
    if not a.get_bool("nodisk", default=True):
        c.index_path = a.get("path", "indexpath", default=".") or "."
    elif a.get("path", "indexpath"):
        c.index_path = a.get("path", "indexpath")
    c.overwrite_index = a.get_bool("overwrite", "ow", default=False)
    c.in1 = a.get("in", "in1")
    c.in2 = a.get("in2")
    c.out = a.get("out", "outm")
    c.k = a.get_int("k", default=13)
    c.min_ratio = a.get_float("minratio", "minid", default=0.56)
    c.rescue_mates = a.get_bool("rescuemates", "rescue", default=True)
    c.rescue_dist = a.get_int("rescuedist", default=800)
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
            index = self._load_or_build_index()
        self.index = index
        self.ref = index.ref
        self.reads_mapped = 0
        self.reads_unmapped = 0
        self.reads_in = 0
        self.rescued = 0

    def _load_or_build_index(self) -> SeedIndex:
        """Build the seed index, caching it under `path=` like the
        reference's on-disk genome index (align2/IndexMaker4; reuse unless
        nodisk/overwrite)."""
        import os
        import sys as _sys
        import time as _time

        cfg = self.cfg
        cache = None
        if cfg.index_path:
            os.makedirs(cfg.index_path, exist_ok=True)
            tag = os.path.basename(cfg.ref or "ref")
            cache = os.path.join(
                cfg.index_path, f"{tag}.k{cfg.k}.seedindex.npz"
            )
            if os.path.exists(cache) and not cfg.overwrite_index:
                t0 = _time.time()
                idx = SeedIndex.load(cache)
                print(
                    f"Loaded index {cache} in {_time.time()-t0:.2f}s",
                    file=_sys.stderr,
                )
                return idx
        ref = load_ref(cfg.ref)
        idx = SeedIndex.build(ref, k=cfg.k, max_hits=cfg.max_hits_per_key)
        if cache is not None:
            idx.save(cache)
            print(f"Wrote index {cache}", file=_sys.stderr)
        return idx

    # ------------------------------------------------------------------
    def seed_offsets(self, length: int) -> np.ndarray:
        k = self.cfg.k
        n_slots = max(length - k + 1, 1)
        n_keys = max(2, min(n_slots, int(length * self.cfg.key_density / k)))
        return np.unique(np.linspace(0, n_slots - 1, n_keys).astype(np.int64))

    def candidates_for_batch(self, bases: np.ndarray, lengths: np.ndarray):
        """Seed + cluster phase, fully vectorized across the batch.

        Returns list per read of (diag_start, strand, votes) candidates.
        """
        cfg = self.cfg
        k = cfg.k
        B, L = bases.shape
        fwd, rkm, runlen = rolling_kmers_np(bases, k)
        space_mask = (1 << (2 * k)) - 1
        lengths = lengths.astype(np.int64)
        # per-read offsets matrix [B, K]
        n_slots = np.maximum(lengths - k + 1, 1)
        K = max(
            2, min(int(n_slots.max(initial=1)), int(L * cfg.key_density / k))
        )
        frac = np.linspace(0, 1, K)
        offs = np.round(frac[None, :] * (n_slots[:, None] - 1)).astype(np.int64)
        valid_off = np.ones((B, K), dtype=bool)
        valid_off[:, 1:] = offs[:, 1:] != offs[:, :-1]  # dedupe equal offsets
        valid_off &= (lengths >= k)[:, None]
        rows = np.arange(B)[:, None]
        # strand 0: key ends at offs+k-1; strand 1: rc-read offset o ->
        # rkm at forward index n-1-o
        kidx0 = np.minimum(offs + k - 1, L - 1)
        kidx1 = np.clip(lengths[:, None] - 1 - offs, 0, L - 1)
        keys = np.empty((2, B, K), dtype=np.int64)
        vmask = np.empty((2, B, K), dtype=bool)
        keys[0] = fwd[rows, kidx0] & space_mask
        vmask[0] = valid_off & (runlen[rows, kidx0] >= k)
        keys[1] = rkm[rows, kidx1] & space_mask
        vmask[1] = valid_off & (runlen[rows, kidx1] >= k)
        flat_keys = keys.reshape(-1)
        flat_valid = vmask.reshape(-1)
        flat_off = np.broadcast_to(offs[None], (2, B, K)).reshape(-1)
        sel = np.flatnonzero(flat_valid)
        if len(sel) == 0:
            return [[] for _ in range(B)]
        sites, owner = self.index.expand(flat_keys[sel])
        if len(sites) == 0:
            return [[] for _ in range(B)]
        src = sel[owner]  # index into the (2, B, K) flattening
        strand = src // (B * K)
        read = (src // K) % B
        diag = sites.astype(np.int64) - flat_off[src]
        # group by (read, strand, diag): sort then cluster within max_indel
        group = (read * 2 + strand) * np.int64(1)
        order = np.lexsort((diag, group))
        g = group[order]
        d = diag[order]
        boundary = np.ones(len(d), dtype=bool)
        boundary[1:] = (g[1:] != g[:-1]) | (np.diff(d) > cfg.max_indel)
        cid = np.cumsum(boundary) - 1
        votes = np.bincount(cid)
        firsts = d[boundary]
        cgroup = g[boundary]
        # top max_sites clusters per (read, strand) by votes
        corder = np.lexsort((-votes, cgroup))
        cg = cgroup[corder]
        # rank within group: positions since the group start (cg is sorted)
        rank = np.arange(len(cg)) - np.searchsorted(cg, cg)
        keep = rank < cfg.max_sites
        out = [[] for _ in range(B)]
        for ci in corder[keep]:
            grp = int(cgroup[ci])
            out[grp // 2].append((int(firsts[ci]), grp & 1, int(votes[ci])))
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
        # task reads (rc for strand 1), vectorized gather
        task_lens0 = lengths[t_read]
        pos = np.arange(L, dtype=np.int64)[None, :]
        fwd_rows = bases[t_read]
        rc_src = np.clip(task_lens0[:, None] - 1 - pos, 0, L - 1)
        rc_vals = bases[t_read[:, None], rc_src]
        rc_rows = np.where(
            pos < task_lens0[:, None],
            np.where(rc_vals < 4, 3 - rc_vals.astype(np.int16), 4),
            4,
        ).astype(np.uint8)
        task_reads = np.where(
            (t_strand == 0)[:, None], fwd_rows, rc_rows
        ).astype(np.uint8)
        task_reads[pos >= task_lens0[:, None]] = 4
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
        # DP only when an indel alignment could beat the ungapped score
        # (maxImperfectScore gating, MultiStateAligner11ts.java:2293-2304)
        max_imperfect = maxq + min(MC.POINTS_DEL, MC.POINTS_INS - MC.POINTS_MATCH2)
        need_dp = (ug <= max_imperfect) & (task_lens >= cfg.k)
        # only extend the top-2 ungapped candidates per read (the
        # reference trims the site list before slow alignment,
        # BBMapThread.java:507 trimList)
        order = np.lexsort((-ug, t_read))
        tr = t_read[order]
        rank = np.arange(len(tr)) - np.searchsorted(tr, tr)
        topk = np.zeros(T, dtype=bool)
        topk[order[rank < 2]] = True
        need_dp &= topk
        dp_score = ug.astype(np.int64).copy()
        dp_col = np.full(T, -1, np.int64)  # end col within window
        dp_state = np.full(T, -1, np.int64)
        dp_subidx = np.full(T, -1, np.int64)  # index into the DP subset
        dp_planes = None
        sel = np.flatnonzero(need_dp)
        if len(sel):
            # single DP pass WITH traceback planes (kept on device); the
            # winners' match strings come from these planes, so no second
            # fill is needed
            sreads = task_reads[sel]
            slens = task_lens[sel].astype(np.int32)
            srefs = refwins[sel]
            # unpruned fill (fillUnlimited semantics) with traceback planes;
            # Pallas wavefront kernel on TPU, XLA scan elsewhere. Unpruned
            # scores are >= pruned ones and the min-score filter runs at
            # winner selection, so site choice is unchanged.
            bs, bc, bst, planes = msa_fill_tb_auto(L, W, sreads, slens, srefs)
            bs = np.asarray(bs).astype(np.int64)
            dp_better = bs > ug[sel]
            dp_score[sel] = np.maximum(bs, ug[sel])
            dp_col[sel] = np.where(dp_better, np.asarray(bc), -1)
            dp_state[sel] = np.where(dp_better, np.asarray(bst), -1)
            dp_subidx[sel] = np.arange(len(sel))
            dp_planes = (planes, np.asarray(bc), np.asarray(bst), slens)
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
        # traceback for winners that need a match string; winners resolved
        # ungapped (no indels possible) get a direct comparison match
        # string (genMatchNoIndels analog) without a second DP
        win_tasks = []
        ungapped_winners = []
        for b, (s, i) in best.items():
            if s >= min_score_for(int(lengths[b]), cfg.min_ratio):
                if dp_col[i] < 0:
                    # winner resolved without an improving DP alignment:
                    # indel-free -> direct comparison match string
                    ungapped_winners.append((b, i, s))
                else:
                    win_tasks.append((b, i, s))
        if ungapped_winners:
            for b, i, s in ungapped_winners:
                n = int(lengths[b])
                rd = task_reads[i, :n]
                rf = refwins[i, cfg.pad : cfg.pad + n]
                eq = rd == rf
                m = np.where(
                    eq & (rd < 4), ord("m"),
                    np.where((rd >= 4) | (rf >= 4), ord("N"), ord("S")),
                ).astype(np.uint8)
                r = results[b]
                r.mapped = True
                r.score = int(s)
                r.strand = int(t_strand[i])
                r.flat_start = int(t_diag[i])
                r.match = bytes(m)
                sec = second.get(b, (-BIG, -1))[0]
                cz = clearzone_for(r.score, int(max_quality(lengths[b])))
                r.ambig = sec >= r.score - cz
        # build final results with traceback via DP (always run fill with
        # traceback for the winning site to obtain the match string)
        if win_tasks and dp_planes is not None:
            planes, bc_all, bst_all, slens_all = dp_planes
            ops, nsteps = msa_walk(
                L, W, planes, jnp.asarray(slens_all),
                jnp.asarray(bc_all), jnp.asarray(bst_all),
            )
            ops = np.asarray(ops)
            nsteps = np.asarray(nsteps)
            sub = np.asarray([dp_subidx[w[1]] for w in win_tasks])
            matches = match_strings_np(
                ops[sub],
                nsteps[sub],
                task_reads[sel][sub],
                slens_all[sub],
                refwins[sel][sub],
                np.full(len(sub), W, np.int32),
                bc_all[sub],
            )
            for j, (b, i, s) in enumerate(win_tasks):
                m = matches[j]
                ndiag = sum(m.count(x) for x in (b"m", b"S", b"N", b"D"))
                start_col = int(bc_all[sub[j]]) - ndiag
                r = results[b]
                r.mapped = True
                r.score = int(s)
                r.strand = int(t_strand[i])
                r.flat_start = int(win_start[i] + start_col)
                r.match = m
                sec = second.get(b, (-BIG, -1))[0]
                cz = clearzone_for(r.score, int(max_quality(lengths[b])))
                r.ambig = sec >= r.score - cz
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
        reader2 = (
            FastqReader(cfg.in2, batch_reads=cfg.batch_reads, pad_to=None)
            if cfg.in2
            else None
        )
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
        it2 = iter(reader2) if reader2 else None
        for batch in reader:
            results = self.map_batch(batch)
            if it2 is not None:
                batch2 = next(it2)
                results2 = self.map_batch(batch2)
                if cfg.rescue_mates:
                    self.rescue(batch, results, batch2, results2)
                    self.rescue(batch2, results2, batch, results)
                payload = self.to_sam_paired(batch, results, batch2, results2)
            else:
                payload = self.to_sam(batch, results) if writer else b""
            if writer:
                writer.add_batch(batch.ordinal, payload)
        if writer:
            writer.close()
        self.elapsed = time.time() - t0
        return self

    def rescue(self, ba, ra, bb, rb):
        """Mate rescue (AbstractMapThread.rescue): when read A mapped and
        its mate B did not, slide mate-rc ungapped across the expected
        insert window next to A and accept the best offset above the
        rescue threshold. One batched score_no_indels call covers every
        (candidate, offset) pair."""
        import jax.numpy as jnp

        cfg = self.cfg
        cands = [
            i
            for i in range(ba.n)
            if ra[i].mapped and not rb[i].mapped
            and int(bb.lengths[i]) >= 20
        ]
        if not cands:
            return
        G = len(self.ref.codes)
        Lb = bb.bases.shape[1]
        STEP = 1
        tasks_read = []
        tasks_win = []
        tasks_off = []
        tasks_cand = []
        wlen = cfg.rescue_dist + Lb
        for i in cands:
            ln_b = int(bb.lengths[i])
            anchor = ra[i].flat_start
            if ra[i].strand == 0:
                w0 = anchor
            else:
                w0 = anchor + int(ba.lengths[i]) - wlen
            w0 = max(0, min(w0, G - 1))
            w1 = min(G, w0 + wlen)
            win = np.full(wlen, 4, dtype=np.uint8)
            win[: w1 - w0] = self.ref.codes[w0:w1]
            # mate orientation is opposite the anchor's
            row = bb.bases[i, :ln_b]
            mate = (
                np.where(row < 4, 3 - row, 4)[::-1]
                if ra[i].strand == 0
                else row
            )
            mrow = np.full(Lb, 4, dtype=np.uint8)
            mrow[:ln_b] = mate
            n_off = max(1, (wlen - ln_b) // STEP)
            for o in range(0, n_off, STEP):
                tasks_read.append(mrow)
                tasks_win.append(win)
                tasks_off.append(o)
                tasks_cand.append((i, w0, o))
        if not tasks_read:
            return
        scores = np.asarray(
            score_no_indels(
                Lb,
                jnp.asarray(np.array(tasks_read)),
                jnp.asarray(
                    np.array(
                        [int(bb.lengths[c[0]]) for c in tasks_cand], np.int32
                    )
                ),
                jnp.asarray(np.array(tasks_win)),
                jnp.asarray(np.array(tasks_off, np.int32)),
                jnp.asarray(np.full(len(tasks_read), wlen, np.int32)),
            )
        )
        best: dict[int, tuple[int, int, int]] = {}
        for t, (i, w0, o) in enumerate(tasks_cand):
            sc = int(scores[t])
            if i not in best or sc > best[i][0]:
                best[i] = (sc, w0, o)
        for i, (sc, w0, o) in best.items():
            ln_b = int(bb.lengths[i])
            # rescue threshold: half the normal ratio floor (the reference
            # accepts rescued sites below minRatio but above a floor)
            if sc < min_score_for(ln_b, cfg.min_ratio * 0.7):
                continue
            row = bb.bases[i, :ln_b]
            mate = (
                np.where(row < 4, 3 - row, 4)[::-1]
                if ra[i].strand == 0
                else row
            )
            refseg = self.ref.codes[w0 + o : w0 + o + ln_b]
            if len(refseg) < ln_b:
                continue
            m = bytearray()
            for x, y in zip(mate, refseg):
                if x >= 4 or y >= 4:
                    m += b"N"
                elif x == y:
                    m += b"m"
                else:
                    m += b"S"
            r = rb[i]
            r.mapped = True
            r.flat_start = w0 + o
            r.strand = 1 - ra[i].strand
            r.score = sc
            r.match = bytes(m)
            r.ambig = False
            self.reads_mapped += 1
            self.reads_unmapped -= 1
            self.rescued += 1

    def to_sam_paired(self, b1, r1s, b2, r2s) -> bytes:
        """Emit pair records with mate fields (SamLine pairing semantics:
        flags 0x1/0x2/0x20/0x40/0x80, RNEXT/PNEXT/TLEN; proper pair =
        same scaffold, opposite strands, |TLEN| <= pairlen limit)."""
        out = []
        ref = self.ref
        for b in range(len(r1s)):
            recs = []
            for pairnum, (batch, r, mate) in enumerate(
                ((b1, r1s[b], r2s[b]), (b2, r2s[b], r1s[b]))
            ):
                n = int(batch.lengths[b])
                name = batch.ids[b].split()[0]
                flag = FPAIRED | (FFIRST if pairnum == 0 else FSECOND)
                scaf = rstart0 = -1
                cigar = "*"
                mapq = 0
                tags = []
                if r.mapped:
                    scaf = int(ref.scaffold_of(np.array([max(r.flat_start, 0)]))[0])
                    scaf_start = int(ref.starts[scaf])
                    rstart0 = r.flat_start - scaf_start
                    cigar = match_to_cigar14(r.match, rstart0, int(ref.lengths[scaf]))
                    mapq = to_mapq(r.score, n, True, r.ambig)
                    if r.strand:
                        flag |= FREVERSE
                    tags = [b"AS:i:%d" % r.score, b"NM:i:%d" % _nm(r.match)]
                else:
                    flag |= FUNMAPPED
                mate_scaf = -1
                if mate.mapped:
                    mate_scaf = int(
                        ref.scaffold_of(np.array([max(mate.flat_start, 0)]))[0]
                    )
                    if mate.strand:
                        flag |= 0x20  # mate reverse
                else:
                    flag |= 0x8  # mate unmapped
                tlen = 0
                rnext = b"*"
                pnext = 0
                if r.mapped and mate.mapped and mate_scaf == scaf:
                    rnext = b"="
                    mate_start0 = mate.flat_start - int(ref.starts[scaf])
                    pnext = max(mate_start0, 0) + 1
                    left = min(rstart0, mate_start0)
                    right = max(
                        rstart0 + _reflen(r.match), mate_start0 + _reflen(mate.match)
                    )
                    tlen = right - left
                    if rstart0 > mate_start0 or (
                        rstart0 == mate_start0 and pairnum == 1
                    ):
                        tlen = -tlen
                    # proper pair: opposite strands, sane insert
                    if r.strand != mate.strand and abs(tlen) < 32000:
                        flag |= 0x2
                elif mate.mapped:
                    rnext = ref.names[mate_scaf].split()[0]
                    pnext = max(mate.flat_start - int(ref.starts[mate_scaf]), 0) + 1
                seq = batch.sequence(b)
                qual = batch.quality_string(b)
                if r.mapped and r.strand:
                    from ..core.dna import reverse_complement

                    seq = reverse_complement(seq)
                    qual = qual[::-1]
                recs.append(
                    SamRecord(
                        qname=name,
                        flag=flag,
                        rname=ref.names[scaf].split()[0] if r.mapped else b"*",
                        pos=(max(rstart0, 0) + 1) if r.mapped else 0,
                        mapq=mapq,
                        cigar=cigar,
                        rnext=rnext,
                        pnext=pnext,
                        tlen=tlen,
                        seq=seq,
                        qual=qual,
                        tags=tags,
                    ).to_bytes()
                )
            out.extend(recs)
        return b"".join(out)

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
        if self.rescued:
            print(f"rescued mates:       \t{self.rescued}", file=stream)
        t = getattr(self, "elapsed", 0) or 1e-9
        print(f"Reads Used:          \t{self.reads_in}", file=stream)
        pct = 100.0 * self.reads_mapped / max(self.reads_in, 1)
        print(f"mapped:              \t{pct:.4f}% \t{self.reads_mapped} reads", file=stream)
        print(
            f"Reads/sec:           \t{self.reads_in / t:.2f}",
            file=stream,
        )


def _reflen(match: bytes) -> int:
    return sum(match.count(x) for x in (b"m", b"S", b"N", b"D"))


def _nm(match: bytes) -> int:
    return (
        match.count(b"S") + match.count(b"I") + match.count(b"D")
    )


def min_score_for(length: int, min_ratio: float) -> int:
    return int(max_quality(length) * min_ratio)


# clearzone constants (align2/BBMapThread.java:39-74, scaled by
# POINTS_MATCH2): an alignment is ambiguous when the runner-up is within
# `clearzone` of the winner; the zone widens as the best score drops
# (two-segment linear interpolation CZ1 -> CZ1b -> CZ1c, :590-606).
_CZP = int(1.6 * MC.POINTS_MATCH2)
_CZ1 = int(2.0 * MC.POINTS_MATCH2)
_CZ1B = int(2.6 * MC.POINTS_MATCH2)
_CZ1C = int(4.6 * MC.POINTS_MATCH2)
_CZ1B_FLAT = 12 * MC.POINTS_MATCH2
_CZ1C_FLAT = 26 * MC.POINTS_MATCH2


def clearzone_for(score: int, max_sw: int) -> int:
    if score >= max_sw:
        return _CZP
    blim = max_sw * 0.97 - _CZ1B_FLAT
    clim = max_sw * 0.92 - _CZ1C_FLAT
    if score > blim:
        return int(
            ((max_sw - score) * _CZ1B + (score - blim) * _CZ1)
            / max(max_sw - blim, 1)
        )
    if score > clim:
        return int(
            ((blim - score) * _CZ1C + (score - clim) * _CZ1B)
            / max(blim - clim, 1)
        )
    return _CZ1C


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
