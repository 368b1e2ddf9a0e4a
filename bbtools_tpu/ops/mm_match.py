"""MXU k-mer matcher: hdist-tolerant set lookup as a one-hot matmul.

The gather-based BBDuk indexes pay two structural costs on TPU: hdist
expansion multiplies the stored key count by ~(1 + 3*k*hdist) (70x for
k=23 hdist=1), and XLA's HBM row-gather unit plateaus near ~70M rows/s
regardless of bandwidth — the measured wall for adapters.fa panels
(BASELINE.md gap analysis). This module replaces both with systolic-array
work, the one primitive where this hardware is fastest:

  Encode a key as a one-hot vector over its k 2-bit fields (4 dims per
  field). For same-length keys the dot product of two one-hots counts
  EQUAL fields, so

      hamming(q, x) <= h   <=>   dot(onehot(q), onehot(x)) >= k - h.

  Matching every query against every RAW reference key is then a single
  [Nq, K] x [K, D] matmul on the MXU — no expansion (D ~ raw key count,
  not raw x 70), no gathers. Mixed key lengths (mink short-kmer classes)
  ride per-class indicator channels with weight CLASS_W: cross-class
  dots stay below CLASS_W and can never reach a threshold. Short keys
  store their length-tag bit as a regular field so every class shares
  the uniform threshold k + CLASS_W - hdist. The threshold is folded
  into the matmul via a constant-one query dim whose column weight is
  -(k + CLASS_W - h): a query matches column j iff the product >= 0.

  First-insertion-wins id resolution (the reference's setIfNotPresent
  contract, bbduk/BBDukIndexAndLoader.addToMap :618-700) needs the id of
  the FIRST raw key (insertion order) whose hdist-ball contains the
  query. Each column carries a priority word (insertion_rank << 16) | id
  and a min-reduction over matching columns returns the winning id with
  zero gather traffic.

Reverse-complement canonicalization (toValue stores max(kmer, rkmer),
kmers.canonical_keys_np) is handled by storing TWO adjacent columns per
raw key — the forward form and its reverse complement — because the
reference expands mutants of the FORWARD kmer and canonicalizes each
mutant (kmer_index._mutant_stream_hdist1): the stored ball is
  {canon(m) : hamming(m, x_fwd) <= h}
  = {q canonical : hamming(q, x_fwd) <= h or hamming(q, rc(x_fwd)) <= h}
exactly, when no middle-mask is in play.

maskMiddle: keys are stored pre-masked and queries arrive pre-masked, so
masked fields read as zero on both sides and auto-match — no kernel
special-casing. But canonicalization happens BEFORE masking (toValue),
so for near-palindromic keys a masked query pattern can be reachable in
ball-space yet absent from the reference's expansion (the canonical
witness flips orientation). build() enumerates the masked ball of every
full-k key and verifies it is contained in the reference expansion
(expand_kmers); any unsafe key disables the backend and callers keep
the gather index. Real adapter/artifact panels contain no
near-palindromes, so this is a correctness gate, not a working mode.

Scan-side notes:
  - speed= sampling needs NO load-side filtering here: the scan masks
    query positions with the same hash test the loader applies to
    stored keys (key values are identical on both sides), so dropping
    stored keys is observationally redundant.
  - qhdist and edist are NOT supported (qhdist mutates queries above
    the lookup; edist needs indel balls); build() returns None and
    callers keep the gather path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kmers import length_mask, rc_kmer_np

LANES = 128
CLASS_W = 64  # class-channel weight; > max cross-class dot (k)
BIG32 = np.int32(0x7FFFFFFF)
QT = 1024  # queries per grid step
DT = 512  # columns per grid step


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------


def _field_onehot_np(vals: np.ndarray, k: int) -> np.ndarray:
    """[n, 4k] one-hot of the k 2-bit fields of int64 keys (LSB first)."""
    n = len(vals)
    shifts = (2 * np.arange(k, dtype=np.int64))[None, :]
    codes = (vals[:, None] >> shifts) & 3  # [n, k]
    oh = codes[:, :, None] == np.arange(4, dtype=np.int64)[None, None, :]
    return oh.reshape(n, 4 * k).astype(np.int8)


def _canonical_realizable_np(y: np.ndarray, k: int, mid_mask: int) -> np.ndarray:
    """For masked patterns y (masked fields zero): is y the masked image
    of at least one canonical full key? Tries every masked-field variant
    Q of y and tests Q >= rc(Q)."""
    free = [i for i in range(k) if (mid_mask >> (2 * i)) & 3 != 3]
    variants = [y]
    for pos in free:
        variants = [
            v | (np.int64(c) << int(2 * pos)) for v in variants for c in range(4)
        ]
    ok = np.zeros(y.shape, bool)
    for v in variants:
        ok |= v >= rc_kmer_np(v, k)
    return ok


def _masked_safety(fwd: np.ndarray, k: int, hdist: int, mid_mask: int) -> bool:
    """True iff for every raw full-k key x, the set of canonical masked
    queries accepted by the two-column ball test is contained in the
    reference expansion (no false positive possible). Only called when a
    middle mask is active and rcomp is on; supports hdist <= 1."""
    from .kmer_index import expand_kmers

    if hdist > 1:
        return False
    n = len(fwd)
    if n == 0:
        return True
    mm = np.int64(mid_mask)
    tag = np.int64(length_mask(k))
    unmasked = [i for i in range(k) if (mid_mask >> (2 * i)) & 3 == 3]
    exp, src = expand_kmers(fwd, k, hdist, mid_mask)
    exp = exp & ~tag
    for base in (fwd, rc_kmer_np(fwd, k)):
        cand = [base & mm]
        if hdist >= 1:
            for i in unmasked:
                for c in range(4):
                    v = (base & ~(np.int64(3) << (2 * i))) | (
                        np.int64(c) << (2 * i)
                    )
                    cand.append(v & mm)
        cand = np.stack(cand, axis=1)  # [n, V]
        V = cand.shape[1]
        realizable = _canonical_realizable_np(
            cand.reshape(-1), k, mid_mask
        ).reshape(n, V)
        for b in range(n):
            ref = set((exp[src == b]).tolist())
            mine = set(cand[b][realizable[b]].tolist())
            if not mine <= ref:
                return False
    return True


@dataclass
class MMKmerIndex:
    """One-hot matmul matcher; see module docstring.

    keymat  int8 [Kp, Dp]  column = key one-hot + class W + (-thr) const
    prio    int32 [1, Dp]  (insertion_rank << 16) | id ; BIG for pad cols
    """

    keymat: np.ndarray
    prio: np.ndarray
    k: int
    mink: int
    Kp: int
    Dp: int
    n_raw: int

    #: above this column count the matmul loses to the gather index
    MAX_COLS = 32768

    @staticmethod
    def build(
        scaffolds: list[np.ndarray],
        k: int,
        mink: int = 0,
        hdist: int = 0,
        hdist2: int | None = None,
        mid_mask: int = -1,
        rcomp: bool = True,
        ids: list[int] | None = None,
    ) -> "MMKmerIndex | None":
        """Raw-key column build in reference insertion order. Returns
        None when the config or panel shape is unsupported (callers use
        the gather index)."""
        from .kmer_index import scaffold_kmer_stream

        if hdist2 is None:
            hdist2 = hdist
        if k > 31:
            return None
        # insertion-order raw streams, all classes interleaved as the
        # loader inserts them (scaffold-major; class collisions are
        # impossible so only within-class order matters, but global
        # order is kept anyway)
        ent_len: list[int] = []
        ent_fwd: list[int] = []
        ent_id: list[int] = []
        for snum, codes in enumerate(scaffolds):
            sid = ids[snum] if ids is not None else snum + 1
            if sid <= 0 or sid >= (1 << 16):
                return None
            fwd, _rkm, s_first, s_last, _extras = scaffold_kmer_stream(
                codes, k, mink
            )
            ent_len.extend([k] * len(fwd))
            ent_fwd.extend(int(x) for x in fwd)
            ent_id.extend([sid] * len(fwd))
            for km, _rk, ln, _eb in s_first + s_last:
                ent_len.append(ln)
                ent_fwd.append(int(km))
                ent_id.append(sid)
        if not ent_fwd:
            return None
        lens = np.asarray(ent_len, np.int64)
        fwds = np.asarray(ent_fwd, np.int64)
        sids = np.asarray(ent_id, np.int32)
        # first-wins dedup of identical (len, fwd) raw keys
        pairs = np.stack([lens, fwds], axis=1)
        _, first = np.unique(pairs, axis=0, return_index=True)
        keep = np.sort(first)
        lens, fwds, sids = lens[keep], fwds[keep], sids[keep]
        n_raw = len(fwds)
        # strict <, so the max priority word (rank<<16 | id) stays below
        # the BIG32 miss sentinel even at rank 2*n_raw-1, id 0xFFFF
        if 2 * n_raw >= MMKmerIndex.MAX_COLS:
            return None
        # masked-safety gate (full-k class only; shorts carry no mask)
        has_mask = mid_mask != -1 and any(
            (mid_mask >> (2 * i)) & 3 != 3 for i in range(k)
        )
        if has_mask and rcomp:
            if not _masked_safety(fwds[lens == k], k, hdist, mid_mask):
                return None
        nc = (k - mink + 1) if mink and mink < k else 1
        dims = 4 * k + nc + 1
        Kp = ((dims + LANES - 1) // LANES) * LANES
        thr = k + CLASS_W  # minus per-class hdist below
        if thr > 127:
            return None
        cols_oh: list[np.ndarray] = []
        cols_cls: list[np.ndarray] = []
        cols_thr: list[np.ndarray] = []
        cols_prio: list[np.ndarray] = []
        mmv = np.int64(mid_mask)
        for ln in sorted(set(lens.tolist())):
            sel = np.nonzero(lens == ln)[0]
            x = fwds[sel]
            h = hdist if ln == k else hdist2
            msk = mmv if ln == k else np.int64(-1)
            # short keys keep their length-tag bit as a regular field so
            # an exact same-class match scores k field-equalities: bases
            # 0..ln-1, the tag field at ln, zeros above (never mutated)
            tagv = np.int64(0 if ln == k else length_mask(int(ln)))
            forms = [(x & msk) | tagv]
            if rcomp:
                forms.append((rc_kmer_np(x, int(ln)) & msk) | tagv)
            ci = int(ln) - mink if (mink and mink < k) else 0
            for fi, form in enumerate(forms):
                cols_oh.append(_field_onehot_np(form, k))
                cls = np.zeros((len(sel), nc), np.int8)
                cls[:, ci] = CLASS_W
                cols_cls.append(cls)
                cols_thr.append(np.full(len(sel), -(thr - h), np.int32))
                cols_prio.append(
                    ((sel.astype(np.int64) * 2 + fi) << 16)
                    | sids[sel].astype(np.int64)
                )
        oh = np.concatenate(cols_oh, axis=0)
        cls = np.concatenate(cols_cls, axis=0)
        thrv = np.concatenate(cols_thr, axis=0)
        prio = np.concatenate(cols_prio, axis=0)
        colmat = np.concatenate(
            [oh, cls, thrv[:, None].astype(np.int8)], axis=1
        )  # [D, dims]
        D = colmat.shape[0]
        # keep insertion order along columns (priority already encodes
        # it; ordering is for locality and debuggability)
        order = np.argsort(prio, kind="stable")
        dt = DT if D > DT else LANES
        Dp = ((D + dt - 1) // dt) * dt
        keymat = np.zeros((Kp, Dp), np.int8)
        keymat[:dims, :D] = colmat[order].T
        # pad columns: all-zero weights with const dim -1 -> s < 0, never hit
        keymat[4 * k + nc, D:] = -1
        prio_row = np.full((1, Dp), BIG32, np.int32)
        prio_row[0, :D] = prio[order].astype(np.int32)
        return MMKmerIndex(keymat, prio_row, k, mink, Kp, Dp, n_raw)

    def device_arrays(self):
        return jnp.asarray(self.keymat), jnp.asarray(self.prio)

    def static_params(self):
        return (self.k, self.mink, self.Kp, self.Dp)

    # ------------------------------------------------------------------
    def lookup_np(self, query: np.ndarray) -> np.ndarray:
        """Host oracle (small inputs/tests)."""
        q = np.asarray(query, np.int64).reshape(-1)
        oh = _query_onehot_np(q, self.k, self.mink, self.Kp)
        s = oh.astype(np.int32) @ self.keymat.astype(np.int32)
        pr = np.where(s >= 0, self.prio, BIG32)
        best = pr.min(axis=1)
        out = np.where(best != BIG32, best & 0xFFFF, 0).astype(np.int32)
        return out.reshape(np.asarray(query).shape)


def _query_onehot_np(q: np.ndarray, k: int, mink: int, Kp: int) -> np.ndarray:
    n = len(q)
    oh = _field_onehot_np(q & ((np.int64(1) << (2 * k)) - 1), k)
    nc = (k - mink + 1) if mink and mink < k else 1
    cls = np.zeros((n, nc), np.int8)
    if nc > 1:
        for ci in range(nc):
            cls[:, ci] = (q >> (2 * (mink + ci))) == 1
    else:
        cls[:, 0] = 1
    out = np.zeros((n, Kp), np.int8)
    out[:, : 4 * k] = oh
    out[:, 4 * k : 4 * k + nc] = cls
    out[:, 4 * k + nc] = 1
    return out


# ---------------------------------------------------------------------------
# device lookup
# ---------------------------------------------------------------------------


def _query_onehot_jnp(q, k: int, mink: int, Kp: int):
    """[N, Kp] int8 one-hot; fused elementwise in XLA."""
    n = q.shape[0]
    shifts = (2 * jnp.arange(k, dtype=jnp.int64))[None, :]
    codes = ((q[:, None] >> shifts) & 3).astype(jnp.int32)  # [N, k]
    oh = (codes[:, :, None] == jnp.arange(4, dtype=jnp.int32)).reshape(
        n, 4 * k
    )
    nc = (k - mink + 1) if mink and mink < k else 1
    if nc > 1:
        lns = 2 * (mink + jnp.arange(nc, dtype=jnp.int64))
        cls = (q[:, None] >> lns[None, :]) == 1
    else:
        cls = jnp.ones((n, 1), bool)
    const = jnp.ones((n, 1), bool)
    pad = jnp.zeros((n, Kp - 4 * k - nc - 1), bool)
    return jnp.concatenate([oh, cls, const, pad], axis=1).astype(jnp.int8)


def mm_lookup_jnp(keymat, prio, k: int, mink: int, Kp: int, Dp: int, query):
    """ids for canonical keys `query` (any shape). Pallas kernel on TPU,
    blocked XLA matmul elsewhere (identical results)."""
    shape = query.shape
    flat = query.reshape(-1)
    oh = _query_onehot_jnp(flat, k, mink, Kp)
    if jax.devices()[0].platform == "tpu":
        out = _mm_pallas(keymat, prio, oh)
    else:
        out = _mm_xla(keymat, prio, oh)
    return out.reshape(shape)


def _mm_xla(keymat, prio, oh):
    # bf16 is exact here: dot terms are 0/1 * weights <= 127 and |s| is
    # bounded by k + CLASS_W + thr < 256 (integers below 2^8 are exact
    # in bf16); accumulation is f32. Chunked over queries: the full
    # [N, Dp] score matrix is tens of GB for a production scan batch
    # (the Pallas path tiles it in VMEM; this fallback must too).
    N = oh.shape[0]
    CH = 8192
    Np = ((N + CH - 1) // CH) * CH
    ohp = jnp.pad(oh, ((0, Np - N), (0, 0))) if Np != N else oh
    kb = keymat.astype(jnp.bfloat16)

    def chunk(oh_c):
        s = jax.lax.dot_general(
            oh_c.astype(jnp.bfloat16), kb,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pr = jnp.where(s >= 0, prio, BIG32)
        return pr.min(axis=1)

    best = jax.lax.map(chunk, ohp.reshape(Np // CH, CH, -1)).reshape(-1)[:N]
    return jnp.where(best != BIG32, best & 0xFFFF, 0).astype(jnp.int32)


def _mm_kernel(nd, oh_ref, key_ref, prio_ref, out_ref, best_ref):
    d = pl.program_id(1)

    @pl.when(d == 0)
    def _init():
        best_ref[:, :] = jnp.full(best_ref.shape, BIG32, jnp.int32)

    # int8 x int8 -> int32 on the MXU (exact; ~15% over bf16 on v5e —
    # the kernel is bound by the [QT, DT] select+min, not the matmul)
    a = oh_ref[:, :]  # [QT, Kp] int8
    b = key_ref[:, :]  # [Kp, DT] int8
    s = jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    pr = jnp.where(s >= 0, prio_ref[0:1, :], BIG32)
    best_ref[:, :] = jnp.minimum(
        best_ref[:, :], jnp.min(pr, axis=1, keepdims=True)
    )

    @pl.when(d == nd - 1)
    def _emit():
        b0 = best_ref[:, :]
        out_ref[:, :] = jnp.where(
            b0 != BIG32, b0 & jnp.int32(0xFFFF), jnp.int32(0)
        )


@partial(jax.jit, static_argnames=("interpret",))
def _mm_pallas(keymat, prio, oh, interpret: bool = False):
    N, Kp = oh.shape
    Dp = keymat.shape[1]
    qt = min(QT, max(((N + 7) // 8) * 8, 8))
    Np = ((N + qt - 1) // qt) * qt
    if Np != N:
        oh = jnp.pad(oh, ((0, Np - N), (0, 0)))
    dt = min(DT, Dp)
    nd = Dp // dt  # build pads Dp to a dt multiple
    grid = (Np // qt, nd)
    out = pl.pallas_call(
        partial(_mm_kernel, nd),
        grid=grid,
        in_specs=[
            pl.BlockSpec((qt, Kp), lambda i, d: (i, d - d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, dt), lambda i, d: (i - i, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dt), lambda i, d: (d - d, d),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qt, 1), lambda i, d: (i, d - d),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((qt, 1), jnp.int32)],
        interpret=interpret,
    )(oh, keymat, prio)
    return out[:N, 0]


def mm_best_jnp(keymat, prio, k: int, mink: int, Kp: int, query):
    """Per-query best (rank<<16 | id) priority word against THIS column
    set, BIG32 on miss. The shard-combinable half of mm_lookup_jnp:
    min over column shards == min over all columns, so a tp-sharded
    index resolves with one pmin (parallel/sharded_count.py)."""
    flat = query.reshape(-1)
    oh = _query_onehot_jnp(flat, k, mink, Kp)
    s = jax.lax.dot_general(
        oh.astype(jnp.bfloat16),
        keymat.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pr = jnp.where(s >= 0, prio, BIG32)
    return pr.min(axis=1).reshape(query.shape)


def mm_decode_best(best):
    """Priority word -> scaffold id (0 on miss)."""
    return jnp.where(best != BIG32, best & 0xFFFF, 0).astype(jnp.int32)
