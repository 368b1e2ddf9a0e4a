"""Big k-mers (31 < k <= 62) — the ukmer analog (ukmer/Kmer.java:17).

K-mers are (hi, lo) int64 pairs: lo holds the newest 31 bases, hi the
older k-31. Rolling, reverse-complement, and lexicographic
canonicalization operate on the pair; spectrum storage uses a mixed
64-bit hash of the pair (mix64(hi) * C ^ mix64(lo)) — at E. coli scale
(~10^7 kmers) the collision expectation is ~1e-5, far below sequencing
noise; the exact multi-word table (reference HashArrayU) is a later-round
upgrade for metagenome-scale inputs.
"""

from __future__ import annotations

import numpy as np

from .kmer_index import _mix64

LO_BASES = 31
LO_MASK = (1 << (2 * LO_BASES)) - 1


def rolling_kmers2_np(codes: np.ndarray, k: int):
    """Per-position big-kmer pairs for codes [B, L].

    Returns (hi, lo, rhi, rlo, runlen): forward pair, reverse-complement
    pair, and the defined-run length, matching the k<=31 rolling semantics
    (undefined -> contributes 0 forward, resets the reverse registers).
    """
    assert LO_BASES < k <= 62
    hi_bases = k - LO_BASES
    hi_mask = (1 << (2 * hi_bases)) - 1
    codes = np.atleast_2d(codes)
    B, L = codes.shape
    defined = codes < 4
    code0 = np.where(defined, codes, 0).astype(np.int64)
    comp0 = np.where(defined, 3 - codes.astype(np.int64), 0)
    idx = np.arange(L, dtype=np.int64)
    marked = np.where(defined, np.int64(-1), idx[None, :])
    lastn = np.maximum.accumulate(marked, axis=-1)
    runlen = (idx[None, :] - lastn).astype(np.int32)
    hi = np.zeros((B, L), dtype=np.int64)
    lo = np.zeros((B, L), dtype=np.int64)
    rhi = np.zeros((B, L), dtype=np.int64)
    rlo = np.zeros((B, L), dtype=np.int64)
    # forward: source i-j goes to overall position j (0 = newest)
    for j in range(k):
        src = np.zeros((B, L), dtype=np.int64)
        if j == 0:
            src = code0
        else:
            src[:, j:] = code0[:, :-j]
        live = (idx[None, :] - j) > lastn
        csrc = np.zeros((B, L), dtype=np.int64)
        if j == 0:
            csrc = comp0
        else:
            csrc[:, j:] = comp0[:, :-j]
        csrc = np.where(live, csrc, 0)
        if j < LO_BASES:
            lo |= src << (2 * j)
        else:
            hi |= src << (2 * (j - LO_BASES))
        # reverse: source i-j at overall reverse position k-1-j
        rj = k - 1 - j
        if rj < LO_BASES:
            rlo |= csrc << (2 * rj)
        else:
            rhi |= csrc << (2 * (rj - LO_BASES))
    return hi & hi_mask, lo, rhi & hi_mask, rlo, runlen


def canonical_pair(hi, lo, rhi, rlo):
    """Lexicographic max of (hi, lo) vs (rhi, rlo)."""
    take_f = (hi > rhi) | ((hi == rhi) & (lo >= rlo))
    return np.where(take_f, hi, rhi), np.where(take_f, lo, rlo)


_C = np.uint64(0x9E3779B97F4A7C15)


def pair_hash(hi, lo) -> np.ndarray:
    """64-bit mixed hash of the pair (spectrum key)."""
    return (
        _mix64(np.asarray(hi).astype(np.uint64) * _C)
        ^ _mix64(np.asarray(lo).astype(np.uint64))
    ).astype(np.int64) & np.int64(0x7FFFFFFFFFFFFFFF)


def count_batch2(bases: np.ndarray, lengths: np.ndarray, k: int):
    """Host big-k counting: hashed canonical keys + counts for one batch."""
    hi, lo, rhi, rlo, runlen = rolling_kmers2_np(bases, k)
    i_idx = np.arange(bases.shape[1])[None, :]
    valid = (runlen >= k) & (i_idx < np.asarray(lengths)[:, None])
    chi, clo = canonical_pair(hi, lo, rhi, rlo)
    h = pair_hash(chi[valid], clo[valid])
    values, counts = np.unique(h, return_counts=True)
    return values, counts.astype(np.int64)
