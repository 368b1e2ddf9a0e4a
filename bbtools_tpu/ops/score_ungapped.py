"""Ungapped site scoring — batched scoreNoIndels.

Exact port of MultiStateAligner11ts.scoreNoIndels (:960-1030): a single
diagonal scan with (mode, timeInMode) carry producing the same
streak-dependent match/sub scores; out-of-reference positions score
POINTS_NOREF. One lax.scan over read positions, vectorized over candidate
sites (the reference calls this per (read, site) in a loop,
align2/BBMapThread.java:520).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import msa_constants as C


@partial(jax.jit, static_argnames=("R",))
def score_no_indels(R: int, reads, read_lens, refwins, ref_starts, ref_lens):
    """Score reads against reference windows at fixed offsets (no indels).

    reads [B, R] uint8; refwins [B, W] uint8 — a window of the reference
    with the candidate site at column `ref_starts[b]` (may be negative for
    off-the-end sites, relative to the window); ref_lens = number of valid
    columns in each window (i.e. scaffold-clipped length).

    Returns score int32 [B].
    """
    B, W = refwins.shape
    i32 = jnp.int32
    reads_i = reads.astype(i32)
    refs_i = refwins.astype(i32)

    # pre-align the windows so step i reads column i of `aligned`
    # (aligned[b, i] = refwins[b, ref_starts[b] + i]) via log-shifts —
    # the per-step per-row gathers this replaces run at the ~50M rows/s
    # random-access wall (2R gathers of B rows per call). Out-of-range
    # columns hold shifted-in garbage, masked by in_ref below.
    Wp = max(W, R)
    x = jnp.pad(refs_i, ((0, 0), (0, Wp - W)))
    lsh = jnp.maximum(ref_starts, 0)[:, None]
    rsh = jnp.maximum(-ref_starts, 0)[:, None]
    j = 0
    while (1 << j) <= W:
        sh = 1 << j
        x = jnp.where(
            ((lsh >> j) & 1) == 1,
            jnp.pad(x[:, sh:], ((0, 0), (0, sh))),
            x,
        )
        j += 1
    j = 0
    while (1 << j) <= R:
        sh = 1 << j
        x = jnp.where(
            ((rsh >> j) & 1) == 1,
            jnp.pad(x[:, :-sh], ((0, 0), (sh, 0))),
            x,
        )
        j += 1
    aligned = x[:, :R]  # [B, R]

    def step(carry, xs):
        score, mode, tim = carry
        c, r, i = xs
        rpos = ref_starts + i
        in_ref = (rpos >= 0) & (rpos < ref_lens)
        active = i < read_lens
        is_match = in_ref & (c == r) & (c < 4)
        is_nocall = in_ref & ~is_match & (c >= 4)
        is_noref = ~in_ref | (in_ref & ~is_match & (c < 4) & (r >= 4))
        is_sub = in_ref & ~is_match & (c < 4) & (r < 4)
        new_tim = jnp.where(
            is_match,
            jnp.where(mode == 0, tim + 1, 0),
            jnp.where(is_sub, jnp.where(mode == 1, tim + 1, 0), tim),
        )
        sub_cost = _sub_array(new_tim + 1)
        delta = jnp.where(
            is_match,
            jnp.where(mode == 0, C.POINTS_MATCH2, C.POINTS_MATCH),
            jnp.where(
                is_nocall,
                C.POINTS_NOCALL,
                jnp.where(is_noref, C.POINTS_NOREF, sub_cost),
            ),
        )
        new_mode = jnp.where(
            is_match, 0, jnp.where(is_sub, 1, mode)
        )
        score = jnp.where(active, score + delta, score)
        mode = jnp.where(active & (is_match | is_sub), new_mode, mode)
        tim = jnp.where(active & (is_match | is_sub), new_tim, tim)
        return (score, mode, tim), None

    init = (
        jnp.zeros(B, i32),
        jnp.full(B, -1, i32),
        jnp.zeros(B, i32),
    )
    xs = (
        reads_i.T,  # [R, B]: scan consumes rows, no per-step extraction
        aligned.T,
        jnp.arange(R, dtype=i32),
    )
    (score, _, _), _ = jax.lax.scan(step, init, xs)
    return score


@partial(jax.jit, static_argnames=("R", "NOFF"))
def score_no_indels_offsets(R: int, NOFF: int, reads, read_lens, wins):
    """Sliding-offset scoreNoIndels: score of reads[c] vs wins[c, o:o+R]
    for every offset o in [0, NOFF), in one scan. Used by mate rescue
    (AbstractMapThread.rescue scans every offset in the insert window) —
    one [C, NOFF] lane block instead of C*NOFF duplicated tasks.

    Windows must be 4-filled outside the reference so off-reference
    columns take the POINTS_NOREF branch; requires wins.shape[1] >=
    NOFF + R - 1. Returns int32 [C, NOFF].
    """
    i32 = jnp.int32
    reads_i = reads.astype(i32)  # [C, R]
    wins_i = wins.astype(i32)  # [C, >= NOFF+R-1]
    C_ = wins_i.shape[0]
    active_rows = read_lens[:, None]  # [C, 1]

    def step(carry, xs):
        score, mode, tim = carry  # [C, NOFF]
        c, i = xs  # c: [C] read column, i scalar
        c = c[:, None]
        r = jax.lax.dynamic_slice_in_dim(wins_i, i, NOFF, axis=1)
        active = i < active_rows
        is_match = (c == r) & (c < 4)
        is_nocall = ~is_match & (c >= 4)
        is_noref = ~is_match & (c < 4) & (r >= 4)
        is_sub = ~is_match & (c < 4) & (r < 4)
        new_tim = jnp.where(
            is_match,
            jnp.where(mode == 0, tim + 1, 0),
            jnp.where(is_sub, jnp.where(mode == 1, tim + 1, 0), tim),
        )
        sub_cost = _sub_array(new_tim + 1)
        delta = jnp.where(
            is_match,
            jnp.where(mode == 0, C.POINTS_MATCH2, C.POINTS_MATCH),
            jnp.where(
                is_nocall,
                C.POINTS_NOCALL,
                jnp.where(is_noref, C.POINTS_NOREF, sub_cost),
            ),
        )
        new_mode = jnp.where(is_match, 0, jnp.where(is_sub, 1, mode))
        score = jnp.where(active, score + delta, score)
        upd = active & (is_match | is_sub)
        mode = jnp.where(upd, new_mode, mode)
        tim = jnp.where(upd, new_tim, tim)
        return (score, mode, tim), None

    init = (
        jnp.zeros((C_, NOFF), i32),
        jnp.full((C_, NOFF), -1, i32),
        jnp.zeros((C_, NOFF), i32),
    )
    xs = (reads_i.T, jnp.arange(R, dtype=i32))
    (score, _, _), _ = jax.lax.scan(step, init, xs)
    return score


def _sub_array(i):
    return jnp.where(
        i > C.LIMIT_FOR_COST_3,
        C.POINTS_SUB3,
        jnp.where(i > 1, C.POINTS_SUB2, C.POINTS_SUB),
    )


def score_no_indels_np(read, ref, ref_start):
    """Host oracle (direct transliteration) for one (read, site)."""
    score = 0
    mode = -1
    tim = 0
    read_start = 0
    read_stop = len(read)
    ref_stop = ref_start + len(read)
    if ref_start < 0:
        read_start = -ref_start
        score += C.POINTS_NOREF * read_start
    if ref_stop > len(ref):
        dif = ref_stop - len(ref)
        read_stop -= dif
        score += C.POINTS_NOREF * dif
    for i in range(read_start, read_stop):
        c = read[i]
        r = ref[ref_start + i]
        if c == r and c < 4:
            if mode == 0:
                tim += 1
                score += C.POINTS_MATCH2
            else:
                tim = 0
                score += C.POINTS_MATCH
            mode = 0
        elif c >= 4:
            score += C.POINTS_NOCALL
        elif r >= 4:
            score += C.POINTS_NOREF
        else:
            if mode == 1:
                tim += 1
            else:
                tim = 0
            score += int(C.POINTS_SUB_ARRAY[min(tim + 1, 603)])
            mode = 1
    return score
