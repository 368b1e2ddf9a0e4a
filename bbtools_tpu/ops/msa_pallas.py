"""Pallas MSA wavefront — the banded-DP hot loop as a TPU kernel.

The XLA lax.scan version (ops/msa.py) dispatches ~R+C small fused ops per
alignment batch; this Pallas kernel runs the whole wavefront inside one
program with every diagonal register in VMEM, one grid row per task tile.
Semantics match msa_fill(prune=False) — the fillUnlimited recurrence
(MultiStateAligner11ts.java:643-860) — and are tested for equality.

Layout per grid step (task tile of T alignments):
  reads   [T, R]        uint8->int32 in VMEM
  refp    [T, CP]       ref codes padded with sentinel 97 left/right (R+2)
  state   12 x [T, R+1] int32 VMEM scratch (score/time x 3 states x 2 diags)
  best    3 x [T] per-state running max + col

The diagonal loop is a jax.lax.fori_loop inside the kernel; per-diagonal
ref/horiz values come from dynamic slices of the padded rows (pl.ds).

STATUS: bit-equal to the oracle-verified XLA wavefront under
interpret=True (tests/test_msa.py). This dev harness's remote Mosaic
compile service rejects kernels containing dynamic slices in loops
(tpu_compile_helper HTTP 500) and lacks the `rev` lowering, so on-chip
compilation is deferred to a standard TPU host; callers select the
backend via msa.USE_PALLAS.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import msa_constants as C

NEG_BIG = -(1 << 30)


def _sub_array_cost(streak):
    i = streak + 1
    return jnp.where(
        i > C.LIMIT_FOR_COST_3,
        C.POINTS_SUB3,
        jnp.where(i > 1, C.POINTS_SUB2, C.POINTS_SUB),
    )


def _ins_array_cost(streak):
    i = streak + 1
    return jnp.where(
        i > C.LIMIT_FOR_COST_4,
        C.POINTS_INS4,
        jnp.where(
            i > C.LIMIT_FOR_COST_3,
            C.POINTS_INS3,
            jnp.where(i > 1, C.POINTS_INS2, C.POINTS_INS),
        ),
    )


def _del_ext_cost(streak):
    return jnp.where(
        streak == 0,
        C.POINTS_DEL,
        jnp.where(
            streak < C.LIMIT_FOR_COST_3,
            C.POINTS_DEL2,
            jnp.where(
                streak < C.LIMIT_FOR_COST_4,
                C.POINTS_DEL3,
                jnp.where(
                    streak < C.LIMIT_FOR_COST_5,
                    C.POINTS_DEL4,
                    jnp.where((streak & C.MASK5) == 0, C.POINTS_DEL5, 0),
                ),
            ),
        ),
    )


def _kernel(R, Cc, reads_ref, lens_ref, refp_ref, col0_ref, out_s_ref, out_c_ref,
            out_st_ref, sc_ms_s1, sc_ms_t1, sc_del_s1, sc_del_t1, sc_ins_s1,
            sc_ins_t1, sc_ms_s2, sc_ms_t2, sc_del_s2, sc_del_t2, sc_ins_s2,
            sc_ins_t2, best_s, best_c):
    T = reads_ref.shape[0]
    W = R + 1
    rr = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
    col0v = col0_ref[:, :]  # [1, W]
    rows_b = lens_ref[:, 0][:, None]  # [T, 1]
    # barriers (per task)
    B_I2 = rows_b - C.BARRIER_I1
    B_D2 = rows_b - C.BARRIER_D1
    B_I2b = Cc - 1  # static ref window width per tile

    call1 = jnp.concatenate(
        [jnp.full((T, 1), 99, jnp.int32), reads_ref[:, :].astype(jnp.int32)],
        axis=1,
    )
    call0 = jnp.concatenate(
        [jnp.full((T, 2), 98, jnp.int32), reads_ref[:, :-1].astype(jnp.int32)],
        axis=1,
    )

    def init_diag(d):
        c = d - rr
        s = jnp.where(
            c == 0,
            jnp.broadcast_to(col0v, (T, W)),
            jnp.where(rr == 0, 0, NEG_BIG),
        ).astype(jnp.int32)
        return s

    s0 = init_diag(0)
    s1 = init_diag(1)
    z = jnp.zeros((T, W), jnp.int32)
    for ref_, val in (
        (sc_ms_s2, s0), (sc_del_s2, s0), (sc_ins_s2, s0),
        (sc_ms_s1, s1), (sc_del_s1, s1), (sc_ins_s1, s1),
        (sc_ms_t1, z), (sc_del_t1, z), (sc_ins_t1, z),
        (sc_ms_t2, z), (sc_del_t2, z), (sc_ins_t2, z),
    ):
        ref_[:, :] = val
    for st in range(3):
        best_s[st, :] = jnp.full((T,), NEG_BIG, jnp.int32)
        best_c[st, :] = jnp.full((T,), -1, jnp.int32)

    maxgain = (rows_b[:, 0] - 1) * C.POINTS_MATCH2 + C.POINTS_MATCH
    subfloor = (-2 * maxgain)[:, None]

    def shift_row(x):
        return jnp.concatenate([jnp.zeros((T, 1), x.dtype), x[:, :-1]], axis=1)

    def body(d, _):
        c = d - rr
        # ref1 = refp[d + R - r + 1], ref0 = refp[d + R - r]
        sl = refp_ref[:, pl.ds(d, R + 3)]
        ref1 = sl[:, 1 : R + 2][:, ::-1].astype(jnp.int32)
        ref0 = sl[:, 0 : R + 1][:, ::-1].astype(jnp.int32)
        in_range = (rr >= 1) & (c >= 1)
        match = (call1 == ref1) & (ref1 < 4)
        prev_match = (call0 == ref0) & (ref0 < 4)
        s_diag = shift_row(sc_ms_s2[:, :])
        s_del = shift_row(sc_del_s2[:, :])
        s_ins = shift_row(sc_ins_s2[:, :])
        streak = shift_row(sc_ms_t2[:, :])
        m_sMS = jnp.where(
            match,
            s_diag + jnp.where(prev_match, C.POINTS_MATCH2, C.POINTS_MATCH),
            jnp.where(
                (ref1 < 4) & (call1 < 4),
                s_diag
                + jnp.where(
                    prev_match,
                    jnp.where(streak <= 1, C.POINTS_SUBR, C.POINTS_SUB),
                    _sub_array_cost(streak),
                ),
                s_diag + C.POINTS_NOCALL,
            ),
        )
        m_sD = s_del + jnp.where(match, C.POINTS_MATCH, C.POINTS_SUB)
        m_sI = s_ins + jnp.where(match, C.POINTS_MATCH, C.POINTS_SUB)
        pick_ms = (m_sMS >= m_sD) & (m_sMS >= m_sI)
        pick_d = ~pick_ms & (m_sD >= m_sI)
        ms_score = jnp.where(pick_ms, m_sMS, jnp.where(pick_d, m_sD, m_sI))
        ms_time = jnp.where(
            pick_ms,
            jnp.where(
                match,
                jnp.where(prev_match, streak + 1, 1),
                jnp.where(prev_match, 1, streak + 1),
            ),
            1,
        )
        p1_ms_s = sc_ms_s1[:, :]
        p1_del_s = sc_del_s1[:, :]
        p1_del_t = sc_del_t1[:, :]
        p1_ins_s = sc_ins_s1[:, :]
        p1_ins_t = sc_ins_t1[:, :]
        d_sMS = p1_ms_s + C.POINTS_DEL
        d_sD = p1_del_s + _del_ext_cost(p1_del_t)
        refn = ref1 >= 4
        d_sMS = d_sMS + jnp.where(refn, C.POINTS_DEL_REF_N, 0)
        d_sD = d_sD + jnp.where(refn, C.POINTS_DEL_REF_N, 0)
        d_pick = d_sMS >= d_sD
        del_score = jnp.where(d_pick, d_sMS, d_sD)
        del_time = jnp.where(d_pick, 1, p1_del_t + 1)
        i_sMS = shift_row(p1_ms_s) + C.POINTS_INS
        i_streak = shift_row(p1_ins_t)
        i_sI = shift_row(p1_ins_s) + _ins_array_cost(i_streak)
        i_pick = i_sMS >= i_sI
        ins_score = jnp.where(i_pick, i_sMS, i_sI)
        ins_time = jnp.where(i_pick, 1, i_streak + 1)
        del_barrier = (rr < C.BARRIER_D1) | (rr > B_D2)
        ins_barrier = ((rr < C.BARRIER_I1) & (c > 1)) | (
            (rr > B_I2) & (c < B_I2b)
        )
        del_score = jnp.where(del_barrier, subfloor, del_score)
        del_time = jnp.where(del_barrier, 0, del_time)
        ins_score = jnp.where(ins_barrier, subfloor, ins_score)
        ins_time = jnp.where(ins_barrier, 0, ins_time)
        ms_time = jnp.where(ms_time > C.MAX_TIME, C.MAX_TIME - C.MASK5, ms_time)
        del_time = jnp.where(del_time > C.MAX_TIME, C.MAX_TIME - C.MASK5, del_time)
        ins_time = jnp.where(ins_time > C.MAX_TIME, C.MAX_TIME - C.MASK5, ins_time)
        bnd_s = jnp.where(
            c == 0,
            jnp.broadcast_to(col0v, (T, W)),
            jnp.where(rr == 0, 0, NEG_BIG),
        ).astype(jnp.int32)
        use_bnd = ~in_range
        ms_score = jnp.where(use_bnd, bnd_s, ms_score)
        del_score = jnp.where(use_bnd, bnd_s, del_score)
        ins_score = jnp.where(use_bnd, bnd_s, ins_score)
        ms_time = jnp.where(use_bnd, 0, ms_time)
        del_time = jnp.where(use_bnd, 0, del_time)
        ins_time = jnp.where(use_bnd, 0, ins_time)
        # final-row extraction: r == rows_b, c = d - rows_b
        fin_mask = rr == rows_b
        fin_c = d - rows_b[:, 0]
        valid_fin = (fin_c >= 1) & (fin_c <= Cc)
        for st, s_plane in ((0, ms_score), (1, del_score), (2, ins_score)):
            fs = jnp.max(jnp.where(fin_mask, s_plane, NEG_BIG), axis=1)
            cand = valid_fin & (fs > best_s[st, :])
            best_s[st, :] = jnp.where(cand, fs, best_s[st, :])
            best_c[st, :] = jnp.where(cand, fin_c, best_c[st, :])
        # rotate diagonals: d-1 -> d-2, current -> d-1
        for dst2, src1 in (
            (sc_ms_s2, sc_ms_s1), (sc_ms_t2, sc_ms_t1),
            (sc_del_s2, sc_del_s1), (sc_del_t2, sc_del_t1),
            (sc_ins_s2, sc_ins_s1), (sc_ins_t2, sc_ins_t1),
        ):
            dst2[:, :] = src1[:, :]
        sc_ms_s1[:, :] = ms_score
        sc_ms_t1[:, :] = ms_time
        sc_del_s1[:, :] = del_score
        sc_del_t1[:, :] = del_time
        sc_ins_s1[:, :] = ins_score
        sc_ins_t1[:, :] = ins_time
        return 0

    jax.lax.fori_loop(2, R + Cc + 1, body, 0)
    # combine states in state-major order with strict >
    bs = best_s[0, :]
    bc = best_c[0, :]
    bst = jnp.where(bc >= 0, 0, -1)
    for st in (1, 2):
        s = best_s[st, :]
        c2 = best_c[st, :]
        take = s > bs
        bs = jnp.where(take, s, bs)
        bc = jnp.where(take, c2, bc)
        bst = jnp.where(take, st, bst)
    out_s_ref[:, 0] = bs
    out_c_ref[:, 0] = bc
    out_st_ref[:, 0] = bst


@partial(jax.jit, static_argnames=("R", "Cc", "tile", "interpret"))
def msa_fill_pallas(R: int, Cc: int, reads, read_lens, refp, tile: int = 8,
                    interpret: bool = False):
    """Unpruned MSA fill. refp must be pre-padded: [B, Cc + 2R + 4] with
    sentinel 97 in the R+2 pads (same layout msa_fill builds internally).
    Returns (max_score, max_col, max_state) int32 [B].
    """
    import sys as _sys

    if _sys.getrecursionlimit() < 10000:
        _sys.setrecursionlimit(10000)  # deep Ref-transform chains in tracing
    from .msa import col0_scores

    B = reads.shape[0]
    W = R + 1
    col0 = jnp.asarray(col0_scores(R), dtype=jnp.int32).reshape(1, W)
    grid = (B // tile,)
    kernel = partial(_kernel, R, Cc)
    out_shape = [
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
    ]
    scr = [pltpu.VMEM((tile, W), jnp.int32) for _ in range(12)]
    scr += [pltpu.VMEM((3, tile), jnp.int32), pltpu.VMEM((3, tile), jnp.int32)]
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, R), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile, refp.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, refp.shape[1] * 0 + R + 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_shape=out_shape,
        scratch_shapes=scr,
        interpret=interpret,
    )(reads, read_lens.reshape(B, 1).astype(jnp.int32), refp, col0)
    return tuple(r[:, 0] for r in res)


def prepare_refp(refs: np.ndarray, R: int) -> np.ndarray:
    """Pad ref windows to the kernel's layout: [B, Cc + 2(R+2)]."""
    B, Cc = refs.shape
    PAD = R + 2
    out = np.full((B, Cc + 2 * PAD), 97, dtype=np.uint8)
    out[:, PAD : PAD + Cc] = refs
    return out
