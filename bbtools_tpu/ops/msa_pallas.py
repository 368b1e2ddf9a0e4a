"""Pallas MSA wavefront — the banded-DP hot loop as a TPU kernel.

The XLA lax.scan version (ops/msa.py) dispatches ~R+C small fused ops per
alignment batch; this Pallas kernel runs the whole wavefront inside one
program with every diagonal register in VMEM. Semantics match
msa_fill(prune=False) — the fillUnlimited recurrence
(MultiStateAligner11ts.java:643-860) — and are tested for equality.

Mosaic-conservative structure (the round-1 kernel was rejected by the
remote Mosaic compiler for dynamic slices inside fori_loop and a missing
`rev` lowering):
  - the anti-diagonal loop is the SECOND GRID DIMENSION (TPU grids run
    sequentially per core, scratch persists across steps), so there is no
    in-kernel loop at all;
  - the per-diagonal reference window is a VMEM SHIFT REGISTER: one new
    ref code enters per diagonal, delivered by the BlockSpec pipeline
    from a pre-gathered [B, n_diags] "entering codes" matrix — no
    dynamic slices, no reverses; the previous diagonal's window IS the
    ref0 operand (ref0(d) = ref1(d-1));
  - state planes (score|streak for MS/DEL/INS at d-1 and d-2) live in
    VMEM scratch, initialized under @pl.when(step == 0);
  - outputs are accumulator blocks revisited every step and flushed at
    the end.

Layout per grid step (task tile of T alignments, W = R+1 diagonal rows):
  reads   [T, R]   int32 codes (static block)
  enter   [T, 1]   the ref code entering the wavefront this diagonal
  state   12 x [T, W] int32 scratch + ref window [T, W] x 2 + best 3x[T]
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


def _i32(x):
    return jnp.int32(x)


def _sub_array_cost(streak):
    # all scalar constants pinned to int32: a python-int pair inside
    # jnp.where becomes int64 under x64, and Mosaic's int64->int32
    # convert lowering recurses forever
    i = streak + 1
    return jnp.where(
        i > C.LIMIT_FOR_COST_3,
        _i32(C.POINTS_SUB3),
        jnp.where(i > 1, _i32(C.POINTS_SUB2), _i32(C.POINTS_SUB)),
    )


def _ins_array_cost(streak):
    i = streak + 1
    return jnp.where(
        i > C.LIMIT_FOR_COST_4,
        _i32(C.POINTS_INS4),
        jnp.where(
            i > C.LIMIT_FOR_COST_3,
            _i32(C.POINTS_INS3),
            jnp.where(i > 1, _i32(C.POINTS_INS2), _i32(C.POINTS_INS)),
        ),
    )


def _del_ext_cost(streak):
    return jnp.where(
        streak == 0,
        _i32(C.POINTS_DEL),
        jnp.where(
            streak < C.LIMIT_FOR_COST_3,
            _i32(C.POINTS_DEL2),
            jnp.where(
                streak < C.LIMIT_FOR_COST_4,
                _i32(C.POINTS_DEL3),
                jnp.where(
                    streak < C.LIMIT_FOR_COST_5,
                    _i32(C.POINTS_DEL4),
                    jnp.where(
                        (streak & C.MASK5) == 0, _i32(C.POINTS_DEL5), _i32(0)
                    ),
                ),
            ),
        ),
    )


def _kernel(R, Cc, nd, traceback, reads_ref, lens_ref, enter_ref, init_ref1_ref,
            col0_ref, out_s_ref, out_c_ref, out_st_ref, *rest):
    """Diagonal banks are double-buffered by STEP PARITY: bank A holds
    diagonal d-1 on even steps and d-2 on odd steps (B the reverse), and
    each step writes the new diagonal over the d-2 bank in place — no
    rotation copies (12 plane writes + reads per step in the rotating
    version, which dominated VMEM traffic)."""
    if traceback:
        out_pl_ref = rest[0]
        rest = rest[1:]
    (sc_ms_s1, sc_ms_t1, sc_del_s1, sc_del_t1, sc_ins_s1, sc_ins_t1,
     sc_ms_s2, sc_ms_t2, sc_del_s2, sc_del_t2, sc_ins_s2, sc_ins_t2,
     ref1_reg, best_s, best_c) = rest
    # TRANSPOSED plane layout [W, T]: the wavefront row dim rides the
    # sublane axis (W=R+1 pads only to a multiple of 8) and tasks ride
    # the 128-lane axis — the [T, W] layout padded W to a multiple of
    # 128 lanes, wasting ~40% of every vector op for R=151
    T = reads_ref.shape[1]
    W = R + 1
    step = pl.program_id(1)
    d = step + 2  # diagonal index
    rr = jax.lax.broadcasted_iota(jnp.int32, (W, T), 0)
    col0v = col0_ref[:, :]  # [W, 1]
    rows_b = lens_ref[0:1, :]  # [1, T]
    B_I2 = rows_b - C.BARRIER_I1
    B_D2 = rows_b - C.BARRIER_D1
    B_I2b = Cc - 1

    call1 = jnp.concatenate(
        [jnp.full((1, T), 99, jnp.int32), reads_ref[:, :].astype(jnp.int32)],
        axis=0,
    )
    call0 = jnp.concatenate(
        [jnp.full((2, T), 98, jnp.int32), reads_ref[:-1, :].astype(jnp.int32)],
        axis=0,
    )

    def init_diag(dd):
        c = dd - rr
        return jnp.where(
            c == 0,
            jnp.broadcast_to(col0v, (W, T)),
            jnp.where(rr == 0, _i32(0), _i32(NEG_BIG)),
        ).astype(jnp.int32)

    @pl.when(step == 0)
    def _init():
        s0 = init_diag(0)
        s1 = init_diag(1)
        z = jnp.zeros((W, T), jnp.int32)
        for ref_, val in (
            (sc_ms_s2, s0), (sc_del_s2, s0), (sc_ins_s2, s0),
            (sc_ms_s1, s1), (sc_del_s1, s1), (sc_ins_s1, s1),
            (sc_ms_t1, z), (sc_del_t1, z), (sc_ins_t1, z),
            (sc_ms_t2, z), (sc_del_t2, z), (sc_ins_t2, z),
        ):
            ref_[:, :] = val
        ref1_reg[:, :] = init_ref1_ref[:, :].astype(jnp.int32)
        for st in range(3):
            best_s[st, :] = jnp.full((T,), NEG_BIG, jnp.int32)
            best_c[st, :] = jnp.full((T,), -1, jnp.int32)

    maxgain = (rows_b[0:1, :] - 1) * C.POINTS_MATCH2 + C.POINTS_MATCH
    subfloor = -2 * maxgain  # [1, T]

    def shift_row(x):
        return jnp.concatenate([jnp.zeros((1, T), x.dtype), x[:-1, :]], axis=0)

    c = d - rr
    # advance the ref shift registers: ref0(d) = ref1(d-1);
    # ref1(d)[0] = entering code, ref1(d)[r] = ref1(d-1)[r-1]
    prev_ref1 = ref1_reg[:, :]
    ref0 = prev_ref1
    # entering code refp[d+R+1], delivered as one [1, T] row per grid
    # step by the BlockSpec pipeline from the pre-sliced enter matrix
    # (refp[:, R+3 : R+3+nd], shaped [nd, 1, B] so the block's last two
    # dims satisfy Mosaic's divisible-or-equal rule) — no in-kernel
    # extraction work at all
    enter = enter_ref[0, :, :].astype(jnp.int32)  # [1, T]
    ref1 = jnp.concatenate([enter, prev_ref1[:-1, :]], axis=0)
    ref1_reg[:, :] = ref1

    # everything below that does not read the diagonal banks is
    # parity-independent and computed once
    in_range = (rr >= 1) & (c >= 1)
    match = (call1 == ref1) & (ref1 < 4)
    prev_match = (call0 == ref0) & (ref0 < 4)
    refn = ref1 >= 4
    del_barrier = (rr < C.BARRIER_D1) | (rr > B_D2)
    ins_barrier = ((rr < C.BARRIER_I1) & (c > 1)) | (
        (rr > B_I2) & (c < B_I2b)
    )
    bnd_s = jnp.where(
        c == 0,
        jnp.broadcast_to(col0v, (W, T)),
        jnp.where(rr == 0, _i32(0), _i32(NEG_BIG)),
    ).astype(jnp.int32)
    use_bnd = ~in_range
    fin_mask = rr == rows_b
    fin_c = d - rows_b[0, :]
    valid_fin = (fin_c >= 1) & (fin_c <= Cc)

    def diag_step(q_ms_s, q_ms_t, q_del_s, q_del_t, q_ins_s, q_ins_t,
                  p_ms_s_ref, p_del_s_ref, p_del_t_ref, p_ins_s_ref,
                  p_ins_t_ref):
        """Compute diagonal d from the d-1 bank (p refs) and d-2 bank
        (q refs), writing the new diagonal over the q bank in place."""
        s_diag = shift_row(q_ms_s[:, :])
        s_del = shift_row(q_del_s[:, :])
        s_ins = shift_row(q_ins_s[:, :])
        streak = shift_row(q_ms_t[:, :])
        m_sMS = jnp.where(
            match,
            s_diag
            + jnp.where(prev_match, _i32(C.POINTS_MATCH2), _i32(C.POINTS_MATCH)),
            jnp.where(
                (ref1 < 4) & (call1 < 4),
                s_diag
                + jnp.where(
                    prev_match,
                    jnp.where(
                        streak <= 1, _i32(C.POINTS_SUBR), _i32(C.POINTS_SUB)
                    ),
                    _sub_array_cost(streak),
                ),
                s_diag + C.POINTS_NOCALL,
            ),
        )
        m_sD = s_del + jnp.where(match, _i32(C.POINTS_MATCH), _i32(C.POINTS_SUB))
        m_sI = s_ins + jnp.where(match, _i32(C.POINTS_MATCH), _i32(C.POINTS_SUB))
        pick_ms = (m_sMS >= m_sD) & (m_sMS >= m_sI)
        pick_d = ~pick_ms & (m_sD >= m_sI)
        ms_score = jnp.where(pick_ms, m_sMS, jnp.where(pick_d, m_sD, m_sI))
        ms_time = jnp.where(
            pick_ms,
            jnp.where(
                match,
                jnp.where(prev_match, streak + 1, _i32(1)),
                jnp.where(prev_match, _i32(1), streak + 1),
            ),
            _i32(1),
        )
        p1_ms_s = p_ms_s_ref[:, :]
        p1_del_s = p_del_s_ref[:, :]
        p1_del_t = p_del_t_ref[:, :]
        p1_ins_s = p_ins_s_ref[:, :]
        p1_ins_t = p_ins_t_ref[:, :]
        d_sMS = p1_ms_s + C.POINTS_DEL
        d_sD = p1_del_s + _del_ext_cost(p1_del_t)
        d_sMS = d_sMS + jnp.where(refn, _i32(C.POINTS_DEL_REF_N), _i32(0))
        d_sD = d_sD + jnp.where(refn, _i32(C.POINTS_DEL_REF_N), _i32(0))
        d_pick = d_sMS >= d_sD
        del_score = jnp.where(d_pick, d_sMS, d_sD)
        del_time = jnp.where(d_pick, _i32(1), p1_del_t + 1)
        i_sMS = shift_row(p1_ms_s) + C.POINTS_INS
        i_streak = shift_row(p1_ins_t)
        i_sI = shift_row(p1_ins_s) + _ins_array_cost(i_streak)
        i_pick = i_sMS >= i_sI
        ins_score = jnp.where(i_pick, i_sMS, i_sI)
        ins_time = jnp.where(i_pick, _i32(1), i_streak + 1)
        if traceback:
            # predecessor-state plane, identical encoding to the XLA fill:
            # ms_prev | del_prev<<2 | ins_prev<<4 (picks computed
            # pre-barrier, matching msa.py msa_fill traceback=True)
            ms_prev = jnp.where(
                pick_ms, _i32(0), jnp.where(pick_d, _i32(1), _i32(2))
            )
            del_prev = jnp.where(d_pick, _i32(0), _i32(1))
            ins_prev = jnp.where(i_pick, _i32(0), _i32(2))
            out_pl_ref[0, :, :] = (
                ms_prev + del_prev * _i32(4) + ins_prev * _i32(16)
            )
        del_score = jnp.where(del_barrier, subfloor, del_score)
        del_time = jnp.where(del_barrier, _i32(0), del_time)
        ins_score = jnp.where(ins_barrier, subfloor, ins_score)
        ins_time = jnp.where(ins_barrier, _i32(0), ins_time)
        ms_time = jnp.where(
            ms_time > C.MAX_TIME, _i32(C.MAX_TIME - C.MASK5), ms_time
        )
        del_time = jnp.where(
            del_time > C.MAX_TIME, _i32(C.MAX_TIME - C.MASK5), del_time
        )
        ins_time = jnp.where(
            ins_time > C.MAX_TIME, _i32(C.MAX_TIME - C.MASK5), ins_time
        )
        ms_score = jnp.where(use_bnd, bnd_s, ms_score)
        del_score = jnp.where(use_bnd, bnd_s, del_score)
        ins_score = jnp.where(use_bnd, bnd_s, ins_score)
        ms_time = jnp.where(use_bnd, _i32(0), ms_time)
        del_time = jnp.where(use_bnd, _i32(0), del_time)
        ins_time = jnp.where(use_bnd, _i32(0), ins_time)
        # final-row extraction: r == rows_b, c = d - rows_b
        for st, s_plane in ((0, ms_score), (1, del_score), (2, ins_score)):
            fs = jnp.max(jnp.where(fin_mask, s_plane, _i32(NEG_BIG)), axis=0)
            cand = valid_fin & (fs > best_s[st, :])
            best_s[st, :] = jnp.where(cand, fs, best_s[st, :])
            best_c[st, :] = jnp.where(cand, fin_c, best_c[st, :])
        # the new diagonal replaces d-2 in place; banks swap roles next step
        q_ms_s[:, :] = ms_score
        q_ms_t[:, :] = ms_time
        q_del_s[:, :] = del_score
        q_del_t[:, :] = del_time
        q_ins_s[:, :] = ins_score
        q_ins_t[:, :] = ins_time

    bank_a = (sc_ms_s1, sc_ms_t1, sc_del_s1, sc_del_t1, sc_ins_s1, sc_ins_t1)
    bank_b = (sc_ms_s2, sc_ms_t2, sc_del_s2, sc_del_t2, sc_ins_s2, sc_ins_t2)

    parity = jax.lax.rem(step, jnp.int32(2))

    @pl.when(parity == jnp.int32(0))
    def _even():
        # d-1 in bank A, d-2 in bank B (init puts diag1 in A, diag0 in B)
        diag_step(*bank_b, bank_a[0], bank_a[2], bank_a[3], bank_a[4],
                  bank_a[5])

    @pl.when(parity == jnp.int32(1))
    def _odd():
        diag_step(*bank_a, bank_b[0], bank_b[2], bank_b[3], bank_b[4],
                  bank_b[5])

    @pl.when(step == nd - 1)
    def _finish():
        # combine states in state-major order with strict >
        bs = best_s[0, :]
        bc = best_c[0, :]
        bst = jnp.where(bc >= 0, _i32(0), _i32(-1))
        for st in (1, 2):
            s = best_s[st, :]
            c2 = best_c[st, :]
            take = s > bs
            bs = jnp.where(take, s, bs)
            bc = jnp.where(take, c2, bc)
            bst = jnp.where(take, _i32(st), bst)
        out_s_ref[:, 0] = bs
        out_c_ref[:, 0] = bc
        out_st_ref[:, 0] = bst


@partial(jax.jit, static_argnames=("R", "Cc", "tile", "interpret", "traceback"))
def msa_fill_pallas(R: int, Cc: int, reads, read_lens, refp, tile: int = 8,
                    interpret: bool = False, traceback: bool = False):
    """Unpruned MSA fill. refp must be pre-padded: [B, Cc + 2R + 4] with
    sentinel 97 in the R+2 pads (same layout msa_fill builds internally).
    Returns (max_score, max_col, max_state) int32 [B]; with traceback=True
    also returns prevState planes uint8 [D, B, R+1] (msa_walk layout).
    """
    from .msa import col0_scores

    B = reads.shape[0]
    W = R + 1
    nd = R + Cc - 1  # diagonals 2 .. R+Cc
    col0 = jnp.asarray(col0_scores(R), dtype=jnp.int32).reshape(W, 1)
    # ref1 register init (diagonal 1): ref1(1)[r] = refp[R+2-r], r=0..R
    # (cols 2..R+2 reversed; the reverse runs in XLA, outside the kernel)
    init_ref1 = refp[:, 2 : W + 2][:, ::-1].T  # [W, B]
    # entering code for step s (diagonal d = s+2) is refp[:, d + R + 1]
    enter_mat = refp[:, R + 3 : R + 3 + nd].T[:, None, :]  # [nd, 1, B]
    grid = (B // tile, nd)
    kernel = partial(_kernel, R, Cc, nd, traceback)
    out_shape = [
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((tile, 1), lambda i, s: (i, s - s), memory_space=pltpu.VMEM)
        for _ in range(3)
    ]
    if traceback:
        # planes land transposed [nd, W, B]; un-transposed to the
        # msa_walk layout [nd, B, W] in XLA on return
        out_shape.append(jax.ShapeDtypeStruct((nd, W, B), jnp.int32))
        out_specs.append(
            pl.BlockSpec(
                (1, W, tile), lambda i, s: (s, i - i, i),
                memory_space=pltpu.VMEM,
            )
        )
    scr = [pltpu.VMEM((W, tile), jnp.int32) for _ in range(12)]
    scr += [pltpu.VMEM((W, tile), jnp.int32)]  # ref1 shift register
    scr += [pltpu.VMEM((3, tile), jnp.int32), pltpu.VMEM((3, tile), jnp.int32)]
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, tile), lambda i, s: (s - s, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, s: (s - s, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, tile), lambda i, s: (s, s - s, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((W, tile), lambda i, s: (s - s, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 1), lambda i, s: (s - s, s - s), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scr,
        interpret=interpret,
    )(
        reads.astype(jnp.int32).T,
        read_lens.reshape(1, B).astype(jnp.int32),
        enter_mat.astype(jnp.int32),
        init_ref1.astype(jnp.int32),
        col0,
    )
    out = tuple(r[:, 0] for r in res[:3])
    if traceback:
        return out + (jnp.transpose(res[3], (0, 2, 1)).astype(jnp.uint8),)
    return out


def use_pallas() -> bool:
    """Pallas MSA backend gate: on TPU unless BBTOOLS_MSA_PALLAS=0."""
    import os

    flag = os.environ.get("BBTOOLS_MSA_PALLAS", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return jax.devices()[0].platform == "tpu"


def msa_fill_tb_auto(R: int, Cc: int, reads, read_lens, refs):
    """Unpruned fill WITH traceback planes; Pallas kernel on TPU, XLA
    wavefront elsewhere. All tasks must have full-width refs
    (ref_lens == Cc). numpy in, jax arrays out:
    (max_score, max_col, max_state, planes).
    """
    from . import msa as msa_mod

    B = reads.shape[0]
    if use_pallas():
        # tile = lanes per grid step; 128 measured fastest at B=512 in the
        # transposed layout (11.5G cells/s vs 10.9G at 256, in-graph
        # slope timing). Tiles below 128 lanes are legal only when
        # tile == padded batch (block == array dim), which the padding
        # below guarantees. Small static set -> a handful of compile
        # cache entries
        tile = 128 if B > 32 else (32 if B > 8 else 8)
        Bp = ((B + tile - 1) // tile) * tile
        if Bp != B:
            pad = Bp - B
            reads = np.concatenate([reads, np.repeat(reads[:1], pad, 0)], 0)
            read_lens = np.concatenate(
                [read_lens, np.repeat(read_lens[:1], pad, 0)], 0
            )
            refs = np.concatenate([refs, np.repeat(refs[:1], pad, 0)], 0)
        refp = prepare_refp(np.asarray(refs), R)
        bs, bc, bst, planes = msa_fill_pallas(
            R, Cc, jnp.asarray(reads), jnp.asarray(read_lens),
            jnp.asarray(refp), tile=tile, traceback=True,
        )
        return bs[:B], bc[:B], bst[:B], planes[:, :B]
    maxgain = (
        read_lens.astype(np.int64) - 1
    ) * C.POINTS_MATCH2 + C.POINTS_MATCH
    subfloor = -2 * maxgain
    ref_lens = np.full(B, Cc, np.int32)
    vert, horiz, floor, _ = msa_mod.prepare_limits_np(
        reads, read_lens, refs, ref_lens, np.zeros(B, np.int64)
    )
    return msa_mod.msa_fill(
        R, Cc, False, True,
        jnp.asarray(reads), jnp.asarray(read_lens.astype(np.int32)),
        jnp.asarray(refs), jnp.asarray(ref_lens),
        jnp.asarray(vert.astype(np.int32)), jnp.asarray(horiz.astype(np.int32)),
        jnp.asarray(floor.astype(np.int32)),
        jnp.asarray(subfloor.astype(np.int32)),
    )


def prepare_refp(refs: np.ndarray, R: int) -> np.ndarray:
    """Pad ref windows to the kernel's layout: [B, Cc + 2(R+2)]."""
    B, Cc = refs.shape
    PAD = R + 2
    out = np.full((B, Cc + 2 * PAD), 97, dtype=np.uint8)
    out[:, PAD : PAD + Cc] = refs
    return out
