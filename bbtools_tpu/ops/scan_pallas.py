"""Pallas TPU scan kernels: single-pass inclusive cummax over int64.

XLA's lax.cummax on a flat vector runs ~2.7 ms per million int64 on a
v5e (~5 GB/s effective — tools/exp_join_profile.py), 100x below HBM
bandwidth; it dominates the sorted-join backend's non-sort time. The
TPU grid executes sequentially, so a classic block-scan works in ONE
HBM pass: each grid step does a log-shift max-scan of its block in
VMEM, adds the carry from the previous block, and updates the carry.

int64 values are split into (hi int32, lo-biased int32) planes and all
maxes run as lexicographic pair-maxes on int32 — Mosaic's int64 lane
support is partial (ops/lane_index splits keys the same way). The bias
(XOR 1<<31) makes unsigned lo-comparison an int32 comparison.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8  # sublane dimension of a block (TPU tiling requirement)
COLS = 1 << 12  # lanes per row; block = 8x4096 int32 x2 planes = 256 KB
BLOCK = ROWS * COLS
_MIN32 = np.int32(-(2**31))


def _pair_max(ah, al, bh, bl):
    take_b = (bh > ah) | ((bh == ah) & (bl > al))
    return jnp.where(take_b, bh, ah), jnp.where(take_b, bl, al)


def _shift_axis1(x, s, fill):
    return jnp.concatenate(
        [jnp.full((x.shape[0], s), fill, x.dtype), x[:, :-s]], axis=1
    )


def _shift_axis0(x, s, fill):
    return jnp.concatenate(
        [jnp.full((s, x.shape[1]), fill, x.dtype), x[:-s, :]], axis=0
    )


def _cummax_kernel(hi_ref, lo_ref, oh_ref, ol_ref, carry):
    """Block = [ROWS, COLS]; the flat element order is row-major, so:
    per-row log-shift scans, then an exclusive prefix over the 8 row
    maxes (log-shift along the sublane axis), then the cross-block
    carry (grid steps run sequentially on TPU)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        # carry rows 0..ROWS-1 = hi, ROWS..2*ROWS-1 = lo; kept as [8,1]
        # slabs so every broadcast below is single-axis (Mosaic has no
        # combined sublane+lane broadcast)
        carry[:, :] = jnp.full(carry.shape, _MIN32, jnp.int32)

    h = hi_ref[:, :]  # [ROWS, COLS]
    lo = lo_ref[:, :]
    s = 1
    while s < COLS:
        h, lo = _pair_max(
            h, lo, _shift_axis1(h, s, _MIN32), _shift_axis1(lo, s, _MIN32)
        )
        s *= 2
    # row maxes broadcast to full width (narrow [8,1] vectors don't
    # lower; full-width ops do), then inclusive prefix over rows via
    # sublane log-shifts, exclusive via one more shift
    rmh = jnp.broadcast_to(h[:, COLS - 1 : COLS], (ROWS, COLS))
    rml = jnp.broadcast_to(lo[:, COLS - 1 : COLS], (ROWS, COLS))
    ph, pl_ = rmh, rml
    s = 1
    while s < ROWS:
        ph, pl_ = _pair_max(
            ph, pl_, _shift_axis0(ph, s, _MIN32), _shift_axis0(pl_, s, _MIN32)
        )
        s *= 2
    exh = _shift_axis0(ph, 1, _MIN32)
    exl = _shift_axis0(pl_, 1, _MIN32)
    h, lo = _pair_max(h, lo, exh, exl)
    ch = carry[0:ROWS, 0:1]  # [ROWS, 1] -> lane-only broadcast below
    cl = carry[ROWS : 2 * ROWS, 0:1]
    h, lo = _pair_max(h, lo, ch, cl)
    oh_ref[:, :] = h
    ol_ref[:, :] = lo
    # block max = last row's inclusive prefix, already carry-free; fold
    # in the old carry and replicate down the sublanes ([ROWS,1] slab)
    nh, nl = _pair_max(
        ph[ROWS - 1 :, COLS - 1 :], pl_[ROWS - 1 :, COLS - 1 :],
        ch[0:1, :], cl[0:1, :],
    )
    carry[0:ROWS, 0:1] = jnp.broadcast_to(nh, (ROWS, 1))
    carry[ROWS : 2 * ROWS, 0:1] = jnp.broadcast_to(nl, (ROWS, 1))


@jax.jit
def cummax_i64_pallas(v):
    """Inclusive cummax of int64 [N]; pads internally to a BLOCK multiple
    with INT64_MIN (identity)."""
    n = v.shape[0]
    R = -(-n // BLOCK)
    pad = R * BLOCK - n
    if pad:
        v = jnp.concatenate(
            [v, jnp.full(pad, np.int64(-(2**63)), jnp.int64)]
        )
    hi = (v >> 32).astype(jnp.int32).reshape(R * ROWS, COLS)
    # biased low half: unsigned order -> signed int32 order
    lo = (
        (v & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
        ^ jnp.uint32(1 << 31)
    ).astype(jnp.int32).reshape(R * ROWS, COLS)
    oh, ol = pl.pallas_call(
        _cummax_kernel,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((ROWS, COLS), lambda i: (i, i - i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, COLS), lambda i: (i, i - i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ROWS, COLS), lambda i: (i, i - i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, COLS), lambda i: (i, i - i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R * ROWS, COLS), jnp.int32),
            jax.ShapeDtypeStruct((R * ROWS, COLS), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((2 * ROWS, 128), jnp.int32)],
    )(hi, lo)
    lo_u = (ol.reshape(-1).astype(jnp.uint32) ^ jnp.uint32(1 << 31))
    out = (
        (oh.reshape(-1).astype(jnp.int64) << 32)
        | lo_u.astype(jnp.int64)
    )
    return out[:n]
