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

BLOCK = 1 << 15  # int64 block = 256 KB of VMEM as two int32 planes
_MIN32 = np.int32(-(2**31))


def _pair_max(ah, al, bh, bl):
    take_b = (bh > ah) | ((bh == ah) & (bl > al))
    return jnp.where(take_b, bh, ah), jnp.where(take_b, bl, al)


def _cummax_kernel(hi_ref, lo_ref, oh_ref, ol_ref, carry):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry[0, :] = jnp.full((carry.shape[1],), _MIN32, jnp.int32)
        carry[1, :] = jnp.full((carry.shape[1],), _MIN32, jnp.int32)

    h = hi_ref[:, :]  # [1, BLOCK]
    lo = lo_ref[:, :]
    # within-block inclusive scan: log-shift pair-max
    s = 1
    while s < h.shape[1]:
        hs = jnp.concatenate(
            [jnp.full((1, s), _MIN32, jnp.int32), h[:, :-s]], axis=1
        )
        ls = jnp.concatenate(
            [jnp.full((1, s), _MIN32, jnp.int32), lo[:, :-s]], axis=1
        )
        h, lo = _pair_max(h, lo, hs, ls)
        s *= 2
    ch = carry[0:1, 0:1]
    cl = carry[1:2, 0:1]
    h, lo = _pair_max(h, lo, ch, cl)
    oh_ref[:, :] = h
    ol_ref[:, :] = lo
    carry[0, 0] = h[0, h.shape[1] - 1]
    carry[1, 0] = lo[0, lo.shape[1] - 1]


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
    hi = (v >> 32).astype(jnp.int32).reshape(R, BLOCK)
    # biased low half: unsigned order -> signed int32 order
    lo = (
        (v & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
        ^ jnp.uint32(1 << 31)
    ).astype(jnp.int32).reshape(R, BLOCK)
    oh, ol = pl.pallas_call(
        _cummax_kernel,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, BLOCK), lambda i: (i, i - i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK), lambda i: (i, i - i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK), lambda i: (i, i - i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK), lambda i: (i, i - i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, BLOCK), jnp.int32),
            jax.ShapeDtypeStruct((R, BLOCK), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((2, 128), jnp.int32)],
    )(hi, lo)
    lo_u = (ol.reshape(-1).astype(jnp.uint32) ^ jnp.uint32(1 << 31))
    out = (
        (oh.reshape(-1).astype(jnp.int64) << 32)
        | lo_u.astype(jnp.int64)
    )
    return out[:n]
