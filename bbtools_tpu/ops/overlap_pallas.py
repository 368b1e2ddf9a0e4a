"""Pallas insert-scan for BBMerge overlap counting.

The XLA version (ops/overlap.py overlap_counts_jnp) runs a lax.scan over
~2L insert candidates; every step re-reads both full [B, L] read planes
from HBM, so the scan is HBM-bound at ~n_inserts x 2 x B x L x 4 bytes of
traffic. This kernel keeps one tile of read pairs resident in VMEM and
walks all inserts in-register, so the whole scan touches HBM once per
read pair (the reference's per-pair pointer walk,
jgi/BBMergeOverlapper.java:368-505, has the same single-pass data reuse —
per thread; here it is per VMEM tile on the VPU).

Layout: reads are TRANSPOSED to [position, read] so the per-insert mate
window is a SUBLANE slice, with reads riding the 128-wide lane dimension.
Insert d's mate segment for read column r is b_pad[P + L - ins + i, r] —
the same right-justified alignment the XLA scan uses, so results are
bit-identical (tests/test_bbmerge.py asserts equality against both the
XLA path and the Java-oracle transliteration).

Mosaic constraint: dynamic sublane-slice starts must be provably
8-aligned, so inserts run in blocks of 8 — one aligned dynamic copy of a
[Ls+16, T] window into scratch per block (start written as
(F - db) * 8), then eight STATIC-offset window slices, and one aligned
8-row block store per output plane.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE_READS = 256  # reads per grid step (2 lane tiles)


def _kernel(L, Ls, P, D, min0, a_ref, b_ref, al_ref, bl_ref,
            g_ref, bd_ref, o_ref, win_ref):
    T = a_ref.shape[1]
    ai = a_ref[:, :]  # [Ls, T]
    al = al_ref[0:1, :]  # [1, T]
    bl = bl_ref[0:1, :]
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (Ls, T), 0)
    a_lt4 = ai < 4
    S0 = P + L - min0  # slice start for insert d is S0 - d (>= 1 for all d)
    F = (S0 - 7) // 8  # static; F >= db for every block (see module doc)
    Ws = win_ref.shape[0]
    NB = (D + 7) // 8

    def body(db, carry):
        # aligned dynamic window copy: start is literally (F - db) * 8
        base = (jnp.int32(F) - db) * jnp.int32(8)
        win_ref[:, :] = b_ref[pl.ds(pl.multiple_of(base, 8), Ws), :]
        g_rows, bd_rows, o_rows = [], [], []
        for r in range(8):
            off = S0 - 8 * F - r  # static, in [0, 14]
            ins = jnp.int32(min0 + r) + db * jnp.int32(8)
            bseg = win_ref[off : off + Ls, :]
            valid = (i_idx < jnp.minimum(al, ins)) & (
                i_idx >= jnp.maximum(ins - bl, 0)
            )
            match = valid & (ai == bseg)
            # explicit accumulator dtype: under x64 jnp.sum(int32) promotes
            # to int64 (numpy default-int), which Mosaic cannot lower
            g_rows.append(jnp.sum(
                (match & a_lt4).astype(jnp.int32), axis=0, keepdims=True,
                dtype=jnp.int32,
            ))
            bd_rows.append(jnp.sum(
                (valid & (ai != bseg)).astype(jnp.int32), axis=0,
                keepdims=True, dtype=jnp.int32,
            ))
            o_rows.append(jnp.sum(
                valid.astype(jnp.int32), axis=0, keepdims=True,
                dtype=jnp.int32,
            ))
        dst = pl.ds(pl.multiple_of(db * jnp.int32(8), 8), 8)
        g_ref[dst, :] = jnp.concatenate(g_rows, axis=0)
        bd_ref[dst, :] = jnp.concatenate(bd_rows, axis=0)
        o_ref[dst, :] = jnp.concatenate(o_rows, axis=0)
        return carry

    # int32 loop bounds: python-int bounds make the induction variable
    # int64 under x64, and Mosaic's int64->int32 convert recurses forever
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(NB), body, jnp.int32(0))


def _pad_to(x, m):
    return (x + m - 1) // m * m


@partial(jax.jit, static_argnames=(
    "min_insert0", "n_inserts", "interpret", "pre_justified"))
def overlap_counts_pallas(a, b_rc, alens, blens, min_insert0: int,
                          n_inserts: int, interpret: bool = False,
                          pre_justified: bool = False):
    """Drop-in equal to overlap_counts_jnp (same padding rules, same
    right-justification), insert scan fused into one VMEM-resident pass.

    pre_justified=True means b_rc is ALREADY right-justified (host prep
    via overlap.right_justify_np): the per-element device gather that
    right-justification costs (~L x B random accesses, which measures
    the gather unit rather than the scan) is skipped entirely.
    """
    B, L = a.shape
    ai = a.astype(jnp.int32)
    al = alens.astype(jnp.int32)
    bl = blens.astype(jnp.int32)
    if pre_justified:
        b_rj = b_rc.astype(jnp.int32)
    else:
        i_idx = jnp.arange(L, dtype=jnp.int32)[None, :]
        src = i_idx - (L - bl[:, None])
        b_rj = jnp.take_along_axis(
            b_rc.astype(jnp.int32),
            jnp.clip(src, 0, L - 1).astype(jnp.int32),
            axis=1,
        )
    max_ins = min_insert0 + n_inserts - 1
    P = max(max_ins - L, 0) + 1
    Ls = _pad_to(L + 1, 8)
    # guard pad: the last 8-insert block may contain padding inserts past
    # n_inserts whose nominal window starts fall below row 0; bump P so
    # every block's aligned base 8*(F - db) stays >= 0
    S0 = P + L - min_insert0
    NB = (n_inserts + 7) // 8
    P += 8 * max(0, NB - 1 - (S0 - 7) // 8)
    S0 = P + L - min_insert0
    Ws = Ls + 16  # block window: 8 static offsets in [0, 14] + Ls rows
    Lp = _pad_to(S0 + Ws + 8, 8)
    Bp = _pad_to(max(B, 1), TILE_READS)
    aT = jnp.full((Ls, Bp), 9, jnp.int32).at[:L, :B].set(ai.T)
    bT = jnp.full((Lp, Bp), 9, jnp.int32).at[P : P + L, :B].set(b_rj.T)
    alp = jnp.zeros((1, Bp), jnp.int32).at[:, :B].set(al[None, :])
    blp = jnp.zeros((1, Bp), jnp.int32).at[:, :B].set(bl[None, :])
    D = n_inserts
    Dp = _pad_to(D, 8)
    T = TILE_READS
    kern = partial(_kernel, L, Ls, P, D, min_insert0)
    outs = pl.pallas_call(
        kern,
        grid=(Bp // T,),
        in_specs=[
            pl.BlockSpec((Ls, T), lambda i: (i - i, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lp, T), lambda i: (i - i, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i: (i - i, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i: (i - i, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Dp, T), lambda i: (i - i, i), memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Dp, Bp), jnp.int32) for _ in range(3)
        ],
        scratch_shapes=[pltpu.VMEM((Ws, T), jnp.int32)],
        interpret=interpret,
    )(aT, bT, alp, blp)
    return tuple(o[:D, :B].T for o in outs)


def use_pallas() -> bool:
    """Overlap-scan backend gate: on TPU unless BBTOOLS_OVERLAP_PALLAS=0."""
    import os

    flag = os.environ.get("BBTOOLS_OVERLAP_PALLAS", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return jax.devices()[0].platform == "tpu"
