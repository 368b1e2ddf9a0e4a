"""Lane-resident k-mer index: the TPU-register hash table.

XLA's HBM row-gather tops out near ~350M rows/s on a v5e chip, which
caps any gather-based k-mer scan at ~2M reads/s — BELOW the reference's
own documented 500 Mbp/s input-stream ceiling (DedupeGuide.txt:19). This
index instead keeps the whole table in VMEM *lanes* and resolves a
lookup with Mosaic's per-sublane dynamic-gather (`take_along_axis` along
the minor dim), which runs at VPU register speed: ~100x the HBM gather
rate for small tables.

Layout: `nb = groups * 128` buckets, `slots` entries per bucket. Bucket
b lives at lane `b & 127` of lane-group `b >> 7`; each (group, slot)
cell is one 128-lane row of three int32 planes (key_lo, key_hi, id).
A lookup hashes the query to (group, lane), then for every (group,
slot) pair does one broadcast + lane-gather + compare — `groups*slots*3`
register gathers per query *tile*, independent of query count within
the tile. Empty slots have id == 0; stored keys are unique (first-wins
dedup happens in build_ref_keys), so at most one slot matches.

Hash: 32-bit multiply-xor-multiply with a build-chosen salt; build
retries salts (and then grows nb) until every bucket fits in `slots`
entries. Arithmetic-shift-then-mask equals logical shift under the
mask, so the kernel stays pure int32 (TPU has no native int64).

Replaces the reference's HashArray probe chains (kmer/HashArray.java:154)
for small references — adapter/artifact/primer panels — where BBDuk
spends its scan time; large references fall back to BucketKmerIndex's
two-HBM-gather rows.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

C1 = np.int32(-1640531527)  # 0x9E3779B9 golden-ratio odd constant
C2 = np.int32(-862048943)  # 0xCC9E2D51 (murmur3 c1)
C3 = np.int32(461845907)  # 0x1B873593 (murmur3 c2)

LANES = 128


def _hash32_np(lo: np.ndarray, hi: np.ndarray, salt: int, nb: int) -> np.ndarray:
    """Bucket index; int32 wraparound arithmetic, identical to the kernel."""
    with np.errstate(over="ignore"):
        h = (
            lo.astype(np.int32) * C1
            + hi.astype(np.int32) * C2
            + np.int32(salt)
        )
        h = h ^ ((h >> np.int32(15)) & np.int32(0x1FFFF))
        h = h * C3
        sh = 32 - int(nb).bit_length() + 1
        return (h >> np.int32(sh)) & np.int32(nb - 1)


def _hash32_jnp(lo, hi, salt: int, nb: int):
    h = lo * jnp.int32(C1) + hi * jnp.int32(C2) + jnp.int32(salt)
    h = h ^ ((h >> jnp.int32(15)) & jnp.int32(0x1FFFF))
    h = h * jnp.int32(C3)
    sh = 32 - int(nb).bit_length() + 1
    return (h >> jnp.int32(sh)) & jnp.int32(nb - 1)


@dataclass
class LaneKmerIndex:
    """VMEM-lane hash table; see module docstring.

    `packed` mode (hi < 2**15 and 0 <= id < 2**16, true for adapter-scale
    panels) stores thi = (hi << 16) | id and drops the tid plane: lookups
    cost 2 register gathers per slot instead of 3.
    """

    tlo: np.ndarray  # int32 [groups * rows, LANES]
    thi: np.ndarray  # int32 [groups * rows, LANES] (packed: hi<<16 | id)
    tid: np.ndarray  # int32 [groups * rows, LANES] (packed: empty [8, LANES])
    nb: int
    groups: int
    slots: int
    rows: int  # slots padded to the sublane tile (multiple of 8)
    salt: int
    packed: bool
    n: int

    #: above this groups*slots product the HBM row-gather bucket path
    #: wins; build returns None and callers fall back. Slope-measured on
    #: v5e: the kernel costs ~9.6 ns/query per pass, the packed bucket
    #: gather runs a flat ~53M lookups/s, so the crossover sits near
    #: cost ~2000; capped a bit below it where the win is still >=1.5x
    #: (cost 224 = 565M lookups/s, 832 = 126M, 1664 = 68M)
    MAX_COST = 1280
    #: per-slot unrolled gather temps are TILE_ROWS*LANES*4B each; cap
    #: slots so scoped VMEM (16M on v5e) can hold them
    MAX_SLOTS = 24

    @staticmethod
    def supports(n_keys: int) -> bool:
        """Rough pre-check; build() may still return None."""
        return n_keys <= LaneKmerIndex.MAX_COST * LANES

    @staticmethod
    def build(keys: np.ndarray, ids: np.ndarray) -> "LaneKmerIndex | None":
        """Returns None if no layout lands under MAX_COST."""
        n = len(keys)
        if n == 0:
            return None
        keys = np.asarray(keys, dtype=np.int64)
        ids = np.asarray(ids, dtype=np.int32)
        lo = (keys & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
        hi = (keys >> 32).astype(np.int32)
        # kernel cost per query tile = groups * slots gather passes; search
        # nb for the minimum product among layouts whose max occupancy
        # respects the VMEM slot cap
        best = None
        nb = LANES
        while nb <= LANES << 10:
            for salt in range(8):
                b = _hash32_np(lo, hi, salt, nb)
                occ = np.bincount(b, minlength=nb)
                mo = int(occ.max(initial=0))
                if mo > LaneKmerIndex.MAX_SLOTS:
                    continue
                cost = (nb // LANES) * max(mo, 1)
                if best is None or cost < best[0]:
                    best = (cost, nb, salt, mo)
            nb *= 2
        if best is None or best[0] > LaneKmerIndex.MAX_COST:
            return None
        _, nb, salt, mo = best
        groups = nb // LANES
        slots = max(mo, 1)
        rows = (slots + 7) // 8 * 8
        packed = bool((hi < (1 << 15)).all() and (ids >= 0).all()
                      and (ids < (1 << 16)).all())
        b = _hash32_np(lo, hi, salt, nb)
        tlo = np.zeros((groups * rows, LANES), np.int32)
        thi = np.zeros((groups * rows, LANES), np.int32)
        order = np.argsort(b, kind="stable")
        bs = b[order]
        rank = np.arange(n) - np.searchsorted(bs, bs)
        g = bs // LANES
        lane = bs % LANES
        row = g * rows + rank
        tlo[row, lane] = lo[order]
        if packed:
            thi[row, lane] = (hi[order] << 16) | ids[order]
            tid = np.zeros((8, LANES), np.int32)
        else:
            thi[row, lane] = hi[order]
            tid = np.zeros((groups * rows, LANES), np.int32)
            tid[row, lane] = ids[order]
        return LaneKmerIndex(
            tlo, thi, tid, nb, groups, slots, rows, int(salt), packed, n
        )

    def device_arrays(self):
        return jnp.asarray(self.tlo), jnp.asarray(self.thi), jnp.asarray(self.tid)

    def lookup_np(self, query: np.ndarray) -> np.ndarray:
        qlo = (query & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
        qhi = (query >> 32).astype(np.int32)
        b = _hash32_np(qlo, qhi, self.salt, self.nb)
        g = b // LANES
        lane = b % LANES
        out = np.zeros(query.shape, np.int32)
        for s in range(self.slots):
            row = g * self.rows + s
            clo = self.tlo[row, lane]
            chi = self.thi[row, lane]
            if self.packed:
                cid = chi & 0xFFFF
                chi = chi >> 16
            else:
                cid = self.tid[row, lane]
            hit = (clo == qlo) & (chi == qhi) & (cid != 0)
            out = np.where(hit & (out == 0), cid, out)
        return out

    def static_params(self):
        """(nb, groups, slots, rows, salt, packed) for lookup_jnp."""
        return (self.nb, self.groups, self.slots, self.rows, self.salt,
                self.packed)

    @staticmethod
    def lookup_jnp(tlo, thi, tid, nb: int, groups: int, slots: int, rows: int,
                   salt: int, packed: bool, query):
        """Dispatch: Pallas lane-gather kernel on TPU, plain-XLA gather
        emulation elsewhere (identical results)."""
        if jax.devices()[0].platform == "tpu":
            return _lookup_pallas(tlo, thi, tid, nb, groups, slots, rows,
                                  salt, packed, query)
        return _lookup_xla(tlo, thi, tid, nb, groups, slots, rows, salt,
                           packed, query)


def _split_query(query):
    qlo = (query & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32).astype(jnp.int32)
    qhi = (query >> jnp.int64(32)).astype(jnp.int32)
    return qlo, qhi


def _lookup_xla(tlo, thi, tid, nb, groups, slots, rows, salt, packed, query):
    qlo, qhi = _split_query(query)
    b = _hash32_jnp(qlo, qhi, salt, nb)
    g = b // LANES
    lane = b % LANES
    out = jnp.zeros(query.shape, jnp.int32)
    for s in range(slots):
        row = g * rows + s
        clo = tlo[row, lane]
        chi = thi[row, lane]
        if packed:
            cid = chi & 0xFFFF
            chi = chi >> 16
        else:
            cid = tid[row, lane]
        hit = (clo == qlo) & (chi == qhi) & (cid != 0)
        out = jnp.where(hit & (out == 0), cid, out)
    return out


TILE_ROWS = 256  # queries per grid step = TILE_ROWS * LANES; 512 blows
# the 16M scoped-vmem limit by 72K on v5e (slots of unrolled gather temps)


def _take_lane(op, idx):
    """out[r, l] = op[r, idx[r, l]] with int32 indices (jnp.take_along_axis
    force-converts indices to int64 under x64, which Mosaic can't lower)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        op, idx[:, :, None], dnums, slice_sizes=(1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _lane_kernel(groups, slots, nb, salt, packed, qlo_ref, qhi_ref,
                 tlo_ref, thi_ref, tid_ref, out_ref):
    """Grid = (query tiles, lane groups); the group loop rides the minor
    grid dim with the out block revisited, so only `slots` gather temps
    are live at once (an in-kernel groups*slots unroll blows scoped VMEM)."""
    g = pl.program_id(1)
    qlo = qlo_ref[:, :]  # [TILE_ROWS, LANES] int32
    qhi = qhi_ref[:, :]
    h = qlo * jnp.int32(C1) + qhi * jnp.int32(C2) + jnp.int32(salt)
    h = h ^ ((h >> jnp.int32(15)) & jnp.int32(0x1FFFF))
    h = h * jnp.int32(C3)
    sh = 32 - int(nb).bit_length() + 1
    b = (h >> jnp.int32(sh)) & jnp.int32(nb - 1)
    lane = b & jnp.int32(LANES - 1)

    @pl.when(g == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(qlo)

    # no group-membership test: a stored key equal to the query hashes to
    # the query's own bucket, so cross-group lane collisions can't have
    # equal (lo, hi). Empty slots are (0, 0) and only pseudo-match padded
    # zero queries (valid keys carry the length-mask bit), writing id 0.
    out = out_ref[:, :]
    for s in range(slots):
        tl = jnp.broadcast_to(tlo_ref[s : s + 1, :], qlo.shape)
        th = jnp.broadcast_to(thi_ref[s : s + 1, :], qlo.shape)
        clo = _take_lane(tl, lane)
        chi = _take_lane(th, lane)
        if packed:
            hit = (clo == qlo) & ((chi >> jnp.int32(16)) == qhi)
            out = jnp.where(hit, chi & jnp.int32(0xFFFF), out)
        else:
            ti = jnp.broadcast_to(tid_ref[s : s + 1, :], qlo.shape)
            cid = _take_lane(ti, lane)
            out = jnp.where((clo == qlo) & (chi == qhi), cid, out)
    out_ref[:, :] = out


@partial(jax.jit, static_argnames=(
    "nb", "groups", "slots", "rows", "salt", "packed", "interpret"))
def _lookup_pallas(tlo, thi, tid, nb, groups, slots, rows, salt, packed,
                   query, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = query.shape
    qlo, qhi = _split_query(query)
    flat = qlo.size
    per = TILE_ROWS * LANES
    nt = max((flat + per - 1) // per, 1)
    pad = nt * per - flat
    qlo = jnp.pad(qlo.reshape(-1), (0, pad)).reshape(nt * TILE_ROWS, LANES)
    qhi = jnp.pad(qhi.reshape(-1), (0, pad)).reshape(nt * TILE_ROWS, LANES)
    kern = partial(_lane_kernel, groups, slots, nb, salt, packed)
    tid_rows = 8 if packed else rows
    out = pl.pallas_call(
        kern,
        grid=(nt, groups),
        # index-map zeros written as i - i: a literal 0 lowers as i64
        # under x64 and the Mosaic service rejects it
        in_specs=[
            pl.BlockSpec((TILE_ROWS, LANES), lambda i, g: (i, g - g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, LANES), lambda i, g: (i, g - g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i, g: (g, g - g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i, g: (g, g - g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tid_rows, LANES), lambda i, g: (g - g, g - g),
                         memory_space=pltpu.VMEM)
            if packed
            else pl.BlockSpec((rows, LANES), lambda i, g: (g, g - g),
                              memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_ROWS, LANES), lambda i, g: (i, g - g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt * TILE_ROWS, LANES), jnp.int32),
        interpret=interpret,
    )(qlo, qhi, tlo, thi, tid)
    return out.reshape(-1)[:flat].reshape(shape)
