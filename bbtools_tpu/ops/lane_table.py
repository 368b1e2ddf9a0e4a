"""Small-table lookups without the gather wall.

TPU per-row random access (gather/scatter) runs ~50M rows/s regardless
of table size — lethal for the [B, D]-shaped lookups into tiny constant
tables (quality/increment tables of a few hundred entries) that BBTools
semantics require for bit-exactness (the tables encode sequential-f32
rounding, so no closed form exists). Mosaic DOES provide register-speed
dynamic indexing along the 128-lane minor axis; this module tiles a
<=1024-entry table across ceil(n/128) lane rows and resolves a lookup
with that many broadcast+lane-gather+select passes per [256, 128] query
tile (~120G elements/s measured) — the same trick as
lane_index.LaneKmerIndex, packaged for plain value tables.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
TILE_ROWS = 256


def _kernel(nrows, idx_ref, tab_ref, out_ref):
    idx = idx_ref[:, :]  # [TILE_ROWS, LANES] int32
    lane = idx & jnp.int32(LANES - 1)
    row = idx >> jnp.int32(7)
    from .lane_index import _take_lane

    out = jnp.zeros(idx.shape, tab_ref.dtype)
    for r in range(nrows):
        vals = _take_lane(
            jnp.broadcast_to(tab_ref[r : r + 1, :], idx.shape), lane
        )
        out = jnp.where(row == r, vals, out)
    out_ref[:, :] = out


@partial(jax.jit, static_argnames=("interpret",))
def _lookup_pallas(table2d, idx, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nrows = table2d.shape[0]
    shape = idx.shape
    flat = idx.reshape(-1).astype(jnp.int32)
    per = TILE_ROWS * LANES
    nt = max((flat.size + per - 1) // per, 1)
    pad = nt * per - flat.size
    q = jnp.pad(flat, (0, pad)).reshape(nt * TILE_ROWS, LANES)
    out = pl.pallas_call(
        partial(_kernel, nrows),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, i - i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nrows, LANES), lambda i: (i - i, i - i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, i - i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, table2d.dtype),
        interpret=interpret,
    )(q, table2d)
    return out.reshape(-1)[: flat.size].reshape(shape)


def pack_table(table: np.ndarray):
    """Host-side: pad a 1-D table to [ceil(n/128), 128] for lookup()."""
    table = np.asarray(table)
    n = len(table)
    assert n <= 2048, "lane table capped at 16 rows"
    rows = (n + LANES - 1) // LANES
    out = np.zeros((rows, LANES), table.dtype)
    out.reshape(-1)[:n] = table
    return out


def lookup(table2d, idx):
    """out[...] = table2d.reshape(-1)[idx]; idx int in range. Pallas
    lane-gather on TPU, plain take elsewhere (identical results)."""
    if jax.devices()[0].platform == "tpu":
        return _lookup_pallas(table2d, idx)
    return jnp.take(table2d.reshape(-1), idx)
