"""On-chip verification: Pallas MSA kernel vs XLA wavefront, on the real TPU.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/check_pallas_tpu.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from bbtools_tpu.ops.msa import msa_fill_batch
from bbtools_tpu.ops.msa_pallas import msa_fill_pallas, prepare_refp

print("devices:", jax.devices())

rng = np.random.default_rng(7)
B, R, Cc = 256, 48, 80
reads = np.zeros((B, R), np.uint8)
rlens = (30 + rng.integers(0, R - 30 + 1, B)).astype(np.int32)
refs = rng.integers(0, 5, (B, Cc)).astype(np.uint8)  # include some Ns (code 4)
for b in range(B):
    rl = int(rlens[b])
    reads[b, :rl] = refs[b, 5 : 5 + rl] % 4
    m = rng.random(rl) < 0.08
    reads[b, :rl][m] = (reads[b, :rl][m] + rng.integers(1, 4, m.sum())) % 4
    # random indel-ish shifts: delete a base from the middle sometimes
clens = np.full(B, Cc, np.int32)

t0 = time.time()
ms, mc, mst = msa_fill_batch(
    reads, rlens, refs, clens, np.zeros(B, np.int64), prune=False
)
ms, mc, mst = np.asarray(ms), np.asarray(mc), np.asarray(mst)
print(f"XLA path: {time.time()-t0:.1f}s (incl compile)")

refp = prepare_refp(refs, R)
t0 = time.time()
ps, pc, pst = msa_fill_pallas(
    R, Cc, jnp.asarray(reads), jnp.asarray(rlens), jnp.asarray(refp),
    tile=8, interpret=False,
)
ps, pc, pst = np.asarray(ps), np.asarray(pc), np.asarray(pst)
print(f"Pallas path: {time.time()-t0:.1f}s (incl compile)")

np.testing.assert_array_equal(ms, ps)
np.testing.assert_array_equal(mc, pc)
np.testing.assert_array_equal(mst, pst)
print("BIT-EQUAL on", jax.devices()[0].platform)

# quick throughput probe (steady state)
reads_j = jnp.asarray(reads)
rlens_j = jnp.asarray(rlens)
refp_j = jnp.asarray(refp)
for name, fn in (
    ("pallas", lambda: msa_fill_pallas(R, Cc, reads_j, rlens_j, refp_j, tile=8)),
):
    fn()[0].block_until_ready()
    t0 = time.time()
    n = 20
    for _ in range(n):
        r = fn()
    r[0].block_until_ready()
    dt = (time.time() - t0) / n
    print(f"{name}: {dt*1e3:.2f} ms/batch, {B/dt:,.0f} alignments/s")

refs_j = jnp.asarray(refs)
clens_j = jnp.asarray(clens)
zf = jnp.zeros(B, jnp.int64)
def xla_fn():
    return msa_fill_batch(reads_j, rlens_j, refs_j, clens_j, zf, prune=False)
xla_fn()  # warm (returns numpy; synchronous)
t0 = time.time()
n = 20
for _ in range(n):
    r = xla_fn()
dt = (time.time() - t0) / n
print(f"xla: {dt*1e3:.2f} ms/batch, {B/dt:,.0f} alignments/s")

# --- traceback planes equality ---
from bbtools_tpu.ops.msa import msa_fill, prepare_limits_np
from bbtools_tpu.ops import msa_constants as C

maxgain = (rlens.astype(np.int64) - 1) * C.POINTS_MATCH2 + C.POINTS_MATCH
subfloor = -2 * maxgain
vert, horiz, floor, _ = prepare_limits_np(
    reads, rlens, refs, clens, np.zeros(B, np.int64)
)
xs, xc, xst, xpl = msa_fill(
    R, Cc, False, True,
    jnp.asarray(reads), jnp.asarray(rlens), jnp.asarray(refs), jnp.asarray(clens),
    jnp.asarray(vert.astype(np.int32)), jnp.asarray(horiz.astype(np.int32)),
    jnp.asarray(floor.astype(np.int32)), jnp.asarray(subfloor.astype(np.int32)),
)
ps2, pc2, pst2, ppl = msa_fill_pallas(
    R, Cc, jnp.asarray(reads), jnp.asarray(rlens), jnp.asarray(refp),
    tile=8, traceback=True,
)
np.testing.assert_array_equal(np.asarray(xs), np.asarray(ps2))
# planes may disagree only at never-walked boundary cells; compare the
# in-range region via the walk result instead: walk both and compare ops
from bbtools_tpu.ops.msa import msa_walk
xo, xn = msa_walk(R, Cc, xpl, jnp.asarray(rlens), xc, xst)
po, pn = msa_walk(R, Cc, ppl, jnp.asarray(rlens), pc2, pst2)
np.testing.assert_array_equal(np.asarray(xn), np.asarray(pn))
np.testing.assert_array_equal(np.asarray(xo), np.asarray(po))
print("TRACEBACK WALK EQUAL on", jax.devices()[0].platform)
