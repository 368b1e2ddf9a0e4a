"""Experiments: where does the adapters.fa MXU matcher step spend time,
and what do the alternative primitives cost on this chip?

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_mm_wall.py
Prints one JSON line per experiment (slope-measured, see utils/chaintime).
"""

import json
import sys
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bbtools_tpu.ops import mm_match as mm
from bbtools_tpu.utils.chaintime import slope_time

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, MINK = 23, 11
NQ = 8192 * 151


def build_panel():
    import os
    import bbtools_tpu
    from bbtools_tpu.io.fasta import iter_fasta
    from bbtools_tpu.core.dna import encode

    res = os.path.join(
        os.path.dirname(bbtools_tpu.__file__), "resources", "adapters.fa"
    )
    scaffolds = [encode(r.seq) for r in iter_fasta(res)]
    idx = mm.MMKmerIndex.build(scaffolds, K, mink=MINK, hdist=1)
    return idx


def report(name, secs, extra=None):
    d = {"exp": name, "ms_per_step": round(secs * 1e3, 3)}
    if extra:
        d.update(extra)
    print(json.dumps(d), flush=True)


# --- variant kernels -------------------------------------------------------

def _mm_kernel_maxonly(nd, oh_ref, key_ref, out_ref, best_ref):
    d = pl.program_id(1)

    @pl.when(d == 0)
    def _init():
        best_ref[:, :] = jnp.full(best_ref.shape, -(2**30), jnp.int32)

    a = oh_ref[:, :]
    b = key_ref[:, :]
    s = jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    best_ref[:, :] = jnp.maximum(
        best_ref[:, :], jnp.max(s, axis=1, keepdims=True)
    )

    @pl.when(d == nd - 1)
    def _emit():
        out_ref[:, :] = best_ref[:, :]


def _mm_kernel_matmulonly(nd, oh_ref, key_ref, out_ref, best_ref):
    d = pl.program_id(1)

    @pl.when(d == 0)
    def _init():
        best_ref[:, :] = jnp.zeros(best_ref.shape, jnp.int32)

    a = oh_ref[:, :]
    b = key_ref[:, :]
    s = jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    # cheapest possible epilogue: one strided column read per query tile
    best_ref[:, :] = best_ref[:, :] + s[:, :1]

    @pl.when(d == nd - 1)
    def _emit():
        out_ref[:, :] = best_ref[:, :]


def run_variant(kernel, keymat, oh, qt=1024, dt=512):
    N, Kp = oh.shape
    Dp = keymat.shape[1]
    Np = ((N + qt - 1) // qt) * qt
    if Np != N:
        oh = jnp.pad(oh, ((0, Np - N), (0, 0)))
    nd = Dp // dt
    grid = (Np // qt, nd)
    return pl.pallas_call(
        partial(kernel, nd),
        grid=grid,
        in_specs=[
            pl.BlockSpec((qt, Kp), lambda i, d: (i, d - d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, dt), lambda i, d: (i - i, d),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qt, 1), lambda i, d: (i, d - d),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((qt, 1), jnp.int32)],
    )(oh, keymat)


def main():
    dev = jax.devices()[0]
    print(json.dumps({"platform": dev.platform}), flush=True)
    idx = build_panel()
    print(json.dumps({
        "n_raw": idx.n_raw, "Dp": idx.Dp, "Kp": idx.Kp
    }), flush=True)

    rng = np.random.default_rng(0)
    q_host = rng.integers(0, 1 << 46, NQ, dtype=np.int64)
    q = jnp.asarray(q_host)
    keymat, prio = idx.device_arrays()

    # 0) one-hot build alone
    def step_oh(i):
        qq = jnp.roll(q, i)
        return mm._query_onehot_jnp(qq, K, MINK, idx.Kp)

    report("onehot_build", slope_time(step_oh, 4, 12))

    oh = mm._query_onehot_jnp(q, K, MINK, idx.Kp)
    oh = jax.device_put(oh)

    # 1) current full kernel (one-hot prebuilt; isolates kernel cost)
    def step_full(i):
        return mm._mm_pallas(keymat, prio, jnp.roll(oh, i, axis=0))

    report("mm_full_Dp%d" % idx.Dp, slope_time(step_full, 2, 6))

    # 2) matmul-only
    def step_mat(i):
        return run_variant(_mm_kernel_matmulonly, keymat,
                           jnp.roll(oh, i, axis=0))

    report("mm_matmulonly", slope_time(step_mat, 2, 6))

    # 3) max-only epilogue
    def step_max(i):
        return run_variant(_mm_kernel_maxonly, keymat,
                           jnp.roll(oh, i, axis=0))

    report("mm_maxonly", slope_time(step_max, 2, 6))

    # 4) full epilogue at stage-1 column count (1792)
    km1 = jnp.asarray(idx.keymat[:, :1792])
    pr1 = jnp.asarray(idx.prio[:, :1792])

    def step_small(i):
        return mm._mm_pallas(km1, pr1, jnp.roll(oh, i, axis=0))

    report("mm_full_Dp1792", slope_time(step_small, 2, 8))

    # 5) bigger query tile (fewer grid steps, same work)
    def step_qt4096(i):
        N, Kp = oh.shape
        oh_i = jnp.roll(oh, i, axis=0)
        Dp = keymat.shape[1]
        qt, dt = 2048, 512
        Np = ((N + qt - 1) // qt) * qt
        ohp = jnp.pad(oh_i, ((0, Np - N), (0, 0)))
        nd = Dp // dt
        out = pl.pallas_call(
            partial(mm._mm_kernel, nd),
            grid=(Np // qt, nd),
            in_specs=[
                pl.BlockSpec((qt, Kp), lambda a, d: (a, d - d),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Kp, dt), lambda a, d: (a - a, d),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dt), lambda a, d: (d - d, d),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((qt, 1), lambda a, d: (a, d - d),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Np, 1), jnp.int32),
            scratch_shapes=[pltpu.VMEM((qt, 1), jnp.int32)],
        )(oh_i, keymat, prio)
        return out

    report("mm_full_qt2048", slope_time(step_qt4096, 2, 6))

    # 6) sort rates
    big = jnp.asarray(rng.integers(0, 1 << 62, NQ + 220000, dtype=np.int64))
    pay = jnp.asarray(rng.integers(0, 1 << 31, NQ + 220000, dtype=np.int32))

    def step_sort1(i):
        return jnp.sort(jnp.roll(big, i) + i)

    report("sort_int64_1.4M_keysonly", slope_time(step_sort1, 2, 6))

    def step_sort2(i):
        k2, p2 = jax.lax.sort(
            (jnp.roll(big, i) + i, pay), num_keys=1
        )
        return k2[:8], p2[:8]

    report("sort_int64+payload_1.4M", slope_time(step_sort2, 2, 6))

    def step_sort32(i):
        return jnp.sort(jnp.roll(pay, i) + i)

    report("sort_int32_1.4M", slope_time(step_sort32, 2, 6))


if __name__ == "__main__":
    main()
