"""Benchmark: BBDuk adapter-scan throughput on one TPU chip.

Runs the flagship device pipeline (packed-base transfer -> device unpack ->
rolling canonical k-mers -> hashed index lookup -> per-read trim verdict)
steady-state on synthetic 151 bp reads with planted TruSeq adapters — the
BASELINE.json config #1 shape (k=23 mink=11 hdist=1 ktrim=r).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Notes:
- Bases ship 2-bit packed + N bitmask (ops/encode.py): the dev harness
  reaches the chip through a ~13 MB/s tunnel, so the wire format is the
  bottleneck; on a real TPU host PCIe makes this moot.
- vs_baseline compares against an estimated 32-thread Java BBDuk rate; the
  image has no JVM (BASELINE.md TODO), so the constant is an estimate from
  published user numbers, not a measured row.
"""

import json
import sys
import time

import numpy as np

JAVA_32T_READS_PER_SEC = 500_000.0  # estimate; see module docstring

READ_LEN = 151
BATCH = 32768
WARMUP_BATCHES = 2
BENCH_BATCHES = 16


def main():
    sys.path.insert(0, "/root/repo")
    import jax
    import jax.numpy as jnp

    from bbtools_tpu.core.dna import encode
    from bbtools_tpu.ops.bbduk_scan import KScanConfig, kscan_full, kscan_short
    from bbtools_tpu.ops.encode import pack_bases_np, unpack_bases_jnp
    from bbtools_tpu.ops.kmer_index import BucketKmerIndex, build_ref_keys

    adapter = b"AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"
    k = 23
    keys, ids = build_ref_keys([encode(adapter)], k, mink=11, hdist=1)
    idx = BucketKmerIndex.build(keys, ids)
    cfg = KScanConfig(k=k, mink=11, nb=idx.nb)
    table = idx.device_arrays()

    rng = np.random.default_rng(42)
    acodes = encode(adapter)

    def make_batch():
        bases = rng.integers(0, 4, (BATCH, READ_LEN)).astype(np.uint8)
        n_pl = BATCH // 3
        pos = rng.integers(60, READ_LEN - 10, n_pl)
        for r, p in zip(rng.choice(BATCH, n_pl, replace=False), pos):
            m = min(len(acodes), READ_LEN - p)
            bases[r, p : p + m] = acodes[:m]
        lengths = np.full(BATCH, READ_LEN, np.int32)
        packed, nmask = pack_bases_np(bases)
        return packed, nmask, lengths

    @jax.jit
    def device_step(packed, nmask, lengths):
        bases = unpack_bases_jnp(packed, nmask, READ_LEN)
        out = kscan_full(cfg, table, bases, lengths)
        shortR = kscan_short(cfg, table, bases, lengths, False)
        # ktrim=r verdict: keep [0, min_loc-1]
        keep_to = jnp.where(out["nhits"] > 0, out["min_loc"] - 1, lengths - 1)
        return out["nhits"], out["id0"], keep_to, shortR[0]

    batches = [make_batch() for _ in range(4)]
    for i in range(WARMUP_BATCHES):
        r = device_step(*[jnp.asarray(x) for x in batches[i % len(batches)]])
        jax.block_until_ready(r)
    t0 = time.time()
    results = []
    for i in range(BENCH_BATCHES):
        b = batches[i % len(batches)]
        results.append(
            device_step(
                jax.device_put(b[0]), jax.device_put(b[1]), jax.device_put(b[2])
            )
        )
        if len(results) > 2:
            results.pop(0)  # keep pipeline depth bounded
    jax.block_until_ready(results)
    dt = time.time() - t0
    reads = BENCH_BATCHES * BATCH
    rps = reads / dt
    print(
        json.dumps(
            {
                "metric": "bbduk_scan_reads_per_sec_1chip",
                "value": round(rps, 1),
                "unit": "reads/s",
                "vs_baseline": round(rps / JAVA_32T_READS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
