"""Benchmark suite: the five BASELINE.json configs on one TPU chip.

Each section times DEVICE COMPUTE steady-state and the host->device
TRANSFER rate separately, because the dev harness reaches the chip
through a slow tunnel; BASELINE.md records both so the compute numbers
are not conflated with link speed. An end-to-end BBDuk row (real gzipped
FASTQ from disk -> FastqReader -> device scan -> trimmed FASTQ out) is
also reported.

TIMING METHODOLOGY: on TPU every device row uses the in-graph slope
(bbtools_tpu/utils/chaintime.slope_time) — M chained invocations inside
one fori_loop with per-iteration input rolls, completion forced by a
scalar checksum pull, per-step time taken as the slope between two M
values. Per-dispatch wall timing through this harness measures the
tunnel (~20 ms dispatch floor; block_until_ready returns at dispatch
acknowledgement, and identical executions can be served from a cache),
not the device; the slope cancels dispatch, RTT, caching, and compile
exactly.

Baselines are the reference's OWN published numbers (no JVM in this
image; derivations recorded in BASELINE.md):
- 500 Mbp/s: documented per-stream input ceiling of the Java pipeline
  (docs/guides/DedupeGuide.txt:19) — an upper bound on any
  single-input-stream Java tool (BBDuk config #1), generous to Java.
- 42 Mbp/s mapping peak on 4 cores (docs/changelog.txt:4950), scaled
  linearly to 32 threads = 336 Mbp/s (again generous: BBMap scaling is
  sublinear past NUMA boundaries).

Prints ONE JSON line: the flagship metric (BBDuk device-compute bases/s
vs the 8x-of-stream-ceiling target) with every other config's result in
"extras".

SURVIVAL CONTRACT (round 4): the driver runs this under a timeout and a
run that dies before printing its JSON line records NOTHING (round 3
ended rc=124/parsed=null). Three defenses, in order of importance:
1. A global wall budget (BENCH_BUDGET_S env, default 540 s): sections
   run in priority order (flagship bbduk panel, khist, host ingest,
   bbmap e2e first) and any section whose cost estimate exceeds the
   remaining budget is recorded as {"skipped": "budget"} instead of run.
2. A persistent XLA compilation cache (.jax_cache/) so the warm-compile
   walls (347 s for the bbduk e2e graph alone in round 2, more for the
   bbmap window classes in round 3) are paid once per machine, not once
   per invocation.
3. The flagship JSON line is emitted by an atexit hook and a SIGTERM
   handler with whatever sections have completed, so even a timeout kill
   leaves a parseable record; BENCH_PARTIAL.json on disk is updated
   after every section for post-mortems.
"""

import atexit
import json
import os
import signal
import sys
import time

import numpy as np

JAVA_STREAM_CEILING_BPS = 500e6  # DedupeGuide.txt:19 (see BASELINE.md)
JAVA_MAP_32T_BPS = 336e6  # changelog.txt:4950 scaled 4c -> 32t

READ_LEN = 151
BATCH = 32768

BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "540"))
_T0 = time.monotonic()


def _remaining():
    return BUDGET_S - (time.monotonic() - _T0)


def _rng():
    return np.random.default_rng(42)


def _on_tpu():
    import jax

    return jax.devices()[0].platform == "tpu"


def make_reads(rng, batch=BATCH, L=READ_LEN, adapter=None):
    bases = rng.integers(0, 4, (batch, L)).astype(np.uint8)
    if adapter is not None:
        acodes = adapter
        n_pl = batch // 3
        pos = rng.integers(60, L - 10, n_pl)
        for r, p in zip(rng.choice(batch, n_pl, replace=False), pos):
            m = min(len(acodes), L - p)
            bases[r, p : p + m] = acodes[:m]
    lengths = np.full(batch, L, np.int32)
    return bases, lengths


def timeit_host(fn, warmup=1, iters=4):
    """Host-path wall timing (CPU backend or pure-numpy sections)."""
    import jax

    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / iters


def step_time(step_fn, m1=4, m2=12):
    """Per-invocation device time; see module docstring. step_fn(i) must
    make its work depend on the traced index i (roll an input)."""
    from bbtools_tpu.utils.chaintime import slope_time

    return slope_time(step_fn, m1=m1, m2=m2)


def bench_device_health():
    """Degraded-device canary (run FIRST and LAST): slope-time two
    fixed-cost kernels with known healthy-v5e values — a 32-deep
    elementwise fma chain over 4M f32 (VPU-bound, no autotune: a matmul
    canary spent 15+ min in tunnel autotuning and is exactly what a
    canary must not do) and a 1M-row int64 sort (healthy: ~1.6-1.8 ms).
    The dev tunnel's TPU allocation intermittently degrades ~25x
    (observed round 5: the same bbduk graph measured 128 Mb/s and
    4.9 Mb/s an hour apart); when that happens every row in the run is
    garbage, and this section is the evidence. degraded=true means:
    discard the run's device rows, keep host rows."""
    import jax
    import jax.numpy as jnp

    rng = _rng()
    NV = 1 << 22
    v = jnp.asarray(rng.standard_normal(NV).astype(np.float32))
    DEPTH = 32

    def fma(i):
        # x*(x*eps+1) per step: NONLINEAR (an affine chain x*c+d folds
        # to a single fma at compile time), numerically stable
        x = v + i.astype(jnp.float32)
        for _ in range(DEPTH):
            x = x * (x * jnp.float32(1e-9) + jnp.float32(1.0))
        return jnp.abs(x).sum()[None]

    dt_fma = step_time(fma, m1=8, m2=64)
    gflops = 3 * NV * DEPTH / dt_fma / 1e9
    big = jnp.asarray(rng.integers(0, 1 << 60, 1 << 20).astype(np.int64))

    def srt(i):
        return jnp.sort(jnp.roll(big, i))[:4]

    dt_sort = step_time(srt, m1=4, m2=16)
    # measured healthy v5e: fma chain 5886 GFLOP/s, sort 1.6-1.75 ms;
    # thresholds ~10x below healthy, well inside the observed ~25x
    # degradation
    degraded = _on_tpu() and (gflops < 500.0 or dt_sort > 10e-3)
    return {
        "fma_gflops": round(gflops, 1),
        "sort_1m_ms": round(dt_sort * 1e3, 3),
        "degraded": bool(degraded),
    }


def bench_transfer():
    """Host->device link rate for a packed read batch (quantifies the
    tunnel bottleneck; on a real TPU host this is PCIe). Completion is
    forced by a device checksum over every staged buffer + scalar pull;
    the scalar-pull RTT is measured separately and subtracted."""
    import jax
    import jax.numpy as jnp

    from bbtools_tpu.ops.encode import pack_bases_np
    from bbtools_tpu.utils.chaintime import rtt_seconds

    rng = _rng()
    bases, lengths = make_reads(rng)
    packed, nmask = pack_bases_np(bases)
    nbytes = packed.nbytes + nmask.nbytes + lengths.nbytes
    iters = 4
    variants = [
        (np.roll(packed, i, axis=0), np.roll(nmask, i, axis=0), lengths)
        for i in range(iters + 1)
    ]

    @jax.jit
    def chk(bufs):
        return sum(
            jnp.sum(b, dtype=jnp.int32) for trio in bufs for b in trio
        )

    # warm: one put + forced pull
    int(chk([tuple(map(jax.device_put, variants[-1]))]))
    rtt = rtt_seconds()
    t0 = time.perf_counter()
    staged = [tuple(map(jax.device_put, v)) for v in variants[:iters]]
    int(chk(staged))
    dt = (time.perf_counter() - t0 - rtt) / iters
    return {
        "bytes_per_sec": nbytes / dt,
        "batch_bytes": nbytes,
        "rtt_ms": round(rtt * 1e3, 1),
    }


def _bbduk_device_for_panel(scaffolds):
    """Build the production device step for a reference panel, mirroring
    models/bbduk.build_index backend selection (lane -> sorted join ->
    MXU matmul -> packed bucket); returns (step_fn, index_name, n_keys)."""
    import jax
    import jax.numpy as jnp

    from bbtools_tpu.ops.bbduk_scan import KScanConfig, kscan_combined
    from bbtools_tpu.ops.encode import unpack_bases_jnp
    from bbtools_tpu.ops.kmer_index import BucketKmerIndex, build_ref_keys
    from bbtools_tpu.ops.lane_index import LaneKmerIndex
    from bbtools_tpu.ops.mm_match import MMKmerIndex
    from bbtools_tpu.ops.sort_join import SortJoinIndex

    k = 23
    keys, ids = build_ref_keys(scaffolds, k, mink=11, hdist=1)
    idx = (
        LaneKmerIndex.build(keys, ids)
        if LaneKmerIndex.supports(len(keys))
        else None
    )
    if idx is not None:
        cfg = KScanConfig(k=k, mink=11, lane=idx.static_params())
    elif _on_tpu() and SortJoinIndex.supports(len(keys)):
        idx = SortJoinIndex.build(keys, ids)
        cfg = KScanConfig(k=k, mink=11, join=idx.static_params())
    else:
        idx = MMKmerIndex.build(scaffolds, k, mink=11, hdist=1)
        if idx is not None:
            cfg = KScanConfig(k=k, mink=11, mxu=idx.static_params())
        else:
            idx = BucketKmerIndex.build(keys, ids, pack=True)
            cfg = KScanConfig(k=k, mink=11, nb=idx.nb, packed=idx.packed)
    table = idx.device_arrays()

    @jax.jit
    def device_step(packed, nmask, lengths):
        bases = unpack_bases_jnp(packed, nmask, READ_LEN)
        out, _, shortR = kscan_combined(cfg, table, bases, lengths,
                                        False, True)
        keep_to = jnp.where(out["nhits"] > 0, out["min_loc"] - 1, lengths - 1)
        return out["nhits"], out["id0"], keep_to, shortR[0]

    return device_step, type(idx).__name__, len(keys)


def bench_bbduk_device():
    """Config #1: adapter scan k=23 mink=11 hdist=1 ktrim=r, device only —
    the production fused scan graph (full + short + verdict in one
    dispatch), at BOTH panel scales: one adapter (VMEM lane index) and
    the full bundled adapters.fa (MXU matmul matcher)."""
    import os

    import jax.numpy as jnp

    from bbtools_tpu.core.dna import encode
    from bbtools_tpu.io.fasta import iter_fasta
    from bbtools_tpu.ops.encode import pack_bases_np

    adapter = b"AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"
    rng = _rng()
    bases, lengths = make_reads(rng, adapter=encode(adapter))
    packed, nmask = pack_bases_np(bases)
    dp, dn, dl = map(jnp.asarray, (packed, nmask, lengths))

    out = {}
    panels = {"1adapter": [encode(adapter)]}
    res = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "bbtools_tpu", "resources", "adapters.fa",
    )
    panels["adapters_fa"] = [encode(r.seq) for r in iter_fasta(res)]
    for name, scafs in panels.items():
        step_fn, idx_name, n_keys = _bbduk_device_for_panel(scafs)
        if _on_tpu():
            dt = step_time(
                lambda i: step_fn(jnp.roll(dp, i, axis=0), dn, dl)
            )
        else:
            dt = timeit_host(lambda: step_fn(dp, dn, dl))
        out[name] = {
            "reads_per_sec": BATCH / dt,
            "bases_per_sec": BATCH * READ_LEN / dt,
            "index": idx_name,
            "n_keys": n_keys,
        }
    # headline = the full real panel (honest config)
    out["bases_per_sec"] = out["adapters_fa"]["bases_per_sec"]
    out["reads_per_sec"] = out["adapters_fa"]["reads_per_sec"]
    return out


def bench_bbduk_end_to_end(tmpdir):
    """Config #1 end-to-end: gzipped FASTQ on disk -> FastqReader (native
    codec) -> device scan/trim -> FASTQ out. Includes ALL host work and
    the tunnel dispatch latency; the honest user-visible rate in this
    harness (dominated by per-batch dispatch RTT here, not on a real
    TPU host)."""
    import gzip
    import os

    from bbtools_tpu.cli import main as cli_main

    rng = _rng()
    adapter = b"AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"
    n = 10000
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    recs = []
    total_bases = 0
    for i in range(n):
        L = int(rng.integers(90, 152))
        seq = ACGT[rng.integers(0, 4, L)].copy()
        if i % 3 == 0:
            p = int(rng.integers(40, L - 5))
            ins = np.frombuffer(adapter[: L - p], np.uint8)
            seq[p : p + len(ins)] = ins
        q = (33 + rng.integers(2, 40, L)).astype(np.uint8)
        recs.append(b"@r%d\n%s\n+\n%s\n" % (i, seq.tobytes(), q.tobytes()))
        total_bases += L
    inp = os.path.join(tmpdir, "bench_in.fq.gz")
    outp = os.path.join(tmpdir, "bench_out.fq")
    with gzip.open(inp, "wb", compresslevel=2) as f:
        f.write(b"".join(recs))
    args = [
        "bbduk", f"in={inp}", f"out={outp}", "ref=adapters", "k=23",
        "mink=11", "hdist=1", "ktrim=r", "minlen=40", "overwrite=t",
    ]
    # budget-capped protocol (VERDICT r4 #3b): ONE cold pass timed
    # as-is; a warm pass only if the cold one stayed within the 60 s
    # cap. Measured (round 5 diagnostic): this section's graphs pay a
    # per-PROCESS compile the persistent cache does not serve
    # (rep0 726 s, rep1/2 1.6 s in one process; ~346 s in the bench
    # where some shapes do hit) — so it runs LAST and capped. The row
    # measures the harness dispatch path anyway; the device rows carry
    # the architecture numbers.
    t0 = time.perf_counter()
    cli_main(args)
    dt_cold = time.perf_counter() - t0
    out = {
        "cold_reads_per_sec": n / dt_cold,
        "cold_wall_s": round(dt_cold, 1),
    }
    if dt_cold <= 60 and _remaining() > dt_cold + 20:
        os.remove(outp)
        t0 = time.perf_counter()
        cli_main(args)
        dt = time.perf_counter() - t0
        out["reads_per_sec"] = n / dt
        out["bases_per_sec"] = total_bases / dt
    else:
        out["note"] = "warm pass skipped: cold exceeded the 60 s cap"
    return out


def bench_kmercount():
    """Config #2: exact k=31 counting — the production count_batch path
    (all-device sort-reduce on TPU, device extraction + host sort on
    CPU; the function dispatches on platform)."""
    import jax.numpy as jnp

    from bbtools_tpu.ops.kmer_count import (
        batch_kmers_jnp,
        count_batch,
        sort_reduce,
    )

    rng = _rng()
    bases, lengths = make_reads(rng, batch=BATCH // 2)
    reads = BATCH // 2

    if not _on_tpu():
        dt = timeit_host(lambda: count_batch(bases, lengths, 31))
        return {
            "reads_per_sec": reads / dt,
            "bases_per_sec": reads * READ_LEN / dt,
            "kmers_per_sec": reads * (READ_LEN - 30) / dt,
        }

    db, dl = jnp.asarray(bases), jnp.asarray(lengths)

    def dev_step(i):
        keys = batch_kmers_jnp(jnp.roll(db, i, axis=0), dl, 31)
        v, c, n = sort_reduce(keys)
        return v[:8], c[:8], n

    dt_dev = step_time(dev_step)

    # spectrum read-back row: wall including the device->host transfer of
    # the counted spectrum (~16 MB through the tunnel)
    import jax

    @jax.jit
    def compute(db, dl):
        keys = batch_kmers_jnp(db, dl, 31)
        return sort_reduce(keys)

    def with_transfer():
        v, c, n = compute(db, dl)
        nn = int(n)
        np.asarray(v[:nn]), np.asarray(c[:nn])

    with_transfer()
    t0 = time.perf_counter()
    with_transfer()
    dt_all = time.perf_counter() - t0

    # the PRODUCTION khist path since round 3: DeviceSpectrum keeps the
    # spectrum on device (one scalar crosses the link per batch) and
    # finalizes the histogram there — the readback-cliff mitigation
    from bbtools_tpu.ops.kmer_count import DeviceSpectrum

    # khist (DeviceSpectrum accumulate) rate on a REALISTIC spectrum:
    # reads drawn from a 1 Mbp genome, so uniques plateau at ~1M and
    # the capacity never grows mid-measurement. Measured with the same
    # in-graph slope as every other device row: chained accumulates in
    # one fori_loop (this harness's per-dispatch wall has a ~0.5 s
    # floor that buried the real per-batch cost 10x; BASELINE.md
    # "Timing methodology").
    from bbtools_tpu.ops.kmer_count import (
        PAD,
        _merge_spectra,
        batch_kmers_jnp,
    )

    genome = rng.integers(0, 4, 1_000_000).astype(np.uint8)
    starts = rng.integers(0, len(genome) - READ_LEN, reads)
    gbases = genome[
        starts[:, None] + np.arange(READ_LEN)[None, :]
    ]
    cap = 1 << 21
    dgb = jnp.asarray(gbases)
    spec_k0 = jnp.full(cap, PAD, jnp.int64)
    spec_c0 = jnp.zeros(cap, jnp.int64)
    kk = batch_kmers_jnp(dgb, dl, 31)
    spec_k0, spec_c0, _ = _merge_spectra(spec_k0, spec_c0, kk)
    spec_k0, spec_c0 = spec_k0[:cap], spec_c0[:cap]  # warm table

    def khist_step(i):
        # steady state: merge one rolled batch into the warm 1M-unique
        # table (the carry's SIZE is what prices the merge; threading it
        # through the chain would only change capacity, which is fixed)
        keys = batch_kmers_jnp(jnp.roll(dgb, i + 1, axis=0), dl, 31)
        nk, nc, nr = _merge_spectra(spec_k0, spec_c0, keys)
        return nr

    dt_acc = step_time(khist_step)
    return {
        "reads_per_sec": reads / dt_dev,
        "bases_per_sec": reads * READ_LEN / dt_dev,
        "kmers_per_sec": reads * (READ_LEN - 30) / dt_dev,
        "with_spectrum_readback": {
            "reads_per_sec": reads / dt_all,
            "kmers_per_sec": reads * (READ_LEN - 30) / dt_all,
        },
        "device_spectrum_khist": {
            "reads_per_sec": reads / dt_acc,
            "kmers_per_sec": reads * (READ_LEN - 30) / dt_acc,
        },
    }


def bench_bbmerge():
    """Config #4: the PRODUCTION overlap pipeline — fused in-graph
    right-justify + Pallas insert scan + mateByOverlapRatio selection
    (prescan + main state machine as lane-tiled lax.scans)."""
    import jax
    import jax.numpy as jnp

    from bbtools_tpu.ops.overlap import (
        mate_by_overlap_ratio_jnp,
        overlap_counts_jnp,
        right_justify_jnp,
    )
    from bbtools_tpu.ops.overlap_pallas import (
        overlap_counts_pallas,
        use_pallas,
    )

    rng = _rng()
    B = 8192
    a, alens = make_reads(rng, batch=B)
    b, blens = make_reads(rng, batch=B)
    n_inserts = 2 * READ_LEN - 2 * 24
    da, dbb = jnp.asarray(a), jnp.asarray(b)
    dal, dbl = jnp.asarray(alens), jnp.asarray(blens)
    mo0 = jnp.asarray(np.full(B, 7))
    mo = jnp.asarray(np.full(B, 24))
    pallas = use_pallas()

    @jax.jit
    def step_fn(da, dbb, dal, dbl):
        if pallas:
            db_rj = right_justify_jnp(dbb, dbl, READ_LEN)
            g, bad, ol = overlap_counts_pallas(
                da, db_rj, dal, dbl, 24, n_inserts, pre_justified=True
            )
        else:
            g, bad, ol = overlap_counts_jnp(da, dbb, dal, dbl, 24, n_inserts)
        return mate_by_overlap_ratio_jnp(
            g, bad, ol, dal, dbl, 24, mo0, mo, 24, 35,
            0.09, 0.1, 5.5, 0.55,
        )

    if _on_tpu():
        dt = step_time(
            lambda i: step_fn(jnp.roll(da, i, axis=0), dbb, dal, dbl)
        )
    else:
        dt = timeit_host(lambda: step_fn(da, dbb, dal, dbl))
    return {
        "pairs_per_sec": B / dt,
        "bases_per_sec": B * 2 * READ_LEN / dt,
    }


def _contention_probe(iters: int = 2_000_000) -> float:
    """Fixed-work spin probe (ms). On a quiet machine this is stable
    run-to-run; inflation/variance across passes is direct evidence of
    sandbox CPU contention, recorded next to the rates it perturbs."""
    t0 = time.perf_counter()
    x = 0
    for i in range(iters):
        x += i & 7
    if x < 0:  # defeat DCE
        print(x)
    return (time.perf_counter() - t0) * 1e3


def bench_host_ingest():
    """Host FASTQ parse rate on a warm uncompressed file (the reference's
    500 Mbases/s per-stream ceiling is the bar): raw bytes -> padded SoA
    batches via the native MT codec + prefetch thread.

    Contention-robust protocol (VERDICT r4 #3a): 5 passes per mode,
    median AND best reported, with a fixed-work spin probe timed before
    every pass — if the row misses its bar, the probe series shows
    whether the machine or the code was slow."""
    import os
    import tempfile

    from bbtools_tpu.io.fastq import FastqReader

    rng = _rng()
    # ~66 MB: big enough to measure, small enough that the page cache
    # keeps it across passes (the 270 MB round-3 file was getting
    # partially evicted by the bench's own allocations, making the row
    # swing 226-588 Mb/s between runs)
    N_READS = 200_000
    path = os.path.join(tempfile.gettempdir(), "bench_ingest_sm.fq")
    if not os.path.exists(path) or os.path.getsize(path) < 60e6:
        ACGT = np.frombuffer(b"ACGT", np.uint8)
        with open(path, "wb") as f:
            parts = []
            for i in range(N_READS):
                seq = ACGT[rng.integers(0, 4, READ_LEN)].tobytes()
                parts.append(
                    b"@SRR1234.%d %d length=%d\n%s\n+\n%s\n"
                    % (i, i, READ_LEN, seq, b"F" * READ_LEN)
                )
                if len(parts) >= 20000:
                    f.write(b"".join(parts))
                    parts = []
            f.write(b"".join(parts))
    # two UNTIMED warmup passes: the first pass after other bench
    # sections measured as low as 29 Mb/s (codec threads + page/alloc
    # state cold) and was dragging the median far below steady state
    for _ in range(2):
        for b in FastqReader(path, batch_reads=8192):
            pass
    bw_buf = np.ones(64 << 20, np.uint8)
    bw_dst = np.empty_like(bw_buf)  # preallocated: measure copy BW,
    # not first-touch fault cost of a fresh allocation
    np.copyto(bw_dst, bw_buf)
    full_rates, count_rates, probes, bw_probes = [], [], [], []
    for rep in range(5):
        probes.append(round(_contention_probe(), 1))
        # DRAM-bandwidth probe: a CPU spin loop is register-bound and
        # blind to memory contention, which is what actually moves this
        # row; copy 64 MB and record GB/s
        t0 = time.perf_counter()
        np.copyto(bw_dst, bw_buf)
        bw_probes.append(
            round(len(bw_buf) / (time.perf_counter() - t0) / 1e9, 2)
        )
        with open(path, "rb") as f:  # re-warm page cache each pass
            while f.read(1 << 24):
                pass
        t0 = time.perf_counter()
        bases = 0
        for b in FastqReader(path, batch_reads=8192):
            bases += int(b.lengths.sum())
        full_rates.append(bases / (time.perf_counter() - t0))
        # compute-only readers (kmer counting etc.) skip the raw plane
        t0 = time.perf_counter()
        bases = 0
        for b in FastqReader(path, batch_reads=8192, with_ascii=False,
                             with_quals=False):
            bases += int(b.lengths.sum())
        count_rates.append(bases / (time.perf_counter() - t0))
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    return {
        "bases_per_sec": float(np.median(full_rates)),
        "bases_per_sec_best": max(full_rates),
        "count_only_bases_per_sec": float(np.median(count_rates)),
        "count_only_bases_per_sec_best": max(count_rates),
        "passes": 5,
        "contention_probe_ms": probes,
        "membw_probe_gbps": bw_probes,
        "loadavg_1m": load1,
    }


def bench_bbmap_e2e(tmpdir):
    """Config #3 end-to-end: index an E. coli-scale genome, map reads
    through the production pipeline (seed -> cluster -> ungapped -> DP ->
    winner -> match string), wall-clock over the whole batch loop.
    Tracked against the 32-thread Java mapping figure (JAVA_MAP_32T_BPS).
    On this harness each batch pays multiple tunnel dispatch RTTs, so the
    device share is reported separately via the MSA row."""
    import os

    from bbtools_tpu.io.fasta import load_reference, write_fasta
    from bbtools_tpu.models.bbmap import BBMap, BBMapConfig
    from bbtools_tpu.models.bbmap_index import SeedIndex
    from bbtools_tpu.utils.synth import random_genome, write_reads
    from bbtools_tpu.core.dna import CODE_TO_BASE

    rng = _rng()
    genome = random_genome(2_000_000, n_scaffolds=4, seed=11)
    ref_fa = os.path.join(tmpdir, "ref.fa")
    write_fasta(ref_fa, genome)
    ref = load_reference(ref_fa)
    t0 = time.perf_counter()
    idx = SeedIndex.build(ref, k=13)
    t_index = time.perf_counter() - t0
    n = 8192
    recs = []
    total_bases = 0
    for i in range(n):
        scaf = int(rng.integers(0, len(ref.lengths)))
        codes = ref.scaffold_codes(scaf)
        start = int(rng.integers(0, len(codes) - READ_LEN))
        r = codes[start : start + READ_LEN].copy()
        if i & 1:
            r = (3 - r[::-1]).astype(np.uint8)
        e = rng.random(READ_LEN) < 0.01
        r[e] = (r[e] + rng.integers(1, 4, int(e.sum()))) % 4
        recs.append((
            b"r%d" % i, CODE_TO_BASE[np.minimum(r, 4)].tobytes(),
            b"F" * READ_LEN,
        ))
        total_bases += READ_LEN
    reads_fq = os.path.join(tmpdir, "reads.fq")
    write_reads(reads_fq, recs)
    out_sam = os.path.join(tmpdir, "out.sam")
    cfg = BBMapConfig(in1=reads_fq, out=out_sam, batch_reads=4096)
    BBMap(cfg, index=idx).run()  # warm: compiles all window classes
    os.remove(out_sam)
    t0 = time.perf_counter()
    tool = BBMap(cfg, index=idx).run()
    dt = time.perf_counter() - t0
    out = {
        "reads_per_sec": n / dt,
        "bases_per_sec": total_bases / dt,
        "mapped_fraction": tool.reads_mapped / max(tool.reads_in, 1),
        "index_build_sec": round(t_index, 2),
        "vs_java_map_32t": round((total_bases / dt) / JAVA_MAP_32T_BPS, 4),
        "note": "tunnel-dispatch-bound on this harness; "
                "bbmap_device_pipeline is the architecture row",
    }
    return out


def bench_bbmap_device_pipeline(tmpdir):
    """Config #3 architecture row (VERDICT r4 #1): the PRODUCTION fused
    per-batch device phase — ungapped scoring + speculative DP +
    in-graph winner selection + winner walk-row gather, the exact graph
    map_batch dispatches ONCE per batch (ops/map_fused.fused_map_step,
    prepared by the production BBMap._fused_prep) — measured with the
    in-graph slope. The host stage (seed+cluster+prep) is wall-timed
    separately; production overlaps the two via the double-buffered
    prefetch, so the pipeline rate is the slower of the stages."""
    import jax
    import jax.numpy as jnp

    from bbtools_tpu.io.fasta import load_reference, write_fasta
    from bbtools_tpu.models.bbmap import BBMap, BBMapConfig
    from bbtools_tpu.models.bbmap_index import SeedIndex
    from bbtools_tpu.ops.map_fused import fused_map_step
    from bbtools_tpu.utils.synth import random_genome

    rng = _rng()
    genome = random_genome(2_000_000, n_scaffolds=4, seed=11)
    ref_fa = os.path.join(tmpdir, "refdp.fa")
    write_fasta(ref_fa, genome)
    ref = load_reference(ref_fa)
    idx = SeedIndex.build(ref, k=13)
    tool = BBMap(BBMapConfig(), index=idx)
    B, L = 4096, READ_LEN
    bases = np.full((B, L), 4, np.uint8)
    lengths = np.full(B, L, np.int64)
    for i in range(B):
        scaf = int(rng.integers(0, len(ref.lengths)))
        codes = ref.scaffold_codes(scaf)
        p = int(rng.integers(0, len(codes) - L))
        r = codes[p : p + L].copy()
        if i & 1:
            r = (3 - r[::-1]).astype(np.uint8)
        e = rng.random(L) < 0.01
        r[e] = (r[e] + 1) % 4
        bases[i] = r

    def host_stage():
        cand = tool.candidates_for_batch(bases, lengths)
        t_read, t_diag, t_strand, t_votes, t_spread, t_anchor, _nc = cand
        task_reads, task_lens, refwins, _W = tool._build_tasks(
            bases, lengths, t_read, t_strand, t_anchor
        )
        return tool._fused_prep(
            B, L, t_read, t_votes, t_spread, t_anchor, t_diag,
            task_reads, task_lens, refwins,
        )

    t0 = time.perf_counter()
    prep = host_stage()
    prep = host_stage()
    t_host = (time.perf_counter() - t0) / 2
    # production runs the WHOLE host stage in the prefetch thread pool
    # (BBMap._prefetch_candidates, ordered, bounded in-flight); measure
    # its aggregate throughput the same way
    from concurrent.futures import ThreadPoolExecutor

    workers = max(1, min(4, (os.cpu_count() or 2) - 1))
    reps = 2 * workers
    t0 = time.perf_counter()
    with ThreadPoolExecutor(workers) as ex:
        list(ex.map(lambda _i: host_stage(), range(reps)))
    t_host_pool = (time.perf_counter() - t0) / reps
    (L_, W_, K, cls_shapes, pl, wcap, tr, tl, rw, sm, dp_args) = (
        prep["jit_args"]
    )

    def step(i):
        # roll every compute-bearing plane so no iteration can be
        # hoisted as loop-invariant or deduplicated
        dp2 = tuple(
            a[:4] + (jnp.roll(a[4], i, axis=0), a[5],
                     jnp.roll(a[6], i, axis=0)) + a[7:]
            for a in dp_args
        )
        return fused_map_step(
            L_, W_, K, cls_shapes, pl, wcap,
            jnp.roll(tr, i, axis=0), tl, jnp.roll(rw, i, axis=0),
            sm, dp2,
        )

    dt_dev = step_time(step)
    n_dp = sum(s[1] for s in cls_shapes)
    dt_pipe = max(dt_dev, t_host_pool)  # stages overlap via prefetch
    total_bases = B * L
    return {
        "device_reads_per_sec": B / dt_dev,
        "device_bases_per_sec": total_bases / dt_dev,
        "host_stage_reads_per_sec": B / t_host,
        "host_pool_reads_per_sec": B / t_host_pool,
        "host_pool_workers": workers,
        "pipeline_reads_per_sec": B / dt_pipe,
        "pipeline_bases_per_sec": total_bases / dt_pipe,
        "dp_alignments_per_batch": n_dp,
        "host_syncs_per_batch": 1,
        "vs_java_map_32t": round(
            (total_bases / dt_pipe) / JAVA_MAP_32T_BPS, 4
        ),
    }


def bench_bbmap_msa():
    """Config #3 hot loop: banded-window MSA fill with traceback planes
    (the per-site scoring kernel behind bbmap -> SAM), Pallas on TPU."""
    import jax.numpy as jnp

    rng = _rng()
    B = 512
    R = READ_LEN
    Cc = R + 2 * 12  # pad=12 window slack, as models/bbmap.py uses
    reads = rng.integers(0, 4, (B, R)).astype(np.uint8)
    read_lens = np.full(B, R, np.int32)
    refs = rng.integers(0, 4, (B, Cc)).astype(np.uint8)
    # plant near-matches so scores are realistic
    refs[:, 12 : 12 + R] = reads
    mut = rng.integers(0, R, (B, 3))
    for j in range(3):
        refs[np.arange(B), 12 + mut[:, j]] ^= 1
    cells = B * R * Cc

    if _on_tpu():
        from bbtools_tpu.ops.msa_pallas import msa_fill_pallas, prepare_refp

        jr = jnp.asarray(reads)
        jl = jnp.asarray(read_lens)
        jp = jnp.asarray(prepare_refp(refs, R))
        dt = step_time(
            lambda i: msa_fill_pallas(
                R, Cc, jnp.roll(jr, i, axis=0), jl,
                jnp.roll(jp, i, axis=0), tile=128, traceback=True,
            )
        )
    else:
        from bbtools_tpu.ops.msa_pallas import msa_fill_tb_auto

        dt = timeit_host(
            lambda: msa_fill_tb_auto(R, Cc, reads, read_lens, refs),
            warmup=2, iters=4,
        )
    return {
        "alignments_per_sec": B / dt,
        "cells_per_sec": cells / dt,
        "bases_per_sec": B * R / dt,
    }


def bench_tadpole_bigk():
    """Config #5 load phase: exact k=62 two-word counting — fused device
    extract+lex-sort+reduce on TPU (ops/kmers2.count_batchw_device), the
    native-radix host path elsewhere."""
    rng = _rng()
    bases, lengths = make_reads(rng, batch=4096)

    if _on_tpu():
        import jax.numpy as jnp

        from bbtools_tpu.ops.kmers2 import _count_batchw_jit

        fn = _count_batchw_jit(62)
        db = jnp.asarray(bases)
        dl = jnp.asarray(lengths)
        dt = step_time(lambda i: fn(jnp.roll(db, i, axis=0), dl))
        where = "device"
    else:
        from bbtools_tpu.ops.kmers2 import count_batchw_exact

        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            count_batchw_exact(bases, lengths, 62)
        dt = (time.perf_counter() - t0) / iters
        where = "host"
    return {
        "bases_per_sec": 4096 * READ_LEN / dt,
        "where": where,
    }


def _round_vals(d):
    return {
        k: (round(v, 4) if isinstance(v, float) else v) for k, v in d.items()
    }


_EXTRAS = {}
_EMITTED = False


def _snapshot():
    dev = _EXTRAS.get("bbduk_device", {})
    bps = dev.get("bases_per_sec", 0.0) if isinstance(dev, dict) else 0.0
    return {
        "metric": "bbduk_device_bases_per_sec_1chip",
        "value": round(bps, 1),
        "unit": "bases/s",
        # target in BASELINE.json is >=8x the 32T Java rate; the
        # documented Java per-stream ceiling (500 Mbp/s,
        # DedupeGuide.txt:19) stands in for the unmeasurable
        # 32T rate — see BASELINE.md for the derivation
        "vs_baseline": round(bps / JAVA_STREAM_CEILING_BPS, 3),
        "extras": _EXTRAS,
    }


def _emit():
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    print(json.dumps(_snapshot()), flush=True)


def _on_term(signum, frame):
    _EXTRAS["terminated_by_signal"] = signum
    _emit()
    os._exit(0)


def _write_partial():
    try:
        with open("/root/repo/BENCH_PARTIAL.json", "w") as f:
            json.dump(_snapshot(), f, indent=1)
    except OSError:
        pass


def main():
    sys.path.insert(0, "/root/repo")
    import tempfile

    atexit.register(_emit)
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, _on_term)

    # Package init handles x64, the JAX_PLATFORMS override (the site hook
    # forces the tpu plugin via jax.config, which beats the env var), and
    # the gVisor mallopt tuning — import it before touching jax.devices().
    import bbtools_tpu  # noqa: F401
    import jax

    # Persistent compile cache: the warm-compile walls through the
    # ~25 ms-RTT tunnel (hundreds of seconds for the e2e graphs) are the
    # reason round 3's bench never printed; pay them once per machine.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    platform = jax.devices()[0].platform
    # start the wall budget AFTER device init: the remote tunnel can take
    # minutes to accept a client after recent churn, and that stall must
    # not eat the section budget (observed: a 5-min init left only the
    # flagship row in an otherwise healthy run)
    global _T0
    init_s = time.monotonic() - _T0
    _T0 = time.monotonic()
    _EXTRAS.update(
        {
            "platform": platform,
            "timing": "in-graph slope (chaintime)",
            "budget_s": BUDGET_S,
            "device_init_s": round(init_s, 1),
        }
    )

    td_ctx = tempfile.TemporaryDirectory()
    td = td_ctx.name

    # (name, fn, conservative cold-cache cost estimate in seconds).
    # Priority order: the flagship panel row, then the rows VERDICT r3
    # requires (khist, host ingest, bbmap e2e), then the rest. Estimates
    # assume a cold compile cache; with .jax_cache warm the real costs
    # are a small fraction and everything runs.
    sections = [
        ("device_health", bench_device_health, 30),
        ("bbduk_device", bench_bbduk_device, 150),
        ("kmercount_k31_device", bench_kmercount, 120),
        ("host_ingest", bench_host_ingest, 60),
        ("bbmap_device_pipeline", lambda: bench_bbmap_device_pipeline(td), 150),
        ("bbmap_end_to_end", lambda: bench_bbmap_e2e(td), 200),
        ("bbmerge_overlap_device", bench_bbmerge, 60),
        ("bbmap_msa_device", bench_bbmap_msa, 60),
        ("tadpole_k62", bench_tadpole_bigk, 50),
        ("transfer", bench_transfer, 30),
        # LAST among tool rows: its cold compile through the tunnel has
        # measured ~335 s twice (not served by the persistent cache) and
        # must never starve the device rows above
        ("bbduk_end_to_end", lambda: bench_bbduk_end_to_end(td), 90),
        # canary re-check: a run whose START was healthy can degrade
        # mid-run; bracketed health rows date-stamp the device state
        ("device_health_end", bench_device_health, 30),
    ]
    # A warm compile cache shrinks every section dramatically; scale the
    # cold estimates down when the cache is populated so a warm machine
    # runs everything.
    try:
        cache_warm = len(os.listdir("/root/repo/.jax_cache")) >= 10
    except OSError:
        cache_warm = False
    _EXTRAS["compile_cache_warm"] = cache_warm

    for name, fn, est in sections:
        if cache_warm:
            est = max(20, est // 5)
        rem = _remaining()
        if rem < min(est, 45):
            _EXTRAS[name] = {"skipped": "budget", "remaining_s": round(rem, 1)}
            _write_partial()
            continue
        t0 = time.monotonic()
        try:
            row = _round_vals(fn())
        except Exception as e:  # record, keep benching
            row = {"error": f"{type(e).__name__}: {e}"[:300]}
        row["elapsed_s"] = round(time.monotonic() - t0, 1)
        _EXTRAS[name] = row
        _write_partial()
        print(f"[bench] {name}: {row.get('elapsed_s')}s", file=sys.stderr)
        if name == "device_health":
            # the opening canary absorbs the process's tunnel cold-start
            # (measured 75-750 s for the SAME cached graphs across
            # processes — an environmental stall, not compute). That is
            # init cost: restart the wall budget here so one bad
            # cold-start cannot starve every real row.
            _T0 = time.monotonic()

    try:
        td_ctx.cleanup()
    except OSError:
        pass
    _emit()


if __name__ == "__main__":
    main()
