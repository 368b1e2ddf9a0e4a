"""Multi-chip paths on the 8-device virtual CPU mesh: sharded BBDuk
filter, sharded k-mer counting, sharded alignment scoring — each checked
for exact equality against the single-device implementation."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bbtools_tpu.ops.bbduk_scan import KScanConfig
from bbtools_tpu.ops.kmer_count import KmerSpectrum, count_batch_np
from bbtools_tpu.ops.kmer_index import BucketKmerIndex, build_ref_keys
from bbtools_tpu.ops.score_ungapped import score_no_indels, score_no_indels_np
from bbtools_tpu.parallel.mesh import make_mesh
from bbtools_tpu.parallel.sharded_count import (
    sharded_count_step,
    sharded_ungapped_score_step,
)
from bbtools_tpu.parallel.sharded_index import (
    ShardedKmerIndex,
    sharded_bbduk_step,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)

rng = np.random.default_rng(5150)


def test_sharded_bbduk_step_matches_single_device():
    from bbtools_tpu.core.dna import encode

    adapter = b"AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"
    k = 23
    keys, ids = build_ref_keys([encode(adapter)], k, hdist=1)
    B, L = 64, 101
    bases = rng.integers(0, 4, (B, L)).astype(np.uint8)
    acodes = encode(adapter)
    for r in range(0, B, 3):
        bases[r, 40 : 40 + len(acodes)] = acodes
    lengths = np.full(B, L, np.int32)

    mesh = make_mesh(n_dp=4, n_tp=2)
    sidx = ShardedKmerIndex.build(keys, ids, n_shards=2)
    step = sharded_bbduk_step(mesh, KScanConfig(k=k), sidx)
    nhits, hist = step(
        jnp.asarray(bases), jnp.asarray(lengths),
        jnp.asarray(sidx.keys), jnp.asarray(sidx.ids),
    )
    nhits = np.asarray(nhits)

    # single-device truth: same scan with one unsharded bucket table
    from bbtools_tpu.ops.kmers import canonical_keys_jnp, rolling_kmers_jnp

    bidx = BucketKmerIndex.build(keys, ids)
    fwd, rkm, runlen = rolling_kmers_jnp(jnp.asarray(bases), k)
    qk = canonical_keys_jnp(fwd, rkm, k, -1, True)
    i_idx = np.arange(L)[None, :]
    eligible = (np.asarray(runlen) >= k) & (i_idx >= k - 1) & (
        i_idx < lengths[:, None]
    )
    kb, ib = bidx.device_arrays()
    full = np.asarray(BucketKmerIndex.lookup_jnp(kb, ib, bidx.nb, qk))
    full = np.where(eligible, full, 0)
    want_nhits = (full > 0).sum(axis=1)
    np.testing.assert_array_equal(nhits, want_nhits)
    assert nhits.max() > 0  # planted adapters actually hit
    # histogram is the dp-merged read-count histogram
    want_hist = np.bincount(np.minimum(want_nhits, 255), minlength=256)
    np.testing.assert_array_equal(np.asarray(hist), want_hist)


def test_sharded_count_matches_brute_force():
    k = 31
    B, L = 64, 80
    bases = rng.integers(0, 4, (B, L)).astype(np.uint8)
    bases[rng.random((B, L)) < 0.01] = 4  # Ns break runs
    lengths = rng.integers(k, L + 1, B).astype(np.int32)

    mesh = make_mesh(n_dp=8, n_tp=1)
    step = sharded_count_step(mesh, k)
    values, counts, n_runs, hist = step(
        jnp.asarray(bases), jnp.asarray(lengths)
    )
    spec = KmerSpectrum(k)
    for d in range(8):
        n = int(n_runs[d])
        spec.add_batch(np.asarray(values[d][:n]), np.asarray(counts[d][:n]))
    spec.flush()
    want_v, want_c = count_batch_np(bases, lengths, k)
    got = dict(zip(spec.keys.tolist(), spec.counts.tolist()))
    want = dict(zip(want_v.tolist(), want_c.tolist()))
    assert got == want
    # device-psum'd histogram equals per-device local histograms summed
    wh = np.zeros(64, np.int64)
    for d in range(8):
        n = int(n_runs[d])
        c = np.asarray(counts[d][:n])
        wh += np.bincount(np.minimum(c, 63), minlength=64)
    np.testing.assert_array_equal(np.asarray(hist), wh)


def test_sharded_ungapped_score_matches_oracle():
    T, L, W = 32, 60, 90
    reads = rng.integers(0, 4, (T, L)).astype(np.uint8)
    refs = rng.integers(0, 4, (T, W)).astype(np.uint8)
    starts = rng.integers(0, 20, T).astype(np.int32)
    for t in range(0, T, 2):  # plant near-matches
        s = int(starts[t])
        refs[t, s : s + L] = reads[t]
        refs[t, s + 7] ^= 1
    lens = np.full(T, L, np.int32)

    mesh = make_mesh(n_dp=8, n_tp=1)
    step = sharded_ungapped_score_step(mesh, L, W)
    got = np.asarray(
        step(jnp.asarray(reads), jnp.asarray(lens), jnp.asarray(refs),
             jnp.asarray(starts))
    )
    for t in range(T):
        assert got[t] == score_no_indels_np(reads[t], refs[t], int(starts[t]))
    # and equals the single-device jit path
    single = np.asarray(
        score_no_indels(
            L, jnp.asarray(reads), jnp.asarray(lens), jnp.asarray(refs),
            jnp.asarray(starts), jnp.asarray(np.full(T, W, np.int32)),
        )
    )
    np.testing.assert_array_equal(got, single)


def test_sharded_seed_expand_matches_csr():
    """tp-sharded fixed-width seed expansion returns exactly the CSR's
    site lists (up to max_hits) for every query key."""
    from bbtools_tpu.parallel.sharded_count import (
        shard_seed_index,
        sharded_seed_expand_step,
    )

    k = 5
    nk = 4 ** k
    rng2 = np.random.default_rng(9)
    # synthetic CSR: random site counts per key
    counts = rng2.integers(0, 5, nk)
    starts = np.zeros(nk + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    sites = rng2.integers(0, 1 << 20, int(starts[-1]), dtype=np.int32)
    M = 4
    S = 2
    tables = shard_seed_index(starts, sites, S, M)
    mesh = make_mesh(n_dp=4, n_tp=S)
    step = sharded_seed_expand_step(mesh, S)
    B, K = 16, 6
    keys = rng2.integers(0, nk, (B, K)).astype(np.int32)
    out = np.asarray(step(jnp.asarray(keys), jnp.asarray(tables)))
    assert out.shape == (S, B, K, M)
    for b in range(B):
        for t in range(K):
            key = int(keys[b, t])
            end = min(starts[key] + M, starts[key + 1])
            want = sites[starts[key] : end].tolist()
            got = [
                x for s in range(S) for x in out[s, b, t].tolist() if x >= 0
            ]
            assert sorted(got) == sorted(want), (key, got, want)


def test_sharded_mm_lookup_matches_host():
    """Column-sharded MXU matcher == host oracle on a (2 dp, 4 tp) mesh."""
    import numpy as np

    from bbtools_tpu.ops.mm_match import MMKmerIndex
    from bbtools_tpu.parallel.mesh import make_mesh
    from bbtools_tpu.parallel.sharded_count import sharded_mm_lookup_step

    rng = np.random.default_rng(21)
    scafs = [rng.integers(0, 4, 60).astype(np.uint8) for _ in range(6)]
    mm = MMKmerIndex.build(scafs, 13, mink=8, hdist=1)
    assert mm is not None
    import jax

    mesh = make_mesh(n_dp=2, n_tp=4, devices=jax.devices()[:8])
    assert mm.Dp % 4 == 0, "column padding must divide tp"
    step = sharded_mm_lookup_step(mesh, mm.k, mm.mink, mm.Kp)
    from bbtools_tpu.ops.kmers import length_mask, rc_kmer_np

    q = rng.integers(0, 1 << 26, (8, 64), dtype=np.int64)
    q = np.maximum(q, rc_kmer_np(q, 13)) | np.int64(length_mask(13))
    import jax.numpy as jnp

    km, pr = mm.device_arrays()
    got = np.asarray(step(km, pr, jnp.asarray(q)))
    want = mm.lookup_np(q)
    np.testing.assert_array_equal(got, want)


def test_bbduk_cli_sharded_equals_single(tmp_path):
    """TOOL-level multi-chip: full BBDuk CLI with the k-mer table sharded
    over 8 virtual devices (tpshards=8 -> kmer%WAYS routing + psum inside
    the production kscan) produces byte-identical FASTQ and stats to the
    single-device run. This is the production wiring of
    sharded_index.make_sharded_kscan, not a kernel-level check."""
    from bbtools_tpu.cli import main as cli_main

    rng2 = np.random.default_rng(17)
    scafs = [rng2.integers(0, 4, 40).astype(np.uint8) for _ in range(40)]
    ref_p = tmp_path / "panel.fa"
    with open(ref_p, "w") as fh:
        for i, s in enumerate(scafs):
            fh.write(f">a{i}\n" + "".join("ACGT"[c] for c in s) + "\n")
    in_p = tmp_path / "in.fq"
    with open(in_p, "w") as fh:
        for i in range(700):
            r = rng2.integers(0, 4, 151).astype(np.uint8)
            if i % 3 == 0:
                s = scafs[i % len(scafs)]
                p = int(rng2.integers(20, 100))
                r[p : p + len(s)] = s
            fh.write(f"@r{i}\n" + "".join("ACGT"[c] for c in r)
                     + f"\n+\n{'F' * 151}\n")

    def run(tag, extra):
        out = tmp_path / f"{tag}.fq"
        stats = tmp_path / f"{tag}.stats"
        cli_main([
            "bbduk", f"in={in_p}", f"out={out}", f"ref={ref_p}",
            "k=23", "mink=11", "hdist=1", "ktrim=r", f"stats={stats}",
            "batchreads=300",  # multiple batches incl. a ragged last one
        ] + extra)
        return out.read_bytes(), stats.read_text()

    fq1, st1 = run("single", [])
    fq8, st8 = run("sharded", ["tpshards=8"])
    assert fq1 == fq8
    assert st1 == st8
    # mixed mesh too: 4-way table shards x 2-way read parallelism
    fq4, st4 = run("mixed", ["tpshards=4"])
    assert fq1 == fq4 and st1 == st4


def test_sharded_spectrum_matches_single_device():
    """Hash-sharded spectrum (kmer % n ownership over dp,
    KmerTableSet.java:273-285): multi-batch accumulation, histogram,
    and final spectrum all equal the single-device KmerSpectrum."""
    from bbtools_tpu.parallel.sharded_spectrum import ShardedSpectrum

    k = 31
    mesh = make_mesh(n_dp=8)
    ss = ShardedSpectrum(mesh, k, cap=1 << 12)
    ks = KmerSpectrum(k)
    g = np.random.default_rng(77)
    for bi in range(3):
        B, L = 48 + 8 * bi, 120
        bases = g.integers(0, 4, (B, L)).astype(np.uint8)
        # duplicated rows so counts exceed 1 across batches
        bases[::4] = bases[0]
        lengths = np.full(B, L, np.int32)
        lengths[5] = 50
        ss.add_batch(bases, lengths)
        v, c = count_batch_np(bases, lengths, k)
        ks.add_batch(v, c)
    ks.flush()
    sk, sc = ss.spectrum()
    assert (sk == ks.keys).all()
    assert (sc == ks.counts).all()
    h1 = ss.histogram(1000)
    h2 = ks.histogram(1000)
    assert (h1 == h2).all()
    assert ss.n_unique == ks.n_unique


def test_kmercountexact_cli_sharded_equals_single(tmp_path):
    """CLI-level: kmercountexact shards=8 produces byte-identical khist
    and dump to the single-device run."""
    from bbtools_tpu.cli import main as cli_main

    g = np.random.default_rng(13)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    with open(tmp_path / "r.fq", "wb") as f:
        base = ACGT[g.integers(0, 4, 150)].tobytes()
        for i in range(400):
            seq = base if i % 3 == 0 else ACGT[g.integers(0, 4, 150)].tobytes()
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, seq, b"F" * 150))
    cli_main(["kmercountexact", f"in={tmp_path}/r.fq", "k=31",
              f"khist={tmp_path}/h1.txt", f"dump={tmp_path}/d1.fa"])
    cli_main(["kmercountexact", f"in={tmp_path}/r.fq", "k=31", "shards=8",
              f"khist={tmp_path}/h8.txt", f"dump={tmp_path}/d8.fa"])
    assert (tmp_path / "h1.txt").read_bytes() == (tmp_path / "h8.txt").read_bytes()
    assert (tmp_path / "d1.fa").read_bytes() == (tmp_path / "d8.fa").read_bytes()


_DIST_WORKER = r"""
import sys
import bbtools_tpu  # applies JAX_PLATFORMS env over the site hook
from bbtools_tpu.parallel.distributed import initialize, global_mesh

ok = initialize()
assert ok, "initialize() returned False with coordinator env set"
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
mesh = global_mesh()
assert mesh.devices.shape == (2, 2), mesh.devices.shape
local = np.full((2, 4), jax.process_index() + 1, np.int32)
sh = NamedSharding(mesh, P(("dp", "tp"), None))
g = jax.make_array_from_process_local_data(sh, local)
total = int(jax.jit(lambda x: x.sum())(g))
print("DIST_TOTAL=%d" % total)

# production tools run inside the joined cluster (each host on its own
# input shard — the per-host FASTQ feeding design of SURVEY §5.8)
import os
import tempfile

from bbtools_tpu.cli import main as cli_main

with tempfile.TemporaryDirectory() as td:
    with open(os.path.join(td, "r.fq"), "w") as f:
        for i in range(50):
            f.write("@r%d\nACGTACGTACGTACGTACGTACGTACGTACGTACGT\n+\n" % i
                    + "F" * 36 + "\n")
    cli_main(["kmercountexact", "in=%s/r.fq" % td, "k=31",
              "khist=%s/h.txt" % td])
    nlines = len(open(os.path.join(td, "h.txt")).read().splitlines())
print("DIST_TOOL_OK=%d" % (nlines > 1))
"""


def test_distributed_two_process_localhost(tmp_path):
    """The multi-host join path actually runs: two localhost processes
    join via jax.distributed (coordination service over gRPC), build the
    global (dp, tp) mesh, and compute over a process-spanning global
    array. Exercises parallel/distributed.py initialize() + global_mesh()
    end to end — the reference never shipped its MPI path (SURVEY §2.6.7);
    this proves ours joins."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "dist_worker.py"
    script.write_text(_DIST_WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            PYTHONPATH="/root/repo",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, (out.decode(), err.decode()[-2000:])
        outs.append(out.decode())
    # 8 cells of 1 (proc 0) + 8 cells of 2 (proc 1)
    assert all("DIST_TOTAL=24" in o for o in outs), outs
    # CLI tools run inside the joined cluster
    assert all("DIST_TOOL_OK=1" in o for o in outs), outs


def test_bbmap_cli_tpshards_equals_single(tmp_path):
    """CLI-level: bbmap tpshards=8 (dp-sharded ungapped scoring + DP
    fill/walk through shard_map) produces a byte-identical SAM to the
    single-device run."""
    from bbtools_tpu.cli import main as cli_main
    from bbtools_tpu.core.dna import CODE_TO_BASE, encode
    from bbtools_tpu.io.fasta import load_reference, write_fasta
    from bbtools_tpu.utils.synth import random_genome, write_reads

    g = random_genome(60_000, n_scaffolds=2, seed=91)
    write_fasta(str(tmp_path / "ref.fa"), g)
    ref = load_reference(str(tmp_path / "ref.fa"))
    gg = np.random.default_rng(17)
    recs = []
    for i in range(300):
        s = int(gg.integers(0, 2))
        codes = ref.scaffold_codes(s)
        p = int(gg.integers(0, len(codes) - 140))
        r = codes[p : p + 140].copy()
        if i & 1:
            r = (3 - r[::-1]).astype(np.uint8)
        e = gg.random(140) < 0.01
        r[e] = (r[e] + gg.integers(1, 4, int(e.sum()))) % 4
        if i % 7 == 0:  # plant an indel so DP classes run
            q = int(gg.integers(30, 100))
            r = np.concatenate([r[:q], r[q + 3 :], codes[p : p + 3]])[:140]
        recs.append((b"r%d" % i, CODE_TO_BASE[np.minimum(r, 4)].tobytes(),
                     b"F" * 140))
    write_reads(str(tmp_path / "r.fq"), recs)
    cli_main(["bbmap", f"ref={tmp_path}/ref.fa", f"in={tmp_path}/r.fq",
              f"out={tmp_path}/s1.sam", "nodisk"])
    cli_main(["bbmap", f"ref={tmp_path}/ref.fa", f"in={tmp_path}/r.fq",
              f"out={tmp_path}/s8.sam", "nodisk", "tpshards=8"])

    def body(p):
        return [l for l in (tmp_path / p).read_bytes().splitlines()
                if not l.startswith(b"@PG")]

    assert body("s1.sam") == body("s8.sam")


def test_tadpole_cli_shards_equals_single(tmp_path):
    """CLI-level: tadpole shards=8 load phase (hash-sharded spectrum)
    produces byte-identical contigs."""
    from bbtools_tpu.cli import main as cli_main

    g = np.random.default_rng(23)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    genome = ACGT[g.integers(0, 4, 8000)].tobytes()
    with open(tmp_path / "r.fq", "wb") as f:
        for i in range(600):
            p = int(g.integers(0, len(genome) - 100))
            seq = genome[p : p + 100]
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, seq, b"F" * 100))
    cli_main(["tadpole", f"in={tmp_path}/r.fq", f"out={tmp_path}/c1.fa",
              "k=31"])
    cli_main(["tadpole", f"in={tmp_path}/r.fq", f"out={tmp_path}/c8.fa",
              "k=31", "shards=8"])
    c1 = (tmp_path / "c1.fa").read_bytes()
    assert c1 == (tmp_path / "c8.fa").read_bytes()
    assert c1.count(b">") >= 1


_GLOBAL_WORKER = r"""
import os
import bbtools_tpu
from bbtools_tpu.parallel.distributed import initialize

ok = initialize()
assert ok
import jax

pid = jax.process_index()
shared = os.environ["DIST_SHARED"]
from bbtools_tpu.cli import main as cli_main

# each process reads ITS OWN input shard; the tools produce ONE global
# answer via collectives over the global mesh
cli_main([
    "kmercountexact", "in=%s/shard%d.fq" % (shared, pid), "k=31",
    "khist=%s/khist_p%d.txt" % (shared, pid),
    "dump=%s/dump_p%d.fa" % (shared, pid),
])
cli_main([
    "bbduk", "in=%s/shard%d.fq" % (shared, pid),
    "out=%s/out_p%d.fq" % (shared, pid),
    "literal=AGATCGGAAGAGCACACGTCTGAACTCCAGTCA",
    "k=23", "mink=11", "hdist=1", "ktrim=r", "minlen=40",
    "stats=%s/stats_p%d.txt" % (shared, pid),
])
print("GLOBAL_OK")
"""


def test_distributed_global_result_equals_concat(tmp_path):
    """VERDICT r4 #2: N processes, each reading its own input shard,
    produce ONE GLOBAL answer byte-identical to the single-process run
    on the concatenated input — kmercountexact khist/dump via the
    global-mesh spectrum merge (parallel/distributed.global_spectrum),
    bbduk stats via cross-process psum (global_sum_array) with ordered
    per-process output shards."""
    import socket
    import subprocess
    import sys

    import numpy as np

    from bbtools_tpu.cli import main as cli_main

    rng = np.random.default_rng(17)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    adapter = b"AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"
    reads = []
    for i in range(400):
        seq = bytearray(ACGT[rng.integers(0, 4, 120)].tobytes())
        if i % 3 == 0:
            p = int(rng.integers(50, 100))
            ins = adapter[: 120 - p]
            seq[p : p + len(ins)] = ins
        reads.append(b"@r%d\n%s\n+\n%s\n" % (i, bytes(seq), b"F" * 120))
    (tmp_path / "all.fq").write_bytes(b"".join(reads))
    (tmp_path / "shard0.fq").write_bytes(b"".join(reads[:200]))
    (tmp_path / "shard1.fq").write_bytes(b"".join(reads[200:]))

    # single-process reference on the concatenated input
    cli_main([
        "kmercountexact", f"in={tmp_path}/all.fq", "k=31",
        f"khist={tmp_path}/khist_ref.txt", f"dump={tmp_path}/dump_ref.fa",
    ])
    cli_main([
        "bbduk", f"in={tmp_path}/all.fq", f"out={tmp_path}/out_ref.fq",
        "literal=" + adapter.decode(), "k=23", "mink=11", "hdist=1",
        "ktrim=r", "minlen=40", f"stats={tmp_path}/stats_ref.txt",
    ])

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "global_worker.py"
    script.write_text(_GLOBAL_WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            PYTHONPATH="/root/repo",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            DIST_SHARED=str(tmp_path),
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        ))
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, (out.decode(), err.decode()[-3000:])
        assert b"GLOBAL_OK" in out

    ref_khist = (tmp_path / "khist_ref.txt").read_bytes()
    ref_dump = (tmp_path / "dump_ref.fa").read_bytes()
    for pid in range(2):
        assert (tmp_path / f"khist_p{pid}.txt").read_bytes() == ref_khist
        assert (tmp_path / f"dump_p{pid}.fa").read_bytes() == ref_dump
    # bbduk: ordered global output = concat of per-process shards
    cat = (tmp_path / "out_p0.fq").read_bytes() + (
        tmp_path / "out_p1.fq"
    ).read_bytes()
    assert cat == (tmp_path / "out_ref.fq").read_bytes()
    # stats: identical global numbers (only the #File path line differs)
    def _norm(p):
        return [
            ln for ln in p.read_bytes().splitlines()
            if not ln.startswith(b"#File")
        ]
    ref_stats = _norm(tmp_path / "stats_ref.txt")
    assert ref_stats, "reference stats empty"
    for pid in range(2):
        assert _norm(tmp_path / f"stats_p{pid}.txt") == ref_stats
