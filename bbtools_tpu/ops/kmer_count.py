"""Exact k-mer counting — device extraction + host-merged spectrum.

TPU-native redesign of the counting half of kmer/KmerTableSet.java (the
LoadThread scan :397-484 + HashArray1D increment): instead of a mutable
hash table, each batch's canonical k-mers are sorted on device and reduced
to (unique, count) runs; batches merge into a global sorted spectrum on the
host. Sorting replaces atomics — deterministic, collision-free, and maps
onto the TPU's fast sort/reduce primitives (the same observation SURVEY.md
§7.3 makes: the reference's own BBMap Block index is the sorted design).

Canonicalization matches the loader exactly: kmer windows with len >= k
(no undefined base in window), key = max(kmer, rkmer) — note counting
tables use the PLAIN canonical kmer, no length-tag bit
(kmer/KmerTableSet.java uses toValue without masks).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .kmers import rolling_kmers_jnp, rolling_kmers_np

#: sentinel larger than any 62-bit kmer, sorts last
PAD = np.int64(0x7FFFFFFFFFFFFFFF)


def batch_kmers_jnp(bases, lengths, k: int):
    """Canonical kmers of all valid windows, padded with PAD. [B*L] i64."""
    fwd, rkm, runlen = rolling_kmers_jnp(bases, k)
    i_idx = jnp.arange(bases.shape[1], dtype=jnp.int32)[None, :]
    valid = (runlen >= k) & (i_idx < lengths[:, None])
    keys = jnp.maximum(fwd, rkm)
    keys = jnp.where(valid, keys, PAD)
    return keys.reshape(-1)


@jax.jit
def sort_reduce(keys):
    """Sort keys and reduce to run (values, counts, n_runs). Padded output
    arrays of the same length; rows >= n_runs are PAD/0.

    Compaction is a second STABLE sort that partitions run-boundary
    rows to the front (carrying the key and its position), not a
    scatter: TPU random-access scatter runs at ~7M updates/s and
    dominated this function 50:1 (353 ms vs 6 ms for the sorts,
    slope-measured on v5e), while a bitonic sort pass is ~6 ms.
    Counts fall out of adjacent boundary positions."""
    s = jnp.sort(keys)
    n = s.shape[0]
    boundary = jnp.concatenate(
        [jnp.ones(1, bool), s[1:] != s[:-1]]
    ) & (s != PAD)
    n_runs = boundary.sum()
    n_valid = (s != PAD).sum()
    iota = jnp.arange(n, dtype=jnp.int32)
    # stable partition: boundaries first, in ascending-key order. The
    # boundary bit PACKS into the key (canonical k<=31 kmers use < 62
    # bits; PAD already has bit 62 set, and PAD rows are non-boundary)
    # so the partition is a 12-byte 2-operand sort instead of the
    # 16-byte 3-operand (nb, s, iota) — ~25% less sort-unit traffic on
    # the hot counting path.
    key2 = s | ((~boundary).astype(jnp.int64) << 62)
    k2s, pos = jax.lax.sort((key2, iota), num_keys=1, is_stable=True)
    values = k2s & ~(jnp.int64(1) << 62)
    nxt = jnp.concatenate([pos[1:], jnp.zeros(1, jnp.int32)])
    counts = jnp.where(
        iota < n_runs - 1,
        (nxt - pos).astype(jnp.int64),
        (n_valid - pos).astype(jnp.int64),
    )
    live = iota < n_runs
    return (
        jnp.where(live, values, PAD),
        jnp.where(live, counts, 0),
        n_runs,
    )


def count_batch(bases, lengths, k: int):
    """Counting for one batch -> host (values, counts) arrays.

    On CPU hosts the sort-reduce runs via np.unique (host introsort
    measured ~6x XLA-CPU sort for this workload); on TPU the whole
    pipeline stays on device (sort_reduce) because shipping 19 MB of
    keys across the host link per batch costs more than the slower
    on-device bitonic sort. Both produce identical (values, counts)."""
    import jax

    if jax.devices()[0].platform != "cpu":
        keys = batch_kmers_jnp(jnp.asarray(bases), jnp.asarray(lengths), k)
        values, counts, n_runs = sort_reduce(keys)
        n = int(n_runs)
        return np.asarray(values[:n]), np.asarray(counts[:n])
    keys = np.asarray(
        batch_kmers_jnp(jnp.asarray(bases), jnp.asarray(lengths), k)
    )
    keys = keys[keys != PAD]
    return np.unique(keys, return_counts=True)


@partial(jax.jit, static_argnames=())
def _merge_spectra(spec_keys, spec_counts, batch_keys):
    """Merge a device spectrum ([C] PAD-padded sorted keys + counts) with
    a raw batch key stream ([M], PAD-padded): one combined 2-op sort +
    run-sum via the cumsum-carry partition (the scatter-free pattern of
    sort_reduce, extended to SUM counts instead of counting members).
    Returns ([C+M] keys, counts, n_runs) — caller slices back to
    capacity.

    The raw keys enter the merge sort DIRECTLY with count 1 — a
    pre-reduce of the batch (round 3 design) bought nothing: static
    shapes mean the reduced run array is still M rows of concatenated
    input, so the per-batch sort_reduce (a 1-op M sort plus a 3-op M
    stable partition) was pure overhead on top of the same-size combined
    sort. Removing it cut the accumulate:count ratio from 2.10x to 1.09x
    (slope-measured on v5e, tools/exp_khist2.py; BASELINE.md round-4
    khist row)."""
    all_k = jnp.concatenate([spec_keys, batch_keys])
    all_c = jnp.concatenate([
        spec_counts,
        (batch_keys != PAD).astype(jnp.int64),
    ])
    s, c = jax.lax.sort((all_k, all_c), num_keys=1)
    n = s.shape[0]
    boundary = jnp.concatenate(
        [jnp.ones(1, bool), s[1:] != s[:-1]]
    ) & (s != PAD)
    n_runs = boundary.sum()
    total = c.sum()
    excl = jnp.cumsum(c) - c  # count-sum before this row
    iota = jnp.arange(n, dtype=jnp.int32)
    # boundary bit packed into the key (see sort_reduce): a 16-byte
    # 2-operand partition sort instead of 20-byte 3-operand
    key2 = s | ((~boundary).astype(jnp.int64) << 62)
    k2s, ex = jax.lax.sort((key2, excl), num_keys=1, is_stable=True)
    values = k2s & ~(jnp.int64(1) << 62)
    nxt = jnp.concatenate([ex[1:], jnp.zeros(1, jnp.int64)])
    counts = jnp.where(iota < n_runs - 1, nxt - ex, total - ex)
    live = iota < n_runs
    return (
        jnp.where(live, values, PAD),
        jnp.where(live, counts, 0),
        n_runs,
    )


@partial(jax.jit, static_argnames=("k",))
def _accumulate_batch(bases, lengths, spec_keys, spec_counts, k):
    """Fused per-batch spectrum accumulate: extract + merge + slice back
    to the carry capacity, one dispatch. n_runs may exceed the capacity
    (the caller grows and retries; the sliced arrays are then invalid
    and discarded)."""
    keys = batch_kmers_jnp(bases, lengths, k)
    nk, nc, n_runs = _merge_spectra(spec_keys, spec_counts, keys)
    cap = spec_keys.shape[0]
    return nk[:cap], nc[:cap], n_runs


class DeviceSpectrum:
    """Device-resident exact spectrum: the merged (keys, counts) arrays
    live on the TPU across batches and only ONE scalar (the unique
    count) crosses the link per batch. This removes the per-batch
    spectrum readback cliff (measured 128x: 11.3k reads/s with per-batch
    pulls vs 1.45M device-only — BENCH_r02 extras); the full spectrum
    transfers once, at the end, via spectrum(). Capacity doubles on
    overflow (one recompile per power of two, ScheduleMaker's resize
    schedule role, kmer/ScheduleMaker.java:16)."""

    def __init__(self, k: int, cap: int = 1 << 21, sync_every: int = 8):
        self.k = k
        self.cap = cap
        self.keys = jnp.full(cap, PAD, jnp.int64)
        self.counts = jnp.zeros(cap, jnp.int64)
        self.n = 0
        #: overflow-sync cadence: the per-batch n_runs scalars stay on
        #: device for up to sync_every batches so dispatches pipeline
        #: (each forced pull costs a full link round trip on remote
        #: harnesses); a checkpointed carry + kept batch refs make a
        #: LATE overflow exactly replayable after growth
        self.sync_every = max(1, sync_every)
        self._pending: list = []  # per-batch n_runs device scalars
        self._replay: list = []  # (bases, lengths) since the checkpoint
        self._ckpt = (self.keys, self.counts)

    def _grow(self, need: int | None = None):
        while True:
            # cap is ALWAYS derived from the live array (a checkpoint
            # restore may have rolled the arrays back below self.cap)
            pad = int(self.keys.shape[0])
            self.cap = 2 * pad
            self.keys = jnp.concatenate(
                [self.keys, jnp.full(pad, PAD, jnp.int64)]
            )
            self.counts = jnp.concatenate(
                [self.counts, jnp.zeros(pad, jnp.int64)]
            )
            if need is None or self.cap >= need:
                return

    def add_batch(self, bases, lengths):
        """bases [B, L] uint8 (host or device), lengths [B]."""
        # ONE fused dispatch per batch (extract + sort-reduce + merge +
        # slice-to-cap); the overflow check syncs only every
        # sync_every batches, so the link round trip amortizes and the
        # device pipeline stays full. jnp.asarray keeps device arrays
        # resident.
        bases = jnp.asarray(bases)
        lengths = jnp.asarray(lengths)
        nk, nc, n_runs = _accumulate_batch(
            bases, lengths, self.keys, self.counts, self.k,
        )
        self.keys, self.counts = nk, nc
        self._pending.append(n_runs)
        self._replay.append((bases, lengths))
        if len(self._pending) >= self.sync_every:
            self._sync()

    def _sync(self):
        if not self._pending:
            return
        ns = [int(x) for x in self._pending]  # pipelined forced pulls
        if max(ns) <= self.cap:
            self.n = ns[-1]
            self._ckpt = (self.keys, self.counts)
            self._pending.clear()
            self._replay.clear()
            return
        # late overflow: restore the checkpointed carry (immutable jax
        # arrays — holding the refs IS the checkpoint), grow past the
        # largest observed run count, and replay the kept batches
        self.keys, self.counts = self._ckpt
        self.cap = int(self.keys.shape[0])
        replay = self._replay
        self._pending = []
        self._replay = []
        self._grow(need=max(ns))
        for b, ln in replay:
            self.add_batch(b, ln)
        self._sync()

    def flush(self):
        self._sync()

    def spectrum(self):
        """One final readback: (sorted int64 keys [n], counts [n])."""
        self._sync()
        if getattr(self, "_host", None) is None:
            self._host = (
                np.asarray(self.keys[: self.n]),
                np.asarray(self.counts[: self.n]),
            )
        return self._host

    @property
    def host_keys(self):
        return self.spectrum()[0]

    @property
    def host_counts(self):
        return self.spectrum()[1]

    @property
    def n_unique(self):
        self._sync()
        return self.n

    def histogram(self, hist_max: int) -> np.ndarray:
        """On-device histogram finalization: only [hist_max+1] int64
        returns to the host (khist= never pays the spectrum transfer)."""
        self._sync()

        @partial(jax.jit, static_argnames=("hm",))
        def hist(counts, n, hm):
            live = jnp.arange(counts.shape[0]) < n
            cl = jnp.clip(counts, 0, hm)
            # compare-sum bincount in [hm+1, chunk] tiles (scatter-free)
            bins = jnp.arange(hm + 1, dtype=jnp.int64)[:, None]
            CH = 1 << 16
            C = counts.shape[0]
            pad = (-C) % CH
            clp = jnp.pad(cl, (0, pad))
            lvp = jnp.pad(live, (0, pad))

            def step(acc, x):
                cc, ll = x
                acc = acc + jnp.sum(
                    (cc[None, :] == bins) & ll[None, :], axis=1,
                    dtype=jnp.int64,
                )
                return acc, None

            acc, _ = jax.lax.scan(
                step,
                jnp.zeros(hm + 1, jnp.int64),
                (clp.reshape(-1, CH), lvp.reshape(-1, CH)),
            )
            return acc

        h = np.asarray(hist(self.counts, self.n, hist_max)).copy()
        h[0] = 0
        return h


class KmerSpectrum:
    """Host-side merged exact spectrum: sorted kmers + int64 counts."""

    def __init__(self, k: int):
        self.k = k
        self.keys = np.zeros(0, dtype=np.int64)
        self.counts = np.zeros(0, dtype=np.int64)
        self._pending: list[tuple[np.ndarray, np.ndarray]] = []
        self._pending_size = 0

    def add_batch(self, values: np.ndarray, counts: np.ndarray):
        self._pending.append((values, counts))
        self._pending_size += len(values)
        if self._pending_size > max(4 * len(self.keys), 1 << 22):
            self.flush()

    def flush(self):
        if not self._pending:
            return
        all_k = np.concatenate([self.keys] + [p[0] for p in self._pending])
        all_c = np.concatenate([self.counts] + [p[1] for p in self._pending])
        order = np.argsort(all_k, kind="stable")
        all_k = all_k[order]
        all_c = all_c[order]
        boundary = np.ones(len(all_k), dtype=bool)
        boundary[1:] = all_k[1:] != all_k[:-1]
        idx = np.cumsum(boundary) - 1
        self.keys = all_k[boundary]
        self.counts = np.zeros(len(self.keys), dtype=np.int64)
        np.add.at(self.counts, idx, all_c)
        self._pending = []
        self._pending_size = 0

    @property
    def n_unique(self) -> int:
        self.flush()
        return len(self.keys)

    def histogram(self, hist_max: int) -> np.ndarray:
        """hist[c] = number of distinct kmers with count c; counts > max
        accumulate in the last bin (HistogramMaker semantics)."""
        self.flush()
        h = np.zeros(hist_max + 1, dtype=np.int64)
        np.add.at(h, np.minimum(self.counts, hist_max), 1)
        h[0] = 0
        return h


def count_batch_np(bases, lengths, k: int):
    """Host oracle for tests."""
    fwd, rkm, runlen = rolling_kmers_np(bases, k)
    i_idx = np.arange(bases.shape[1])[None, :]
    valid = (runlen >= k) & (i_idx < lengths[:, None])
    keys = np.maximum(fwd, rkm)[valid]
    values, counts = np.unique(keys, return_counts=True)
    return values, counts.astype(np.int64)
