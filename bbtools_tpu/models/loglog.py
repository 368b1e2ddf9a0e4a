"""LogLog — streaming distinct-kmer cardinality (cardinality/LogLog16).

Production-variant equivalent of cardinality/CardinalityTracker.java:25
(`loglog` flags across tools): per-kmer 64-bit hash, bucketed by the low
bits, tracking max leading-zero rank per bucket; harmonic-mean HyperLogLog
estimate with small/large-range corrections. Device-friendly: ranks
computed batched (numpy here; the hash+max is a trivial jnp reduction for
on-device use).
"""

from __future__ import annotations

import sys

import numpy as np

from ..core.parser import tokenize
from ..io.stream import read_batches
from ..ops.kmer_count import batch_kmers_jnp, PAD
from ..ops.kmer_index import _mix64


class LogLog:
    def __init__(self, buckets: int = 2048, k: int = 31):
        assert buckets & (buckets - 1) == 0
        self.p = int(np.log2(buckets))
        self.m = buckets
        self.k = k
        self.maxima = np.zeros(buckets, dtype=np.int64)

    def hash_kmers(self, keys: np.ndarray):
        h = _mix64(keys.astype(np.uint64))
        bucket = (h & np.uint64(self.m - 1)).astype(np.int64)
        rest = (h >> np.uint64(self.p)).astype(np.uint64)
        # rank = leading position of first set bit in the remaining 64-p bits
        bits = 64 - self.p
        rank = np.full(len(keys), bits + 1, dtype=np.int64)
        v = rest
        found = np.zeros(len(keys), dtype=bool)
        for b in range(bits):
            is_set = ((v >> np.uint64(b)) & np.uint64(1)) == 1
            newly = is_set & ~found
            rank[newly] = b + 1
            found |= newly
        np.maximum.at(self.maxima, bucket, rank)

    def add_batch(self, bases, lengths):
        keys = np.asarray(batch_kmers_jnp(bases, lengths, self.k))
        keys = keys[keys != PAD]
        if len(keys):
            self.hash_kmers(keys)

    def cardinality(self) -> int:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.maxima.astype(np.float64))
        zeros = int((self.maxima == 0).sum())
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)
        return int(round(est))


def main(argv=None):
    a = tokenize(argv if argv is not None else sys.argv[1:])
    in1 = a.get("in", "in1")
    k = a.get_int("k", default=31)
    buckets = a.get_int("buckets", default=2048)
    ll = LogLog(buckets=buckets, k=k)
    reader = read_batches(in1)
    import jax.numpy as jnp

    for b in reader:
        ll.add_batch(jnp.asarray(b.bases), jnp.asarray(b.lengths), )
    card = ll.cardinality()
    print(f"Cardinality:         \t{card}")
    return card


if __name__ == "__main__":
    main()
