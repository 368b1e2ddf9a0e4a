"""Count-min sketch k-mer counter — the KCountArray analog.

Memory-bounded approximate counting (bloom/KCountArray7MTA.java:29: atomic
cell-packed counters with multiple hashes). TPU-era layout: `hashes`
independent lanes of a power-of-2 `cells` array of uint16 counters; an
increment updates one cell per lane, a query takes the min over lanes —
vectorized scatter-add / gather over numpy (host) with the same layout
ready for a device scatter implementation.
"""

from __future__ import annotations

import numpy as np

from .kmer_index import _mix64

_SALTS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


class CountMinSketch:
    def __init__(self, cells_per_hash: int = 1 << 22, hashes: int = 3,
                 max_count: int = 65535):
        assert cells_per_hash & (cells_per_hash - 1) == 0
        self.cells = cells_per_hash
        self.hashes = hashes
        self.max_count = max_count
        self.table = np.zeros((hashes, cells_per_hash), dtype=np.uint16)

    def _slots(self, keys: np.ndarray) -> np.ndarray:
        out = np.empty((self.hashes, len(keys)), dtype=np.int64)
        for h in range(self.hashes):
            out[h] = (
                _mix64(keys.astype(np.uint64) ^ _SALTS[h])
                & np.uint64(self.cells - 1)
            ).astype(np.int64)
        return out

    def add(self, keys: np.ndarray):
        """Increment each key once per lane (saturating)."""
        slots = self._slots(keys)
        for h in range(self.hashes):
            # conservative: count duplicates within the batch correctly
            uniq, counts = np.unique(slots[h], return_counts=True)
            cur = self.table[h, uniq].astype(np.int64)
            self.table[h, uniq] = np.minimum(cur + counts, self.max_count).astype(
                np.uint16
            )

    def query(self, keys: np.ndarray) -> np.ndarray:
        slots = self._slots(keys)
        est = np.full(len(keys), self.max_count, dtype=np.int64)
        for h in range(self.hashes):
            est = np.minimum(est, self.table[h, slots[h]].astype(np.int64))
        return est
