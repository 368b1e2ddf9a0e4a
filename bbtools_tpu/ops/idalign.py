"""IDAligner family — identity-only aligners behind one interface.

Reference: idaligner/IDAligner.java (interface: name(), align(q, r[,pos])
-> identity fraction), idaligner/Factory.java (name -> implementation).
That package is a 67-file research family (Banded/Drifting/Glocal/
Quantum/WaveFront...); here the interface is served by two engines:

  - "glocal": exact glocal DP (query end-to-end, free ref start/end) with
    host traceback for the exact matches/columns identity — the accuracy
    reference (GlocalAligner.java role).
  - "banded": the batched banded edit-distance device kernel
    (ops/banded.py) with identity = 1 - edits/max(qlen, window) — the
    throughput engine (BandedAligner.java role).

Scoring for glocal follows the family's unit model: match +1, sub -1,
gap -2 (idaligner/Tracer semantics: identity = matches / columns).
"""

from __future__ import annotations

import numpy as np

MATCH, SUB, GAP = 1, -1, -2


def glocal_align_np(q: np.ndarray, r: np.ndarray):
    """Exact glocal alignment. Returns (identity, rstart, rstop).

    Query is global (fully aligned); ref start/end are free.
    """
    m, n = len(q), len(r)
    if m == 0 or n == 0:
        return 0.0, 0, -1
    NEG = -(1 << 30)
    score = np.zeros((m + 1, n + 1), dtype=np.int64)
    score[1:, 0] = GAP * np.arange(1, m + 1)  # query must be consumed
    ptr = np.zeros((m + 1, n + 1), dtype=np.int8)  # 0 diag, 1 up, 2 left
    for i in range(1, m + 1):
        sub = np.where(r == q[i - 1], MATCH, SUB)
        diag = score[i - 1, :-1] + sub
        up = score[i - 1, 1:] + GAP
        best = np.maximum(diag, up)
        p = np.where(diag >= up, 0, 1).astype(np.int8)
        # left dependency: prefix-max of (best[j] + GAP*(n-j)) relaxation
        row = np.empty(n + 1, dtype=np.int64)
        row[0] = score[i, 0]
        cur = row[0]
        for j in range(1, n + 1):
            left = cur + GAP
            if best[j - 1] >= left:
                cur = best[j - 1]
                ptr[i, j] = p[j - 1]
            else:
                cur = left
                ptr[i, j] = 2
            row[j] = cur
        score[i] = row
    j = int(np.argmax(score[m]))
    rstop = j - 1
    matches = cols = 0
    i = m
    while i > 0 and j >= 0:
        d = ptr[i, j] if j > 0 else 1
        if j == 0:
            d = 1
        if d == 0:
            cols += 1
            if r[j - 1] == q[i - 1]:
                matches += 1
            i -= 1
            j -= 1
        elif d == 1:
            cols += 1
            i -= 1
        else:
            cols += 1
            j -= 1
    rstart = j
    identity = matches / cols if cols else 0.0
    return float(identity), int(rstart), int(rstop)


class GlocalAligner:
    def name(self) -> str:
        return "Glocal"

    def align(self, q, r, pos=None) -> float:
        ident, rstart, rstop = glocal_align_np(
            np.asarray(q, np.uint8), np.asarray(r, np.uint8)
        )
        if pos is not None:
            pos[0], pos[1] = rstart, rstop
        return ident


class BandedIDAligner:
    def __init__(self, max_edits: int = 40):
        self.max_edits = max_edits

    def name(self) -> str:
        return "Banded"

    def align(self, q, r, pos=None) -> float:
        from .banded import banded_edits_np

        q = np.asarray(q, np.uint8)
        r = np.asarray(r, np.uint8)
        a, b = (q, r) if len(q) <= len(r) else (r, q)
        edits = banded_edits_np(a, b, self.max_edits, max_width=81)
        edits = min(edits, max(len(q), len(r)))
        if pos is not None:
            pos[0], pos[1] = 0, len(r) - 1
        return 1.0 - edits / max(len(q), len(r))

    def align_batch(self, q, qlen, r, rlen):
        """Batched device path: [B, L] code arrays -> identity [B]."""
        import jax.numpy as jnp

        from .banded import align_pairs_jnp

        edits = np.asarray(
            align_pairs_jnp(
                jnp.asarray(q), jnp.asarray(qlen),
                jnp.asarray(r), jnp.asarray(rlen),
                self.max_edits, max_width=81,
            )
        )
        denom = np.maximum(np.asarray(qlen), np.asarray(rlen))
        return 1.0 - np.minimum(edits, denom) / denom


def make_id_aligner(name: str = "glocal"):
    """Factory.java analog: name -> implementation."""
    name = name.lower()
    if name in ("glocal", "quantum", "wave", "wavefront", "crosscut",
                "drifting", "wobble"):
        return GlocalAligner()
    if name in ("banded", "ssa2", "ssa3"):
        return BandedIDAligner()
    raise ValueError(f"unknown aligner {name!r}")
