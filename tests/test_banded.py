import numpy as np
import pytest

from bbtools_tpu.ops.banded import (
    align_pairs_jnp,
    align_quadruple_np,
    banded_edits_jnp,
    banded_edits_np,
)

rng = np.random.default_rng(77)


def _mutate(seq, n_sub=0, n_ins=0, n_del=0):
    s = list(seq)
    for _ in range(n_sub):
        p = rng.integers(3, len(s) - 3)
        s[p] = (s[p] + 1) % 4
    for _ in range(n_ins):
        p = rng.integers(3, len(s) - 3)
        s.insert(p, int(rng.integers(0, 4)))
    for _ in range(n_del):
        p = rng.integers(3, len(s) - 3)
        del s[p]
    return np.array(s, dtype=np.uint8)


def test_oracle_basics():
    a = rng.integers(0, 4, 60).astype(np.uint8)
    assert banded_edits_np(a, a, 4) == 0
    b = a.copy()
    b[30] = (b[30] + 1) % 4
    assert banded_edits_np(a, b, 4) == 1
    # deletion of 2 in b: edit distance 2
    c = np.concatenate([a[:20], a[22:]])
    got = banded_edits_np(c, a, 4)
    assert got == 2, got


def test_jnp_matches_oracle_random():
    import jax.numpy as jnp

    B, L = 48, 80
    max_edits = 4
    qs, rs, qls, rls, want = [], [], [], [], []
    for i in range(B):
        a = rng.integers(0, 4, L).astype(np.uint8)
        kind = i % 4
        if kind == 0:
            b = a.copy()
        elif kind == 1:
            b = _mutate(a, n_sub=int(rng.integers(1, 4)))
        elif kind == 2:
            b = _mutate(a, n_ins=1, n_sub=1)
        else:
            b = rng.integers(0, 4, L).astype(np.uint8)  # unrelated
        qa = np.full(L, 99, np.uint8)
        ra = np.full(L, 99, np.uint8)
        qa[: len(a)] = a
        ra[: len(b)] = b[:L]
        qs.append(qa)
        rs.append(ra)
        qls.append(len(a))
        rls.append(min(len(b), L))
        # oracle applies the swap rule itself
        want.append(
            banded_edits_np(a, b[:L], max_edits)
            if len(a) <= min(len(b), L)
            else banded_edits_np(b[:L], a, max_edits)
        )
    got = np.asarray(
        align_pairs_jnp(
            jnp.asarray(np.array(qs)),
            jnp.asarray(np.array(qls, np.int32)),
            jnp.asarray(np.array(rs)),
            jnp.asarray(np.array(rls, np.int32)),
            max_edits,
        )
    )
    for i in range(B):
        if want[i] > max_edits:
            assert got[i] > max_edits, (i, got[i], want[i])
        else:
            assert got[i] == want[i], (i, got[i], want[i])


def test_quadruple_rc():
    a = rng.integers(0, 4, 50).astype(np.uint8)
    rc = (3 - a)[::-1]
    # a vs its own reverse complement: quadruple should see 0 edits
    assert align_quadruple_np(a, rc, 3) == 0
    b = rc.copy()
    b[25] = (b[25] + 1) % 4
    assert align_quadruple_np(a, b, 3) == 1


def test_glocal_identity():
    from bbtools_tpu.ops.idalign import glocal_align_np, make_id_aligner

    rng2 = np.random.default_rng(5)
    r = rng2.integers(0, 4, 200).astype(np.uint8)
    q = r[50:150].copy()
    ident, rstart, rstop = glocal_align_np(q, r)
    assert ident == 1.0
    assert (rstart, rstop) == (50, 149)
    # 5 substitutions -> identity 95/100
    q2 = q.copy()
    for p in (10, 30, 50, 70, 90):
        q2[p] = (q2[p] + 1) % 4
    ident2, a, b = glocal_align_np(q2, r)
    assert abs(ident2 - 0.95) < 1e-6
    # deletion in query: 99 matches / 100 cols
    q3 = np.delete(q, 40)
    ident3, _, _ = glocal_align_np(q3, r)
    assert abs(ident3 - 99 / 100) < 1e-6
    # factory + interface
    al = make_id_aligner("glocal")
    pos = [0, 0]
    assert al.align(q, r, pos) == 1.0 and pos == [50, 149]
    bd = make_id_aligner("banded")
    assert bd.align(q, q2) > 0.94


def test_banded_batch_identity():
    from bbtools_tpu.ops.idalign import BandedIDAligner

    rng2 = np.random.default_rng(6)
    B, L = 16, 120
    qs = rng2.integers(0, 4, (B, L)).astype(np.uint8)
    rs = qs.copy()
    for i in range(B):
        for _ in range(i % 5):
            p = rng2.integers(5, L - 5)
            rs[i, p] = (rs[i, p] + 1) % 4
    ident = BandedIDAligner().align_batch(
        qs, np.full(B, L, np.int32), rs, np.full(B, L, np.int32)
    )
    for i in range(B):
        assert ident[i] >= 1.0 - (i % 5) / L - 1e-6


def test_wavefront_and_drifting_aligners():
    import numpy as np

    from bbtools_tpu.ops.idalign import (
        DriftingIDAligner,
        WaveFrontIDAligner,
        make_id_aligner,
        wavefront_edits_np,
    )

    rng = np.random.default_rng(3)
    q = rng.integers(0, 4, 120).astype(np.uint8)
    # wavefront = exact Levenshtein (check vs dense DP)
    def lev(a, b):
        m, n = len(a), len(b)
        d = np.arange(n + 1)
        for i in range(1, m + 1):
            prev = d.copy()
            d[0] = i
            for j in range(1, n + 1):
                d[j] = min(prev[j] + 1, d[j - 1] + 1,
                           prev[j - 1] + (a[i - 1] != b[j - 1]))
        return int(d[n])

    for trial in range(8):
        r = q.copy()
        for _ in range(int(rng.integers(0, 8))):
            p = int(rng.integers(0, len(r)))
            op = rng.integers(0, 3)
            if op == 0:
                r[p] ^= 1
            elif op == 1 and len(r) > 10:
                r = np.delete(r, p)
            else:
                r = np.insert(r, p, rng.integers(0, 4))
        want = lev(q, r)
        assert wavefront_edits_np(q, r) == want
        wf = WaveFrontIDAligner().align(q, r)
        assert abs(wf - (1 - want / max(len(q), len(r)))) < 1e-9
        # drifting: close to exact for small edit loads
        dr = DriftingIDAligner().align(q, r)
        assert dr <= 1.0 and dr >= wf - 0.1
    # drifting tracks indels within its band width (the reference engine
    # additionally uses a prealignment pass for longer jumps); an 8bp
    # deletion is recovered near-exactly
    r = np.concatenate([q[:50], q[58:]])
    assert DriftingIDAligner().align(r, q) > 0.9
    assert make_id_aligner("wavefront").name() == "WaveFront"
    assert make_id_aligner("drifting").name() == "Drifting"
    assert make_id_aligner("quantum").name() == "Quantum"
    assert make_id_aligner("wobble").name() == "Wobble"
    assert make_id_aligner("ssa2").name() == "Glocal"


def test_quantum_and_wobble_aligners():
    """Quantum (sparse active set + teleporting deletions) and Wobble
    (dynamic-width band) match the exact glocal identity on mutation
    ladders and recover LONG deletions that fixed bands cannot."""
    import numpy as np

    from bbtools_tpu.ops.idalign import (
        GlocalAligner,
        QuantumIDAligner,
        WobbleIDAligner,
    )

    rng = np.random.default_rng(7)
    q = rng.integers(0, 4, 150).astype(np.uint8)
    ex = GlocalAligner()
    qa = QuantumIDAligner()
    wa = WobbleIDAligner()
    # Test.validate pins (idaligner/Test.java): gapped beats double-sub
    aa = np.array([0, 0], np.uint8)
    aga = np.array([0, 2, 0], np.uint8)
    assert abs(qa.align(aa, aga) - 2 / 3) < 1e-9
    assert abs(wa.align(aa, aga) - 2 / 3) < 1e-9
    for trial in range(10):
        r = q.copy()
        for _ in range(int(rng.integers(0, 10))):
            p = int(rng.integers(0, len(r)))
            op = rng.integers(0, 3)
            if op == 0:
                r[p] ^= 1
            elif op == 1 and len(r) > 20:
                r = np.delete(r, p)
            else:
                r = np.insert(r, p, rng.integers(0, 4))
        want = ex.align(q, r)
        assert abs(qa.align(q, r) - want) < 0.02, trial
        assert abs(wa.align(q, r) - want) < 0.02, trial
    # teleportation: a 100bp deletion mid-read (optimal under unit
    # costs: -100 for the bridge vs ~-180 for staying contiguous).
    # Quantum explores only a narrow active set yet prices the jump;
    # Drifting's fixed 21-wide band cannot represent it.
    ref2 = rng.integers(0, 4, 400).astype(np.uint8)
    q2 = np.concatenate([ref2[:120], ref2[220:340]])
    want2 = ex.align(q2, ref2)
    assert want2 > 0.68  # 240 matches / 340 columns
    idq = qa.align(q2, ref2)
    assert abs(idq - want2) < 0.02, (idq, want2)
    # wobble widens into the gap and recovers within a few rows
    assert abs(wa.align(q2, ref2) - want2) < 0.05
