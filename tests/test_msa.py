import numpy as np
import pytest

from bbtools_tpu.ops import msa_constants as C
from bbtools_tpu.ops.msa import msa_fill_batch
from bbtools_tpu.ops.msa_oracle import fill_limited, fill_unlimited

rng = np.random.default_rng(31337)


def make_task(R=40, pad_r=72, pad_c=112, sub=0.05, ins=0.0, dele=0.0, flank=8):
    """Read drawn from a ref window with mutations; returns padded arrays."""
    ref_len = R + 2 * flank
    ref = rng.integers(0, 4, ref_len).astype(np.uint8)
    read = ref[flank : flank + R].copy()
    # substitutions
    m = rng.random(R) < sub
    read[m] = (read[m] + rng.integers(1, 4, m.sum())) % 4
    # single indel events
    if ins > 0 and rng.random() < ins * 10:
        p = int(rng.integers(5, R - 5))
        read = np.concatenate([read[:p], rng.integers(0, 4, 2).astype(np.uint8), read[p:]])[:R]
    if dele > 0 and rng.random() < dele * 10:
        p = int(rng.integers(5, R - 5))
        read = np.concatenate([read[:p], read[p + 2 :], rng.integers(0, 4, 2).astype(np.uint8)])[:R]
    reads = np.full(pad_r, 0, np.uint8)
    reads[:R] = read
    refs = np.full(pad_c, 0, np.uint8)
    refs[:ref_len] = ref
    return reads, R, refs, ref_len


class TestUnlimited:
    def test_vs_oracle_random(self):
        B = 12
        tasks = [
            make_task(R=30 + 2 * i, sub=0.02 * (i % 4), ins=0.02 * (i % 2), dele=0.02 * ((i // 2) % 2))
            for i in range(B)
        ]
        reads = np.stack([t[0] for t in tasks])
        rlens = np.array([t[1] for t in tasks], np.int32)
        refs = np.stack([t[2] for t in tasks])
        clens = np.array([t[3] for t in tasks], np.int32)
        ms, mc, mst = msa_fill_batch(
            reads, rlens, refs, clens, np.zeros(B, np.int64), prune=False
        )
        for b in range(B):
            _, _, res = (None, None, None)
            sc, tm, res = (
                *fill_unlimited(reads[b, : rlens[b]], refs[b, : clens[b]])[:2],
                fill_unlimited(reads[b, : rlens[b]], refs[b, : clens[b]])[2],
            )
            rows, ocol, ostate, oscore = res
            assert ms[b] == oscore, f"task {b}: {ms[b]} vs {oscore}"
            assert mc[b] == ocol, f"task {b} col: {mc[b]} vs {ocol}"
            assert mst[b] == ostate, f"task {b} state"

    def test_perfect_match_score(self):
        R = 50
        reads, rl, refs, cl = make_task(R=R, sub=0.0)
        ms, mc, mst = msa_fill_batch(
            reads[None], np.array([rl], np.int32), refs[None],
            np.array([cl], np.int32), np.zeros(1, np.int64), prune=False,
        )
        assert ms[0] == C.POINTS_MATCH + (R - 1) * C.POINTS_MATCH2
        assert mst[0] == C.MODE_MS

    def test_with_n_bases(self):
        reads, rl, refs, cl = make_task(R=40, sub=0.0)
        reads[5] = 4  # N in read
        refs[20] = 4  # N in ref
        ms, mc, mst = msa_fill_batch(
            reads[None], np.array([rl], np.int32), refs[None],
            np.array([cl], np.int32), np.zeros(1, np.int64), prune=False,
        )
        _, _, res = fill_unlimited(reads[:rl], refs[:cl])
        assert (ms[0], mc[0], mst[0]) == (res[3], res[1], res[2])


class TestLimited:
    @pytest.mark.parametrize("minratio", [0.4, 0.7])
    def test_vs_oracle(self, minratio):
        B = 10
        tasks = [
            make_task(R=60, pad_r=64, pad_c=96, sub=0.03 * (i % 3), ins=0.01 * (i % 2))
            for i in range(B)
        ]
        reads = np.stack([t[0] for t in tasks])
        rlens = np.array([t[1] for t in tasks], np.int32)
        refs = np.stack([t[2] for t in tasks])
        clens = np.array([t[3] for t in tasks], np.int32)
        maxscore = C.POINTS_MATCH + (rlens.astype(np.int64) - 1) * C.POINTS_MATCH2
        min_score = (maxscore * minratio).astype(np.int64)
        ms, mc, mst = msa_fill_batch(reads, rlens, refs, clens, min_score, prune=True)
        for b in range(B):
            sc, tm, res = fill_limited(
                reads[b, : rlens[b]], refs[b, : clens[b]], int(min_score[b])
            )
            if res is None:
                assert ms[b] < min_score[b] - C.MIN_SCORE_ADJUST, f"task {b}"
            else:
                rows, ocol, ostate, oscore = res
                assert ms[b] == oscore, f"task {b}: {ms[b]} vs {oscore}"
                assert mc[b] == ocol, f"task {b} col"
                assert mst[b] == ostate, f"task {b} state"

    def test_unlimited_vs_limited_consistency(self):
        """On an easy alignment, limited (high floor) and unlimited agree."""
        reads, rl, refs, cl = make_task(R=70, pad_r=72, pad_c=96, sub=0.02)
        # dispatch condition requires cols+rows>=90 and cols<=rows+... here
        # cols+rows = 156 >= 90, cols (86) <= rows+min(170, rows+20) ok
        min_score = np.array([int(0.6 * (C.POINTS_MATCH + (rl - 1) * C.POINTS_MATCH2))], np.int64)
        msl, mcl, mstl = msa_fill_batch(
            reads[None], np.array([rl], np.int32), refs[None],
            np.array([cl], np.int32), min_score, prune=True,
        )
        msu, mcu, mstu = msa_fill_batch(
            reads[None], np.array([rl], np.int32), refs[None],
            np.array([cl], np.int32), np.zeros(1, np.int64), prune=False,
        )
        if msl[0] >= min_score[0] - C.MIN_SCORE_ADJUST:
            assert msl[0] == msu[0]
            assert mcl[0] == mcu[0]


class TestTraceback:
    def test_walk_vs_oracle(self):
        import jax.numpy as jnp

        from bbtools_tpu.ops.msa import (
            match_strings_np,
            msa_fill,
            msa_walk,
            prepare_limits_np,
        )
        from bbtools_tpu.ops.msa_oracle import traceback as oracle_tb

        B = 10
        tasks = [
            make_task(R=40 + i, pad_r=56, pad_c=80, sub=0.04 * (i % 3),
                      ins=0.02 * (i % 2), dele=0.02 * ((i + 1) % 2))
            for i in range(B)
        ]
        reads = np.stack([t[0] for t in tasks])
        rlens = np.array([t[1] for t in tasks], np.int32)
        refs = np.stack([t[2] for t in tasks])
        clens = np.array([t[3] for t in tasks], np.int32)
        R, Cc = reads.shape[1], refs.shape[1]
        ms0 = np.zeros(B, np.int64)
        vert, horiz, floor, subfloor = prepare_limits_np(reads, rlens, refs, clens, ms0)
        maxgain = (rlens.astype(np.int64) - 1) * C.POINTS_MATCH2 + C.POINTS_MATCH
        bs, bc, bst, planes = msa_fill(
            R, Cc, False, True,
            jnp.asarray(reads), jnp.asarray(rlens), jnp.asarray(refs),
            jnp.asarray(clens), jnp.asarray(vert.astype(np.int32)),
            jnp.asarray(horiz.astype(np.int32)),
            jnp.asarray(floor.astype(np.int32)),
            jnp.asarray((-2 * maxgain).astype(np.int32)),
        )
        ops, nsteps = msa_walk(R, Cc, planes, jnp.asarray(rlens), bs if False else bc, bst)
        matches = match_strings_np(
            np.asarray(ops), np.asarray(nsteps), reads, rlens, refs, clens,
            np.asarray(bc),
        )
        for b in range(B):
            sc, tm, res = fill_unlimited(reads[b, : rlens[b]], refs[b, : clens[b]])
            rows, ocol, ostate, oscore = res
            want = oracle_tb(
                sc, tm, reads[b, : rlens[b]], refs[b, : clens[b]], rows, ocol, ostate
            )
            assert matches[b] == want, f"task {b}:\n{matches[b]}\n{want}"
            # sanity: ops consume the whole read
            ndiag = want.count(b"m") + want.count(b"S") + want.count(b"N")
            nins = want.count(b"I") + want.count(b"X") + want.count(b"Y")
            assert ndiag + nins == rlens[b]


def test_pallas_fill_matches_wavefront():
    """Pallas MSA kernel (interpret mode) is bit-equal to the XLA path."""
    import jax.numpy as jnp

    from bbtools_tpu.ops.msa_pallas import msa_fill_pallas, prepare_refp

    B, R, Cc = 8, 48, 80
    reads = np.zeros((B, R), np.uint8)
    rlens = np.array([30 + 2 * i for i in range(B)], np.int32)
    refs = rng.integers(0, 4, (B, Cc)).astype(np.uint8)
    for b in range(B):
        rl = int(rlens[b])
        reads[b, :rl] = refs[b, 5 : 5 + rl]
        m = rng.random(rl) < 0.06
        reads[b, :rl][m] = (reads[b, :rl][m] + rng.integers(1, 4, m.sum())) % 4
    clens = np.full(B, Cc, np.int32)
    ms, mc, mst = msa_fill_batch(
        reads, rlens, refs, clens, np.zeros(B, np.int64), prune=False
    )
    refp = prepare_refp(refs, R)
    ps, pc, pst = msa_fill_pallas(
        R, Cc, jnp.asarray(reads), jnp.asarray(rlens), jnp.asarray(refp),
        tile=8, interpret=True,
    )
    np.testing.assert_array_equal(ms, np.asarray(ps))
    np.testing.assert_array_equal(mc, np.asarray(pc))
    np.testing.assert_array_equal(mst, np.asarray(pst))


def test_pallas_traceback_matches_wavefront():
    """Pallas traceback planes walk to the same ops as the XLA fill."""
    import jax.numpy as jnp

    from bbtools_tpu.ops.msa import msa_fill, msa_walk, prepare_limits_np
    from bbtools_tpu.ops import msa_constants as C
    from bbtools_tpu.ops.msa_pallas import msa_fill_pallas, prepare_refp

    B, R, Cc = 8, 32, 56
    reads = np.zeros((B, R), np.uint8)
    rlens = np.array([24 + i for i in range(B)], np.int32)
    refs = rng.integers(0, 4, (B, Cc)).astype(np.uint8)
    for b in range(B):
        rl = int(rlens[b])
        reads[b, :rl] = refs[b, 4 : 4 + rl]
        m = rng.random(rl) < 0.08
        reads[b, :rl][m] = (reads[b, :rl][m] + rng.integers(1, 4, m.sum())) % 4
    clens = np.full(B, Cc, np.int32)
    maxgain = (rlens.astype(np.int64) - 1) * C.POINTS_MATCH2 + C.POINTS_MATCH
    vert, horiz, floor, _ = prepare_limits_np(
        reads, rlens, refs, clens, np.zeros(B, np.int64)
    )
    xs, xc, xst, xpl = msa_fill(
        R, Cc, False, True,
        jnp.asarray(reads), jnp.asarray(rlens), jnp.asarray(refs),
        jnp.asarray(clens),
        jnp.asarray(vert.astype(np.int32)), jnp.asarray(horiz.astype(np.int32)),
        jnp.asarray(floor.astype(np.int32)),
        jnp.asarray((-2 * maxgain).astype(np.int32)),
    )
    refp = prepare_refp(refs, R)
    ps, pc, pst, ppl = msa_fill_pallas(
        R, Cc, jnp.asarray(reads), jnp.asarray(rlens), jnp.asarray(refp),
        tile=8, interpret=True, traceback=True,
    )
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(ps))
    np.testing.assert_array_equal(np.asarray(xc), np.asarray(pc))
    np.testing.assert_array_equal(np.asarray(xst), np.asarray(pst))
    xo, xn = msa_walk(R, Cc, xpl, jnp.asarray(rlens), xc, xst)
    po, pn = msa_walk(R, Cc, ppl, jnp.asarray(rlens), pc, pst)
    np.testing.assert_array_equal(np.asarray(xn), np.asarray(pn))
    np.testing.assert_array_equal(np.asarray(xo), np.asarray(po))


def test_pallas_fill_big_tile():
    """The multi-lane-tile configuration (tile=32, B not a tile multiple
    pre-padding) matches the XLA path — covers the adaptive-tile sizes
    msa_fill_tb_auto picks on TPU."""
    import jax.numpy as jnp

    from bbtools_tpu.ops.msa_pallas import msa_fill_pallas, prepare_refp

    B, R, Cc = 32, 40, 72
    rng2 = np.random.default_rng(11)
    reads = np.zeros((B, R), np.uint8)
    rlens = (24 + rng2.integers(0, R - 24, B)).astype(np.int32)
    refs = rng2.integers(0, 4, (B, Cc)).astype(np.uint8)
    for b in range(B):
        rl = int(rlens[b])
        reads[b, :rl] = refs[b, 3 : 3 + rl]
        m = rng2.random(rl) < 0.1
        reads[b, :rl][m] = (reads[b, :rl][m] + rng2.integers(1, 4, m.sum())) % 4
    clens = np.full(B, Cc, np.int32)
    ms, mc, mst = msa_fill_batch(
        reads, rlens, refs, clens, np.zeros(B, np.int64), prune=False
    )
    refp = prepare_refp(refs, R)
    ps, pc, pst = msa_fill_pallas(
        R, Cc, jnp.asarray(reads), jnp.asarray(rlens), jnp.asarray(refp),
        tile=32, interpret=True,
    )
    np.testing.assert_array_equal(ms, np.asarray(ps))
    np.testing.assert_array_equal(mc, np.asarray(pc))
    np.testing.assert_array_equal(mst, np.asarray(pst))
