"""Site-selection parity: the PENALIZE_AMBIG ladder (applyClearzone3,
calcTipScorePenalty), the CLEARZONE1e many-near-best limit, and their
end-to-end MAPQ effects. Oracles are direct transliterations of the Java
algorithms (align2/AbstractMapThread.java:2159,2895;
align2/BBMapThread.java:589-640,752-790), used tests-only."""

import numpy as np
import pytest

from bbtools_tpu.io.fasta import load_reference, write_fasta
from bbtools_tpu.models.bbmap import (
    _CZ1E,
    _CZ3,
    _CZ3_MULTS,
    BBMap,
    BBMapConfig,
    apply_clearzone3,
    clearzone_for,
    max_quality,
    tip_score_penalty,
)
from bbtools_tpu.models.bbmap_index import SeedIndex
from bbtools_tpu.utils.synth import random_genome

rng = np.random.default_rng(777)


# -- oracles: literal two-pass transliterations ------------------------

def _oracle_cz3(scores, map_score, max_sw, read_len):
    """AbstractMapThread.applyClearzone3 with BBMapThread's cz3v2."""
    if len(scores) < 2:
        return 0
    cz3v2 = _CZ3 * min(1.25, max_sw / float(map_score))
    CLEARZONE3 = int(cz3v2)
    INV = 1.0 / cz3v2
    score1 = scores[0]
    sub = 0.0
    mx = min(len(_CZ3_MULTS), len(scores))
    for i in range(1, mx):
        s2 = scores[i]
        if i > 2 and s2 < scores[i - 1]:
            break
        dif = score1 - s2
        if dif >= CLEARZONE3:
            f = 0.0
        else:
            dif2 = CLEARZONE3 - dif
            ff = dif2 * INV
            f = ff + 2 * ff * ff + 2 * ff * ff * ff
        if f <= 0:
            break
        sub += f * _CZ3_MULTS[i]
    if sub <= 0:
        return 0
    asymptote = 4.0 + 0.03 * read_len
    sub = sub * 1.8
    sub2 = CLEARZONE3 * ((asymptote * sub) / (sub + asymptote))
    subi = int(sub2 + 0.5)
    if subi >= map_score - 300:
        subi = map_score - 300
    return subi if subi > 0 else 0


def _oracle_tip(match, bases, max_score, map_score, tiplen=7):
    """AbstractMapThread.calcTipScorePenalty, two explicit passes."""
    if not match or len(bases) < 2 * tiplen:
        return 0
    points = 0
    last = len(bases) - 1
    prev = ord("m")
    cpos = 0
    i = 0
    while cpos <= tiplen and i < len(match):
        b = match[i]
        if b == ord("m"):
            cpos += 1
        elif b == ord("D"):
            if prev != ord("D"):
                points += 2 * (tiplen + 2 - cpos)
        elif b in (ord("N"), ord("C"), ord("R")):
            points += tiplen + 2 - cpos
            cpos += 1
        else:
            points += 2 * (tiplen + 2 - cpos)
            cpos += 1
        prev = b
        i += 1
    prev = ord("m")
    cpos = 0
    i = len(match) - 1
    while cpos <= tiplen and i >= 0:
        b = match[i]
        if b == ord("m"):
            cpos += 1
        elif b == ord("D"):
            if prev != ord("D"):
                points += 2 * (tiplen + 2 - cpos)
        elif b in (ord("N"), ord("C"), ord("R")):
            points += tiplen + 2 - cpos
            cpos += 1
        else:
            points += 2 * (tiplen + 2 - cpos)
            cpos += 1
        prev = b
        i -= 1
    b0 = bases[0]
    if b0 != 4 and b0 == bases[1]:
        i = 2
        while i <= tiplen and bases[i] == b0:
            points += 1
            i += 1
    b0 = bases[last]
    if b0 != 4 and b0 == bases[last - 1]:
        i = last - 2
        while i >= last - tiplen and bases[i] == b0:
            points += 1
            i -= 1
    if points < 1:
        return 0
    asymptote = 80.0
    f = (asymptote * points) / (points + asymptote)
    penalty = int(f * 0.0022 * max_score)
    max_penalty = map_score - max_score // 10
    if max_penalty <= 0:
        return 0
    return min(penalty, max_penalty)


def test_apply_clearzone3_vs_oracle():
    for _ in range(200):
        n = int(rng.integers(2, 9))
        L = int(rng.integers(50, 400))
        max_sw = int(max_quality(L))
        top = int(rng.integers(max_sw // 2, max_sw + 1))
        drops = np.sort(rng.integers(0, 1200, n - 1))
        scores = [top] + [top - int(d) for d in drops]
        got = apply_clearzone3(scores, top, max_sw, L)
        want = _oracle_cz3(scores, top, max_sw, L)
        assert got == want, (scores, L, got, want)


def test_apply_clearzone3_tie_is_heavy():
    """A perfect tie costs thousands of points; a runner-up a full
    clearzone below costs nothing."""
    L = 120
    max_sw = int(max_quality(L))
    s = 10000
    assert apply_clearzone3([s, s], s, max_sw, L) > 2000
    assert apply_clearzone3([s, s - 2000], s, max_sw, L) == 0


def test_tip_penalty_vs_oracle():
    ops = [ord(c) for c in "mmmmmmSIDNC"]
    for _ in range(300):
        L = int(rng.integers(14, 200))
        match = bytes(rng.choice(ops, L).tolist())
        codes = rng.integers(0, 5, L).astype(np.uint8)
        max_sw = int(max_quality(L))
        ms = int(rng.integers(max_sw // 3, max_sw + 1))
        got = tip_score_penalty(match, codes, max_sw, ms)
        want = _oracle_tip(match, codes, max_sw, ms)
        assert got == want, (match, got, want)


def test_tip_penalty_perfect_is_zero():
    L = 100
    codes = (np.arange(L) % 4).astype(np.uint8)
    assert tip_score_penalty(b"m" * L, codes, int(max_quality(L)), 9000) == 0


def test_tip_penalty_hand_case():
    """1 sub at the first base of a 120 bp read: forward pass pays
    2*(7+2-0)=18 points -> f=80*18/98, penalty=int(f*0.0022*11970)."""
    L = 120
    codes = (np.arange(L) % 4).astype(np.uint8)
    match = b"S" + b"m" * (L - 1)
    want = int((80.0 * 18 / 98) * 0.0022 * 11970)
    assert tip_score_penalty(match, codes, 11970, 11000) == want


def test_clearzone_ladder_values():
    """BBMapThread.java:39-47 scaled by POINTS_MATCH2=100: perfect=160,
    high=interp(200..260), low floor=460."""
    max_sw = int(max_quality(150))
    assert clearzone_for(max_sw, max_sw) == 160
    blim = max_sw * 0.97 - 1200
    assert clearzone_for(int(blim) + 1, max_sw) <= 260
    assert clearzone_for(max_sw - 1, max_sw) >= 200
    assert clearzone_for(int(max_sw * 0.5), max_sw) == 460
    assert _CZ1E == 258


# -- end-to-end MAPQ / ambiguity effects -------------------------------

@pytest.fixture(scope="module")
def dup_genome(tmp_path_factory):
    """Genome with an exact 2 kb duplication and a 1-SNP near-dup."""
    from bbtools_tpu.core.dna import CODE_TO_BASE, encode

    tmp = tmp_path_factory.mktemp("siteselect")
    g = random_genome(40_000, n_scaffolds=1, seed=41)
    name, seq = g[0]
    codes = encode(seq)
    seg = codes[5000:7000].copy()
    near = codes[9000:11000].copy()
    near[1000] = (near[1000] + 1) % 4
    full = np.concatenate([codes, seg, near])
    ref_fa = tmp / "ref.fa"
    write_fasta(str(ref_fa), [(name, CODE_TO_BASE[full].tobytes())])
    ref = load_reference(str(ref_fa))
    idx = SeedIndex.build(ref, k=13)
    return tmp, ref, idx, codes


def _map_one(tmp, idx, codes, start, L, name, **kw):
    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.utils.synth import write_reads

    r = codes[start : start + L]
    fq = tmp / f"{name}.fq"
    write_reads(str(fq), [(name.encode(), CODE_TO_BASE[r].tobytes(),
                           b"F" * L)])
    sam = tmp / f"{name}.sam"
    cfg = BBMapConfig(in1=str(fq), out=str(sam), batch_reads=64, **kw)
    BBMap(cfg, index=idx).run()
    for line in (tmp / f"{name}.sam").read_text().splitlines():
        if line and not line.startswith("@"):
            f = line.split("\t")
            return int(f[1]), int(f[4])  # flag, mapq
    return None, None


def test_exact_repeat_read_is_ambiguous_low_mapq(dup_genome):
    tmp, ref, idx, codes = dup_genome
    flag, mapq = _map_one(tmp, idx, codes, 5600, 150, "rep")
    assert flag is not None and not flag & 4
    assert mapq <= 3  # ambiguous MAPQ formula caps low
    # ambig=toss drops it entirely
    flag2, _ = _map_one(tmp, idx, codes, 5600, 150, "rept", ambig="toss")
    assert flag2 is None or flag2 & 4


def test_near_repeat_pays_cz3_penalty(dup_genome):
    """A read over the 1-SNP near-duplication is NOT ambiguous (the SNP
    resolves it) but applyClearzone3 must depress its MAPQ below an
    equivalent unique read's."""
    tmp, ref, idx, codes = dup_genome
    fu, qu = _map_one(tmp, idx, codes, 20000, 150, "uniq")
    fn, qn = _map_one(tmp, idx, codes, 9950, 150, "near")
    assert not fu & 4 and not fn & 4
    assert qn < qu, (qn, qu)
    # with pambig=f the penalty is off and mapq recovers
    fn2, qn2 = _map_one(tmp, idx, codes, 9950, 150, "nearoff",
                        penalize_ambig=False)
    assert qn2 > qn, (qn2, qn)


def test_unique_read_mapq_unaffected_by_pambig(dup_genome):
    tmp, ref, idx, codes = dup_genome
    f1, q1 = _map_one(tmp, idx, codes, 20000, 150, "u1")
    f2, q2 = _map_one(tmp, idx, codes, 20000, 150, "u2",
                      penalize_ambig=False)
    assert q1 == q2, (q1, q2)
