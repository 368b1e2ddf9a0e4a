import gzip

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bbtools_tpu.core.dna import encode
from bbtools_tpu.io.batch import ReadBatch
from bbtools_tpu.models import bbduk_oracle as oracle
from bbtools_tpu.models.bbduk import BBDuk, BBDukConfig, parse_args
from bbtools_tpu.ops.bbduk_scan import KScanConfig, credit_id, kscan_full, kscan_short
from bbtools_tpu.ops.entropy import EntropyModel
from bbtools_tpu.ops.kmer_index import BucketKmerIndex, build_ref_keys
from bbtools_tpu.ops.trim import optimal_trim_jnp, optimal_trim_np

rng = np.random.default_rng(1234)


def random_reads(n, L, n_prob=0.01):
    c = rng.integers(0, 4, (n, L)).astype(np.uint8)
    c[rng.random((n, L)) < n_prob] = 4
    return c


def make_index(ref_seqs, k, mink=0, hdist=0):
    keys, ids = build_ref_keys(
        [encode(s) for s in ref_seqs], k, mink=mink, hdist=hdist
    )
    idx = BucketKmerIndex.build(keys, ids)
    table = {int(kk): int(ii) for kk, ii in zip(keys, ids)}
    return idx, table


def scan_cfg(idx, k, mink=0, qhdist=0, minlen2=0, mid_mask=-1, **kw):
    return KScanConfig(
        k=k,
        mink=mink,
        minlen2=minlen2,
        mid_mask=mid_mask,
        qhdist=qhdist,
        nb=idx.nb,
        **kw,
    )


class TestScanKernels:
    def setup_method(self):
        self.k = 11
        adapters = [
            b"ACGTTACCGGATAGCTGGCAAGTT",
            b"TTGGCCAATTGGCCAACTGAGATC",
        ]
        self.adapters = adapters
        self.idx, self.table = make_index(adapters, self.k)
        self.tdev = self.idx.device_arrays()

    def test_full_scan_vs_oracle(self):
        k = self.k
        reads = random_reads(64, 80, n_prob=0.03)
        # plant adapter fragments in some reads
        for i in range(0, 64, 3):
            a = self.adapters[i % 2]
            pos = int(rng.integers(0, 80 - len(a)))
            reads[i, pos : pos + len(a)] = encode(a)
        lengths = rng.integers(5, 81, 64).astype(np.int32)
        cfg = scan_cfg(self.idx, k)
        out = kscan_full(cfg, self.tdev, jnp.asarray(reads), jnp.asarray(lengths))
        out = {kk: np.asarray(v) for kk, v in out.items()}
        for i in range(64):
            codes = reads[i, : lengths[i]]
            hits = oracle.full_scan(codes, self.table, k, k)
            assert out["nhits"][i] == len(hits), f"read {i}"
            if hits:
                assert out["id0"][i] == hits[0][1]
                assert out["min_loc"][i] == min(h[0] for h in hits) - k + 1
                assert out["max_loc"][i] == max(h[0] for h in hits)
            else:
                assert out["id0"][i] == 0

    def test_credit_id_vs_oracle(self):
        k = self.k
        reads = random_reads(32, 60, n_prob=0)
        for i in range(32):
            a = self.adapters[i % 2]
            reads[i, 10 : 10 + len(a)] = encode(a)
        lengths = np.full(32, 60, np.int32)
        cfg = scan_cfg(self.idx, k)
        out = kscan_full(cfg, self.tdev, jnp.asarray(reads), jnp.asarray(lengths))
        for maxbad in (0, 2, 5, 100):
            cid = np.asarray(
                credit_id(
                    cfg,
                    out["ids"],
                    jnp.full(32, maxbad, jnp.int32),
                )
            )
            for i in range(32):
                found, want = oracle.count_set_kmers(
                    reads[i, : lengths[i]], self.table, k, maxbad
                )
                got = cid[i] if found > maxbad else 0
                assert got == want, f"read {i} maxbad {maxbad}"

    def test_short_kmers_vs_oracle(self):
        k, mink = 11, 5
        idx, table = make_index(self.adapters, k, mink=mink)
        tdev = idx.device_arrays()
        cfg = scan_cfg(idx, k, mink=mink)
        # reads ending with a short adapter prefix (classic 3' adapter stub)
        reads = random_reads(40, 50, n_prob=0)
        for i in range(40):
            stub = self.adapters[i % 2][: int(rng.integers(3, 11))]
            reads[i, 50 - len(stub) :] = encode(stub)
        lengths = np.full(40, 50, np.int32)
        hitR, idR, locR = (
            np.asarray(x)
            for x in kscan_short(cfg, tdev, jnp.asarray(reads), jnp.asarray(lengths), False)
        )
        hitL, idL, locL = (
            np.asarray(x)
            for x in kscan_short(cfg, tdev, jnp.asarray(reads), jnp.asarray(lengths), True)
        )
        for i in range(40):
            codes = reads[i, : lengths[i]]
            # oracle: run ktrim right with shorts
            found, id0, a, b = oracle.ktrim(
                codes, table, k, mink, ktrim_left=False, ktrim_right=True
            )
            full_hits = oracle.full_scan(codes, table, k, k)
            if not full_hits and found > 0:
                assert hitR[i], f"read {i}"
                # oracle minLoc is the last (lowest i) short hit
                keep_to = b
                got_keep_to = (
                    oracle._trim_to(int(lengths[i]), 0, int(locR[i]) - 1)[1]
                )
                assert got_keep_to == keep_to, f"read {i}"
                assert idR[i] == id0 or hitL[i]

    def test_ktrim_driver_matches_oracle(self):
        k, mink = 11, 5
        cfg = BBDukConfig(
            k=k,
            mink=mink,
            ktrim="r",
            min_length=10,
            literal=self.adapters,
            mask_middle=True,  # will be disabled by resolve()
        ).resolve()
        duk = BBDuk(cfg)
        reads = random_reads(100, 70, n_prob=0.01)
        for i in range(0, 100, 2):
            a = self.adapters[i % 2]
            frag = a if i % 4 == 0 else a[: int(rng.integers(3, len(a)))]
            pos = 70 - len(frag) if i % 3 else int(rng.integers(20, 70 - len(frag)))
            reads[i, pos : pos + len(frag)] = encode(frag)
        lengths = np.full(100, 70, np.int32)
        quals = np.full((100, 70), 30, np.uint8)
        batch = ReadBatch(
            bases=reads.copy(),
            quals=quals,
            lengths=lengths.copy(),
            ids=[b"r%d" % i for i in range(100)],
        )
        b1, b2, keep, s1, s2 = duk.process_pair(batch, None)
        table = {
            int(kk): int(ii)
            for kk, ii in zip(*build_ref_keys(
                [encode(s) for s in self.adapters], k, mink=mink
            ))
        }
        for i in range(100):
            codes = reads[i, : lengths[i]]
            found, id0, a, b = oracle.ktrim(
                codes, table, k, mink, ktrim_left=False, ktrim_right=True
            )
            if found == 0:
                exp_len = 70
            else:
                exp_len = b - a + 1
            exp_keep = exp_len >= 10
            assert keep[i] == exp_keep, f"read {i}"
            if exp_keep:
                assert b1.lengths[i] == exp_len, f"read {i}"


def test_optimal_trim_np_vs_jnp():
    B, L = 64, 120
    quals = rng.integers(0, 42, (B, L)).astype(np.uint8)
    lengths = rng.integers(1, L + 1, B).astype(np.int32)
    is_n = rng.random((B, L)) < 0.02
    for trimq in (6.0, 10.0, 20.0):
        from bbtools_tpu.core.qualtools import phred_to_prob_error

        avg = float(np.float32(phred_to_prob_error(trimq)))
        l_np, r_np = optimal_trim_np(quals, lengths, is_n, avg)
        l_j, r_j = optimal_trim_jnp(
            jnp.asarray(quals), jnp.asarray(lengths), jnp.asarray(is_n), avg
        )
        np.testing.assert_array_equal(l_np, np.asarray(l_j))
        np.testing.assert_array_equal(r_np, np.asarray(r_j))


def test_entropy_batch_vs_read():
    em = EntropyModel(k=5, window=50)
    B, L = 16, 90
    codes = random_reads(B, L, n_prob=0.05)
    lengths = rng.integers(3, L + 1, B).astype(np.int32)
    batch_avg = em.average_entropy_batch(codes, lengths)
    for i in range(B):
        want = em.average_entropy_read(codes[i, : lengths[i]])
        assert abs(batch_avg[i] - want) < 1e-6, f"read {i}"


def test_bbduk_end_to_end_files(tmp_path):
    adapter = b"AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"
    ref = tmp_path / "adapters.fa"
    ref.write_bytes(b">truseq\n" + adapter + b"\n")
    reads = []
    expected_lengths = []
    for i in range(500):
        insert = bytes(
            bytes([b"ACGT"[x] for x in rng.integers(0, 4, 60)])
        )
        if i % 2 == 0:
            seq = insert + adapter[: 40 - 1]  # adapter at 3' end
            exp = 60
        else:
            seq = insert + bytes(
                bytes([b"ACGT"[x] for x in rng.integers(0, 4, 40)])
            )
            exp = 100
        seq = seq[:100]
        reads.append((b"r%d" % i, seq, b"F" * len(seq)))
        expected_lengths.append(exp)
    fin = tmp_path / "in.fq"
    with open(fin, "wb") as fh:
        for n, s, q in reads:
            fh.write(b"@" + n + b"\n" + s + b"\n+\n" + q + b"\n")
    fout = tmp_path / "out.fq"
    cfg = parse_args(
        [
            f"in={fin}",
            f"out={fout}",
            f"ref={ref}",
            "k=23",
            "mink=11",
            "hdist=1",
            "ktrim=r",
            "minlength=10",
        ]
    )
    duk = BBDuk(cfg)
    duk.run()
    out_lines = fout.read_bytes().splitlines()
    assert len(out_lines) == 4 * 500
    got_lengths = [len(out_lines[i * 4 + 1]) for i in range(500)]
    assert got_lengths == expected_lengths
    assert duk.stats.reads_in == 500
    assert duk.stats.reads_ktrimmed == 250


def test_kmask_mode(tmp_path):
    adapter = b"AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"
    ref = tmp_path / "a.fa"
    ref.write_bytes(b">ad\n" + adapter + b"\n")
    seq = b"ACGTAC" * 10 + adapter + b"TGCATG" * 10
    fin = tmp_path / "in.fq"
    fin.write_bytes(b"@r1\n" + seq + b"\n+\n" + b"F" * len(seq) + b"\n")
    fout = tmp_path / "out.fq"
    cfg = parse_args(
        [f"in={fin}", f"out={fout}", f"ref={ref}", "k=23", "ktrim=n", "mm=f"]
    )
    duk = BBDuk(cfg)
    duk.run()
    out = fout.read_bytes().splitlines()
    outseq = out[1]
    assert len(outseq) == len(seq)
    # adapter region masked to N, flanks untouched
    assert outseq[:60] == seq[:60]
    assert outseq[60:60 + len(adapter)] == b"N" * len(adapter)
    assert outseq[60 + len(adapter):] == seq[60 + len(adapter):]
    assert duk.stats.bases_ktrimmed == len(adapter)


def test_tbo_trims_adapter_readthrough(tmp_path):
    # pairs with insert < read length: 3' ends read into adapter; tbo trims
    rng2 = np.random.default_rng(123)
    insert = 60
    rl = 90
    r1s, r2s = [], []
    for i in range(50):
        mol = rng2.integers(0, 4, insert)
        r1 = np.concatenate([mol, rng2.integers(0, 4, rl - insert)])[:rl]
        r2f = mol
        r2 = np.concatenate([(3 - r2f[::-1]), rng2.integers(0, 4, rl - insert)])[:rl]
        conv = lambda a: bytes(b"ACGT"[x] for x in a)
        r1s.append((b"p%d" % i, conv(r1), b"F" * rl))
        r2s.append((b"p%d" % i, conv(r2), b"F" * rl))
    f1, f2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    for f, recs in ((f1, r1s), (f2, r2s)):
        with open(f, "wb") as fh:
            for n, s, q in recs:
                fh.write(b"@" + n + b"\n" + s + b"\n+\n" + q + b"\n")
    cfg = parse_args(
        [
            f"in={f1}", f"in2={f2}", f"out={tmp_path}/o1.fq",
            f"out2={tmp_path}/o2.fq", "tbo=t", "minlength=10",
        ]
    )
    duk = BBDuk(cfg)
    duk.run()
    o1 = (tmp_path / "o1.fq").read_bytes().splitlines()
    trimmed = sum(1 for i in range(len(o1) // 4) if len(o1[i * 4 + 1]) == insert)
    assert trimmed >= 45, trimmed


def test_entropy_mask_and_trim(tmp_path):
    good = b"ACGTAGGCTACGATCGTAGCTAACGGATCGAT" * 4  # 128bp complex
    lowc = b"ATATATATATATATATATATATATATATATAT" * 2  # 64bp dinucleotide repeat
    seq = good + lowc
    fin = tmp_path / "in.fq"
    fin.write_bytes(b"@r1\n" + seq + b"\n+\n" + b"F" * len(seq) + b"\n")
    # mask mode
    fout = tmp_path / "m.fq"
    cfg = parse_args([f"in={fin}", f"out={fout}", "entropy=0.6", "entropymask=t"])
    BBDuk(cfg).run()
    out = fout.read_bytes().splitlines()[1]
    assert out[:80] == seq[:80]  # complex region intact
    assert out.count(b"N") >= 50  # repeat masked
    # trim mode (right)
    fout2 = tmp_path / "t.fq"
    cfg2 = parse_args([f"in={fin}", f"out={fout2}", "entropy=0.6", "entropytrim=r"])
    BBDuk(cfg2).run()
    out2 = fout2.read_bytes().splitlines()[1]
    assert len(out2) < len(seq)
    assert out2 == seq[: len(out2)]


def test_ref_adapters_keyword(tmp_path):
    import random

    random.seed(1)
    ad = "AGATCGGAAGAGCACACGTCTGAACTCCAGTCAC"  # TruSeq R1
    fin = tmp_path / "in.fq"
    with open(fin, "w") as f:
        for i in range(20):
            ins = "".join(random.choice("ACGT") for _ in range(60))
            seq = (ins + ad + "ACGTACGTAC")[:100].ljust(100, "T")
            f.write(f"@r{i}\n{seq}\n+\n{'F'*100}\n")
    fout = tmp_path / "out.fq"
    cfg = parse_args(
        [f"in={fin}", f"out={fout}", "ref=adapters", "ktrim=r", "k=23",
         "mink=11", "hdist=1"]
    )
    BBDuk(cfg).run()
    lens = [
        len(l.strip())
        for i, l in enumerate(open(fout, "rb"))
        if i % 4 == 1
    ]
    assert sum(lens) / len(lens) <= 61


def test_qhdist_device(tmp_path):
    """qhdist=1 finds adapters with one read-side mismatch, including in
    the mink end-scan region."""
    import random

    random.seed(3)
    ad = "AGATCGGAAGAGCACACGTCTGAACTCCAGTCAC"
    fin = tmp_path / "in.fq"
    with open(fin, "w") as f:
        for i in range(20):
            ins = "".join(random.choice("ACGT") for _ in range(60))
            full = ad[:-1] + ("T" if ad[-1] != "T" else "A")  # mutate 1bp
            # plant the MUTATED adapter; exact scan can't see it
            mut = list(ad)
            p = 5 + (i % 20)
            mut[p] = {"A": "C", "C": "G", "G": "T", "T": "A"}[mut[p]]
            seq = (ins + "".join(mut) + "ACGTAC")[:100].ljust(100, "T")
            f.write(f"@r{i}\n{seq}\n+\n{'F'*100}\n")
    out0 = tmp_path / "o0.fq"
    cfg0 = parse_args(
        [f"in={fin}", f"out={out0}", "ref=adapters", "ktrim=r", "k=15",
         "mink=9", "hdist=0"]
    )
    BBDuk(cfg0).run()
    out1 = tmp_path / "o1.fq"
    cfg1 = parse_args(
        [f"in={fin}", f"out={out1}", "ref=adapters", "ktrim=r", "k=15",
         "mink=9", "hdist=0", "qhdist=1"]
    )
    BBDuk(cfg1).run()

    def mean_len(p):
        ls = [len(l.strip()) for i, l in enumerate(open(p, "rb")) if i % 4 == 1]
        return sum(ls) / len(ls)

    # qhdist=1 trims much more than the exact scan on mutated adapters
    assert mean_len(out1) < mean_len(out0) - 5, (
        mean_len(out0), mean_len(out1)
    )
    assert mean_len(out1) <= 62


def _oracle_mutate(kmer, klen, dist, extra, out):
    """Independent transliteration of BBDukIndexMod.mutate (:383-443) for
    edist verification: emit this node's canonical key, recurse subs, then
    dels (consume extra), then ins (dropped last base becomes extra)."""
    from bbtools_tpu.ops.kmers import canonical_keys_np, rc_kmer_np

    arr = np.array([kmer], dtype=np.int64)
    out.append(int(canonical_keys_np(arr, rc_kmer_np(arr, klen), klen, -1)[0]))
    if dist <= 0:
        return
    for j in range(4):
        for i in range(klen):
            temp = (kmer & ~(3 << (2 * i))) | (j << (2 * i))
            if temp != kmer:
                _oracle_mutate(temp, klen, dist - 1, extra, out)
    full = (1 << (2 * klen)) - 1
    if 0 <= extra <= 3:
        for i in range(1, klen):
            left = full & ~((1 << (2 * i)) - 1)
            right = (1 << (2 * i)) - 1
            temp = (kmer & left) | ((kmer << 2) & right) | extra
            if temp != kmer:
                _oracle_mutate(temp, klen, dist - 1, -1, out)
    eb2 = kmer & 3
    for i in range(1, klen):
        left = full & ~((1 << (2 * i)) - 1)
        right = (1 << (2 * i)) - 1
        temp0 = (kmer & left) | ((kmer & right) >> 2)
        for j in range(4):
            temp = temp0 | (j << (2 * (i - 1)))
            if temp != kmer:
                _oracle_mutate(temp, klen, dist - 1, eb2, out)


@pytest.mark.parametrize("edist", [1, 2])
def test_edist_expansion_vs_oracle(edist):
    """build_ref_keys(edist=) stores exactly the del/ins/sub mutant key set
    of the reference mutate recursion."""
    from bbtools_tpu.ops.kmers import length_mask, rolling_kmers_np

    k = 9
    seq = encode(b"ACGTTACCGGATAGCTGG")
    keys, ids = build_ref_keys([seq], k, edist=edist)
    # oracle: every window with its following base as extra
    fwd, _, runlen = rolling_kmers_np(seq[None, :], k)
    fwd, runlen = fwd[0], runlen[0]
    expect: set[int] = set()
    L = len(seq)
    for p in range(k - 1, L):
        if runlen[p] < k:
            continue
        extra = int(seq[p + 1]) if p + 1 < L and seq[p + 1] < 4 else -1
        buf: list[int] = []
        _oracle_mutate(int(fwd[p]), k, edist, extra, buf)
        expect.update(buf)
    assert set(np.asarray(keys).tolist()) == expect


def test_edist_scan_hits_indel_mutants(tmp_path):
    """edist=1 index hits reads whose adapter copy carries a 1-base indel."""
    import random

    random.seed(7)
    ad = "AGATCGGAAGAGCACACGTCTGAACTCCAGTCAC"
    fin = tmp_path / "in.fq"
    with open(fin, "w") as f:
        for i in range(24):
            ins = "".join(random.choice("ACGT") for _ in range(55))
            mut = list(ad)
            p = 3 + (i % 25)
            if i % 2:
                del mut[p]  # deletion in the read's adapter copy
            else:
                mut.insert(p, random.choice("ACGT"))  # insertion
            seq = (ins + "".join(mut) + "ACGTACGT")[:100].ljust(100, "T")
            f.write(f"@r{i}\n{seq}\n+\n{'F'*100}\n")

    def run(flags, out):
        cfg = parse_args(
            [f"in={fin}", f"out={out}", f"literal={ad}", "ktrim=r", "k=19",
             "mm=f"] + flags
        )
        BBDuk(cfg).run()
        return [
            len(l.strip()) for i, l in enumerate(open(out, "rb")) if i % 4 == 1
        ]

    l0 = run(["edist=0"], tmp_path / "o0.fq")
    l1 = run(["edist=1"], tmp_path / "o1.fq")
    # indel-mutated adapters: exact scan sees only flanking exact windows;
    # edist=1 should trim markedly more reads
    assert sum(x < 100 for x in l1) > sum(x < 100 for x in l0)
    assert sum(x < 100 for x in l1) >= 20


def test_qhdist2_vs_oracle():
    """Device qhdist=2 scan (scan-over-mutants recursion) matches the
    transliterated getValue oracle on doubly-mutated queries."""
    k = 9
    adapters = [b"ACGTTACCGGATAGCTGGCAAGTT"]
    keys, ids = build_ref_keys([encode(s) for s in adapters], k)
    idx = BucketKmerIndex.build(keys, ids)
    table = {int(kk): int(ii) for kk, ii in zip(keys, ids)}
    tdev = idx.device_arrays()
    reads = random_reads(12, 48, n_prob=0.0)
    # plant doubly-substituted adapter fragments
    for i in range(12):
        frag = list(encode(adapters[0])[: k + 4])
        for p in (2, 7):
            frag[p] = (frag[p] + 1 + i) % 4
        pos = 4 + i
        reads[i, pos : pos + len(frag)] = frag
    lengths = np.full(12, 48, np.int32)
    for q in (1, 2):
        cfg = KScanConfig(k=k, qhdist=q, nb=idx.nb)
        out = kscan_full(cfg, tdev, jnp.asarray(reads), jnp.asarray(lengths))
        nhits = np.asarray(out["nhits"])
        id0 = np.asarray(out["id0"])
        for i in range(12):
            hits = oracle.full_scan(reads[i], table, k, k, qhdist=q)
            assert nhits[i] == len(hits), (q, i)
            if hits:
                assert id0[i] == hits[0][1]
    # sanity: the doubly-mutated fragments are invisible below qhdist=2
    cfg2 = KScanConfig(k=k, qhdist=2, nb=idx.nb)
    out2 = kscan_full(cfg2, tdev, jnp.asarray(reads), jnp.asarray(lengths))
    assert int(np.asarray(out2["nhits"]).sum()) > 0


def test_sidechannel_phix(tmp_path):
    """align=t maps planted phiX reads to the bundled phix2 reference and
    writes them to alignout SAM, without removing them from out."""
    import gzip as _gzip
    import os
    import random

    random.seed(11)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    phix_path = os.path.join(
        here, "bbtools_tpu", "resources", "phix2.fa.gz"
    )
    with _gzip.open(phix_path, "rb") as f:
        phix = b"".join(
            l.strip() for l in f.read().splitlines() if not l.startswith(b">")
        ).decode()
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    fin = tmp_path / "in.fq"
    n_phix = 0
    with open(fin, "w") as f:
        for i in range(30):
            if i % 3 == 0:
                p = random.randrange(0, len(phix) - 100)
                seq = phix[p : p + 100]
                # a sprinkle of substitutions
                s = list(seq)
                s[10] = comp[s[10]]
                seq = "".join(s)
                if i % 6 == 0:  # reverse-complement half of them
                    seq = "".join(comp[c] for c in reversed(seq))
                n_phix += 1
            else:
                seq = "".join(
                    random.choice("ACGT") for _ in range(100)
                )
            f.write(f"@r{i}\n{seq}\n+\n{'F'*100}\n")
    fout = tmp_path / "out.fq"
    fsam = tmp_path / "side.sam"
    cfg = parse_args(
        [f"in={fin}", f"out={fout}", "align=t", f"alignout={fsam}", "k=27",
         "literal=ACGTACGTACGTACGTACGTACGTACGTAC"]
    )
    BBDuk(cfg).run()
    # all reads survive (no phix kmer filter requested)
    assert sum(1 for i, _ in enumerate(open(fout)) if i % 4 == 0) == 30
    lines = [
        l for l in open(fsam, "rb") if l and not l.startswith(b"@")
    ]
    mapped = [l for l in lines if not int(l.split(b"\t")[1]) & 0x4]
    assert len(mapped) == n_phix, (len(mapped), n_phix)
    for l in mapped:
        f = l.split(b"\t")
        assert f[2].startswith(b"PhiX") or f[2] != b"*"
        assert f[5] != b"*"


def test_speed_and_qskip_flags(tmp_path):
    """speed= samples kmers consistently on load+scan (fewer hits, no
    false hits); qskip= strides query positions."""
    import numpy as np

    from bbtools_tpu.cli import main

    rng = np.random.default_rng(12)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    adapter = b"AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"
    recs = []
    for i in range(300):
        seq = ACGT[rng.integers(0, 4, 120)].copy()
        if i % 2 == 0:
            seq[60 : 60 + len(adapter)] = np.frombuffer(adapter, np.uint8)
        recs.append(b"@r%d\n%s\n+\n%s\n" % (i, seq.tobytes(), b"I" * 120))
    (tmp_path / "in.fq").write_bytes(b"".join(recs))

    def run(extra, tag):
        main([
            "bbduk", f"in={tmp_path}/in.fq", f"out={tmp_path}/{tag}.fq",
            f"literal={adapter.decode()}", "k=23", "ktrim=r", "minlen=1",
            f"stats={tmp_path}/{tag}.txt",
        ] + extra)
        txt = (tmp_path / f"{tag}.txt").read_bytes()
        m = [ln for ln in txt.splitlines() if ln.startswith(b"#Matched")]
        return int(m[0].split(b"\t")[1])

    base = run([], "base")
    fast = run(["speed=9"], "speed")
    strided = run(["qskip=3"], "qskip")
    assert base == 150
    # sampling drops some but not all detections; never adds any
    assert 0 < fast <= base
    assert 0 < strided <= base
    # an 11-kmer adapter still detected at every position stride 3
    assert strided >= 140, strided


def _java_detect_left(seq, c, min_poly, max_non):
    """Literal BBDuk2.detectPolyLeft (:4014) oracle."""
    if len(seq) < min_poly:
        return 0
    trim_to = -1
    polymer = nonpoly = 0
    i = 0
    while i < len(seq) and nonpoly <= max_non:
        if seq[i] == c:
            polymer += 1
            if polymer >= min_poly:
                nonpoly = 0
                trim_to = i
        else:
            polymer = 0
            nonpoly += 1
        i += 1
    return trim_to + 1


def _java_detect_right(seq, c, min_poly, max_non):
    if len(seq) < min_poly:
        return 0
    trim_to = len(seq)
    polymer = nonpoly = 0
    i = len(seq) - 1
    while i >= 0 and nonpoly <= max_non:
        if seq[i] == c:
            polymer += 1
            if polymer >= min_poly:
                nonpoly = 0
                trim_to = i
        else:
            polymer = 0
            nonpoly += 1
        i -= 1
    return len(seq) - trim_to


def test_poly_detect_vs_java_oracle():
    from bbtools_tpu.io.batch import ReadBatch
    from bbtools_tpu.models.bbduk import (
        _detect_poly_left,
        _detect_poly_right,
    )

    g = np.random.default_rng(4)
    B, L = 200, 80
    # poly-G heavy alphabet so runs happen
    bases = g.choice(np.array([0, 1, 2, 2, 2, 3], np.uint8), (B, L))
    lengths = g.integers(4, L + 1, B).astype(np.int32)
    b = ReadBatch(bases=bases, quals=None, lengths=lengths,
                  ids=[b"r%d" % i for i in range(B)])
    for min_poly, max_non in ((6, 2), (3, 0), (10, 4)):
        gl = _detect_poly_left(b, 2, min_poly, max_non)
        gr = _detect_poly_right(b, 2, min_poly, max_non)
        for i in range(B):
            seq = bases[i, : lengths[i]].tolist()
            assert gl[i] == _java_detect_left(seq, 2, min_poly, max_non), i
            assert gr[i] == _java_detect_right(seq, 2, min_poly, max_non), i


def test_bbduk_polyg_flags(tmp_path):
    """trimpolyg/filterpolyg/trimpolya end-to-end through the CLI."""
    from bbtools_tpu.cli import main as cli_main

    recs = [
        (b"g_tail", b"ACGTACGTACGTACGTACGTACGT" + b"G" * 20),
        (b"g_head", b"G" * 20 + b"ACGTACGTACGTACGTACGTACGT"),
        (b"clean", b"ACGTACGTACGTACGTACGTACGTACGTACGTACGT"),
        (b"a_tail", b"ACGTACGTACGTACGTACGTACGT" + b"A" * 12),
    ]
    with open(tmp_path / "in.fq", "wb") as f:
        for n, s in recs:
            f.write(b"@%s\n%s\n+\n%s\n" % (n, s, b"F" * len(s)))
    cli_main(["bbduk", f"in={tmp_path}/in.fq", f"out={tmp_path}/o1.fq",
              "trimpolyg=6", "minlen=10", "ow=t"])
    seqs = dict(zip(
        [l[1:] for l in (tmp_path / "o1.fq").read_bytes().splitlines()[::4]],
        (tmp_path / "o1.fq").read_bytes().splitlines()[1::4],
    ))
    assert seqs[b"g_tail"] == b"ACGTACGTACGTACGTACGTACGT"
    assert seqs[b"g_head"] == b"ACGTACGTACGTACGTACGTACGT"
    assert seqs[b"clean"] == recs[2][1]
    # filterpolyg discards only reads STARTING with poly-G
    cli_main(["bbduk", f"in={tmp_path}/in.fq", f"out={tmp_path}/o2.fq",
              "filterpolyg=8", "ow=t"])
    names = (tmp_path / "o2.fq").read_bytes().splitlines()[::4]
    assert b"@g_head" not in names and b"@g_tail" in names
    # trimpolya trims the A tail
    cli_main(["bbduk", f"in={tmp_path}/in.fq", f"out={tmp_path}/o3.fq",
              "trimpolya=8", "ow=t"])
    seqs3 = dict(zip(
        [l[1:] for l in (tmp_path / "o3.fq").read_bytes().splitlines()[::4]],
        (tmp_path / "o3.fq").read_bytes().splitlines()[1::4],
    ))
    assert seqs3[b"a_tail"] == b"ACGTACGTACGTACGTACGTACGT"
    assert seqs3[b"clean"] == recs[2][1]


def _java_count_big(hits, sub):
    """Literal countSetKmersBig run accounting (:1760-1790) oracle."""
    found = 0
    bk_start = bk_stop = -1
    for i, h in enumerate(hits):
        if h:
            if bk_start == -1:
                bk_start = i
            bk_stop = i
        else:
            if bk_start > -1:
                dif = bk_stop - bk_start - sub
                bk_start = bk_stop = -1
                if dif > 0:
                    found += dif
    if bk_start > -1:
        dif = bk_stop - bk_start - sub
        if dif > 0:
            found += dif
    return found


def test_count_big_kmer_hits_vs_oracle():
    from bbtools_tpu.models.bbduk import _count_big_kmer_hits

    g = np.random.default_rng(6)
    for sub in (0, 3, 8):
        hit = g.random((64, 90)) < 0.6
        got = _count_big_kmer_hits(hit, sub)
        for i in range(64):
            assert got[i] == _java_count_big(hit[i].tolist(), sub), i


def test_bbduk_kbig_filter(tmp_path):
    """k>31 filtering (kbig): a read sharing a full 40-mer with the ref
    is removed; a read sharing only a 31-mer (but no 40-mer run) stays."""
    from bbtools_tpu.cli import main as cli_main

    g = np.random.default_rng(9)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    ref = ACGT[g.integers(0, 4, 60)].tobytes()
    with open(tmp_path / "ref.fa", "wb") as f:
        f.write(b">r\n" + ref + b"\n")
    bg1 = ACGT[g.integers(0, 4, 30)].tobytes()
    bg2 = ACGT[g.integers(0, 4, 30)].tobytes()
    contam = bg1[:10] + ref[5:45] + bg2[:20]  # full 40-mer from ref
    partial = bg1 + ref[5:36] + bg2[:9]  # exactly a 31-mer, no 40-run
    clean = ACGT[g.integers(0, 4, 70)].tobytes()
    with open(tmp_path / "in.fq", "wb") as f:
        for n, s in ((b"contam", contam), (b"partial", partial),
                     (b"clean", clean)):
            f.write(b"@%s\n%s\n+\n%s\n" % (n, s, b"F" * len(s)))
    cli_main(["bbduk", f"in={tmp_path}/in.fq", f"out={tmp_path}/o.fq",
              "ref=%s" % (tmp_path / "ref.fa"), "k=40", "ow=t"])
    names = (tmp_path / "o.fq").read_bytes().splitlines()[::4]
    assert b"@contam" not in names
    assert b"@partial" in names and b"@clean" in names


def test_bbduk_rename_findbestmatch(tmp_path):
    """rename=t (BBDukProcessorS.findBestMatch :1659 + rename
    BBDuk2.java:3654): matched reads route to outm with
    '\\t<scaf>=<count>' appended per matched scaffold, and the scaffold
    stats credit the most-hit scaffold."""
    from bbtools_tpu.cli import main as cli_main

    g = np.random.default_rng(12)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    s1 = ACGT[g.integers(0, 4, 40)].tobytes()
    s2 = ACGT[g.integers(0, 4, 40)].tobytes()
    with open(tmp_path / "ref.fa", "wb") as f:
        f.write(b">alpha\n" + s1 + b"\n>beta\n" + s2 + b"\n")
    # read hits alpha with many kmers and beta with fewer
    read = s1 + s2[:33]
    clean = ACGT[g.integers(0, 4, 70)].tobytes()
    with open(tmp_path / "in.fq", "wb") as f:
        f.write(b"@hit\n%s\n+\n%s\n" % (read, b"F" * len(read)))
        f.write(b"@clean\n%s\n+\n%s\n" % (clean, b"F" * len(clean)))
    cli_main(["bbduk", f"in={tmp_path}/in.fq", f"out={tmp_path}/o.fq",
              f"outm={tmp_path}/m.fq", "ref=%s" % (tmp_path / "ref.fa"),
              "k=31", "rename=t", "mm=f", "ow=t",
              f"stats={tmp_path}/stats.txt"])
    m = (tmp_path / "m.fq").read_bytes().splitlines()
    assert m and m[0].startswith(b"@hit\talpha=")
    assert b"beta=" in m[0]
    # alpha (10 kmers) before beta (3 kmers) in first-seen order, and
    # the counts are the per-scaffold kmer hit totals
    import re

    counts = dict(re.findall(rb"(alpha|beta)=(\d+)", m[0]))
    assert int(counts[b"alpha"]) == 10 and int(counts[b"beta"]) == 3
    stats = (tmp_path / "stats.txt").read_text()
    assert "alpha" in stats  # credit went to the most-hit scaffold
    o = (tmp_path / "o.fq").read_bytes().splitlines()[::4]
    assert o == [b"@clean"]
