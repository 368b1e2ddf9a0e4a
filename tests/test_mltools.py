"""ML tool family (ml/SequenceToVector, Trainer, ScoreSequence, NetFilter)."""

import numpy as np

from bbtools_tpu.cli import main as cli
from bbtools_tpu.models.mltools import (
    _canonical_map,
    _longest_homopolymer,
    load_vectors,
    vectorize_batch,
)


def _write_fq(path, seqs, prefix=b"r"):
    with open(path, "wb") as f:
        for i, s in enumerate(seqs):
            f.write(b"@%s%d\n%s\n+\n%s\n" % (prefix, i, s, b"I" * len(s)))


def test_canonical_map_size():
    # SequenceToVector.calcKSpace: (4^k + palindromes)/2
    for k, want in ((1, 2), (2, 10), (3, 32)):
        _, kspace = _canonical_map(k)
        assert kspace == want, (k, kspace, want)


def test_longest_homopolymer():
    codes = np.array([[0, 0, 0, 1, 1, 2, 2, 2, 2, 3]], np.uint8)
    lengths = np.array([10])
    assert _longest_homopolymer(codes, lengths)[0] == 4
    assert _longest_homopolymer(codes, np.array([3]))[0] == 3


def test_vectorize_raw_layout():
    from bbtools_tpu.core.dna import encode

    codes = np.full((1, 10), 4, np.uint8)
    codes[0, :6] = encode(b"ACGTAC")
    v = vectorize_batch(codes, np.array([6]), width=8, k=0)
    assert v.shape == (1, 8 * 4 + 4)
    # one-hot: position 0 = A -> vec[4]=1; position 1 = C -> vec[4+4+1]=1
    assert v[0, 4] == 1 and v[0, 9] == 1
    # padding beyond read length stays zero
    assert v[0, 4 + 6 * 4:].sum() == 0
    # gc of ACGTAC = 3/6
    assert abs(v[0, 1] - 0.5) < 1e-6


def test_vectorize_spectrum_mean():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, (3, 100)).astype(np.uint8)
    v = vectorize_batch(codes, np.full(3, 100), width=0, k=2)
    # spectrum scaled so the mean is 0.25 (fillSpectrum mult)
    assert np.allclose(v[:, 4:].mean(axis=1), 0.25, atol=1e-5)


def test_ml_pipeline_end_to_end(tmp_path):
    """seqtovec -> train -> netconvert -> netfilter discriminates GC/AT."""
    rng = np.random.default_rng(1)
    gc = [bytes(rng.choice(list(b"GCGCGCAT"), 60).astype(np.uint8))
          for _ in range(80)]
    at = [bytes(rng.choice(list(b"ATATATGC"), 60).astype(np.uint8))
          for _ in range(80)]
    posfq, negfq = tmp_path / "p.fq", tmp_path / "n.fq"
    _write_fq(posfq, gc, b"p")
    _write_fq(negfq, at, b"n")
    pos_tsv, neg_tsv = tmp_path / "p.tsv", tmp_path / "n.tsv"
    cli(["seqtovec", f"in={posfq}", f"out={pos_tsv}", "k=2", "result=1"])
    cli(["seqtovec", f"in={negfq}", f"out={neg_tsv}", "k=2", "result=0"])
    allt = tmp_path / "all.tsv"
    body = open(neg_tsv, "rb").read().split(b"\n", 1)[1]
    allt.write_bytes(open(pos_tsv, "rb").read() + body)
    x, y = load_vectors(str(allt))
    assert x.shape == (160, 14) and y.shape == (160, 1)
    net = tmp_path / "net.bbnet"
    cli(["train", f"data={allt}", f"out={net}", "epochs=600", "lr=0.1"])
    net2 = tmp_path / "net2.bbnet"
    cli(["netconvert", f"in={net}", f"out={net2}"])
    keepp, keepn = tmp_path / "kp.fq", tmp_path / "kn.fq"
    cli(["netfilter", f"in={posfq}", f"net={net2}", "k=2",
         f"out={keepp}", "cutoff=0.5"])
    cli(["netfilter", f"in={negfq}", f"net={net2}", "k=2",
         f"out={keepn}", "cutoff=0.5"])
    npos = keepp.read_bytes().count(b"\n+\n")
    nneg = keepn.read_bytes().count(b"\n+\n")
    assert npos >= 75 and nneg <= 5, (npos, nneg)


def test_vectorutils_and_reducecolumns(tmp_path):
    src = tmp_path / "v.tsv"
    rows = [b"#dims\t3\t1"]
    for i in range(50):
        rows.append(b"%d\t%d\t%d\t%d" % (i, i * 2, i * 3, i % 2))
    src.write_bytes(b"\n".join(rows) + b"\n")
    out = tmp_path / "b.tsv"
    cli(["balancevectors", f"in={src}", f"out={out}"])
    kept = [l for l in out.read_bytes().split(b"\n")
            if l and not l.startswith(b"#")]
    labels = [int(l.split(b"\t")[-1]) for l in kept]
    assert sum(labels) == len(labels) // 2  # balanced
    red = tmp_path / "r.tsv"
    cli(["reducecolumns", str(src), str(red), "0", "2-3"])
    first = [l for l in red.read_bytes().split(b"\n")
             if l and not l.startswith(b"#")][0]
    assert first.split(b"\t") == [b"0", b"0", b"0"]
    hdr = red.read_bytes().split(b"\n")[0]
    assert hdr == b"#dims\t2\t1"
