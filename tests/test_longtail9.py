"""Batch 9: reformatpb, bbmap outu/outm split, remove* presets."""

import numpy as np
import pytest

from bbtools_tpu.cli import main


def test_reformatpb(tmp_path):
    recs = [
        (b"m1/5/0_100", b"ACGT" * 25),               # good
        (b"m1/5/150_170", b"ACGTACGTACGTACGTACGT"),  # short -> bad
        (b"m1/9/0_80", b"CCGA" * 20),                # blacklisted ZMW
        (b"m1/11/0_60", b"GGCA" * 10 + b"A" * 12),   # poly-A tail trim
    ]
    data = b"".join(
        b"@%s\n%s\n+\n%s\n" % (n, s, b"I" * len(s)) for n, s in recs
    )
    (tmp_path / "in.fq").write_bytes(data)
    main([
        "reformatpb", f"in={tmp_path}/in.fq", f"out={tmp_path}/good.fq",
        f"outb={tmp_path}/bad.fq", "minlen=30", "trimpolya=t",
        "blacklist=9", f"schist={tmp_path}/sc.txt",
    ])
    good = (tmp_path / "good.fq").read_bytes()
    bad = (tmp_path / "bad.fq").read_bytes()
    assert b"m1/5/0_100" in good and b"m1/5/150_170" in bad
    assert b"m1/9/0_80" in bad
    # poly-A tail trimmed (the run swallows the final GGCA's A too)
    lines = good.splitlines()
    i = lines.index(b"@m1/11/0_60")
    assert lines[i + 1] == b"GGCA" * 9 + b"GGC"
    sc = (tmp_path / "sc.txt").read_bytes()
    assert b"#Subreads\tZMWs" in sc


def test_reformatpb_kzt(tmp_path):
    recs = [
        (b"m1/5/0_100", b"ACGT" * 25),
        (b"m1/5/150_170", b"ACGTACGTACGTACGTACGT"),  # short
    ]
    data = b"".join(
        b"@%s\n%s\n+\n%s\n" % (n, s, b"I" * len(s)) for n, s in recs
    )
    (tmp_path / "in.fq").write_bytes(data)
    main([
        "reformatpb", f"in={tmp_path}/in.fq", f"out={tmp_path}/good.fq",
        f"outb={tmp_path}/bad.fq", "minlen=40", "kzt=t",
    ])
    # whole ZMW discarded because one subread is bad
    assert (tmp_path / "good.fq").read_bytes() == b""
    assert (tmp_path / "bad.fq").read_bytes().count(b"@m1/5") == 2


@pytest.fixture(scope="module")
def human_like(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rh")
    rng = np.random.default_rng(7)
    host = bytes(b"ACGT"[c] for c in rng.integers(0, 4, 4000))
    other = bytes(b"ACGT"[c] for c in rng.integers(0, 4, 4000))
    (tmp / "host.fa").write_bytes(b">host\n" + host + b"\n")
    reads = []
    truth = []
    r = np.random.default_rng(8)
    for i in range(60):
        src = host if i % 2 == 0 else other
        p = int(r.integers(0, len(src) - 150))
        reads.append(b"@r%d\n%s\n+\n%s\n" % (i, src[p : p + 150], b"I" * 150))
        truth.append(i % 2 == 0)
    (tmp / "reads.fq").write_bytes(b"".join(reads))
    return tmp, truth


def test_bbmap_outu_outm_split(human_like):
    tmp, truth = human_like
    main([
        "bbmap", f"ref={tmp}/host.fa", f"in={tmp}/reads.fq",
        f"outu={tmp}/clean.fq", f"outm={tmp}/host.fq",
    ])
    clean = (tmp / "clean.fq").read_bytes()
    hostr = (tmp / "host.fq").read_bytes()
    n_clean = clean.count(b"\n+\n")
    n_host = hostr.count(b"\n+\n")
    assert n_clean + n_host == 60
    assert n_host >= 28 and n_clean >= 28
    # spot-check identity of routing
    for i, is_host in enumerate(truth[:10]):
        tag = b"@r%d\n" % i
        assert (tag in hostr) == is_host
        assert (tag in clean) == (not is_host)


def test_removehuman_preset(human_like):
    tmp, truth = human_like
    main([
        "removehuman", f"ref={tmp}/host.fa", f"in={tmp}/reads.fq",
        f"outu={tmp}/clean2.fq", f"outm={tmp}/human2.fq",
    ])
    clean = (tmp / "clean2.fq").read_bytes()
    n_clean = clean.count(b"\n+\n")
    assert 25 <= n_clean <= 32  # non-host reads survive


def test_removehuman_requires_ref():
    with pytest.raises(ValueError):
        main(["removehuman", "in=x.fq", "outu=y.fq"])


def test_mergefastacontigs_and_partition(tmp_path):
    """pacbio/MergeFastaContigs + PartitionFastaFile: N-padded pseudo-
    chromosomes with a coordinate index; partition splits at contig
    boundaries into ~equal base parts."""
    import numpy as np

    from bbtools_tpu.cli import main as cli_main

    rng = np.random.default_rng(3)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    seqs = [ACGT[rng.integers(0, 4, n)].tobytes()
            for n in (500, 800, 40, 1200, 700)]
    with open(tmp_path / "in.fa", "wb") as f:
        for i, s in enumerate(seqs):
            f.write(b">c%d\n%s\n" % (i, s))
    cli_main(["mergefastacontigs", f"in={tmp_path}/in.fa",
              f"out={tmp_path}/m.fa", f"info={tmp_path}/m.info",
              "npad=100", "minlen=100", "maxlen=2000"])
    from bbtools_tpu.io.fasta import iter_fasta

    chroms = {r.name: r.seq for r in iter_fasta(str(tmp_path / "m.fa"))}
    assert len(chroms) >= 2  # maxlen forces a split
    # index maps back to the original bytes
    merged = {}
    for line in (tmp_path / "m.info").read_bytes().splitlines()[1:]:
        name, ch, a, b = line.split(b"\t")
        merged[name] = chroms[b"chr" + ch][int(a):int(b)]
    assert merged[b"c0"] == seqs[0]
    assert merged[b"c3"] == seqs[3]
    assert b"c2" not in merged  # dropped by minlen
    # npad separation present
    assert b"N" * 100 in b"".join(chroms.values())

    cli_main(["partitionfastafile", f"in={tmp_path}/in.fa",
              f"out={tmp_path}/p_%.fa", "ways=2"])
    outs = sorted(tmp_path.glob("p_*.fa"))
    assert len(outs) == 2
    names = []
    for o in outs:
        names.extend(r.name for r in iter_fasta(str(o)))
    assert names == [b"c0", b"c1", b"c2", b"c3", b"c4"]
