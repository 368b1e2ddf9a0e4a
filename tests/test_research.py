"""Scalar metrics + research harness tools."""

import numpy as np

from bbtools_tpu.cli import main as cli
from bbtools_tpu.models.scalartools import dimer_counts, metrics

PHIX = "/root/repo/bbtools_tpu/resources/phix2.fa.gz"


def test_dimer_metrics_known_values():
    # AAAA: only AA dimers -> HH=1, AAAT=1, GC=0
    from bbtools_tpu.core.dna import encode

    m = metrics(dimer_counts(encode(b"AAAAAA")))
    assert m["HH"] == 1.0 and m["AAAT"] == 1.0 and m["GC"] == 0.0
    # ACACAC: AC and CA only -> HH=0, PP=0, GC=0.5
    m2 = metrics(dimer_counts(encode(b"ACACAC")))
    assert m2["HH"] == 0.0 and m2["PP"] == 0.0
    assert abs(m2["GC"] - 0.4) < 0.21  # terminal-base GC of dimers
    # N breaks pairs
    c = dimer_counts(encode(b"AANAA"))
    assert c.sum() == 2


def test_scalars_cli(tmp_path):
    out = tmp_path / "sc.tsv"
    cli(["scalars", f"in={PHIX}", f"out={out}"])
    lines = out.read_text().strip().split("\n")
    vals = [float(v) for v in lines[1].split("\t")]
    assert len(vals) == 14
    assert 0.4 < vals[0] < 0.5  # phiX GC ~0.45
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_cardinality_harness_accuracy(capsys):
    cli(["fll2simulate", "tiers=10000", "trials=5", "buckets=2048"])
    rows = [l for l in capsys.readouterr().out.split("\n")
            if l and not l.startswith("#")]
    card, est, err, _ = rows[0].split("\t")
    assert float(err) < 0.1  # HLL with 2048 buckets ~2.3% typical


def test_ddl_pipeline(tmp_path):
    sk = tmp_path / "ddl.tsv"
    cli(["ddlwriter", f"in={PHIX}", f"out={sk}", "mode=perfile"])
    cmp_ = tmp_path / "cmp.tsv"
    cli(["ddlcompare", f"in={sk}", f"ref={sk}", f"out={cmp_}"])
    row = cmp_.read_text().strip().split("\n")[1].split("\t")
    assert float(row[3]) == 1.0  # self-ANI
    merged = tmp_path / "m.tsv"
    cli(["ddlmerger", f"in={sk},{sk}", f"out={merged}"])
    assert b"#name" in merged.read_bytes()


def test_calibrate_recovers_monotone_fit(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.uniform(0.02, 0.98, 500)
    logit = np.log(x / (1 - x))
    p = 1.0 / (1 + np.exp(-(2.0 * logit + 0.5)))
    y = (rng.random(500) < p).astype(float)
    src = tmp_path / "cal.tsv"
    src.write_text("".join(f"{a:.5f}\t{b:.0f}\n" for a, b in zip(x, y)))
    out = tmp_path / "c.txt"
    cli(["calibrate", f"in={src}", f"out={out}", "epochs=1200"])
    fields = dict(kv.split("=") for kv in out.read_text().split())
    assert float(fields["mse"]) < 0.2
    assert float(fields["a"]) > 0.5  # positive slope recovered


def test_covmaker_merges_duplicate_columns(tmp_path):
    src = tmp_path / "cov.tsv"
    src.write_text("#c\ts0\ts1\ts2\n" + "".join(
        f"ctg{i}\t{v}\t{v * 1.01}\t{1.0 + i % 3}\n"
        for i, v in enumerate(range(1, 21))))
    out = tmp_path / "o.tsv"
    cli(["covmaker", f"in={src}", f"out={out}"])
    hdr = out.read_text().split("\n")[0].split("\t")
    assert len(hdr) == 3  # contig + 2 merged sample columns


def test_makequickbinvector_labels(tmp_path):
    rng = np.random.default_rng(4)
    fa = tmp_path / "b.fa"
    with open(fa, "w") as f:
        for g in range(2):
            base = "".join("ACGT"[i] for i in rng.integers(0, 4, 4000))
            for c in range(2):
                f.write(f">ctg{g}_{c}_tid_{g + 1}\n"
                        f"{base[c * 1000:c * 1000 + 2500]}\n")
    out = tmp_path / "v.tsv"
    cli(["makequickbinvector", f"in={fa}", f"out={out}", "pairs=300"])
    rows = [l.split("\t") for l in out.read_text().strip().split("\n")[1:]]
    same = [float(r[0]) for r in rows if r[-1] == "1"]
    diff = [float(r[0]) for r in rows if r[-1] == "0"]
    # same-genome pairs have smaller tetramer distance on average
    assert np.mean(same) < np.mean(diff)
