"""Tool long tail batch 6: taxsize, explodetree, shrinkaccession,
gi2ancestors, mergesketch, subsketch, summarizesketch."""

import numpy as np
import pytest

from bbtools_tpu.cli import main


NODES = (
    "1\t|\t1\t|\tno rank\t|\n"
    "131567\t|\t1\t|\tcellular root\t|\n"
    "2\t|\t131567\t|\tsuperkingdom\t|\n"
    "1224\t|\t2\t|\tphylum\t|\n"
    "561\t|\t1224\t|\tgenus\t|\n"
    "562\t|\t561\t|\tspecies\t|\n"
    "563\t|\t561\t|\tspecies\t|\n"
)
NAMES = (
    "1\t|\troot\t|\t\t|\tscientific name\t|\n"
    "131567\t|\tcellular organisms\t|\t\t|\tscientific name\t|\n"
    "2\t|\tBacteria\t|\t\t|\tscientific name\t|\n"
    "1224\t|\tProteobacteria\t|\t\t|\tscientific name\t|\n"
    "561\t|\tEscherichia\t|\t\t|\tscientific name\t|\n"
    "562\t|\tEscherichia coli\t|\t\t|\tscientific name\t|\n"
    "563\t|\tEscherichia two\t|\t\t|\tscientific name\t|\n"
)


@pytest.fixture()
def dmp(tmp_path):
    (tmp_path / "nodes.dmp").write_text(NODES)
    (tmp_path / "names.dmp").write_text(NAMES)
    return tmp_path


def test_taxsize(dmp, tmp_path):
    fa = tmp_path / "in.fa"
    fa.write_bytes(
        b">tid|562|seqA\n" + b"A" * 100 + b"\n"
        b">tid|562|seqB\n" + b"C" * 50 + b"\n"
        b">tid|563|seqC\n" + b"G" * 30 + b"\n"
    )
    main([
        "taxsize", f"in={fa}", f"out={tmp_path}/size.txt",
        f"names={dmp}/names.dmp", f"nodes={dmp}/nodes.dmp",
    ])
    rows = {}
    for ln in (tmp_path / "size.txt").read_bytes().splitlines()[1:]:
        f = ln.split(b"\t")
        rows[int(f[0])] = [int(x) for x in f[1:]]
    # 562: local 150/2 seqs; genus 561 cumulative 180, 3 seqs, 2 nodes
    assert rows[562] == [150, 150, 2, 2, 1]
    assert rows[563] == [30, 30, 1, 1, 1]
    assert rows[561] == [0, 180, 0, 3, 2]
    assert rows[1] == [0, 180, 0, 3, 2]


def test_explodetree(dmp, tmp_path):
    fa = tmp_path / "in.fa"
    fa.write_bytes(
        b">tid|562|seqA\nACGT\n>tid|563|seqC\nGGGG\n"
    )
    main([
        "explodetree", f"in={fa}", f"out={tmp_path}/tree",
        f"names={dmp}/names.dmp", f"nodes={dmp}/nodes.dmp",
        f"results={tmp_path}/res.txt",
    ])
    p = tmp_path / "tree" / "1" / "131567" / "2" / "1224" / "561" / "562"
    assert (p / "562.fa").read_bytes() == b">tid|562|seqA\nACGT\n"
    assert (p / "Escherichia coli.name").exists()
    res = (tmp_path / "res.txt").read_text()
    assert "562\t4" in res and "563\t4" in res


def test_shrinkaccession(tmp_path):
    (tmp_path / "acc.txt").write_bytes(
        b"accession\taccession.version\ttaxid\tgi\n"
        b"A123\tA123.1\t562\t99\n"
        b"B456\tB456.2\t0\t100\n"
        b"C789\tC789.1\t563\tna\n"
    )
    main([
        "shrinkaccession", f"in={tmp_path}/acc.txt",
        f"out={tmp_path}/small.txt",
    ])
    lines = (tmp_path / "small.txt").read_bytes().splitlines()
    assert lines[0].startswith(b"accession")
    assert lines[1] == b"A123\t562\t99"
    assert lines[2] == b"C789\t563"  # taxid 0 row dropped, na gi dropped


def test_gi2ancestors(dmp, tmp_path):
    (tmp_path / "q.txt").write_bytes(b"562\t563\n562\n")
    main([
        "gi2ancestors", f"in={tmp_path}/q.txt", f"out={tmp_path}/a.txt",
        f"names={dmp}/names.dmp", f"nodes={dmp}/nodes.dmp",
    ])
    lines = (tmp_path / "a.txt").read_bytes().splitlines()
    assert lines[0].split(b"\t")[2] == b"561"  # LCA of the two species
    assert lines[1].split(b"\t")[1] == b"562"


def _mk_sketch(path, values, k=31, name="s"):
    from bbtools_tpu.models.sketch import write_sketch

    write_sketch(str(path), np.array(values, dtype=np.uint64), name, k)


def test_mergesketch_and_subsketch(tmp_path):
    _mk_sketch(tmp_path / "a.sketch", [1, 5, 9, 20])
    _mk_sketch(tmp_path / "b.sketch", [2, 5, 11, 30])
    main([
        "mergesketch", f"in={tmp_path}/a.sketch,{tmp_path}/b.sketch",
        f"out={tmp_path}/m.sketch",
    ])
    from bbtools_tpu.models.sketch import read_sketch

    h, k = read_sketch(str(tmp_path / "m.sketch"))
    # union {1,2,5,9,11,20,30}, bottom-4 (max input size)
    assert list(h) == [1, 2, 5, 9] and k == 31
    main([
        "subsketch", f"in={tmp_path}/m.sketch",
        f"out={tmp_path}/s.sketch", "size=2",
    ])
    h2, _ = read_sketch(str(tmp_path / "s.sketch"))
    assert list(h2) == [1, 2]


def test_summarizesketch(tmp_path):
    (tmp_path / "r1.txt").write_bytes(
        b"Query\tRef\tWKID\tANI\tMatches\tSize\n"
        b"q1\trefA\t80.00%\t99.10%\t800\t1000\n"
        b"q1\trefB\t95.00%\t99.80%\t950\t1000\n"
        b"q2\trefA\t50.00%\t97.00%\t500\t1000\n"
    )
    main([
        "summarizesketch", f"in={tmp_path}/r1.txt",
        f"out={tmp_path}/sum.txt",
    ])
    lines = (tmp_path / "sum.txt").read_bytes().splitlines()
    assert lines[1].split(b"\t")[:2] == [b"q1", b"refB"]
    assert lines[2].split(b"\t")[:2] == [b"q2", b"refA"]
