import numpy as np
import pytest

from bbtools_tpu.models.taxonomy import (
    LEVELS,
    TaxTree,
    filter_by_taxa,
    taxid_of_header,
)


@pytest.fixture()
def tiny_tree(tmp_path):
    # 1=root(life), 2=Bacteria(superkingdom), 2157=Archaea, 1224=Proteobacteria
    # (phylum), 561=Escherichia(genus), 562=E.coli(species), 83333=K12(strain),
    # 9606=human under Eukaryota 2759
    nodes = """1\t|\t1\t|\tno rank\t|
2\t|\t131567\t|\tsuperkingdom\t|
2157\t|\t131567\t|\tsuperkingdom\t|
2759\t|\t131567\t|\tsuperkingdom\t|
131567\t|\t1\t|\tcellular root\t|
1224\t|\t2\t|\tphylum\t|
1236\t|\t1224\t|\tclass\t|
91347\t|\t1236\t|\torder\t|
543\t|\t91347\t|\tfamily\t|
561\t|\t543\t|\tgenus\t|
562\t|\t561\t|\tspecies\t|
83333\t|\t562\t|\tstrain\t|
9606\t|\t2759\t|\tspecies\t|
"""
    names = """1\t|\troot\t|\t\t|\tscientific name\t|
2\t|\tBacteria\t|\t\t|\tscientific name\t|
2157\t|\tArchaea\t|\t\t|\tscientific name\t|
2759\t|\tEukaryota\t|\t\t|\tscientific name\t|
131567\t|\tcellular organisms\t|\t\t|\tscientific name\t|
1224\t|\tProteobacteria\t|\t\t|\tscientific name\t|
1236\t|\tGammaproteobacteria\t|\t\t|\tscientific name\t|
91347\t|\tEnterobacterales\t|\t\t|\tscientific name\t|
543\t|\tEnterobacteriaceae\t|\t\t|\tscientific name\t|
561\t|\tEscherichia\t|\t\t|\tscientific name\t|
562\t|\tEscherichia coli\t|\t\t|\tscientific name\t|
83333\t|\tEscherichia coli K-12\t|\t\t|\tscientific name\t|
9606\t|\tHomo sapiens\t|\t\t|\tscientific name\t|
"""
    (tmp_path / "nodes.dmp").write_text(nodes)
    (tmp_path / "names.dmp").write_text(names)
    return tmp_path, TaxTree.load(
        str(tmp_path / "names.dmp"), str(tmp_path / "nodes.dmp")
    )


def test_lineage_and_ancestors(tiny_tree):
    _, t = tiny_tree
    lin = t.lineage(83333)
    assert lin[:3] == [83333, 562, 561]
    assert t.ancestor_at_level(83333, "species") == 562
    assert t.ancestor_at_level(83333, "phylum") == 1224
    assert t.common_ancestor(83333, 9606) in (131567, 1)
    assert t.common_ancestor(562, 561) == 561
    assert t.is_descendant(83333, 2)
    assert not t.is_descendant(9606, 2)
    assert t.id_of("Escherichia coli") == 562
    assert "genus:Escherichia" in t.lineage_string(562)


def test_filter_by_taxa(tiny_tree, tmp_path):
    d, t = tiny_tree
    fa = tmp_path / "seqs.fa"
    fa.write_bytes(
        b">tid|83333|ecoli K12\nACGTACGT\n"
        b">tid|9606|human\nTTTTAAAA\n"
        b">tid|2157|archaea\nGGGGCCCC\n"
    )
    out = tmp_path / "kept.fa"
    kept, dropped = filter_by_taxa(
        [
            f"in={fa}",
            f"out={out}",
            f"names={d/'names.dmp'}",
            f"nodes={d/'nodes.dmp'}",
            "ids=Bacteria",
        ]
    )
    assert (kept, dropped) == (1, 2)
    assert b"ecoli" in out.read_bytes()
    # exclude mode
    kept2, dropped2 = filter_by_taxa(
        [
            f"in={fa}",
            f"out={tmp_path/'x.fa'}",
            f"names={d/'names.dmp'}",
            f"nodes={d/'nodes.dmp'}",
            "ids=Bacteria",
            "include=f",
        ]
    )
    assert (kept2, dropped2) == (2, 1)


def test_header_taxid():
    assert taxid_of_header(b"tid|562|seq desc", None) == 562
    assert taxid_of_header(b"NC_000913.3 E. coli", {"NC_000913": 562}) == 562
    assert taxid_of_header(b"unknown", None) == -1
