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


def test_server_endpoints(tiny_tree, tmp_path):
    import json
    import urllib.request

    import numpy as np

    from bbtools_tpu.core.dna import CODE_TO_BASE
    from bbtools_tpu.models.server import ServerState, send_sketch, start_server
    from bbtools_tpu.utils.synth import random_genome
    from bbtools_tpu.io.fasta import write_fasta

    d, _tree = tiny_tree
    write_fasta(str(tmp_path / "refA.fa"), random_genome(15_000, 1, seed=91))
    write_fasta(str(tmp_path / "refB.fa"), random_genome(15_000, 1, seed=92))
    state = ServerState()
    state.load_tax(str(d / "names.dmp"), str(d / "nodes.dmp"))
    state.add_reference_fasta(str(tmp_path / "refA.fa"))
    state.add_reference_fasta(str(tmp_path / "refB.fa"))
    srv, port = start_server(state)
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            assert json.loads(r.read())["status"] == "ok"
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/tax/562") as r:
            body = json.loads(r.read())
            assert body["name"] == "Escherichia coli"
            assert "genus:Escherichia" in body["lineage"]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/tax/ancestor/83333/9606"
        ) as r:
            assert json.loads(r.read())["ancestor"] in (131567, 1)
        # SendSketch client round trip: query == refA -> refA top hit
        res = send_sketch("127.0.0.1", port, str(tmp_path / "refA.fa"))
        top = res["results"][0]
        assert "refA" in top["ref"] and top["wkid"] > 0.9
        assert res["results"][1]["matches"] < top["matches"] * 0.1
        # probe: unknown taxid -> 404
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/tax/424242")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()


def test_taxtree_serialization(tiny_tree, tmp_path):
    _, t = tiny_tree
    p = str(tmp_path / "t.taxtree.npz")
    t.save(p)
    from bbtools_tpu.models.taxonomy import TaxTree

    t2 = TaxTree.load_tree(p)
    assert t2.lineage(83333) == t.lineage(83333)
    assert t2.name_of(562) == "Escherichia coli"
    assert t2.id_of("Bacteria") == 2
    assert t2.ancestor_at_level(83333, "phylum") == 1224


def test_accession2taxid_ncbi_format(tmp_path):
    from bbtools_tpu.models.taxonomy import load_accession_map

    p = tmp_path / "acc2tax.tsv"
    p.write_text(
        "accession\taccession.version\ttaxid\tgi\n"
        "NC_001422\tNC_001422.1\t10847\t9626372\n"
        "CP000001\tCP000001.2\t1392\t-\n"
    )
    m = load_accession_map(str(p))
    assert m["NC_001422"] == 10847
    assert m["NC_001422.1"] == 10847
    assert m["gi|9626372"] == 10847
    assert m["CP000001.2"] == 1392


def test_demux_server_endpoint():
    import json
    import urllib.request

    from bbtools_tpu.models.server import ServerState, start_server

    srv, port = start_server(ServerState(), 0)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/demux/assign",
            data=json.dumps({
                "barcodes": ["ACGTACGT", "ACGTACGA", "TTTTCCCC", "GGGGGGGG"],
                "expected": ["ACGTACGT", "TTTTCCCC"],
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            out = json.loads(resp.read())
        a = out["assignments"]
        assert a[0] == "ACGTACGT" and a[1] == "ACGTACGT"
        assert a[2] == "TTTTCCCC"
        assert a[3] is None  # far from both
    finally:
        srv.shutdown()


def test_clade_server_endpoint(tmp_path):
    import json
    import urllib.request

    import numpy as np

    from bbtools_tpu.models.server import ServerState, start_server

    rng = np.random.default_rng(41)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    # two references with different GC character
    a = ACGT[rng.choice(4, 8000, p=[0.35, 0.15, 0.15, 0.35])].tobytes()
    b = ACGT[rng.choice(4, 8000, p=[0.15, 0.35, 0.35, 0.15])].tobytes()
    (tmp_path / "a.fa").write_bytes(b">orgA\n" + a + b"\n")
    (tmp_path / "b.fa").write_bytes(b">orgB\n" + b + b"\n")
    st = ServerState()
    st.add_clade_fasta(str(tmp_path / "a.fa"))
    st.add_clade_fasta(str(tmp_path / "b.fa"))
    srv, port = start_server(st, 0)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/clade/classify",
            data=b">q\n" + a[2000:5000] + b"\n",
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            out = json.loads(resp.read())
        assert out["best"].endswith("a.fa")
    finally:
        srv.shutdown()


def test_splitbytaxa_and_fuse_and_gi2taxid(tiny_tree, tmp_path):
    from bbtools_tpu.models.taxonomy import (
        fuse_by_taxa,
        gi2taxid,
        split_by_taxa,
    )

    d = tmp_path
    (d / "in.fa").write_bytes(
        b">tid|562|ecoli_a\nACGTACGTAC\n"
        b">tid|83333|k12_b\nTTTTGGGGCC\n"
        b">tid|9606|human_c\nAAAACCCCGG\n"
    )
    counts = split_by_taxa([
        f"in={d}/in.fa", f"out={d}/split_%.fa",
        f"names={d/'names.dmp'}", f"nodes={d/'nodes.dmp'}",
        "level=superkingdom",
    ])
    assert counts == {"Bacteria": 2, "Eukaryota": 1}
    bact = (d / "split_Bacteria.fa").read_bytes()
    assert b"ecoli_a" in bact and b"k12_b" in bact and b"human" not in bact

    recs = fuse_by_taxa([
        f"in={d}/in.fa", f"out={d}/fused.fa",
        f"names={d/'names.dmp'}", f"nodes={d/'nodes.dmp'}",
        "level=species", "npad=5",
    ])
    fused = {n: s for n, s in recs}
    assert fused[b"tid_562_Escherichia_coli"] == (
        b"ACGTACGTAC" + b"N" * 5 + b"TTTTGGGGCC"
    )
    assert fused[b"tid_9606_Homo_sapiens"] == b"AAAACCCCGG"

    (d / "named.fa").write_bytes(b">Escherichia coli strain X\nACGT\n")
    n, known = gi2taxid([
        f"in={d}/named.fa", f"out={d}/renamed.fa",
        f"names={d/'names.dmp'}", f"nodes={d/'nodes.dmp'}",
    ])
    assert (n, known) == (1, 1)
    assert (d / "renamed.fa").read_bytes().startswith(b">tid|562|")


def test_accession_index_ncbi_scale(tmp_path):
    """tax/AccessionToTaxid.java role at scale: packed-int64 index with
    vectorized parsing handles NCBI-format files (4-col, header, versions,
    lowercase, odd accessions into the sidecar), 12 bytes/entry."""
    import numpy as np

    from bbtools_tpu.models.taxonomy import (
        AccessionIndex,
        load_accession_map,
        taxid_of_header,
    )

    path = tmp_path / "acc2taxid"
    n = 300_000
    with open(path, "w") as f:
        f.write("accession\taccession.version\ttaxid\tgi\n")
        rows = [
            f"NZ_{i:07d}\tNZ_{i:07d}.1\t{i + 1}\t{i}\n" for i in range(n)
        ]
        f.write("".join(rows))
        f.write("THIS_ONE_IS_FAR_TOO_LONG_TO_PACK\tX.1\t777\t0\n")
        f.write("plain2col\t4242\n")
    idx = AccessionIndex.build(str(path))
    assert len(idx) >= n
    assert idx.get(b"NZ_0000000") == 1
    assert idx.get(b"NZ_0123456.1") == 123457  # version stripped
    assert idx.get(b"nz_0299999") == 300000  # case-folded
    assert idx.get(b"NOPE") == 0 and b"NOPE" not in idx
    assert idx.get(b"THIS_ONE_IS_FAR_TOO_LONG_TO_PACK") == 777  # sidecar
    assert idx.get(b"PLAIN2COL") == 4242  # 2-column rows
    # memory contract: packed arrays, not python objects
    assert idx.keys.nbytes + idx.taxids.nbytes <= 13 * (n + 2)
    # header resolution through the shared surface
    assert taxid_of_header(b"NZ_0000005.1 some description", idx) == 6
    # big files route to AccessionIndex automatically
    big = load_accession_map(str(path), big_threshold=1000)
    assert isinstance(big, AccessionIndex)
    small = load_accession_map(str(path))
    assert small.get("NZ_0000000") == 1  # dict path unchanged


def test_server_reference_protocol(tiny_tree, tmp_path):
    """Reference TaxServer URL grammar + TaxClient interop shapes
    (tax/TaxServer.java toResponse :1062-1210, tax/TaxClient.java:166):
    pt/name/ returns a bare taxid, pt/taxid multi-query returns a comma
    list with -1 misses, sc_name returns the short-level semicolon
    lineage, ancestor works, and the default JSON keys each query."""
    import json
    import urllib.request

    from bbtools_tpu.models.server import ServerState, start_server

    d, _tree = tiny_tree
    state = ServerState()
    state.load_tax(str(d / "names.dmp"), str(d / "nodes.dmp"))
    srv, port = start_server(state)
    base = f"http://127.0.0.1:{port}"

    def get(path):
        with urllib.request.urlopen(base + path) as r:
            return r.read().decode(), r.headers.get("Content-Type")

    try:
        # TaxClient.nameToTaxid: sendAndReceive("pt/name/", name_with_underscores)
        body, ct = get("/tax/pt/name/Escherichia_coli")
        assert body == "562" and ct.startswith("text/plain")
        # pt_ prefixed type form
        body, _ = get("/tax/pt_name/Escherichia_coli")
        assert body == "562"
        # multi-query with a miss -> comma list, -1 for not-found
        body, _ = get("/tax/pt/taxid/562,424242,9606")
        assert body == "562,-1,9606"
        # accession type without a loaded table -> -1 (not an error)
        body, _ = get("/tax/pt/accession/NC_000913.3")
        assert body == "-1"
        # semicolon lineage, short level codes (TaxTree.toSemicolon :928)
        body, _ = get("/tax/sc_name/Escherichia_coli")
        assert "s:Escherichia coli" in body and "p:Proteobacteria" in body
        assert body.index("p:") < body.index("g:") < body.index("s:")
        # ancestor across superkingdoms
        body, _ = get("/tax/ancestor/pt/taxid/83333,9606")
        assert body in ("1", "131567")
        # default JSON: keyed by query, node fields + ancestor levels
        body, ct = get("/tax/name/Escherichia_coli")
        j = json.loads(body)
        node = j["Escherichia_coli"]
        assert node["tax_id"] == 562 and node["level"] == "species"
        assert node["genus"]["tax_id"] == 561
        assert node["phylum"]["name"] == "Proteobacteria"
        # header type strips @/> and resolves via name fallback
        body, _ = get("/tax/pt/header/Homo_sapiens")
        assert body == "9606"
        # legacy routes still work
        with urllib.request.urlopen(base + "/tax/562") as r:
            assert json.loads(r.read())["name"] == "Escherichia coli"
    finally:
        srv.shutdown()


def test_server_sendsketch_wire_protocol(tiny_tree, tmp_path):
    """Reference SendSketch interop: POST the reference .sketch text
    coding (A48 deltas, HASH_VERSION=2) to /sketch and get the
    FORMAT_QUERY_REF_ANI TSV back (tax/TaxServer.java SketchHandler,
    sketch/DisplayParams.header :1361)."""
    import io
    import urllib.request

    from bbtools_tpu.io.fasta import write_fasta
    from bbtools_tpu.models.server import ServerState, start_server
    from bbtools_tpu.models.sketch import sketch_file_v2, write_sketch_v2
    from bbtools_tpu.utils.synth import random_genome

    write_fasta(str(tmp_path / "refA.fa"), random_genome(30_000, 1, seed=21))
    write_fasta(str(tmp_path / "refB.fa"), random_genome(30_000, 1, seed=22))
    state = ServerState()
    state.add_reference_fasta(str(tmp_path / "refA.fa"))
    state.add_reference_fasta(str(tmp_path / "refB.fa"))
    srv, port = start_server(state)
    try:
        # build the query body exactly as SendSketch would: the v2
        # .sketch text for refA
        keys, stats = sketch_file_v2(str(tmp_path / "refA.fa"))
        write_sketch_v2(str(tmp_path / "q.sketch"), keys, stats,
                        name="queryA", fname="refA.fa")
        body = (tmp_path / "q.sketch").read_bytes()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/sketch", data=body,
            headers={"Content-Type": "text/plain"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            text = r.read().decode()
            ct = r.headers.get("Content-Type")
        assert ct.startswith("text/plain")
        lines = text.strip().splitlines()
        assert lines[0].startswith("#Query\tRef\tANI")
        assert len(lines) >= 2, text
        top = lines[1].split("\t")
        assert "refA" in top[1]
        assert float(top[2]) > 99.0  # self-match ANI ~100
        assert float(top[8]) > 90.0  # WKID
        # refB must not outrank refA
        for ln in lines[2:]:
            assert "refB" in ln or "refA" in ln
            if "refB" in ln:
                assert float(ln.split("\t")[8]) < 50.0
    finally:
        srv.shutdown()
