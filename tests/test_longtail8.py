"""Tool long tail batch 8: comparelabels, consect, mergeotus, plotgc,
bbest/samtoest, filterassemblysummary, analyzeaccession, fetchproks."""

import numpy as np

from bbtools_tpu.cli import main


def test_comparelabels(tmp_path, capfd):
    recs = [
        b"@r1 1:N:0:X\tAAAA\tAAAA",   # AA
        b"@r2 1:N:0:X\tAAAA\tCCCC",   # AB
        b"@r3 1:N:0:X\tAAAA\tunknown",  # AU
        b"@r4 1:N:0:X\tunknown\tAAAA",  # UA
        b"@r5 1:N:0:X\tunknown\tunknown",  # UU
    ]
    data = b"".join(n + b"\nACGT\n+\nIIII\n" for n in recs)
    (tmp_path / "in.fq").write_bytes(data)
    main(["comparelabels", f"in={tmp_path}/in.fq"])
    out = capfd.readouterr().out
    assert "AACount\t1" in out and "ABCount\t1" in out
    assert "AUCount\t1" in out and "UACount\t1" in out
    assert "UUCount\t1" in out


def test_consect(tmp_path):
    def fq(recs):
        return b"".join(
            b"@r%d\n%s\n+\n%s\n" % (i, s, b"I" * len(s))
            for i, s in enumerate(recs)
        )

    raw = [b"ACGTACGTAC", b"TTTTTTTTTT"]
    corr1 = [b"ACGAACGTAC", b"TTTTTTTTTT"]  # changes pos 3 -> A
    corr2 = [b"ACGAACGTAC", b"TTTTCTTTTT"]  # agrees on r0, changes r1 alone
    (tmp_path / "raw.fq").write_bytes(fq(raw))
    (tmp_path / "c1.fq").write_bytes(fq(corr1))
    (tmp_path / "c2.fq").write_bytes(fq(corr2))
    main([
        "consect",
        f"in={tmp_path}/raw.fq,{tmp_path}/c1.fq,{tmp_path}/c2.fq",
        f"out={tmp_path}/out.fq",
    ])
    lines = (tmp_path / "out.fq").read_bytes().splitlines()
    assert lines[1] == b"ACGAACGTAC"  # both correctors agree -> accepted
    assert lines[5] == b"TTTTTTTTTT"  # disagree -> raw kept


def test_mergeotus(tmp_path):
    cov = (
        b"#ID\tAvg_fold\tLength\tRef_GC\tCovered_percent\tCovered_bases\t"
        b"Plus_reads\tMinus_reads\n"
        b"c1 otuA\t10.0\t100\t0.5\t90.0\t90\t5\t5\n"
        b"c2 otuA\t20.0\t300\t0.5\t50.0\t150\t15\t15\n"
        b"c3 otuB\t5.0\t200\t0.4\t100.0\t200\t4\t6\n"
    )
    (tmp_path / "cov.txt").write_bytes(cov)
    main([
        "mergeotus", f"in={tmp_path}/cov.txt", f"out={tmp_path}/m.txt",
    ])
    lines = (tmp_path / "m.txt").read_bytes().splitlines()
    rows = {l.split(b"\t")[0]: l.split(b"\t") for l in lines[1:]}
    a = rows[b"otuA"]
    # weighted avg fold: (10*100+20*300)/400 = 17.5; reads summed
    assert abs(float(a[1]) - 17.5) < 1e-3
    assert a[2] == b"400" and int(a[6]) + int(a[7]) == 40
    assert b"otuB" in rows


def test_plotgc(tmp_path, capfd):
    (tmp_path / "in.fa").write_bytes(
        b">s1\n" + b"G" * 100 + b"A" * 100 + b"\n"
    )
    main(["plotgc", f"in={tmp_path}/in.fa", "interval=100"])
    out = capfd.readouterr().out.splitlines()
    assert out[0].startswith("name\tinterval")
    f1, f2 = out[1].split("\t"), out[2].split("\t")
    assert float(f1[6]) == 1.0 and float(f2[6]) == 0.0
    assert f2[4] == "100" and f2[5] == "199"


def test_samtoest(tmp_path, capfd):
    sam = [
        b"@SQ\tSN:c1\tLN:10000",
        # fully mapped EST
        b"e1\t0\tc1\t100\t40\t100M\t*\t0\t0\t" + b"A" * 100 + b"\t" + b"I" * 100,
        # half mapped
        b"e2\t0\tc1\t500\t40\t50M50S\t*\t0\t0\t" + b"C" * 100 + b"\t" + b"I" * 100,
        # unmapped
        b"e3\t4\t*\t0\t0\t*\t*\t0\t0\t" + b"G" * 100 + b"\t" + b"I" * 100,
    ]
    (tmp_path / "in.sam").write_bytes(b"\n".join(sam) + b"\n")
    main(["bbest", f"in={tmp_path}/in.sam"])
    out = capfd.readouterr().out
    assert "n_est=3" in out
    rows = {
        l.split("\t")[0]: l.split("\t")
        for l in out.splitlines() if "\t" in l
    }
    assert rows["all"][1] == "1"
    assert rows["most"][1] == "1"
    assert rows["none"][1] == "1"


ASM_HEADER = (
    b"#assembly_accession\tbioproject\tbiosample\twgs_master\t"
    b"refseq_category\ttaxid\tspecies_taxid\torganism_name\t"
    b"infraspecific_name\tisolate\tversion_status\tassembly_level\t"
    b"release_type\tgenome_rep\tseq_rel_date\tasm_name\tsubmitter\t"
    b"gbrs_paired_asm\tpaired_asm_comp\tftp_path\n"
)


def _asm_row(acc, cat, taxid, sp_taxid, org, level, ftp):
    f = [b""] * 20
    f[0], f[4], f[5], f[6], f[7], f[11], f[19] = (
        acc, cat, taxid, sp_taxid, org, level, ftp,
    )
    return b"\t".join(f) + b"\n"


def test_filterassemblysummary(tmp_path):
    nodes = (
        "1\t|\t1\t|\tno rank\t|\n"
        "2\t|\t1\t|\tsuperkingdom\t|\n"
        "561\t|\t2\t|\tgenus\t|\n"
        "562\t|\t561\t|\tspecies\t|\n"
        "9606\t|\t1\t|\tspecies\t|\n"
    )
    names = (
        "1\t|\troot\t|\t\t|\tscientific name\t|\n"
        "2\t|\tBacteria\t|\t\t|\tscientific name\t|\n"
        "561\t|\tEscherichia\t|\t\t|\tscientific name\t|\n"
        "562\t|\tEscherichia coli\t|\t\t|\tscientific name\t|\n"
        "9606\t|\tHomo sapiens\t|\t\t|\tscientific name\t|\n"
    )
    (tmp_path / "nodes.dmp").write_text(nodes)
    (tmp_path / "names.dmp").write_text(names)
    (tmp_path / "as.txt").write_bytes(
        ASM_HEADER
        + _asm_row(b"GCF_1", b"na", b"562", b"562", b"Escherichia coli",
                   b"Complete Genome", b"ftp://x/GCF_1")
        + _asm_row(b"GCF_2", b"na", b"9606", b"9606", b"Homo sapiens",
                   b"Scaffold", b"ftp://x/GCF_2")
    )
    main([
        "filterassemblysummary", f"in={tmp_path}/as.txt",
        f"out={tmp_path}/f.txt", "ids=561",
        f"names={tmp_path}/names.dmp", f"nodes={tmp_path}/nodes.dmp",
    ])
    out = (tmp_path / "f.txt").read_bytes()
    assert b"GCF_1" in out and b"GCF_2" not in out


def test_analyzeaccession(tmp_path, capfd):
    (tmp_path / "acc.txt").write_bytes(
        b"accession\taccession.version\ttaxid\tgi\n"
        b"AB123456\tAB123456.1\t562\t1\n"
        b"XY999999\tXY999999.1\t562\t2\n"
        b"NC_001422\tNC_001422.1\t562\t3\n"
    )
    main(["analyzeaccession", f"in={tmp_path}/acc.txt"])
    out = capfd.readouterr().out
    assert "LLDDDDDD\t2" in out
    assert "LL_DDDDDD\t1" in out


def test_fetchproks(tmp_path):
    (tmp_path / "as.txt").write_bytes(
        ASM_HEADER
        + _asm_row(b"GCF_1", b"reference genome", b"562", b"562",
                   b"Escherichia coli", b"Complete Genome",
                   b"ftp://host/genomes/GCF_1_v1")
        + _asm_row(b"GCF_2", b"na", b"563", b"563",
                   b"Escherichia fergusonii", b"Contig",
                   b"ftp://host/genomes/GCF_2_v1")
        + _asm_row(b"GCF_3", b"na", b"1280", b"1280",
                   b"Staphylococcus aureus", b"Chromosome",
                   b"ftp://host/genomes/GCF_3_v1")
    )
    main([
        "fetchproks", f"in={tmp_path}/as.txt", f"out={tmp_path}/fetch.sh",
        "maxspeciespergenus=1",
    ])
    sh = (tmp_path / "fetch.sh").read_bytes()
    # one per genus: the reference E.coli beats the contig-level spp.
    assert b"GCF_1.fa.gz" in sh and b"GCF_3.fa.gz" in sh
    assert b"GCF_2" not in sh
    assert b"GCF_1_v1/GCF_1_v1_genomic.fna.gz" in sh


def test_summarizemerge(tmp_path):
    (tmp_path / "g1.txt").write_bytes(
        b"Correct:                \t97.00000%\t97 reads\n"
        b"Incorrect:              \t3.00000%\t3 reads\n"
        b"Too Short:              \t2.00000%\t2 reads\n"
        b"Too Long:               \t1.00000%\t1 reads\n"
        b"SNR:                    \t15.100\n"
    )
    main([
        "summarizemerge", f"in={tmp_path}/g1.txt", f"out={tmp_path}/s.txt",
    ])
    lines = (tmp_path / "s.txt").read_bytes().splitlines()
    f = lines[1].split(b"\t")
    assert f[1] == b"97.00000" and f[5] == b"15.100"


def test_summarizequast(tmp_path):
    (tmp_path / "q1.tsv").write_bytes(b"N50\t5000\nGC (%)\t52.1\n")
    (tmp_path / "q2.tsv").write_bytes(b"N50\t7000\nGC (%)\t48.9\n")
    main([
        "summarizequast", f"{tmp_path}/q1.tsv", f"{tmp_path}/q2.tsv",
        f"out={tmp_path}/q.txt",
    ])
    lines = (tmp_path / "q.txt").read_bytes().splitlines()
    rows = {l.split(b"\t")[0]: l.split(b"\t") for l in lines[1:]}
    assert rows[b"N50"][1:] == [b"5000", b"7000"]


def test_invertkey(tmp_path):
    (tmp_path / "kv.txt").write_bytes(b"a\t1\nb\t2\n")
    main([
        "invertkey", f"in={tmp_path}/kv.txt", f"out={tmp_path}/vk.txt",
    ])
    assert (tmp_path / "vk.txt").read_bytes() == b"1\ta\n2\tb\n"


def test_bam2sam(tmp_path):
    from bbtools_tpu.io.bam import BamWriter
    from bbtools_tpu.io.sam_read import SamRecord

    p = str(tmp_path / "t.bam")
    w = BamWriter(p, b"@HD\tVN:1.4\n", [(b"c1", 1000)])
    w.write_record(SamRecord(
        qname=b"r0", flag=0, rname=b"c1", pos=10, mapq=30,
        cigar="4M", seq=b"ACGT", qual=b"IIII",
    ))
    w.close()
    main(["bam2sam", f"in={p}", f"out={tmp_path}/t.sam"])
    sam = (tmp_path / "t.sam").read_bytes()
    assert b"@HD" in sam
    assert b"r0\t0\tc1\t10\t30\t4M\t*\t0\t0\tACGT\tIIII" in sam


def test_gitable(tmp_path):
    (tmp_path / "acc.txt").write_bytes(
        b"accession\taccession.version\ttaxid\tgi\n"
        b"A1\tA1.1\t562\t1001\n"
        b"B2\tB2.1\t9606\tna\n"
    )
    main([
        "gitable", f"in={tmp_path}/acc.txt", f"out={tmp_path}/gi.tsv",
    ])
    assert (tmp_path / "gi.tsv").read_bytes() == b"1001\t562\n"
