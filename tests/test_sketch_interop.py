"""Reference-compatible BBSketch hashing + .sketch format interop.

The decisive fixture: bbtools_tpu/resources/blacklist_silva_merged.sketch
was produced by the JAVA reference (sketch/BlacklistMaker over the silva
DB, K:32,24 H:2) and holds the most-over-represented ribosomal k-mer
keys. Sketching the bundled 16S consensus with OUR hash must reproduce
hundreds of those exact 64-bit keys — chance collisions are ~1e-12 — so
a nonzero intersection proves bit-identical hashing end to end
(java.util.Random replay, makeCodes antialiasing, hashToValue2, and the
Long.MAX_VALUE-hash key transform).
"""

import os

import numpy as np

import bbtools_tpu

RES = os.path.join(os.path.dirname(bbtools_tpu.__file__), "resources")


def test_java_random_replay():
    from bbtools_tpu.ops.sketch_hash import JavaRandom

    r = JavaRandom(12345)
    # java.util.Random spec: seed scramble + 48-bit LCG
    first = r.next_long_u64()
    r2 = JavaRandom(12345)
    assert r2.next_long_u64() == first
    # nextInt bounds + power-of-two path
    r3 = JavaRandom(7)
    vals = [r3.next_int(64) for _ in range(1000)]
    assert all(0 <= v < 64 for v in vals)
    vals = [r3.next_int(4999) for _ in range(1000)]
    assert all(0 <= v < 4999 for v in vals)


def test_codes_table_antialiased():
    from bbtools_tpu.ops.sketch_hash import codes1d

    tab = codes1d()
    assert tab.shape == (2048,)
    bits = np.array([bin(int(x)).count("1") for x in tab])
    # antialiasNumber guarantees 31..33 set bits per entry
    assert bits.min() >= 31 and bits.max() <= 33


def test_hash_matches_java_blacklist_keys():
    from bbtools_tpu.models.sketch import (
        read_reference_sketch,
        sketch_file_v2,
    )

    bl, hdr = read_reference_sketch(
        os.path.join(RES, "blacklist_silva_merged.sketch")
    )
    assert hdr["K"] == "32,24" and hdr["H"] == "2"
    keys, stats = sketch_file_v2(
        os.path.join(RES, "16S_consensus_sequence.fa"), size=100000
    )
    inter = np.intersect1d(keys.astype(np.uint64), bl)
    # measured 278 shared keys; chance expectation ~3e-12
    assert len(inter) >= 100, len(inter)
    assert stats["GK"] > 0 and stats["GS"] > 0


def test_sketch_format_roundtrip(tmp_path):
    from bbtools_tpu.models.sketch import (
        read_reference_sketch,
        sketch_file_v2,
        write_sketch_v2,
    )

    keys, stats = sketch_file_v2(os.path.join(RES, "phix2.fa.gz"),
                                 size=500)
    assert len(keys) > 0
    out = tmp_path / "phix.sketch"
    write_sketch_v2(str(out), keys, stats, name="phiX", fname="phix2.fa.gz")
    head = out.read_bytes().split(b"\n", 1)[0]
    assert head.startswith(b"#SZ:%d\tCD:AD\tK:32,24\tH:2" % len(keys))
    back, hdr = read_reference_sketch(str(out))
    assert (np.sort(keys.astype(np.uint64)) == back).all()
    assert hdr["NM"] == "phiX"


def test_sketch_cli_compare_self(tmp_path, capsys):
    from bbtools_tpu.models.sketch import main

    phix = os.path.join(RES, "phix2.fa.gz")
    out = tmp_path / "s.sketch"
    main([f"in={phix}", f"out={out}"])
    # compare the written sketch against a fresh sketch of the same file
    main([f"in={out}", f"ref={phix}"])
    cap = capsys.readouterr().out
    row = [l for l in cap.splitlines() if str(out) in l][-1]
    wkid = float(row.split("\t")[2].rstrip("%"))
    assert wkid == 100.0, row
