"""Step-0 preprocessing tests: stLFR/Tell-Seq normalization, interleave,
barcode sort, hybrid virtual barcodes."""

import gzip
import os

import numpy as np

from pangaea_tpu.io.bam import BamRecord, BamWriter, FPAIRED, FREAD1, FUNMAP
from pangaea_tpu.io.fastq import barcode_sort_interleaved, iter_fastq_records
from pangaea_tpu.io.hybrid import (add_barcode, assign_barcodes,
                                   load_barcode_map,
                                   make_longread_barcode_map)
from pangaea_tpu.io.preprocess import (interleave, preprocess_stlfr,
                                       preprocess_tellseq)


def write_fq(path, records):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "wt") as f:
        for h, s in records:
            f.write(f"@{h}\n{s}\n+\n{'I' * len(s)}\n")


def test_preprocess_stlfr_numeric(tmp_path):
    r1 = str(tmp_path / "r1.fq")
    r2 = str(tmp_path / "r2.fq")
    write_fq(r1, [("read1#12_34_56/1", "ACGT"), ("read2#0_1_2/1", "TTTT"),
                  ("read3#1_0_2/1", "GGGG"), ("read4#1_2_0/1", "CCCC")])
    write_fq(r2, [("read1#12_34_56/2", "TTTT"), ("read2#0_1_2/2", "AAAA"),
                  ("read3#1_0_2/2", "CCCC"), ("read4#1_2_0/2", "GGGG")])
    o1, o2 = preprocess_stlfr(r1, r2, str(tmp_path / "out"), numeric=True,
                              library=True)
    recs1 = list(iter_fastq_records(o1))
    recs2 = list(iter_fastq_records(o2))
    assert recs1[0].header == "read1\tBX:Z:12_34_56-1"
    assert recs2[0].header == recs1[0].header  # R2 header replaced
    assert recs2[0].seq == "TTTT"
    # x=0 / y=0 drop the barcode; z=0 KEEPS it (bc1-twice quirk,
    # preprocess_stlfr.cpp:91)
    assert recs1[1].header == "read2"
    assert recs1[2].header == "read3"
    assert recs1[3].header == "read4\tBX:Z:1_2_0-1"


def test_preprocess_stlfr_whitelist(tmp_path):
    r1, r2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    write_fq(r1, [("r#1_2_3/1", "ACGT")])
    write_fq(r2, [("r#1_2_3/2", "TTTT")])
    wl = ["AAAA", "CCCC", "GGGG"]
    o1, _ = preprocess_stlfr(r1, r2, str(tmp_path / "o"), numeric=False,
                             library=False, whitelist=wl)
    assert list(iter_fastq_records(o1))[0].header == "r\tBX:Z:AAAACCCCGGGG"


def test_preprocess_tellseq(tmp_path):
    r1, r2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    idx = str(tmp_path / "idx.fq")
    write_fq(r1, [("rd1 extra", "ACGT"), ("rd2 extra", "TTTT")])
    write_fq(r2, [("rd1 extra", "GGGG"), ("rd2 extra", "CCCC")])
    write_fq(idx, [("rd1", "A" * 18), ("rd2", "C" * 10)])  # rd2: bad length
    o1, o2 = preprocess_tellseq(r1, r2, idx, str(tmp_path / "ts"))
    recs1 = list(iter_fastq_records(o1))
    assert len(recs1) == 1
    assert recs1[0].header == "rd1\tBX:Z:" + "A" * 18 + "-1"
    wl = open(str(tmp_path / "ts.wl")).read().split()
    assert wl == ["A" * 18]


def test_interleave_and_sort(tmp_path):
    r1, r2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    write_fq(r1, [("a\tBX:Z:ZZZ-1", "AAAA"), ("b\tBX:Z:AAA-1", "CCCC"),
                  ("c", "GGGG")])
    write_fq(r2, [("a\tBX:Z:ZZZ-1", "TTTT"), ("b\tBX:Z:AAA-1", "GGGG"),
                  ("c", "CCCC")])
    inter = str(tmp_path / "i.fq")
    interleave(r1, r2, inter)
    recs = list(iter_fastq_records(inter))
    assert [r.seq for r in recs] == ["AAAA", "TTTT", "CCCC", "GGGG",
                                     "GGGG", "CCCC"]
    out = str(tmp_path / "s.fq")
    barcode_sort_interleaved(inter, out)
    recs = list(iter_fastq_records(out))
    # sorted by BX tag: AAA, ZZZ, then unbarcoded (~~~) last
    assert [r.seq for r in recs] == ["CCCC", "GGGG", "AAAA", "TTTT",
                                     "GGGG", "CCCC"]


def test_hybrid_flow(tmp_path):
    # long reads fastq -> map
    lr = str(tmp_path / "long.fq")
    write_fq(lr, [("long1", "A" * 50), ("long2", "C" * 50)])
    bc_map = str(tmp_path / "bc_map.txt")
    assert make_longread_barcode_map(lr, bc_map) == 2
    assert load_barcode_map(bc_map) == {"long1": "BX:Z:long1",
                                        "long2": "BX:Z:long2"}
    # name-sorted short->long BAM: s1 aligns to long1, s2 unmapped
    bam = str(tmp_path / "s2l.bam")
    with BamWriter(bam, ["long1", "long2"], [50, 50]) as w:
        w.write(BamRecord("s1", FPAIRED | FREAD1, 0, 0, 60, [("M", 70)],
                          "A" * 70, "I" * 70, {}))
        w.write(BamRecord("s2", FPAIRED | FREAD1 | FUNMAP, -1, -1, 0, [],
                          "C" * 70, "I" * 70, {}))
        # s3: alignment too short (<60 cols) -> no barcode
        w.write(BamRecord("s3", FPAIRED | FREAD1, 1, 0, 60,
                          [("M", 30), ("S", 40)], "G" * 70, "I" * 70, {}))
    out_map = add_barcode(bam, bc_map, str(tmp_path / "sb"))
    got = load_barcode_map(out_map)
    assert got == {"s1": "BX:Z:long1", "s2": "", "s3": ""}
    # assign barcodes into interleaved output
    r1, r2 = str(tmp_path / "sr1.fq"), str(tmp_path / "sr2.fq")
    write_fq(r1, [("s1", "AAAA"), ("s2", "CCCC"), ("s3", "GGGG")])
    write_fq(r2, [("s1", "TTTT"), ("s2", "GGGG"), ("s3", "CCCC")])
    inter = str(tmp_path / "hybrid.fq")
    assert assign_barcodes(out_map, r1, r2, inter) == 3
    recs = list(iter_fastq_records(inter))
    assert recs[0].header == "s1 BX:Z:long1-1"
    assert recs[1].header == "s1 BX:Z:long1-1"
    assert recs[2].header == "s2"
    assert recs[4].header == "s3"


def test_add_barcode_random_choice_seeded(tmp_path):
    """Multiple candidate long reads: uniform choice, seeded (srand 2023)."""
    lr_map = str(tmp_path / "m.txt")
    with open(lr_map, "w") as f:
        f.write("L1 BX:Z:L1\nL2 BX:Z:L2\n")
    bam = str(tmp_path / "b.bam")
    with BamWriter(bam, ["L1", "L2"], [100, 100]) as w:
        for i in range(40):
            name = f"s{i:03d}"
            w.write(BamRecord(name, FPAIRED | FREAD1, 0, 0, 60,
                              [("M", 70)], "A" * 70, "I" * 70, {}))
            w.write(BamRecord(name, FPAIRED | FREAD1, 1, 0, 60,
                              [("M", 70)], "A" * 70, "I" * 70, {}))
    out1 = add_barcode(bam, lr_map, str(tmp_path / "o1"))
    got1 = load_barcode_map(out1)
    vals = set(got1.values())
    assert vals == {"BX:Z:L1", "BX:Z:L2"}  # both chosen across 40 draws
    # deterministic given the seed
    os.rename(out1, out1 + ".bak")
    out2 = add_barcode(bam, lr_map, str(tmp_path / "o1"))
    assert open(out2).read() == open(out1 + ".bak").read()
