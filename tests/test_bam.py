"""BAM codec roundtrip tests (io/bam.py vs the SAM spec)."""

import numpy as np

from pangaea_tpu.io.bam import (BamReader, BamRecord, BamWriter, FPAIRED,
                                FREAD1, FREAD2, FREVERSE, FUNMAP, revcomp)


def test_roundtrip(tmp_path):
    path = str(tmp_path / "t.bam")
    recs = [
        BamRecord("read1", FPAIRED | FREAD1, 0, 100, 60,
                  [("M", 50), ("I", 2), ("D", 3), ("S", 10)],
                  "ACGT" * 15 + "TT", "I" * 62, {"NM": 5, "XX": "hello"}),
        BamRecord("read1", FPAIRED | FREAD2 | FREVERSE, 1, 200, 13,
                  [("M", 10)], "ACGTACGTAC", "JJJJJJJJJJ", {"NM": 0}),
        BamRecord("read2", FPAIRED | FREAD1 | FUNMAP, -1, -1, 0, [],
                  "GGGG", "IIII", {}),
    ]
    with BamWriter(path, ["ctgA", "ctgB"], [1000, 2000], "@HD\tVN:1.6\n") as w:
        for r in recs:
            w.write(r)
    rd = BamReader(path)
    assert rd.references == ["ctgA", "ctgB"]
    assert rd.lengths == [1000, 2000]
    assert rd.text.startswith("@HD")
    got = list(rd)
    assert len(got) == 3
    for orig, back in zip(recs, got):
        assert back.qname == orig.qname
        assert back.flag == orig.flag
        assert back.tid == orig.tid
        assert back.pos == orig.pos
        assert back.mapq == orig.mapq
        assert back.cigar == orig.cigar
        assert back.seq == orig.seq
        assert back.qual == orig.qual
        assert back.tags.get("NM", None) == orig.tags.get("NM", None)
    assert got[0].tags["XX"] == "hello"


def test_alignment_columns_and_endpos():
    r = BamRecord("r", 0, 0, 10, 60, [("S", 5), ("M", 20), ("I", 2),
                                      ("D", 3), ("M", 10)],
                  "A" * 37, "", {})
    # M+I+D = 20+2+3+10 = 35 (extract_unmapped.cpp:102-109)
    assert r.alignment_columns() == 35
    # reference consumed: M+D = 33
    assert r.end_pos() == 10 + 33


def test_revcomp():
    assert revcomp("ACGTN") == "NACGT"


def test_unmapped_record_no_cigar_endpos():
    r = BamRecord("r", FUNMAP, -1, 5, 0, [], "AC", "II", {})
    assert r.end_pos() == 6
