"""asm/unmapped.py vs the REAL reference binary and vs a transliteration
oracle of extract_unmapped.cpp, on BAMs covering every filter branch.

Two authorities (VERDICT r1 item 7, r2 item 8):

1. The actual /root/reference/src/cpptools/extract_unmapped.cpp,
   compiled UNMODIFIED against the in-repo minimal htslib shim
   (pangaea_tpu/native/htslib_shim — BGZF+BAM sequential reading is all
   the tool uses; real htslib is absent from this image and cannot be
   fetched). Its .list / .low_abd.fq outputs must be byte-identical.
2. tests/oracle_unmapped.py — an independent restatement of the C++
   control flow that never touches asm/unmapped.py (guards against a
   shim bug mirrored into both sides of authority 1).
"""

import os
import subprocess

import numpy as np
import pytest

from pangaea_tpu.asm.unmapped import extract_unmapped
from pangaea_tpu.io.bam import (BamRecord, BamWriter, FPAIRED, FREAD1,
                                FREAD2, FREVERSE, FSECONDARY, FUNMAP)

from tests.oracle_unmapped import expected_outputs

CUTOFF = 10


def _seq(n, seed):
    rng = np.random.default_rng(seed)
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


def _rec(qname, flag, tid=-1, cigar=(), seq="", qual="", nm=None):
    tags = {} if nm is None else {"NM": nm}
    if seq and not qual:
        qual = "I" * len(seq)
    return BamRecord(qname, flag, tid, 0 if tid >= 0 else -1,
                     60 if tid >= 0 else 0, list(cigar), seq, qual, tags)


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("unmapped"))
    refs = ["high1", "high2", "low1"]
    lens = [5000, 4000, 3000]
    depth_lines = [
        "contigName\tcontigLen\ttotalAvgDepth",
        "high1\t5000\t55.5",
        "high2\t4000\t10",      # == cutoff -> kept (>=)
        "low1\t3000\t9.99",     # below -> dropped
    ]
    P = FPAIRED
    groups = [
        # both mates unmapped -> emitted
        [_rec("g01", P | FREAD1 | FUNMAP, seq=_seq(80, 1)),
         _rec("g01", P | FREAD2 | FUNMAP, seq=_seq(80, 2))],
        # clean alignment to a high-cov contig -> suppressed
        [_rec("g02", P | FREAD1, 0, [("M", 80)], _seq(80, 3), nm=0),
         _rec("g02", P | FREAD2 | FUNMAP, seq=_seq(80, 4))],
        # maps only to the low-coverage contig -> emitted
        [_rec("g03", P | FREAD1, 2, [("M", 80)], _seq(80, 5), nm=0),
         _rec("g03", P | FREAD2 | FUNMAP, seq=_seq(80, 6))],
        # 59 aligned M/I/D columns (< 60) -> emitted
        [_rec("g04", P | FREAD1, 0, [("M", 30), ("I", 9), ("D", 20),
                                     ("S", 41)], _seq(80, 7), nm=0),
         _rec("g04", P | FREAD2 | FUNMAP, seq=_seq(80, 8))],
        # identity 75/80 = 0.9375 < 0.95 -> emitted
        [_rec("g05", P | FREAD1, 0, [("M", 80)], _seq(80, 9), nm=5),
         _rec("g05", P | FREAD2 | FUNMAP, seq=_seq(80, 10))],
        # identity exactly 0.95 (76/80) -> suppressed (>= threshold)
        [_rec("g06", P | FREAD1, 0, [("M", 80)], _seq(80, 11), nm=4),
         _rec("g06", P | FREAD2 | FUNMAP, seq=_seq(80, 12))],
        # reverse-strand failing record: emitted with the read
        # reconstructed (revcomp seq, reversed qual)
        [_rec("g07", P | FREAD1 | FREVERSE, 2, [("M", 80)], _seq(80, 13),
              qual="".join(chr(33 + (i % 40)) for i in range(80)), nm=0),
         _rec("g07", P | FREAD2 | FUNMAP, seq=_seq(80, 14))],
        # only read1 present -> dropped even though unmapped (pair gate)
        [_rec("g08", P | FREAD1 | FUNMAP, seq=_seq(80, 15))],
        # first alignment fails (low contig), second passes -> suppressed
        [_rec("g09", P | FREAD1, 2, [("M", 80)], _seq(80, 16), nm=0),
         _rec("g09", P | FREAD1 | FSECONDARY, 1, [("M", 80)], _seq(80, 16),
              nm=0),
         _rec("g09", P | FREAD2 | FUNMAP, seq=_seq(80, 17))],
        # ONLY a secondary alignment passes: the C++ parses but never
        # tests the secondary flag, so the group is suppressed
        [_rec("g10", P | FREAD1 | FUNMAP, seq=_seq(80, 18)),
         _rec("g10", P | FREAD1 | FSECONDARY, 0, [("M", 80)],
              _seq(80, 18), nm=0),
         _rec("g10", P | FREAD2 | FUNMAP, seq=_seq(80, 19))],
        # NM tag absent -> treated as 0 -> perfect identity -> suppressed
        [_rec("g11", P | FREAD1, 1, [("M", 80)], _seq(80, 20)),
         _rec("g11", P | FREAD2 | FUNMAP, seq=_seq(80, 21))],
        # two read1 records with different seqs, both failing: the FIRST
        # record's seq is emitted
        [_rec("g12", P | FREAD1 | FUNMAP, seq=_seq(80, 22)),
         _rec("g12", P | FREAD1, 2, [("M", 80)], _seq(80, 23), nm=0),
         _rec("g12", P | FREAD2 | FUNMAP, seq=_seq(80, 24))],
    ]
    bam = os.path.join(d, "aln.bam")
    w = BamWriter(bam, refs, lens)
    for group in groups:
        for rec in group:
            w.write(rec)
    w.close()
    depth = os.path.join(d, "depth.txt")
    with open(depth, "w") as f:
        f.write("\n".join(depth_lines) + "\n")
    return d, bam, depth, groups, depth_lines, refs, lens


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_CPP = "/root/reference/src/cpptools"
REF_BIN = "/tmp/pangaea_ref_bin/extract_unmapped"


def build_ref_unmapped() -> bool:
    if os.path.isfile(REF_BIN):
        return True
    if not os.path.isfile(os.path.join(REF_CPP, "extract_unmapped.cpp")):
        return False
    os.makedirs(os.path.dirname(REF_BIN), exist_ok=True)
    r = subprocess.run(
        ["g++", "-O2", "-std=c++14", "-fopenmp",
         f"-I{REPO}/pangaea_tpu/native/htslib_shim",
         f"-I{REF_CPP}/lib/cmdline",
         os.path.join(REF_CPP, "extract_unmapped.cpp"),
         "-lz", "-o", REF_BIN], capture_output=True)
    return r.returncode == 0


def run_ref_binary(bam, depth, cutoff, out_prefix):
    subprocess.run([REF_BIN, "-b", bam, "-c", depth, "-f", str(cutoff),
                    "-o", out_prefix], check=True, capture_output=True)


@pytest.mark.skipif(not build_ref_unmapped(),
                    reason="reference extract_unmapped unavailable")
def test_matches_reference_binary(golden):
    """asm/unmapped.py == the ACTUAL compiled reference tool, byte for
    byte, on the branch-covering golden BAM."""
    d, bam, depth, groups, depth_lines, refs, lens = golden
    ours = os.path.join(d, "ours_bin")
    theirs = os.path.join(d, "ref_bin")
    extract_unmapped(bam, depth, CUTOFF, ours)
    run_ref_binary(bam, depth, CUTOFF, theirs)
    assert (open(ours + ".list").read()
            == open(theirs + ".list").read())
    assert (open(ours + ".low_abd.fq").read()
            == open(theirs + ".low_abd.fq").read())


@pytest.mark.skipif(not build_ref_unmapped(),
                    reason="reference extract_unmapped unavailable")
def test_matches_reference_binary_randomized(tmp_path):
    """Byte-parity vs the reference binary on a larger randomized BAM:
    mixed flag combinations (secondary/supplementary/reverse/unmapped),
    multi-alignment name groups, varied cigars, NM tags present/absent,
    and reads split across high/low-coverage contigs."""
    rng = np.random.default_rng(42)
    refs = [f"ctg{i}" for i in range(6)]
    lens = [3000 + 500 * i for i in range(6)]
    depth = str(tmp_path / "depth.txt")
    with open(depth, "w") as f:
        f.write("contigName\tcontigLen\ttotalAvgDepth\n")
        for i, (r, ln) in enumerate(zip(refs, lens)):
            f.write(f"{r}\t{ln}\t{5 + 3 * i}\n")  # cutoff 10 splits them
    bam = str(tmp_path / "rand.bam")
    w = BamWriter(bam, refs, lens)
    flags_extra = [0, FREVERSE, FSECONDARY, FSECONDARY | FREVERSE,
                   0x800, 0x800 | FREVERSE]
    for g in range(300):
        qname = f"q{g:05d}"
        n_aln = int(rng.integers(1, 5))
        has_r1 = rng.random() < 0.9
        has_r2 = rng.random() < 0.9
        seq1, seq2 = _seq(80, 1000 + g), _seq(80, 2000 + g)
        for a in range(n_aln):
            mate_r1 = has_r1 and (a == 0 or rng.random() < 0.5 or
                                  not has_r2)
            mate = FREAD1 if mate_r1 else (FREAD2 if has_r2 else FREAD1)
            unmapped = rng.random() < 0.3
            flag = FPAIRED | mate
            tid = -1
            cigar = []
            nm = None
            if unmapped:
                flag |= FUNMAP
            else:
                flag |= flags_extra[int(rng.integers(0, 6))]
                tid = int(rng.integers(0, 6))
                m = int(rng.integers(20, 81))
                s = 80 - m
                cigar = [("M", m)] + ([("S", s)] if s else [])
                if rng.random() < 0.8:
                    nm = int(rng.integers(0, 8))
            rec = _rec(qname, flag, tid, cigar,
                       seq1 if (flag & FREAD1) else seq2, nm=nm)
            # decoy aux tags of other types BEFORE NM: bam_aux_get must
            # skip Z strings / floats / ints correctly to find NM
            decoys = {}
            if rng.random() < 0.5:
                decoys["RG"] = f"grp{int(rng.integers(0, 3))}"
            if rng.random() < 0.5:
                decoys["AS"] = int(rng.integers(0, 100))
            if rng.random() < 0.3:
                decoys["XS"] = float(rng.random())
            rec.tags = {**decoys, **rec.tags}
            w.write(rec)
    w.close()
    ours = str(tmp_path / "ours")
    theirs = str(tmp_path / "ref")
    extract_unmapped(bam, depth, CUTOFF, ours)
    run_ref_binary(bam, depth, CUTOFF, theirs)
    assert (open(ours + ".list").read()
            == open(theirs + ".list").read())
    assert (open(ours + ".low_abd.fq").read()
            == open(theirs + ".low_abd.fq").read())


def test_matches_cpp_oracle(golden):
    d, bam, depth, groups, depth_lines, refs, lens = golden
    out = os.path.join(d, "out")
    extract_unmapped(bam, depth, CUTOFF, out)
    want_list, want_fq = expected_outputs(groups, depth_lines, CUTOFF,
                                          refs, lens)
    assert open(out + ".list").read() == want_list
    assert open(out + ".low_abd.fq").read() == want_fq


def test_branch_outcomes(golden):
    """Sanity on the oracle itself: the hand-reasoned per-group verdicts
    (so a bug mirrored into both implementations cannot hide)."""
    d, bam, depth, groups, depth_lines, refs, lens = golden
    _, want_fq = expected_outputs(groups, depth_lines, CUTOFF, refs, lens)
    emitted = {line[1:].split("/")[0] for line in want_fq.splitlines()
               if line.startswith("@g")}
    assert emitted == {"g01", "g03", "g04", "g05", "g07", "g12"}


def test_revcomp_reconstruction(golden):
    d, bam, depth, groups, depth_lines, refs, lens = golden
    out = os.path.join(d, "out2")
    extract_unmapped(bam, depth, CUTOFF, out)
    fq = open(out + ".low_abd.fq").read()
    recs = fq.splitlines()
    i = recs.index("@g07/1")
    comp = {"A": "T", "T": "A", "C": "G", "G": "C"}
    want = "".join(comp[b] for b in reversed(_seq(80, 13)))
    assert recs[i + 1] == want
    assert recs[i + 3] == "".join(chr(33 + (i % 40))
                                  for i in range(80))[::-1]
