"""Circularization logic tests (Lathe encircle/spancircle ports + builtin)."""

import numpy as np

from pangaea_tpu.asm.circular_logic import (CoordRow, exact_overlap_trim,
                                            overcirc_region,
                                            parse_show_coords, smooth_coords,
                                            span_events)


def rand_seq(n, seed=0):
    rng = np.random.RandomState(seed)
    return "".join("ACGT"[b] for b in rng.randint(0, 4, n))


def test_exact_overlap_trim_detects_circle():
    genome = rand_seq(50_000, seed=1)
    overcirc = genome + genome[:5_000]  # wraparound repeat
    keep = exact_overlap_trim(overcirc, min_overlap=2_000)
    assert keep == 50_000
    assert overcirc[:keep] == genome


def test_exact_overlap_trim_linear_none():
    assert exact_overlap_trim(rand_seq(50_000, seed=2)) is None


def test_exact_overlap_trim_too_short_overlap():
    genome = rand_seq(30_000, seed=3)
    overcirc = genome + genome[:500]  # below min_overlap
    assert exact_overlap_trim(overcirc, min_overlap=2_000) is None


def test_overcirc_region_corner_cut():
    # synthetic self-alignment of a 2 Mb contig with a 100 kb terminal
    # repeat: the symmetric corner-cutting off-diagonals (encircle.py
    # dotplot); the identity hit is already stripped by the reference's
    # ``sed 1,5d`` (encircle.py:25-27)
    L, rep = 2_000_000, 100_000
    rows = [
        CoordRow(1, rep, L - rep + 1, L),          # start(ref) vs end(qry)
        CoordRow(L - rep + 1, L, 1, rep),          # end(ref) vs start(qry)
    ]
    region = overcirc_region(rows)
    assert region is not None
    start, end = region
    assert start == 1
    assert end == L - rep + 1  # keeping 1..end trims the terminal repeat


def test_overcirc_region_no_repeat():
    L = 2_000_000
    rows = [CoordRow(500_000, 600_000, 800_000, 900_000)]
    assert overcirc_region(rows) is None


def test_smooth_coords_joins_colinear():
    rows = [CoordRow(1, 20_000, 1, 20_000),
            CoordRow(25_000, 45_000, 25_000, 45_000),  # gap 5k < 150k: join
            CoordRow(900_000, 950_000, 100, 50_100)]   # far: new run
    sm = smooth_coords(rows)
    assert [s[:2] for s in sm] == [[1, 45_000], [900_000, 950_000]]


def test_span_events_trim_and_insert():
    # spanner aligns to both termini of the target; overlapping center
    # => trim (spancircle.py:34-39)
    rows = [
        CoordRow(1, 5_000, 1, 5_000, r_len=1_000_000, q_len=40_000,
                 r_name="tig", q_name="span"),
        CoordRow(995_000, 1_000_000, 3_000, 8_000, r_len=1_000_000,
                 q_len=40_000, r_name="tig", q_name="span"),
    ]
    ev = span_events(rows, margin=10_000)
    assert len(ev) == 1
    assert ev[0].target == "tig"
    assert ev[0].keep_end == 1_000_000 - (5_000 - 3_000)
    # gap between alignments => insert event (spancircle.py:41-48)
    rows2 = [
        CoordRow(1, 5_000, 1, 5_000, r_len=1_000_000, q_len=40_000,
                 r_name="tig", q_name="span"),
        CoordRow(995_000, 1_000_000, 9_000, 14_000, r_len=1_000_000,
                 q_len=40_000, r_name="tig", q_name="span"),
    ]
    ev2 = span_events(rows2, margin=10_000)
    assert ev2[0].insert == ("span", 5_000, 9_000)


def test_parse_show_coords():
    text = ("1\t100\t200\t300\t100\t101\t99.5\t5000\t5000\t2.0\t2.0"
            "\ttigA\ttigB\n")
    rows = parse_show_coords(text)
    assert rows[0].r_start == 1 and rows[0].q_end == 300
    assert rows[0].r_name == "tigA" and rows[0].q_name == "tigB"


def test_circularizer_builtin_roundtrip(tmp_path):
    from pangaea_tpu.asm.circularize import make_circularizer
    from pangaea_tpu.asm.fasta import iter_fasta, write_fasta
    from pangaea_tpu.asm.tools import ToolRunner
    from pangaea_tpu.config import AssemblyConfig, PangaeaConfig
    genome = rand_seq(60_000, seed=7)
    overcirc = genome + genome[:5_000]
    small = rand_seq(1_000, seed=8)
    fa = str(tmp_path / "asm.fa")
    write_fasta(fa, [("big", overcirc), ("small", small)])
    cfg = PangaeaConfig(
        assembly=AssemblyConfig(circularize_min_size=50_000))
    circ = make_circularizer(cfg, ToolRunner())
    out = circ(fa, fa, str(tmp_path))
    recs = dict(iter_fasta(out))
    assert recs["big_circularized"] == genome
    assert recs["small"] == small
