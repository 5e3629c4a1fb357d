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
    # the pool contains the candidate itself (as in the real pipeline,
    # merge_asm.sh:38), so SPAN circularization fires: the self-spanner
    # overlaps both termini and trims the duplicated wrap. The kept
    # length is n+1, reproducing spancircle.py:36-38's own off-by-one
    # (trim = prev_q_end - q_start, no +1 for 1-based inclusive coords).
    assert "big_spanned" in recs
    got = recs["big_spanned"]
    assert abs(len(got) - len(genome)) <= 1
    assert got[:len(genome)] == genome
    assert recs["small"] == small


def test_circularizer_builtin_overcirc_only(tmp_path):
    """With no spanning evidence in the pool, the over-circularization
    trim (exact terminal-repeat floor for encircle.py) still recovers the
    genome exactly."""
    from pangaea_tpu.asm.circularize import make_circularizer
    from pangaea_tpu.asm.fasta import iter_fasta, write_fasta
    from pangaea_tpu.asm.tools import ToolRunner
    from pangaea_tpu.config import AssemblyConfig, PangaeaConfig
    genome = rand_seq(60_000, seed=7)
    overcirc = genome + genome[:5_000]
    decoy = rand_seq(9_000, seed=9)
    fa = str(tmp_path / "asm.fa")
    pool = str(tmp_path / "pool.fa")
    write_fasta(fa, [("big", overcirc)])
    write_fasta(pool, [("decoy", decoy)])
    cfg = PangaeaConfig(
        assembly=AssemblyConfig(circularize_min_size=50_000))
    circ = make_circularizer(cfg, ToolRunner())
    recs = dict(iter_fasta(circ(fa, pool, str(tmp_path))))
    assert recs["big_circularized"] == genome


# ---- full Lathe span workflow (builtin floor: anchor aligner + unitig
# assembler), reference third_parties/Lathe/Snakefile:36-135 -------------


def _rand_circle(n, seed):
    rng = np.random.default_rng(seed)
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


def _span_cfg(tmp_path):
    import dataclasses
    from pangaea_tpu.config import AssemblyConfig, PangaeaConfig
    return PangaeaConfig(
        output=str(tmp_path), threads=2,
        assembly=AssemblyConfig(circularize_min_size=50_000,
                                terminal_window=20_000))


def _run_circ(tmp_path, contigs, pool):
    from pangaea_tpu.asm.circularize import make_circularizer
    from pangaea_tpu.asm.fasta import iter_fasta, write_fasta
    from pangaea_tpu.asm.tools import ToolRunner
    contigs_fa = str(tmp_path / "contigs.fa")
    pool_fa = str(tmp_path / "pool.fa")
    write_fasta(contigs_fa, contigs)
    write_fasta(pool_fa, pool)
    circ = make_circularizer(_span_cfg(tmp_path),
                             ToolRunner(log_dir=str(tmp_path / "logs")))
    out = circ(contigs_fa, pool_fa, str(tmp_path))
    return list(iter_fasta(out))


def test_span_circularization_gap_extend(tmp_path):
    """A candidate missing sequence at the wrap point is EXTENDED with the
    spanner's insert (spancircle.py gap branch + Snakefile:119-135)."""
    n = 120_000
    C = _rand_circle(n, 41)
    T = C[200:]                      # 200 bp missing at the wrap
    W = C[-12_000:] + C[:12_000]     # spanner crosses the wrap
    decoy = C[30_000:60_000]
    out = _run_circ(tmp_path, [("tig1", T)],
                    [("span1", W), ("mid1", decoy)])
    assert len(out) == 1
    name, seq = out[0]
    assert name == "tig1_spanned"
    # whole tig kept + insert appended => circle length recovered
    assert abs(len(seq) - n) <= 5, (len(seq), n)
    assert seq[:1000] == T[:1000]
    # the insert closes the wrap gap; the spanner's assembly orientation
    # is arbitrary (flye's is too, and Lathe appends the faidx slice
    # as-is, Snakefile:130-133), so accept either strand
    from pangaea_tpu.asm.circular_logic import _revcomp_str
    tail = seq[-50:]
    # the insert slice starts AT prev_q_end (spancircle.py:46-48), so it
    # carries one duplicated junction base — search across the wrap
    wrap = C[-5:] + C[:250]
    assert tail in wrap or tail in _revcomp_str(wrap)


def test_span_circularization_overlap_trim(tmp_path):
    """An over-circularized candidate (duplicated wrap sequence) is
    TRIMMED at the wrap-around (spancircle.py overlap branch): the
    spanner's center aligns to both termini with overlapping query
    intervals thanks to multi-occurrence anchors."""
    n = 120_000
    C = _rand_circle(n, 42)
    T = C + C[:2_000]                # 2 kb over-circularized
    W = C[-12_000:] + C[:12_000]
    out = _run_circ(tmp_path, [("tig1", T)], [("span1", W)])
    assert len(out) == 1
    name, seq = out[0]
    assert name == "tig1_spanned"
    assert abs(len(seq) - n) <= 5, (len(seq), n)
    assert seq[: n - 5] == C[: n - 5]


def test_span_circularization_linear_untouched(tmp_path):
    """A linear contig with no spanning evidence passes through unchanged
    (and keeps its original name)."""
    rng = np.random.default_rng(7)
    T = "".join("ACGT"[i] for i in rng.integers(0, 4, 80_000))
    decoy = "".join("ACGT"[i] for i in rng.integers(0, 4, 30_000))
    out = _run_circ(tmp_path, [("lin1", T)], [("mid1", decoy)])
    assert out == [("lin1", T)]


def test_anchor_chain_coords_blocks():
    """Builtin aligner: forward and reverse blocks with nucmer-style
    coordinates (reverse = descending query coords)."""
    from pangaea_tpu.asm.circular_logic import (_revcomp_str,
                                                anchor_chain_coords)
    t = _rand_circle(60_000, 3)
    q = t[10_000:14_000] + t[40_000:43_000]  # two blocks, one query
    rows = anchor_chain_coords("T", t, "Q", q)
    spans = sorted((r.r_start, r.r_end) for r in rows)
    assert len(spans) == 2
    # block boundaries are k-fuzzy: a junction k-mer can extend a block
    # by a base or two when the flanking target bases happen to match
    for got, want in zip(spans, [(10_001, 14_000), (40_001, 43_000)]):
        assert abs(got[0] - want[0]) <= 21 and abs(got[1] - want[1]) <= 21
    rows_rc = anchor_chain_coords("T", t, "Q", _revcomp_str(q))
    assert all(r.q_start > r.q_end for r in rows_rc)


def test_terminal_read_names_pull():
    from pangaea_tpu.asm.circular_logic import terminal_read_names
    t = _rand_circle(100_000, 5)
    reads = [("head", t[1_000:5_000]), ("tail", t[-6_000:-500]),
             ("mid", t[45_000:55_000]),
             ("wrap", t[-2_000:] + t[:2_000])]
    got = terminal_read_names(t, iter(reads), window=20_000)
    assert got == ["head", "tail", "wrap"]
