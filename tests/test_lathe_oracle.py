"""Executed-reference parity for the Lathe decision logic.

The reference's circularization detectors are plain Python scripts driven
by snakemake objects (third_parties/Lathe/scripts/spancircle.py and
encircle.py). They are the one vendored component whose reference is
directly runnable on this box, so these tests EXECUTE the original
scripts (under a tiny snakemake-object stub, with the nucmer invocation
stubbed out for encircle) on coordinate tables and assert our ports —
``span_events`` and ``smooth_coords``/``overcirc_region``
(pangaea_tpu/asm/circular_logic.py) — agree event-for-event.

Tables come from three sources: the hand fixtures of test_circular.py,
realistic tables produced by the builtin anchor-chain aligner on
simulated circles, and a randomized sweep over the scripts' branch space
(terminal/non-terminal, same/different spanner, overlap/gap, inversions,
short alignments).
"""

import os
import re
import sys
import types

import numpy as np
import pytest

from pangaea_tpu.asm.circular_logic import (CoordRow, anchor_chain_coords,
                                            overcirc_region, span_events)

SPAN_SRC = "/root/reference/third_parties/Lathe/scripts/spancircle.py"
ENC_SRC = "/root/reference/third_parties/Lathe/scripts/encircle.py"
MARGIN = 10_000  # Lathe Snakefile:103


class _Snakemake:
    def __init__(self, inputs, outputs, params=None, threads=1):
        self.input = inputs
        self.output = outputs
        self.params = params or {}
        self.threads = threads


def _span_tsv_line(r: CoordRow) -> str:
    # show-coords -Tl layout consumed by spancircle.py:19-29:
    # S1 E1 S2 E2 LEN1 LEN2 IDY LENR LENQ TAGR TAGQ
    return "\t".join(map(str, [
        r.r_start, r.r_end, r.q_start, r.q_end,
        abs(r.r_end - r.r_start) + 1, abs(r.q_end - r.q_start) + 1,
        "99.9", r.r_len, r.q_len, r.r_name, r.q_name]))


def _run_spancircle(tmp_path, lines, margin=MARGIN):
    coords = tmp_path / "span_coords.tsv"
    out = tmp_path / "span_out.txt"
    coords.write_text("".join(l + "\n" for l in lines))
    g = {"snakemake": _Snakemake([str(coords)], [str(out)],
                                 {"margin": margin}),
         "__name__": "__spancircle__"}
    src = open(SPAN_SRC).read()
    exec(compile(src, SPAN_SRC, "exec"), g)
    return out.read_text()


def _parse_span_output(text):
    """Oracle output -> [('trim', target, keep_end) | ('insert', target,
    spanner, lo, hi)], mirroring spancircle.py:39,46-49."""
    lines = text.splitlines()
    assert lines and lines[-1] == "done"
    lines = lines[:-1]
    events, i = [], 0
    while i < len(lines):
        l = lines[i]
        if l == "no circularizations":
            events.append(("none",))
            i += 1
        elif ":" in l:  # "{target}:1-{keep_end}"
            m = re.match(r"^(.*):1-(-?\d+)$", l)
            assert m, l
            events.append(("trim", m.group(1), int(m.group(2))))
            i += 1
        else:  # bare target line + "spanner:lo-hi"
            m = re.match(r"^(.*):(-?\d+)-(-?\d+)$", lines[i + 1])
            assert m, lines[i + 1]
            events.append(("insert", l, m.group(1), int(m.group(2)),
                           int(m.group(3))))
            i += 2
    return events


def _ours_as_tuples(rows, margin=MARGIN):
    out = []
    for ev in span_events(rows, margin=margin):
        if ev.keep_end is not None:
            out.append(("trim", ev.target, ev.keep_end))
        else:
            sp, lo, hi = ev.insert
            out.append(("insert", ev.target, sp, lo, hi))
    return out


def _assert_span_agree(tmp_path, rows, margin=MARGIN):
    oracle = _parse_span_output(
        _run_spancircle(tmp_path, [_span_tsv_line(r) for r in rows],
                        margin))
    assert oracle == _ours_as_tuples(rows, margin)


# ---- spancircle ----------------------------------------------------------

def test_span_oracle_trim_fixture(tmp_path):
    rows = [
        CoordRow(1, 5_000, 1, 5_000, r_len=1_000_000, q_len=40_000,
                 r_name="tig", q_name="span"),
        CoordRow(995_000, 1_000_000, 3_000, 8_000, r_len=1_000_000,
                 q_len=40_000, r_name="tig", q_name="span"),
    ]
    _assert_span_agree(tmp_path, rows)


def test_span_oracle_insert_fixture(tmp_path):
    rows = [
        CoordRow(1, 5_000, 1, 5_000, r_len=1_000_000, q_len=40_000,
                 r_name="tig", q_name="span"),
        CoordRow(995_000, 1_000_000, 9_000, 14_000, r_len=1_000_000,
                 q_len=40_000, r_name="tig", q_name="span"),
    ]
    _assert_span_agree(tmp_path, rows)


def test_span_oracle_no_circularizations(tmp_path):
    out = _run_spancircle(tmp_path, ["no circularizations"])
    assert _parse_span_output(out) == [("none",)]


def _rand_circle(n, seed):
    rng = np.random.default_rng(seed)
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


@pytest.mark.parametrize("case", ["overlap", "gap"])
def test_span_oracle_on_anchor_chain_tables(tmp_path, case):
    """Coord tables from the builtin aligner on simulated circles — the
    exact tables the hermetic circularizer feeds span_events — replayed
    through the reference script."""
    n = 120_000
    C = _rand_circle(n, 42 if case == "overlap" else 41)
    if case == "overlap":
        T = C + C[:2_000]              # over-circularized
    else:
        T = C[200:]                    # 200 bp missing at the wrap
    W = C[-12_000:] + C[:12_000]       # spanner crosses the wrap
    rows = anchor_chain_coords("tig1", T, "span1", W)
    assert rows, "aligner found no blocks — fixture broken"
    _assert_span_agree(tmp_path, rows)
    # our port found the expected event type on this table
    ours = _ours_as_tuples(rows)
    kinds = {e[0] for e in ours}
    assert ("trim" if case == "overlap" else "insert") in kinds


def test_span_oracle_random_sweep(tmp_path):
    """Randomized branch-space sweep: terminal/interior alignments,
    same/different names, swapped coordinate orders, overlap vs gap."""
    rng = np.random.default_rng(7)
    r_len, q_len = 500_000, 60_000
    names_t = ["tigA", "tigB"]
    names_q = ["spanA", "spanB"]
    for trial in range(150):
        nrows = int(rng.integers(1, 7))
        rows = []
        for _ in range(nrows):
            # biased toward termini so spanned events actually occur
            loc = rng.choice(["start", "end", "mid"])
            if loc == "start":
                r0 = int(rng.integers(1, MARGIN))
            elif loc == "end":
                r0 = int(rng.integers(r_len - MARGIN - 6_000,
                                      r_len - 5_000))
            else:
                r0 = int(rng.integers(MARGIN + 1_000,
                                      r_len - MARGIN - 20_000))
            r1 = r0 + int(rng.integers(1_000, 6_000))
            qloc = rng.choice(["start", "end", "mid"])
            if qloc == "start":
                q0 = int(rng.integers(1, MARGIN))
            elif qloc == "end":
                q0 = int(rng.integers(q_len - MARGIN - 3_000,
                                      q_len - 2_000))
            else:
                q0 = int(rng.integers(MARGIN + 1_000,
                                      q_len - MARGIN - 4_000))
            q1 = q0 + int(rng.integers(500, 3_000))
            if rng.random() < 0.3:
                r0, r1 = r1, r0  # reversed coords (min/max handling)
            if rng.random() < 0.3:
                q0, q1 = q1, q0
            rows.append(CoordRow(r0, r1, q0, q1, r_len=r_len, q_len=q_len,
                                 r_name=str(rng.choice(names_t)),
                                 q_name=str(rng.choice(names_q))))
        d = tmp_path / f"t{trial}"
        d.mkdir()
        _assert_span_agree(d, rows)


# ---- encircle ------------------------------------------------------------

def _enc_tsv_line(vals):
    # plain show-coords -T after `sed 1,5d` (encircle.py:24-26):
    # S1 E1 S2 E2 LEN1 LEN2 IDY TAGR TAGQ — script uses s[0..3], s[-1]
    s1, e1, s2, e2, name = vals
    return "\t".join(map(str, [s1, e1, s2, e2, abs(e1 - s1) + 1,
                               abs(e2 - s2) + 1, "99.9", name, name]))


def _run_encircle(tmp_path, lines, monkeypatch):
    coords = tmp_path / "coords.tsv"  # hardcoded relative path in the ref
    out = tmp_path / "enc_out.txt"
    fa = tmp_path / "genome.fa"
    fa.write_text(">x\nACGT\n")
    coords.write_text("".join(l + "\n" for l in lines))
    monkeypatch.chdir(tmp_path)
    calls = []
    monkeypatch.setattr(os, "system", lambda cmd: calls.append(cmd) or 0)
    if "pysam" not in sys.modules:  # imported but unused by the script
        monkeypatch.setitem(sys.modules, "pysam",
                            types.ModuleType("pysam"))
    g = {"snakemake": _Snakemake([str(fa)], [str(out)],
                                 {"delta": str(tmp_path / "delta")}),
         "__name__": "__encircle__"}
    src = open(ENC_SRC).read()
    exec(compile(src, ENC_SRC, "exec"), g)
    g["out"].close()  # the script relies on process exit to flush
    assert any("nucmer" in c for c in calls)  # it tried to align
    return out.read_text()


def _enc_region_from_output(text):
    lines = text.splitlines()
    assert lines[-1] == "done"
    if len(lines) == 1:
        return None
    m = re.match(r"^(.*):(\d+)-(\d+)$", lines[0])
    assert m, lines[0]
    return int(m.group(2)), int(m.group(3))


def _assert_enc_agree(tmp_path, rows, monkeypatch):
    text = _run_encircle(tmp_path,
                         [_enc_tsv_line((r.r_start, r.r_end, r.q_start,
                                         r.q_end, r.r_name or "tig"))
                          for r in rows], monkeypatch)
    assert _enc_region_from_output(text) == overcirc_region(rows)


def test_encircle_oracle_corner_cut(tmp_path, monkeypatch):
    L, rep = 2_000_000, 100_000
    rows = [CoordRow(1, rep, L - rep + 1, L, r_name="tig"),
            CoordRow(L - rep + 1, L, 1, rep, r_name="tig")]
    _assert_enc_agree(tmp_path, rows, monkeypatch)
    assert overcirc_region(rows) == (1, L - rep + 1)


def test_encircle_oracle_no_repeat(tmp_path, monkeypatch):
    rows = [CoordRow(500_000, 600_000, 800_000, 900_000, r_name="tig")]
    _assert_enc_agree(tmp_path, rows, monkeypatch)


def test_encircle_oracle_empty(tmp_path, monkeypatch):
    text = _run_encircle(tmp_path, [], monkeypatch)
    assert _enc_region_from_output(text) is None


def test_encircle_oracle_anchor_chain_self_alignment(tmp_path,
                                                     monkeypatch):
    """Self-alignment of an over-circularized contig through the builtin
    aligner (identity hit dropped like the reference's `sed 1,5d`)."""
    n = 400_000
    C = _rand_circle(n, 9)
    T = C + C[:160_000]  # terminal repeat > min_smoothed_aln_len
    rows = [r for r in anchor_chain_coords("tig", T, "tig", T, k=31)
            if not (r.r_start == r.q_start and r.r_end == r.q_end)]
    assert rows, "self-aligner found no off-diagonal blocks"
    _assert_enc_agree(tmp_path, rows, monkeypatch)


def test_encircle_oracle_random_sweep(tmp_path, monkeypatch):
    """Randomized sweep incl. inversions, short alignments, colinear
    runs, and corner-cutting diagonals."""
    rng = np.random.default_rng(13)
    L = 2_000_000
    for trial in range(100):
        nrows = int(rng.integers(1, 8))
        rows = []
        for _ in range(nrows):
            kind = rng.choice(["corner_lo", "corner_hi", "mid", "short",
                               "inversion"])
            if kind == "corner_lo":
                r0 = int(rng.integers(1, 140_000))
                r1 = r0 + int(rng.integers(6_000, 120_000))
                q0 = int(rng.integers(L - 150_000, L - 20_000))
                q1 = min(L, q0 + (r1 - r0))
            elif kind == "corner_hi":
                r0 = int(rng.integers(L - 150_000, L - 20_000))
                r1 = min(L, r0 + int(rng.integers(6_000, 120_000)))
                q0 = int(rng.integers(1, 140_000))
                q1 = q0 + (r1 - r0)
            elif kind == "mid":
                r0 = int(rng.integers(200_000, L - 400_000))
                r1 = r0 + int(rng.integers(6_000, 150_000))
                q0 = r0 + int(rng.integers(-100_000, 100_000))
                q1 = q0 + (r1 - r0)
            elif kind == "short":
                r0 = int(rng.integers(1, L - 10_000))
                r1 = r0 + int(rng.integers(100, 4_999))
                q0, q1 = r0, r1
            else:  # inversion: S1 > E1
                r1 = int(rng.integers(1, L - 200_000))
                r0 = r1 + int(rng.integers(6_000, 100_000))
                q0, q1 = r1, r0
            rows.append(CoordRow(r0, r1, q0, q1, r_name="tig"))
        d = tmp_path / f"t{trial}"
        d.mkdir()
        _assert_enc_agree(d, rows, monkeypatch)
