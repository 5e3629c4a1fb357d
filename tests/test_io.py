import gzip

import numpy as np

from pangaea_tpu.io.fastq import (BarcodeParser, barcode_sort_interleaved,
                                  iter_fastq_records)
from pangaea_tpu.io.grouping import (iter_read_pairs_interleaved,
                                     iter_read_pairs_paired)
from pangaea_tpu.io.sim import simulate_linked_reads


def test_barcode_parser_10x():
    p = BarcodeParser()
    name, bc = p.parse("read1\tBX:Z:ACGTACGT-1")
    assert (name, bc) == ("read1", "ACGTACGT")
    assert p.read_type == "10x"
    # sticky: later headers without BX:Z stay 10x and yield empty barcode
    name, bc = p.parse("read2 extra")
    assert (name, bc) == ("read2", "")


def test_barcode_parser_stlfr():
    p = BarcodeParser()
    name, bc = p.parse("read1#12_34_56/1")
    assert (name, bc) == ("read1", "12_34_56")
    assert p.read_type == "stLFR"
    name, bc = p.parse("read2#0_0_0/1")
    assert bc == ""  # 0_0_0 => unbarcoded (count_kmer.cpp:41-42)


def test_simulator_roundtrip(tmp_path):
    inter = str(tmp_path / "reads.fq.gz")
    res = simulate_linked_reads(out_interleaved=inter, n_species=2,
                                genome_len=5000, n_barcodes=10,
                                pairs_per_barcode=5, read_len=50, seed=3)
    pairs = list(iter_read_pairs_interleaved(inter))
    assert len(pairs) == res.n_pairs == 50
    # barcode-sorted stream
    bcs = [p.barcode for p in pairs]
    assert bcs == sorted(bcs)
    assert set(bcs) == set(res.barcodes)


def test_paired_vs_interleaved_consistency(tmp_path):
    r1, r2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    inter = str(tmp_path / "i.fq")
    simulate_linked_reads(out_interleaved=inter, out_r1=r1, out_r2=r2,
                          n_barcodes=5, pairs_per_barcode=3,
                          genome_len=3000, read_len=40, seed=1)
    pi = list(iter_read_pairs_interleaved(inter))
    pp = list(iter_read_pairs_paired(r1, r2))
    assert [(p.name, p.barcode, p.seq1, p.seq2) for p in pi] == \
           [(p.name, p.barcode, p.seq1, p.seq2) for p in pp]


def test_barcode_sort(tmp_path):
    # unsorted interleaved file with an unbarcoded pair
    recs = [
        ("x\tBX:Z:TTT-1", "AAAA"),
        ("y\tBX:Z:AAA-1", "CCCC"),
        ("z no_barcode", "GGGG"),
    ]
    inp, out = str(tmp_path / "u.fq"), str(tmp_path / "s.fq")
    with open(inp, "w") as f:
        for h, s in recs:
            for r in (1, 2):
                f.write(f"@{h}\n{s}\n+\nIIII\n")
    barcode_sort_interleaved(inp, out)
    headers = [r.header for r in iter_fastq_records(out)]
    # AAA first, TTT next, unbarcoded (~~~) last
    assert headers[0].startswith("y") and headers[2].startswith("x")
    assert headers[4].startswith("z")


def test_barcode_sort_external_runs(tmp_path):
    """The external (run-spill + k-way merge) path produces byte-identical
    output to the in-memory path, gz in / gz out included — step 0 must
    survive genome-scale files in bounded memory (src/run_pangaea:237-252
    is a disk-backed LANG=C sort)."""
    import gzip
    import random
    rng = random.Random(7)
    bcs = [f"BC{i:03d}" for i in range(40)]
    rng.shuffle(bcs)
    inp = str(tmp_path / "u.fq.gz")
    with gzip.open(inp, "wt") as f:
        for i in range(2000):
            bc = bcs[i % len(bcs)]
            seq = "".join(rng.choice("ACGT") for _ in range(60))
            for r in (1, 2):
                f.write(f"@r{i}\tBX:Z:{bc}-1\n{seq}\n+\n{'I' * 60}\n")
    outs = {}
    for name, kw in (
            ("py_ext", dict(mem_limit=16 << 10, backend="python")),
            ("py_mem", dict(backend="python")),
            ("gnu", dict(mem_limit=16 << 10, backend="gnu"))):
        out = str(tmp_path / f"{name}.fq.gz")
        barcode_sort_interleaved(inp, out, **kw)
        with gzip.open(out, "rb") as f:
            outs[name] = f.read()
    # spilled-runs path == in-memory path == GNU sort path, byte for byte
    assert outs["py_ext"] == outs["py_mem"] == outs["gnu"]
    # ... == the native C++ radix backend (plain output)
    from pangaea_tpu.native import native_available
    if native_available():
        out = str(tmp_path / "native.fq")
        barcode_sort_interleaved(inp, out, backend="native")
        with open(out, "rb") as f:
            assert f.read() == outs["gnu"]
    tmp = str(tmp_path / "s.fq")  # outs holds DECOMPRESSED bytes
    with open(tmp, "wb") as f:
        f.write(outs["gnu"])
    tags = [r.header.split("BX:Z:")[1] for r in iter_fastq_records(tmp)]
    assert tags == sorted(tags)


def test_barcode_sort_no_trailing_newline(tmp_path):
    """A file whose final record lacks the trailing newline must not
    lose that record, on every backend (regression: the python
    converter's carry was dropped at EOF)."""
    recs = []
    for i, bc in enumerate(["TTT", "AAA", "CCC"]):
        for r in (1, 2):
            recs.append(f"@r{i}\tBX:Z:{bc}-1\nACGT\n+\nIIII")
    text = "\n".join(recs)  # no trailing newline
    inp = str(tmp_path / "u.fq")
    with open(inp, "w") as f:
        f.write(text)
    outs = {}
    for backend in ("python", "gnu", "native"):
        out = str(tmp_path / f"{backend}.fq")
        barcode_sort_interleaved(inp, out, backend=backend)
        with open(out, "rb") as f:
            outs[backend] = f.read()
    assert outs["python"] == outs["gnu"] == outs["native"]
    assert outs["python"].count(b"@r") == 6  # all records kept


def test_barcode_sort_native_recursion_acgt(tmp_path):
    """ACGT barcodes land in only 16 top-level radix buckets; a tiny
    mem_limit must force the recursive re-scatter, not an unbounded
    in-memory load (regression: mem_limit was ignored)."""
    import gzip
    import random
    rng = random.Random(3)
    bcs = ["".join(rng.choice("ACGT") for _ in range(12))
           for _ in range(64)]
    inp = str(tmp_path / "u.fq.gz")
    with gzip.open(inp, "wt") as f:
        for i in range(4000):
            bc = bcs[i % len(bcs)]
            seq = "".join(rng.choice("ACGT") for _ in range(60))
            for r in (1, 2):
                f.write(f"@q{i}\tBX:Z:{bc}-1\n{seq}\n+\n{'I' * 60}\n")
    nat = str(tmp_path / "nat.fq")
    ref = str(tmp_path / "ref.fq")
    # ~2.2 MB of records vs a 64 KiB budget => multiple recursion levels
    barcode_sort_interleaved(inp, nat, backend="native",
                             mem_limit=64 << 10)
    barcode_sort_interleaved(inp, ref, backend="python")
    with open(nat, "rb") as a, open(ref, "rb") as b:
        assert a.read() == b.read()
