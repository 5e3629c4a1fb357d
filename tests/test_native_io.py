"""Native C++ IO path vs the pure-Python oracle path: identical outputs."""

import gzip

import numpy as np
import pytest

from pangaea_tpu.config import FeatureConfig
from pangaea_tpu.features import FeatureExtractor
from pangaea_tpu.io.sim import simulate_linked_reads

native = pytest.importorskip("pangaea_tpu.native")
if not native.native_available():
    pytest.skip("native IO build unavailable", allow_module_level=True)


def test_native_reader_basic(tmp_path):
    from pangaea_tpu.native import NativeFastqReader
    path = str(tmp_path / "r.fq.gz")
    with gzip.open(path, "wt") as f:
        f.write("@r1\tBX:Z:AAAC-1\nACGTN\n+\nIIIII\n")
        f.write("@r2#12_0_3/1\nGGGG\n+\nIIII\n")
    with NativeFastqReader(path, max_len=8, name_width=16) as rd:
        codes, lengths, bcs, names = rd.read(10)
    assert lengths.tolist() == [5, 4]
    # (ascii>>1)&3: A=0 C=1 G=3 T=2; N/pad = 4
    assert codes[0].tolist() == [0, 1, 3, 2, 4, 4, 4, 4]
    assert bcs[0] == b"AAAC"
    # sticky type: first header said 10x, '#' header parsed as 10x too
    assert names[0] == b"r1"
    assert names[1] == b"r2#12_0_3/1"
    assert bcs[1] == b""


def test_native_reader_stlfr_sticky(tmp_path):
    from pangaea_tpu.native import NativeFastqReader
    path = str(tmp_path / "r.fq")
    with open(path, "w") as f:
        f.write("@r1#1_2_3/1\nACGT\n+\nIIII\n")
        f.write("@r2#0_0_0/1\nACGT\n+\nIIII\n")
    with NativeFastqReader(path, max_len=8, name_width=16) as rd:
        _, _, bcs, names = rd.read(10)
    assert bcs.tolist() == [b"1_2_3", b""]
    assert names.tolist() == [b"r1", b"r2"]


def test_native_reader_quality_mask(tmp_path):
    from pangaea_tpu.native import NativeFastqReader
    path = str(tmp_path / "r.fq")
    with open(path, "w") as f:
        f.write("@r1\nACGT\n+\n!I!I\n")  # '!' (33) below '?' (63)
    with NativeFastqReader(path, max_len=4, min_qual_char="?") as rd:
        codes, lengths, _ = rd.read(1)
    assert codes[0].tolist() == [4, 1, 4, 2]


@pytest.fixture(scope="module")
def simfile(tmp_path_factory):
    d = tmp_path_factory.mktemp("nativeio")
    path = str(d / "reads.fq.gz")
    simulate_linked_reads(out_interleaved=path, n_species=3,
                          genome_len=20_000, n_barcodes=120,
                          pairs_per_barcode=25, seed=21)
    return path


def extract(path, tmpdir, force_python: bool):
    cfg = FeatureConfig(reads_per_batch=4096)
    fe = FeatureExtractor(cfg, str(tmpdir))
    if force_python:
        import pangaea_tpu.native as nat
        saved = nat.native_available
        nat.native_available = lambda: False
        try:
            out = fe.extract_features(interleaved=path)
        finally:
            nat.native_available = saved
    else:
        out = fe.extract_features(interleaved=path)
    return out


def test_native_features_match_python(simfile, tmp_path):
    n_names, n_abd, n_tnf = extract(simfile, tmp_path / "nat", False)
    p_names, p_abd, p_tnf = extract(simfile, tmp_path / "py", True)
    assert n_names.tolist() == p_names.tolist()
    np.testing.assert_array_equal(n_abd, p_abd)
    np.testing.assert_array_equal(n_tnf, p_tnf)


def test_native_group_chunks_small_chunksize(simfile, tmp_path):
    """Chunk splitting mid-buffer keeps ids consistent."""
    from pangaea_tpu.io.fast_packing import native_group_chunks
    from pangaea_tpu.io.grouping import (iter_barcode_groups,
                                         iter_read_pairs_interleaved)
    from pangaea_tpu.io.packing import GroupPacker
    chunks = list(native_group_chunks(simfile, 2000, 256, 512,
                                      groups_per_chunk=16,
                                      pairs_per_buffer=100))
    gp = GroupPacker(min_len=2000, max_read_len=256, overlap=14,
                     reads_per_batch=512, groups_per_chunk=16)
    ref = list(gp.iter_chunks(iter_barcode_groups(
        iter_read_pairs_interleaved(simfile))))
    assert [c.names for c in chunks] == [c.names for c in ref]
    # same rows per (chunk, seg): compare multisets of (seg, length)
    for cn, cr in zip(chunks, ref):
        got = sorted((int(s), int(l))
                     for b in cn.batches
                     for s, l in zip(b.seg_ids, b.lengths) if s >= 0)
        want = sorted((int(s), int(l))
                      for b in cr.batches
                      for s, l in zip(b.seg_ids, b.lengths) if s >= 0)
        assert got == want


def test_native_keep_dropped_matches_python(simfile):
    """keep_dropped: dropped reads appear once as seg -1 rows on both
    paths (multiset of lengths), kept rows unchanged (sort-join
    prerequisite: global counts must cover every read)."""
    from pangaea_tpu.io.fast_packing import native_group_chunks
    from pangaea_tpu.io.grouping import (iter_barcode_groups,
                                         iter_read_pairs_interleaved)
    from pangaea_tpu.io.packing import GroupPacker
    # min_len high enough that some groups drop
    chunks = list(native_group_chunks(simfile, 20000, 256, 512,
                                      groups_per_chunk=16,
                                      pairs_per_buffer=100,
                                      keep_dropped=True))
    gp = GroupPacker(min_len=20000, max_read_len=256, overlap=14,
                     reads_per_batch=512, groups_per_chunk=16,
                     keep_dropped=True)
    ref = list(gp.iter_chunks(iter_barcode_groups(
        iter_read_pairs_interleaved(simfile))))
    assert [c.names for c in chunks] == [c.names for c in ref]

    def rows(cs, dropped):
        out = []
        for c in cs:
            for b in c.batches:
                for s, l, code in zip(b.seg_ids, b.lengths, b.codes):
                    if l == 0:
                        continue
                    if dropped and s == -1:
                        out.append(code[:l].tobytes())
                    elif not dropped and s >= 0:
                        out.append((int(s), code[:l].tobytes()))
        return sorted(out)

    assert rows(chunks, False) == rows(ref, False)
    d_nat, d_py = rows(chunks, True), rows(ref, True)
    assert len(d_nat) > 0
    # dropped rows are a global multiset (chunk placement may differ)
    assert d_nat == d_py


def test_native_sortjoin_matches_scatter(simfile, tmp_path):
    """Native-IO sort-join extraction == python scatter extraction."""
    cfg = FeatureConfig(reads_per_batch=4096, hist_impl="sortjoin",
                        min_qual_char=None)
    fe = FeatureExtractor(cfg, str(tmp_path / "sj"))
    n_names, n_abd, n_tnf = fe.extract_features(interleaved=simfile)
    cfg2 = FeatureConfig(reads_per_batch=4096, hist_impl="scatter",
                         min_qual_char=None)
    fe2 = FeatureExtractor(cfg2, str(tmp_path / "sc"))
    p_names, p_abd, p_tnf = fe2.extract_features(interleaved=simfile)
    assert n_names.tolist() == p_names.tolist()
    np.testing.assert_array_equal(n_abd, p_abd)
    np.testing.assert_array_equal(n_tnf, p_tnf)


def test_native_single_group_spans_many_buffers(tmp_path):
    """One barcode run covering several whole read buffers exercises the
    deferred-carry path (fragments appended, concatenated once at
    close); output must equal the python packer's, including the
    unbarcoded tail run."""
    import gzip
    from pangaea_tpu.io.fast_packing import native_group_chunks
    from pangaea_tpu.io.grouping import (iter_barcode_groups,
                                         iter_read_pairs_interleaved)
    from pangaea_tpu.io.packing import GroupPacker
    import numpy as np
    rng = np.random.default_rng(9)
    fq = str(tmp_path / "span.fq.gz")
    with gzip.open(fq, "wt") as f:
        def write(bc_tag, n, tag0):
            for i in range(n):
                seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 60))
                for r in (1, 2):
                    f.write(f"@{tag0}{i}{bc_tag}\n{seq}\n+\n{'I'*60}\n")
        write("\tBX:Z:AAA-1", 20, "a")     # small leading group
        write("\tBX:Z:BBB-1", 300, "b")    # spans many 50-pair buffers
        write("\tBX:Z:CCC-1", 25, "c")
        write("", 120, "u")                # unbarcoded tail run
    kw = dict(min_len=100, max_read_len=64, reads_per_batch=32)
    chunks = list(native_group_chunks(fq, kw["min_len"], 64, 32,
                                      groups_per_chunk=8,
                                      pairs_per_buffer=50,
                                      keep_dropped=True))
    gp = GroupPacker(min_len=100, max_read_len=64, overlap=14,
                     reads_per_batch=32, groups_per_chunk=8,
                     keep_dropped=True)
    ref = list(gp.iter_chunks(iter_barcode_groups(
        iter_read_pairs_interleaved(fq))))
    assert [c.names for c in chunks] == [c.names for c in ref]
    for cn, cr in zip(chunks, ref):
        got = sorted((int(s), int(l), bytes(code[:l].tobytes()))
                     for b in cn.batches
                     for s, l, code in zip(b.seg_ids, b.lengths, b.codes))
        want = sorted((int(s), int(l), bytes(code[:l].tobytes()))
                      for b in cr.batches
                      for s, l, code in zip(b.seg_ids, b.lengths,
                                            b.codes))
        assert got == want


def test_native_extract_reads_equals_python(tmp_path):
    """pgn_extract_reads == the Python port byte-for-byte on interleaved
    AND paired input (incl. stLFR headers, unclustered barcodes, id -1
    skip)."""
    import pangaea_tpu.io.extract_reads as er
    from pangaea_tpu.io.sim import simulate_linked_reads

    for mode in ("interleaved", "paired", "stlfr"):
        d = tmp_path / mode
        d.mkdir()
        kw = dict(n_species=2, genome_len=6_000, n_barcodes=12,
                  pairs_per_barcode=5, read_len=60, seed=3)
        if mode == "paired":
            r1, r2 = str(d / "r1.fq.gz"), str(d / "r2.fq.gz")
            simulate_linked_reads(out_r1=r1, out_r2=r2, **kw)
            inputs = dict(reads1=r1, reads2=r2)
            sim_bcs = None
        else:
            fq = str(d / "r.fq.gz")
            simulate_linked_reads(out_interleaved=fq,
                                  fmt="stlfr" if mode == "stlfr" else "10x",
                                  **kw)
            inputs = dict(interleaved=fq)
        # clusters: 3 bins + an id -1 line + some unclustered barcodes
        import gzip
        src = inputs.get("interleaved") or inputs["reads1"]
        with gzip.open(src, "rt") as f:
            from pangaea_tpu.io.fastq import BarcodeParser
            p = BarcodeParser()
            bcs = []
            for i, line in enumerate(f):
                if i % 4 == 0:
                    _, bc = p.parse(line.rstrip("\n").lstrip("@"))
                    if bc and bc not in bcs:
                        bcs.append(bc)
        tsv = str(d / "clusters.tsv")
        with open(tsv, "w") as f:
            f.write("0\t" + ",".join(bcs[0:4]) + "\n")
            f.write("-1\t" + ",".join(bcs[4:6]) + "\n")
            f.write("7\t" + ",".join(bcs[6:9]) + "\n")
            # duplicate cluster id: both lines' barcodes must land in ONE
            # stream (ADVICE r4: two handles on the same path interleave
            # garbage; both implementations collapse duplicates)
            f.write("7\t" + ",".join(bcs[9:11]) + "\n")
        # native
        ok = er._extract_reads_native(tsv, str(d / "nat"), 
                                      inputs.get("reads1", ""),
                                      inputs.get("reads2", ""),
                                      inputs.get("interleaved", ""))
        assert ok, "native extract unavailable"
        # python fallback (force)
        import unittest.mock as um
        with um.patch.object(er, "_extract_reads_native",
                             return_value=False):
            er.extract_reads(tsv, str(d / "py"), **inputs)
        for cid in ("0", "7"):
            for ext in (".fq", ".barcode"):
                a = (d / f"nat_bin{cid}{ext}").read_bytes()
                b = (d / f"py_bin{cid}{ext}").read_bytes()
                assert a == b, (mode, cid, ext)
            assert (d / f"py_bin{cid}.fq").stat().st_size > 0
