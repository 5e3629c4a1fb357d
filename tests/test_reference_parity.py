"""Byte-level parity vs the reference C++ tools (BASELINE.md correctness
bar: identical feature tables and bin assignments).

The reference binaries are built once into /tmp/pangaea_ref_bin from
/root/reference/src/cpptools (zlib-only tools; the htslib BAM tools are
covered by contract tests in test_asm.py instead). Skipped when no
compiler or reference checkout is available.
"""

import gzip
import os
import subprocess

import numpy as np
import pytest

from pangaea_tpu.config import FeatureConfig
from pangaea_tpu.features import FeatureExtractor
from pangaea_tpu.io.sim import simulate_linked_reads

REF = "/root/reference/src/cpptools"
BIN = "/tmp/pangaea_ref_bin"
TOOLS = ["count_kmer", "count_tnf", "extract_reads", "preprocess_stlfr",
         "preprocess_tellseq", "parse_header"]


def build_ref_tools() -> bool:
    if not os.path.isdir(REF):
        return False
    os.makedirs(BIN, exist_ok=True)
    for tool in TOOLS:
        out = os.path.join(BIN, tool)
        if os.path.isfile(out):
            continue
        cmd = ["g++", "-O3", "-std=c++14", f"-I{REF}/lib/cmdline",
               f"-I{REF}/lib/gzstream", f"-I{REF}/lib/ThreadPool",
               f"{REF}/{tool}.cpp", f"{REF}/lib/gzstream/gzstream.C",
               "-lz", "-lpthread", "-o", out]
        r = subprocess.run(cmd, capture_output=True)
        if r.returncode:
            return False
    return True


if not build_ref_tools():
    pytest.skip("reference tools unavailable", allow_module_level=True)

K = 11  # small k keeps the CPU-side 4^k table light; contract is k-independent


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("parity")
    inter = str(d / "reads.fq.gz")
    r1 = str(d / "r1.fq.gz")
    r2 = str(d / "r2.fq.gz")
    res = simulate_linked_reads(out_interleaved=inter, out_r1=r1, out_r2=r2,
                                n_species=3, genome_len=20_000,
                                n_barcodes=100, pairs_per_barcode=25,
                                seed=31)
    return d, inter, r1, r2, res


def parse_csv_gz(path):
    names, rows = [], []
    with gzip.open(path, "rt") as f:
        for line in f:
            parts = line.rstrip("\n").split(",")
            names.append(parts[0])
            rows.append([float(x) for x in parts[1:]])
    return names, np.array(rows)


@pytest.fixture(scope="module")
def ours(data):
    d, inter, _, _, _ = data
    cfg = FeatureConfig(kmer=K, reads_per_batch=4096)
    fe = FeatureExtractor(cfg, str(d / "ours"))
    table = fe.global_kmer_table(interleaved=inter)
    dump = str(d / "ours" / "table.dump")
    fe.export_jellyfish_dump(table, dump)
    names, abd, tnf = fe.group_features(table, interleaved=inter)
    return fe, dump, names, abd, tnf


def test_count_kmer_parity_interleaved(data, ours):
    d, inter, _, _, _ = data
    fe, dump, names, abd, _ = ours
    out = str(d / "ref_kmer.gz")
    subprocess.run([os.path.join(BIN, "count_kmer"), "-i", inter,
                    "-g", dump, "-k", str(K), "-l", "2000", "-w", "10",
                    "-v", "400", "-t", "4", "-o", out],
                   check=True, capture_output=True)
    ref_names, ref_rows = parse_csv_gz(out)
    assert list(names) == ref_names
    np.testing.assert_array_equal(abd.astype(np.float64), ref_rows)


def test_count_tnf_parity_interleaved(data, ours):
    d, inter, _, _, _ = data
    fe, dump, names, _, tnf = ours
    out = str(d / "ref_tnf.gz")
    subprocess.run([os.path.join(BIN, "count_tnf"), "-i", inter,
                    "-k", "4", "-l", "2000", "-t", "4", "-o", out],
                   check=True, capture_output=True)
    ref_names, ref_rows = parse_csv_gz(out)
    assert list(names) == ref_names
    np.testing.assert_array_equal(tnf.astype(np.float64), ref_rows)


def test_count_kmer_parity_paired(data):
    d, _, r1, r2, _ = data
    cfg = FeatureConfig(kmer=K, reads_per_batch=4096, min_qual_char=None)
    fe = FeatureExtractor(cfg, str(d / "ours_paired"))
    table = fe.global_kmer_table(reads1=r1, reads2=r2)
    dump = str(d / "ours_paired" / "table.dump")
    fe.export_jellyfish_dump(table, dump)
    names, abd, tnf = fe.group_features(table, reads1=r1, reads2=r2)
    out = str(d / "ref_kmer_paired.gz")
    subprocess.run([os.path.join(BIN, "count_kmer"), "-1", r1, "-2", r2,
                    "-g", dump, "-k", str(K), "-l", "2000", "-w", "10",
                    "-v", "400", "-t", "4", "-o", out],
                   check=True, capture_output=True)
    ref_names, ref_rows = parse_csv_gz(out)
    assert list(names) == ref_names
    np.testing.assert_array_equal(abd.astype(np.float64), ref_rows)


def test_extract_reads_parity(data, ours):
    d, inter, _, _, _ = data
    fe, dump, names, _, _ = ours
    # clusters.tsv: split kept barcodes into 3 clusters + one -1 line
    bcs = list(names)
    tsv = str(d / "clusters.tsv")
    with open(tsv, "w") as f:
        f.write("0\t" + ",".join(bcs[0::3]) + "\n")
        f.write("-1\t" + ",".join(bcs[1::3][:2]) + "\n")
        f.write("2\t" + ",".join(bcs[2::3]) + "\n")
    ref_prefix = str(d / "refbin")
    subprocess.run([os.path.join(BIN, "extract_reads"), "-i", inter,
                    "-c", tsv, "-o", ref_prefix],
                   check=True, capture_output=True)
    from pangaea_tpu.io.extract_reads import extract_reads
    our_prefix = str(d / "ourbin")
    extract_reads(tsv, our_prefix, interleaved=inter)
    for cid in ("0", "2"):
        for ext in (".fq", ".barcode"):
            ref = open(f"{ref_prefix}_bin{cid}{ext}").read()
            got = open(f"{our_prefix}_bin{cid}{ext}").read()
            assert got == ref, f"bin{cid}{ext} differs"


def test_preprocess_stlfr_parity(data):
    d = data[0]
    r1, r2 = str(d / "s1.fq"), str(d / "s2.fq")
    with open(r1, "w") as f1, open(r2, "w") as f2:
        for i, bc in enumerate(["12_34_56", "0_1_2", "1_0_2", "1_2_0",
                                "5_6_7"]):
            f1.write(f"@rd{i}#{bc}/1\nACGT\n+\nIIII\n")
            f2.write(f"@rd{i}#{bc}/2\nTTTT\n+\nIIII\n")
    subprocess.run([os.path.join(BIN, "preprocess_stlfr"), "-1", r1,
                    "-2", r2, "-n", "-l", "-o", str(d / "refpp")],
                   check=True, capture_output=True)
    from pangaea_tpu.io.preprocess import preprocess_stlfr
    preprocess_stlfr(r1, r2, str(d / "ourpp"), numeric=True, library=True)
    for suffix in ("_1.fq", "_2.fq"):
        ref = open(str(d / f"refpp{suffix}")).read()
        got = open(str(d / f"ourpp{suffix}")).read()
        assert got == ref, f"{suffix} differs"


def test_preprocess_tellseq_parity(data):
    d = data[0]
    r1, r2 = str(d / "t1.fq"), str(d / "t2.fq")
    idx = str(d / "tidx.fq")
    with open(r1, "w") as f1, open(r2, "w") as f2, open(idx, "w") as fi:
        for i, bc in enumerate(["A" * 18, "C" * 10, "G" * 18]):
            f1.write(f"@td{i} 1:N:0\nACGT\n+\nIIII\n")
            f2.write(f"@td{i} 2:N:0\nTTTT\n+\nIIII\n")
            fi.write(f"@td{i}\n{bc}\n+\n{'I' * len(bc)}\n")
    subprocess.run([os.path.join(BIN, "preprocess_tellseq"), "-1", r1,
                    "-2", r2, "-l", idx, "-o", str(d / "refts")],
                   check=True, capture_output=True)
    from pangaea_tpu.io.preprocess import preprocess_tellseq
    preprocess_tellseq(r1, r2, idx, str(d / "ourts"))
    for suffix in ("_1.fq", "_2.fq", ".wl"):
        ref = open(str(d / f"refts{suffix}")).read()
        got = open(str(d / f"ourts{suffix}")).read()
        assert got == ref, f"{suffix} differs"


def test_parse_header_parity(data):
    d = data[0]
    fa = str(d / "x.fa")
    with open(fa, "w") as f:
        f.write(">a desc\nACGT\nGGGG\n>b\nTTTT\n")
    ref = subprocess.run([os.path.join(BIN, "parse_header"), fa, "contig_"],
                         check=True, capture_output=True,
                         text=True).stdout
    from pangaea_tpu.asm.fasta import rename_contigs
    out = str(d / "x.renamed.fa")
    rename_contigs(fa, out)
    assert open(out).read() == ref


def test_count_kmer_parity_k21(data):
    """k=21 (> int32 range) byte-parity: the split-word sort-join path vs
    the reference's uint64 count_kmer (count_kmer.cpp:79-86) fed a dump
    built from a brute-force string-level global counter."""
    from collections import Counter

    from pangaea_tpu.io.grouping import iter_read_pairs_interleaved

    d, inter, _, _, _ = data
    k = 21
    comp = str.maketrans("ACGT", "TGCA")
    table = Counter()
    for p in iter_read_pairs_interleaved(inter):
        for s in (p.seq1, p.seq2):
            for i in range(len(s) - k + 1):
                w = s[i:i + k]
                if all(ch in "ACGT" for ch in w):
                    table[min(w, w.translate(comp)[::-1])] += 1
    dump = str(d / "k21.dump")
    with open(dump, "w") as f:
        for w, c in table.items():
            f.write(f"{w}\t{c}\n")

    cfg = FeatureConfig(kmer=k, reads_per_batch=4096)
    fe = FeatureExtractor(cfg, str(d / "ours_k21"))
    names, abd, _ = fe.extract_features(interleaved=inter)

    out = str(d / "ref_kmer_k21.gz")
    subprocess.run([os.path.join(BIN, "count_kmer"), "-i", inter,
                    "-g", dump, "-k", str(k), "-l", "2000", "-w", "10",
                    "-v", "400", "-t", "4", "-o", out],
                   check=True, capture_output=True)
    ref_names, ref_rows = parse_csv_gz(out)
    assert list(names) == ref_names
    np.testing.assert_array_equal(abd.astype(np.float64), ref_rows)


def test_feature_parity_realistic_reads(tmp_path):
    """Byte-parity survives REALISTIC reads (VERDICT r4 item 4): indels,
    read-length variation, uncorrected barcode errors, substitution
    errors + heterogeneous quality — the same files feed the reference
    binaries and both of our paths (table AND default sort-join)."""
    inter = str(tmp_path / "real.fq.gz")
    simulate_linked_reads(out_interleaved=inter, n_species=3,
                          genome_len=20_000, n_barcodes=80,
                          pairs_per_barcode=25, read_len=100,
                          error_rate=0.01, low_qual_rate=0.1,
                          indel_rate=0.01, read_len_sd=12.0,
                          barcode_error_rate=0.05, seed=77)
    cfg = FeatureConfig(kmer=K, reads_per_batch=4096, hist_impl="scatter")
    fe = FeatureExtractor(cfg, str(tmp_path / "ours"))
    table = fe.global_kmer_table(interleaved=inter)
    dump = str(tmp_path / "ours" / "table.dump")
    fe.export_jellyfish_dump(table, dump)
    names, abd, tnf = fe.group_features(table, interleaved=inter)
    # reference binaries on the same realistic file
    out_k = str(tmp_path / "ref_kmer.gz")
    subprocess.run([os.path.join(BIN, "count_kmer"), "-i", inter,
                    "-g", dump, "-k", str(K), "-l", "2000", "-w", "10",
                    "-v", "400", "-t", "4", "-o", out_k],
                   check=True, capture_output=True)
    ref_names, ref_rows = parse_csv_gz(out_k)
    assert list(names) == ref_names
    np.testing.assert_array_equal(abd.astype(np.float64), ref_rows)
    out_t = str(tmp_path / "ref_tnf.gz")
    subprocess.run([os.path.join(BIN, "count_tnf"), "-i", inter,
                    "-k", "4", "-l", "2000", "-t", "4", "-o", out_t],
                   check=True, capture_output=True)
    ref_names, ref_rows = parse_csv_gz(out_t)
    assert list(names) == ref_names
    np.testing.assert_array_equal(tnf.astype(np.float64), ref_rows)
    # our default (sort-join) path agrees with the table path on the
    # same realistic input
    fe2 = FeatureExtractor(FeatureConfig(kmer=K, reads_per_batch=4096,
                                         hist_impl="sortjoin",
                                         min_qual_char=None),
                           str(tmp_path / "ours_sj"))
    n2, a2, t2 = fe2.extract_features(interleaved=inter)
    np.testing.assert_array_equal(np.asarray(names), n2)
    np.testing.assert_array_equal(abd, a2)
    np.testing.assert_array_equal(tnf, t2)


def test_preprocess_stlfr_whitelist_parity(tmp_path):
    """Whitelist-translation byte-parity on RAW stLFR reads with
    realistic collisions, 0_0_0 unassigned pairs and index errors
    (preprocess_stlfr.cpp:76-103; the r1-r4 parity case covered numeric
    mode only)."""
    from pangaea_tpu.io.preprocess import load_whitelist, preprocess_stlfr
    from pangaea_tpu.io.sim import simulate_stlfr_raw
    r1 = str(tmp_path / "raw_1.fq")
    r2 = str(tmp_path / "raw_2.fq")
    wl_path = str(tmp_path / "whitelist.tsv")
    res = simulate_stlfr_raw(r1, r2, wl_path, n_partitions=120,
                             pairs_per_partition=4, n_wl=16,
                             unassigned_frac=0.05, index_error_rate=0.1,
                             error_rate=0.01, seed=9)
    # with only 16 whitelist entries and 120 partitions, triple
    # collisions are certain — the realistic merge case
    assert len(res.virtual_species) < len(res.partitions)
    assert res.n_unassigned > 0 and res.n_index_errors > 0
    subprocess.run([os.path.join(BIN, "preprocess_stlfr"), "-1", r1,
                    "-2", r2, "-w", wl_path, "-l",
                    "-o", str(tmp_path / "refwl")],
                   check=True, capture_output=True)
    preprocess_stlfr(r1, r2, str(tmp_path / "ourwl"), numeric=False,
                     library=True, whitelist=load_whitelist(wl_path))
    for suffix in ("_1.fq", "_2.fq"):
        ref = open(str(tmp_path / f"refwl{suffix}")).read()
        got = open(str(tmp_path / f"ourwl{suffix}")).read()
        assert got == ref, f"{suffix} differs"
