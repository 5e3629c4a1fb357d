"""Quality-masked paired-path sort-join (the weighted global join).

The reference's paired (-1/-2) flow quality-masks only the GLOBAL k-mer
count: jellyfish runs with --min-qual-char=? (src/feature.py:76-86) while
count_kmer scans raw bases and looks counts up (count_kmer.cpp:87). The
weighted sort-join (kernels/features.py §quality-masked) reproduces this
with one sort: every window routes its unmasked key with weight 1 iff the
window survives masking; run weight sums == masked jellyfish counts.

Verified here at three levels: kernel vs oracle, extractor sort-join vs
extractor table path (which masks via the packers), and — in
test_reference_parity.py style — byte-parity vs the compiled reference
count_kmer fed a masked jellyfish-format dump.
"""

import gzip
import os
import subprocess

import numpy as np
import pytest

import jax.numpy as jnp

from pangaea_tpu.config import FeatureConfig
from pangaea_tpu.features import FeatureExtractor
from pangaea_tpu.io.sim import simulate_linked_reads
from pangaea_tpu.kernels.features import (batch_kmer_keys_weighted,
                                          kmer_key_sentinel,
                                          sortjoin_bins_weighted,
                                          sortjoin_bins_weighted_rowgrouped)

from tests import oracle


# ---------------------------------------------------------------- kernels


def test_batch_kmer_keys_weighted_oracle():
    k = 5
    rng = np.random.default_rng(0)
    R, L = 8, 24
    codes = rng.integers(0, 4, (R, L)).astype(np.uint8)
    codes[rng.random((R, L)) < 0.05] = 4  # Ns
    lowq = (rng.random((R, L)) < 0.2).astype(np.uint8)
    lengths = rng.integers(k, L + 1, R).astype(np.int32)
    cont = np.zeros(R, np.uint8)
    keys, wts = batch_kmer_keys_weighted(
        jnp.asarray(codes), jnp.asarray(lowq), jnp.asarray(lengths),
        jnp.asarray(cont), k=k, overlap=k - 1)
    keys = np.asarray(keys).reshape(R, L - k + 1)
    wts = np.asarray(wts).reshape(R, L - k + 1)
    sent = kmer_key_sentinel(k)
    for r in range(R):
        for w in range(L - k + 1):
            window = codes[r, w:w + k]
            in_read = w + k <= lengths[r]
            valid = in_read and (window < 4).all()
            if not valid:
                assert keys[r, w] == sent
                assert wts[r, w] == 0
                continue
            v = 0
            for c in window:
                v = (v << 2) | int(c)
            assert keys[r, w] == oracle.canon(v, k)
            expect_w = int(lowq[r, w:w + k].sum() == 0)
            assert wts[r, w] == expect_w, (r, w)


@pytest.mark.parametrize("rowgrouped", [False, True])
def test_weighted_bins_oracle(rowgrouped):
    """Weighted join bins == dict-oracle masked counts."""
    k, window, vec = 6, 3, 7
    rng = np.random.default_rng(1)
    n = 1024
    keys = rng.integers(0, 4 ** k, n).astype(np.int32)
    keys[rng.random(n) < 0.2] = kmer_key_sentinel(k)
    wts = (rng.random(n) < 0.6).astype(np.int32)
    if rowgrouped:
        bins = sortjoin_bins_weighted_rowgrouped(
            jnp.asarray(keys), jnp.asarray(wts), k=k, window=window,
            vector_size=vec, row_windows=64)
        bins = np.sort(np.asarray(bins).reshape(-1, 64), axis=1)
    else:
        bins = np.asarray(sortjoin_bins_weighted(
            jnp.asarray(keys), jnp.asarray(wts), k=k, window=window,
            vector_size=vec))
    table = {}
    for key, w in zip(keys, wts):
        if key < kmer_key_sentinel(k):
            table[int(key)] = table.get(int(key), 0) + int(w)
    expect = np.full(n, -1, np.int32)
    for i, key in enumerate(keys):
        if key >= kmer_key_sentinel(k):
            continue
        cnt = table[int(key)]
        if cnt > 0 and cnt // window < vec:
            expect[i] = cnt // window
    if rowgrouped:
        expect = np.sort(expect.reshape(-1, 64), axis=1)
    np.testing.assert_array_equal(bins, expect)


# ----------------------------------------------------- extractor-level


@pytest.fixture(scope="module")
def paired_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("masked")
    r1, r2 = str(d / "r1.fq.gz"), str(d / "r2.fq.gz")
    simulate_linked_reads(out_r1=r1, out_r2=r2, n_species=3,
                          genome_len=20_000, n_barcodes=80,
                          pairs_per_barcode=20, error_rate=0.005,
                          low_qual_rate=0.15, seed=11)
    return d, r1, r2


K = 11


def _extract(d, r1, r2, impl, tag):
    cfg = FeatureConfig(kmer=K, reads_per_batch=4096, hist_impl=impl,
                        min_qual_char="?")
    fe = FeatureExtractor(cfg, str(d / tag))
    return fe, fe.extract_features(reads1=r1, reads2=r2)


def test_masked_paired_sortjoin_equals_table(paired_data):
    """Weighted sort-join == table path (whose global pass masks codes in
    the packers) on heterogeneous-quality paired reads, bit for bit."""
    d, r1, r2 = paired_data
    fe_s, (n_s, a_s, t_s) = _extract(d, r1, r2, "sortjoin", "sj")
    fe_t, (n_t, a_t, t_t) = _extract(d, r1, r2, "scatter", "tbl")
    assert list(n_s) == list(n_t)
    np.testing.assert_array_equal(a_s, a_t)
    np.testing.assert_array_equal(t_s, t_t)
    # masking must actually matter on this dataset, or the test is void
    cfg = FeatureConfig(kmer=K, reads_per_batch=4096, hist_impl="sortjoin",
                        min_qual_char=None)
    fe_u = FeatureExtractor(cfg, str(d / "unmasked"))
    _, a_u, _ = fe_u.extract_features(reads1=r1, reads2=r2)
    assert (a_u != a_s).any()


def test_mismatched_pairs_count_globally(paired_data, tmp_path):
    """R1/R2 name-mismatched pairs are skipped from grouping
    (count_kmer.cpp:195-197) but still feed the global counts (jellyfish
    reads the raw files) — on both the sort-join and table paths."""
    d, r1, r2 = paired_data
    m1, m2 = str(tmp_path / "m1.fq"), str(tmp_path / "m2.fq")
    with gzip.open(r1, "rt") as fin, open(m1, "w") as fout:
        fout.write(fin.read())
    with gzip.open(r2, "rt") as fin, open(m2, "w") as fout:
        lines = fin.read().splitlines()
        # corrupt the 3rd record's name -> a mismatched pair
        lines[8] = lines[8].split("\t")[0] + "_MISMATCH\tBX:Z:ZZZZ-1"
        fout.write("\n".join(lines) + "\n")
    fe_s, (n_s, a_s, t_s) = _extract(tmp_path, m1, m2, "sortjoin", "sj")
    fe_t, (n_t, a_t, t_t) = _extract(tmp_path, m1, m2, "scatter", "tbl")
    assert list(n_s) == list(n_t)
    np.testing.assert_array_equal(a_s, a_t)
    np.testing.assert_array_equal(t_s, t_t)


def test_native_paired_packer_matches_python(paired_data, tmp_path,
                                             monkeypatch):
    """The native paired group-event stream (lockstep C++ readers, lowq
    plane, mismatched pairs as global-only rows) produces bit-identical
    features to the pure-python packer path — masked sort-join, with a
    mismatched pair planted."""
    import gzip as _gzip
    import pangaea_tpu.features as fmod
    d, r1, r2 = paired_data
    m1, m2 = str(tmp_path / "m1.fq"), str(tmp_path / "m2.fq")
    with _gzip.open(r1, "rt") as fin, open(m1, "w") as fout:
        fout.write(fin.read())
    with _gzip.open(r2, "rt") as fin, open(m2, "w") as fout:
        lines = fin.read().splitlines()
        lines[8] = lines[8].split("\t")[0] + "_X\tBX:Z:ZZZZ-1"
        fout.write("\n".join(lines) + "\n")

    from pangaea_tpu.native import native_available
    if not native_available():
        pytest.skip("native IO unavailable")
    fe_n, (n_n, a_n, t_n) = _extract(tmp_path, m1, m2, "sortjoin", "nat")

    import pangaea_tpu.native as natmod
    monkeypatch.setattr(natmod, "native_available", lambda: False)
    fe_p, (n_p, a_p, t_p) = _extract(tmp_path, m1, m2, "sortjoin", "py")
    assert list(n_n) == list(n_p)
    np.testing.assert_array_equal(a_n, a_p)
    np.testing.assert_array_equal(t_n, t_p)


def test_interleaved_plus_paired_prefers_interleaved(paired_data,
                                                     tmp_path):
    """With BOTH interleaved and -1/-2 given (the config forbids
    neither), the interleaved stream wins and counts UNMASKED
    (src/feature.py:94) — regression: the weighted flag once keyed on
    reads1/reads2 alone, crashing the native path / silently masking
    interleaved counts."""
    import gzip as _gzip
    d, r1, r2 = paired_data
    inter = str(tmp_path / "inter.fq")
    with _gzip.open(r1, "rt") as f1, _gzip.open(r2, "rt") as f2, \
            open(inter, "w") as out:
        l1, l2 = f1.read().splitlines(), f2.read().splitlines()
        for i in range(0, len(l1), 4):
            out.write("\n".join(l1[i:i + 4]) + "\n")
            out.write("\n".join(l2[i:i + 4]) + "\n")
    cfg = FeatureConfig(kmer=K, reads_per_batch=4096,
                        hist_impl="sortjoin", min_qual_char="?")
    fe_both = FeatureExtractor(cfg, str(tmp_path / "both"))
    n_b, a_b, t_b = fe_both.extract_features(reads1=r1, reads2=r2,
                                             interleaved=inter)
    fe_i = FeatureExtractor(cfg, str(tmp_path / "ionly"))
    n_i, a_i, t_i = fe_i.extract_features(interleaved=inter)
    assert list(n_b) == list(n_i)
    np.testing.assert_array_equal(a_b, a_i)
    np.testing.assert_array_equal(t_b, t_i)


# ------------------------------------------- vs the reference binary

from tests.test_reference_parity import BIN, build_ref_tools  # noqa: E402


@pytest.mark.skipif(not build_ref_tools(),
                    reason="reference tools unavailable")
def test_masked_paired_vs_reference_binary(paired_data):
    """Byte-parity: our weighted sort-join vs the compiled reference
    count_kmer (-1/-2) fed a --min-qual-char=? masked jellyfish dump —
    the exact reference paired flow (src/feature.py:76-86)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.refstack import write_jellyfish_dump
    d, r1, r2 = paired_data
    dump = str(d / "masked.dump")
    write_jellyfish_dump([r1, r2], dump, k=K, min_qual_char="?")
    out = str(d / "ref_masked_kmer.gz")
    subprocess.run([os.path.join(BIN, "count_kmer"), "-1", r1, "-2", r2,
                    "-g", dump, "-k", str(K), "-l", "2000", "-w", "10",
                    "-v", "400", "-t", "4", "-o", out],
                   check=True, capture_output=True)
    fe_s, (names, abd, _) = _extract(d, r1, r2, "sortjoin", "sj")
    with gzip.open(out, "rb") as f:
        ref_bytes = f.read()
    with gzip.open(fe_s.abd_gz, "rb") as f:
        our_bytes = f.read()
    assert our_bytes == ref_bytes
