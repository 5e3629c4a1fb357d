"""Scatter-free (segsum) feature kernels == scatter kernels, exactly.

The segsum path (kernels/features.py: cumsum segment-sum over the
barcode-sorted rows + 128-lane row-gather table lookups) is the TPU fast
path; the scatter path is the CPU implementation and small-shape
reference. They must agree bit-for-bit on every geometry quirk: -1
padding tails, groups spanning batches, continuation rows, dropped
groups, and partial final chunks.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pangaea_tpu.config import FeatureConfig
from pangaea_tpu.features import FeatureExtractor
from pangaea_tpu.io.grouping import ReadPair, iter_barcode_groups
from pangaea_tpu.io.packing import GroupPacker
from pangaea_tpu.kernels.encode import canonical_rank_lut, num_canonical_kmers
from pangaea_tpu.kernels.features import (abundance_histogram,
                                          abundance_histogram_segsum,
                                          count_kmers_global,
                                          lookup_table_rows,
                                          make_global_table, tnf_histogram,
                                          tnf_histogram_segsum,
                                          use_segsum_impl)


def _rand_pairs(rng, n_barcodes=10, pairs_per_bc=5, read_len=40):
    pairs = []
    for b in range(n_barcodes):
        bc = f"BC{b:04d}"
        for p in range(rng.integers(1, pairs_per_bc + 1)):
            def seq():
                s = "".join("ACGT"[c] for c in rng.integers(0, 4, read_len))
                if rng.random() < 0.3:
                    i = int(rng.integers(0, read_len))
                    s = s[:i] + "N" + s[i + 1:]
                return s
            pairs.append(ReadPair(f"r{b}_{p}", bc, seq(), seq()))
    return pairs


@pytest.mark.parametrize("seed", [0, 1])
def test_segsum_matches_scatter(seed):
    k, tnf_k, window, vec, min_len = 7, 4, 2, 50, 60
    rng = np.random.default_rng(seed)
    pairs = _rand_pairs(rng)
    table = make_global_table(k)
    gp = GroupPacker(min_len=min_len, max_read_len=48, overlap=k - 1,
                     reads_per_batch=16, groups_per_chunk=4)
    chunks = list(gp.iter_chunks(iter_barcode_groups(iter(pairs))))
    # build the global table from the same batches
    for chunk in chunks:
        for b in chunk.batches:
            table = count_kmers_global(
                table, jnp.asarray(b.codes), jnp.asarray(b.lengths),
                jnp.asarray(b.cont), k=k, overlap=k - 1)
    lut = jnp.asarray(canonical_rank_lut(tnf_k))
    ncols = num_canonical_kmers(tnf_k)
    G = gp.groups_per_chunk
    for chunk in chunks:
        a1 = jnp.zeros(G * vec, jnp.int32)
        t1 = jnp.zeros(G * ncols, jnp.int32)
        a2 = jnp.zeros((G, vec), jnp.int32)
        t2 = jnp.zeros((G, ncols), jnp.int32)
        for b in chunk.batches:
            args = (jnp.asarray(b.codes), jnp.asarray(b.lengths),
                    jnp.asarray(b.seg_ids), jnp.asarray(b.cont))
            a1 = abundance_histogram(a1, table, *args, k=k, window=window,
                                     vector_size=vec, overlap=k - 1)
            t1 = tnf_histogram(t1, lut, *args, k=tnf_k, num_cols=ncols,
                               overlap=k - 1)
            a2 = abundance_histogram_segsum(
                a2, table, *args, k=k, window=window, vector_size=vec,
                overlap=k - 1, n_groups=G)
            t2 = tnf_histogram_segsum(t2, *args, k=tnf_k, num_cols=ncols,
                                      overlap=k - 1, n_groups=G)
        np.testing.assert_array_equal(np.asarray(a1).reshape(G, vec),
                                      np.asarray(a2))
        np.testing.assert_array_equal(np.asarray(t1).reshape(G, ncols),
                                      np.asarray(t2))


def test_lookup_table_rows_divisible_and_not():
    rng = np.random.default_rng(0)
    # 128-divisible table -> row-gather path
    table = jnp.asarray(rng.integers(0, 1000, 4 ** 4).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, 4 ** 4, (7, 13)).astype(np.int32))
    valid = jnp.asarray(rng.random((7, 13)) < 0.8)
    got = lookup_table_rows(table, idx, valid)
    want = np.where(np.asarray(valid), np.asarray(table)[np.asarray(idx)], 0)
    np.testing.assert_array_equal(np.asarray(got), want)
    # non-divisible table -> scalar-gather fallback
    table = jnp.asarray(rng.integers(0, 1000, 4 ** 3).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, 4 ** 3, 33).astype(np.int32))
    valid = jnp.asarray(rng.random(33) < 0.8)
    got = lookup_table_rows(table, idx, valid)
    want = np.where(np.asarray(valid), np.asarray(table)[np.asarray(idx)], 0)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_lookup_table_rows_chunked(monkeypatch):
    import pangaea_tpu.kernels.features as F
    monkeypatch.setattr(F, "_LOOKUP_CHUNK", 64)
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.integers(0, 99, 4 ** 4).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, 4 ** 4, (10, 17)).astype(np.int32))
    valid = jnp.asarray(rng.random((10, 17)) < 0.7)
    got = F.lookup_table_rows(table, idx, valid)  # 170 > 64 -> lax.map path
    want = np.where(np.asarray(valid), np.asarray(table)[np.asarray(idx)], 0)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_use_segsum_impl():
    assert use_segsum_impl("segsum") is True
    assert use_segsum_impl("scatter") is False
    # conftest forces the cpu backend -> auto picks scatter there
    assert use_segsum_impl("auto") is False


def test_feature_extractor_impl_equivalence(tmp_path):
    """FeatureExtractor with hist_impl='segsum' == 'scatter' end to end."""
    from pangaea_tpu.io.sim import simulate_linked_reads
    fq = str(tmp_path / "sim.fq.gz")
    simulate_linked_reads(
        out_interleaved=fq, n_species=2, genome_len=5_000, n_barcodes=12,
        pairs_per_barcode=6, read_len=40, seed=3)
    outs = {}
    for impl in ("scatter", "segsum"):
        cfg = FeatureConfig(kmer=9, tnf_kmer=4, min_length=100,
                            max_read_len=64, reads_per_batch=32,
                            hist_impl=impl, min_qual_char=None)
        fe = FeatureExtractor(cfg, str(tmp_path / impl))
        outs[impl] = fe.extract_features(interleaved=fq)
    n_sc, a_sc, t_sc = outs["scatter"]
    n_ss, a_ss, t_ss = outs["segsum"]
    np.testing.assert_array_equal(n_sc, n_ss)
    np.testing.assert_array_equal(a_sc, a_ss)
    np.testing.assert_array_equal(t_sc, t_ss)
