"""Pallas segmented histogram parity vs numpy (interpret mode) and vs the
full abundance pipeline composition."""

import numpy as np

import jax.numpy as jnp

from pangaea_tpu.kernels.encode import canonical_kmers, kmer_window_values
from pangaea_tpu.kernels.features import abundance_histogram
from pangaea_tpu.kernels.pallas_hist import segmented_histogram_pallas


def test_segmented_histogram_matches_numpy():
    rng = np.random.RandomState(0)
    R, W, n_bins, G = 32, 50, 400, 6
    bins = rng.randint(0, n_bins, (R, W)).astype(np.int32)
    valid = rng.rand(R, W) < 0.8
    seg = np.sort(rng.randint(0, G, R)).astype(np.int32)
    seg[0] = -1
    ref = np.zeros((G, n_bins), np.int64)
    for r in range(R):
        if seg[r] < 0:
            continue
        for w in range(W):
            if valid[r, w]:
                ref[seg[r], bins[r, w]] += 1
    got = segmented_histogram_pallas(jnp.asarray(bins), jnp.asarray(valid),
                                     jnp.asarray(seg), jnp.int32(0),
                                     n_bins=n_bins, gspan=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got)[:G, :n_bins], ref)


def test_composed_abundance_matches_xla_path():
    """XLA gather + Pallas histogram == the XLA scatter path."""
    rng = np.random.RandomState(1)
    k, window, vec, G = 7, 10, 400, 4
    R, L = 16, 64
    codes = rng.randint(0, 4, (R, L)).astype(np.uint8)
    lengths = np.full(R, L, np.int32)
    seg = np.sort(rng.randint(0, G, R)).astype(np.int32)
    cont = np.zeros(R, np.uint8)
    table = jnp.asarray(rng.randint(0, 5000, 4 ** k).astype(np.int32))

    ref = abundance_histogram(jnp.zeros(G * vec, jnp.int32), table,
                              jnp.asarray(codes), jnp.asarray(lengths),
                              jnp.asarray(seg), jnp.asarray(cont),
                              k=k, window=window, vector_size=vec,
                              overlap=k - 1)
    ref = np.asarray(ref).reshape(G, vec)

    vals, valid = kmer_window_values(jnp.asarray(codes),
                                     jnp.asarray(lengths), k)
    canon = canonical_kmers(vals, k)
    cnt = table[jnp.where(valid, canon, 0)]
    bins = cnt // window
    keep = valid & (cnt > 0) & (bins < vec)
    got = segmented_histogram_pallas(bins.astype(jnp.int32), keep,
                                     jnp.asarray(seg), jnp.int32(0),
                                     n_bins=vec, gspan=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got)[:G, :vec], ref)
