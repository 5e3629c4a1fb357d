"""Pallas TNF kernel parity vs the XLA scatter path (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pangaea_tpu.kernels.encode import num_canonical_kmers
from pangaea_tpu.kernels.features import tnf_histogram
from pangaea_tpu.kernels.pallas_tnf import tnf_histogram_pallas
from pangaea_tpu.kernels.encode import canonical_rank_lut


def make_batch(R=32, L=64, n_groups=5, seed=0, with_invalid=True):
    rng = np.random.RandomState(seed)
    codes = rng.randint(0, 4, (R, L)).astype(np.uint8)
    lengths = rng.randint(10, L + 1, R).astype(np.int32)
    if with_invalid:
        # sprinkle Ns and padding
        mask = rng.rand(R, L) < 0.05
        codes[mask] = 4
    # sorted, non-decreasing seg ids with some -1 (dropped) rows
    seg = np.sort(rng.randint(0, n_groups, R)).astype(np.int32)
    seg[rng.choice(R, 3, replace=False)] = -1
    cont = (rng.rand(R) < 0.2).astype(np.uint8)
    return codes, lengths, seg, cont


@pytest.mark.parametrize("k", [3, 4])
def test_pallas_matches_xla(k):
    codes, lengths, seg, cont = make_batch()
    ncols = num_canonical_kmers(k)
    overlap = 14
    lut = jnp.asarray(canonical_rank_lut(k))
    n_groups = 5
    ref = tnf_histogram(jnp.zeros(n_groups * ncols, jnp.int32), lut,
                        jnp.asarray(codes), jnp.asarray(lengths),
                        jnp.asarray(seg), jnp.asarray(cont),
                        k=k, num_cols=ncols, overlap=overlap)
    ref = np.asarray(ref).reshape(n_groups, ncols)
    got = tnf_histogram_pallas(jnp.asarray(codes), jnp.asarray(lengths),
                               jnp.asarray(seg), jnp.asarray(cont),
                               jnp.int32(0), k=k, overlap=overlap,
                               gspan=8, interpret=True)
    got = np.asarray(got)[:n_groups, :ncols]
    np.testing.assert_array_equal(got, ref)


def test_pallas_seg0_offset():
    codes, lengths, seg, cont = make_batch(seed=3)
    seg = np.where(seg >= 0, seg + 100, seg).astype(np.int32)
    k, ncols = 4, num_canonical_kmers(4)
    lut = jnp.asarray(canonical_rank_lut(k))
    ref = tnf_histogram(jnp.zeros(200 * ncols, jnp.int32), lut,
                        jnp.asarray(codes), jnp.asarray(lengths),
                        jnp.asarray(seg), jnp.asarray(cont),
                        k=k, num_cols=ncols, overlap=0)
    ref = np.asarray(ref).reshape(200, ncols)[100:105]
    got = tnf_histogram_pallas(jnp.asarray(codes), jnp.asarray(lengths),
                               jnp.asarray(seg), jnp.asarray(cont),
                               jnp.int32(100), k=k, overlap=0,
                               gspan=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got)[:5, :ncols], ref)
