import numpy as np
import pytest

from pangaea_tpu.kernels.encode import (canonical_kmers, canonical_rank_lut,
                                        encode_bases, kmer_window_values,
                                        num_canonical_kmers, revcomp_kmers,
                                        revcomp_kmers_np)
from tests import oracle


def test_encode_bases_mapping():
    codes = encode_bases(b"ACGTNacgtX")
    assert list(codes[:4]) == [0, 1, 3, 2]  # (c>>1)&3: A=0 C=1 G=3 T=2
    assert all(c == 4 for c in codes[4:])


@pytest.mark.parametrize("k", [3, 4, 5, 15])
def test_revcomp_matches_oracle(k):
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 4 ** k, size=200, dtype=np.int64).astype(np.int32)
    got = np.asarray(revcomp_kmers_np(vals, k))
    want = np.array([oracle.revcomp_val(int(v), k) for v in vals], dtype=np.int32)
    np.testing.assert_array_equal(got, want)
    import jax.numpy as jnp
    got_jax = np.asarray(revcomp_kmers(jnp.asarray(vals), k))
    np.testing.assert_array_equal(got_jax, want)


def test_revcomp_involution():
    k = 15
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 4 ** k, size=500).astype(np.int32)
    rc = revcomp_kmers_np(vals, k)
    np.testing.assert_array_equal(revcomp_kmers_np(rc, k), vals)


def test_num_canonical():
    assert num_canonical_kmers(4) == 136  # count_tnf k=4 feature width
    assert num_canonical_kmers(3) == 32   # long-read TNF width
    assert num_canonical_kmers(2) == 10


def test_rank_lut_matches_oracle_order():
    k = 4
    lut = canonical_rank_lut(k)
    order = oracle.canonical_order(k)
    for v in range(4 ** k):
        assert order[lut[v]] == oracle.canon(v, k)


def test_kmer_window_values_small():
    import jax.numpy as jnp
    seq = "ACGTNACGTT"
    k = 3
    codes = np.full((1, 12), 4, dtype=np.uint8)
    enc = encode_bases(seq.encode())
    codes[0, :len(enc)] = enc
    lengths = np.array([len(seq)], dtype=np.int32)
    vals, valid = kmer_window_values(jnp.asarray(codes), jnp.asarray(lengths), k)
    canon = np.asarray(canonical_kmers(vals, k))
    got = [int(c) for c, v in zip(canon[0], np.asarray(valid)[0]) if v]
    want = list(oracle.scan_kmers(seq, k))
    assert got == want


def test_revcomp_pair_k16():
    """k=16 is the kh==0 corner of the split-word path: the general
    formula would shift uint32 by 32 (XLA implementation-defined).
    Compare against the scalar oracle."""
    import jax.numpy as jnp
    from pangaea_tpu.kernels.encode import (canonical_kmers_pair,
                                            revcomp_kmers_pair)
    from tests.oracle import canon, revcomp_val
    rng = np.random.default_rng(8)
    vals = rng.integers(0, 4 ** 16, 512, dtype=np.int64)
    hi = jnp.zeros(512, jnp.uint32)
    lo = jnp.asarray(vals.astype(np.uint32))
    rhi, rlo = revcomp_kmers_pair(hi, lo, 16)
    assert (np.asarray(rhi) == 0).all()
    want = np.array([revcomp_val(int(v), 16) for v in vals], np.int64)
    np.testing.assert_array_equal(np.asarray(rlo).astype(np.int64), want)
    chi, clo = canonical_kmers_pair(hi, lo, 16)
    wantc = np.array([canon(int(v), 16) for v in vals], np.int64)
    assert (np.asarray(chi) == 0).all()
    np.testing.assert_array_equal(np.asarray(clo).astype(np.int64), wantc)
