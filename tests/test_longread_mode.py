"""Long-read binning mode: interleaved long reads, tnf_k=3 (the reference's
documented long-read setting, src/pangaea.py:141 'long reads should use 3').

Covers the split-row path (reads >> max_read_len, Python packer) and its
equivalence with the native path at large max_read_len.
"""

import gzip

import numpy as np
import pytest

from pangaea_tpu.config import FeatureConfig
from pangaea_tpu.features import FeatureExtractor
from pangaea_tpu.kernels.encode import num_canonical_kmers


def make_longread_file(path, n_barcodes=12, reads_per_bc=4, read_len=3000,
                       seed=0):
    rng = np.random.RandomState(seed)
    with gzip.open(path, "wt") as f:
        for b in range(n_barcodes):
            bc = f"LBC{b:04d}"
            for r in range(reads_per_bc):
                # interleaved consumption pairs consecutive records
                for mate in range(2):
                    seq = "".join("ACGT"[v] for v in
                                  rng.randint(0, 4, read_len))
                    f.write(f"@lr_{b}_{r}_{mate}\tBX:Z:{bc}-1\n{seq}\n"
                            f"+\n{'I' * read_len}\n")
    return n_barcodes, reads_per_bc * 2, read_len


def test_longread_features_split_path(tmp_path):
    path = str(tmp_path / "long.fq.gz")
    n_bc, reads_per_bc, read_len = make_longread_file(path)
    # small max_read_len forces the overlong-read split path (Python)
    cfg = FeatureConfig(tnf_kmer=3, max_read_len=512, reads_per_batch=256)
    import pangaea_tpu.native as nat
    saved = nat.native_available
    nat.native_available = lambda: False
    try:
        fe = FeatureExtractor(cfg, str(tmp_path / "feat"))
        names, abd, tnf = fe.extract_features(interleaved=path)
    finally:
        nat.native_available = saved
    assert tnf.shape[1] == num_canonical_kmers(3) == 32
    assert abd.shape[1] == 400
    # boundary leak: first pair leaks into the dropped empty group
    expected_groups = n_bc
    assert len(names) == expected_groups
    # every 3-mer window of every read counts exactly once despite splits
    total_expected = (n_bc * reads_per_bc) * (read_len - 3 + 1)
    leak_loss = 2 * (read_len - 3 + 1)  # first pair -> dropped group
    assert tnf.sum() == total_expected - leak_loss


def test_longread_native_matches_python(tmp_path):
    native = pytest.importorskip("pangaea_tpu.native")
    if not native.native_available():
        pytest.skip("native IO unavailable")
    path = str(tmp_path / "long.fq.gz")
    make_longread_file(path, n_barcodes=8, read_len=2000)
    # native path: max_read_len >= read length
    cfg_n = FeatureConfig(tnf_kmer=3, max_read_len=2048,
                          reads_per_batch=128)
    fe_n = FeatureExtractor(cfg_n, str(tmp_path / "fn"))
    out_n = fe_n.extract_features(interleaved=path)
    # python split path at a different geometry
    cfg_p = FeatureConfig(tnf_kmer=3, max_read_len=300, reads_per_batch=64)
    import pangaea_tpu.native as nat
    saved = nat.native_available
    nat.native_available = lambda: False
    try:
        fe_p = FeatureExtractor(cfg_p, str(tmp_path / "fp"))
        out_p = fe_p.extract_features(interleaved=path)
    finally:
        nat.native_available = saved
    assert out_n[0].tolist() == out_p[0].tolist()
    np.testing.assert_array_equal(out_n[1], out_p[1])
    np.testing.assert_array_equal(out_n[2], out_p[2])


def test_overlong_read_error_is_actionable(tmp_path):
    native = pytest.importorskip("pangaea_tpu.native")
    if not native.native_available():
        pytest.skip("native IO unavailable")
    from pangaea_tpu.io.fast_packing import (OverlongReadError,
                                             native_seq_batches)
    path = str(tmp_path / "r.fq")
    with open(path, "w") as f:
        f.write(f"@r\tBX:Z:A-1\n{'A' * 500}\n+\n{'I' * 500}\n")
    with pytest.raises(OverlongReadError):
        list(native_seq_batches([path], 256, 64))
