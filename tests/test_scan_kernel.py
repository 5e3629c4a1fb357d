"""Pallas 1-D scan kernel vs numpy (interpreter mode on CPU).

The kernel's block/carry machinery (lane scan, sublane scan on row
totals, SMEM carry across grid steps) must be bit-equal to a plain
prefix scan for every op and at every awkward length: sub-block, exact
block, multi-block, and non-multiples (padding with the op identity).
"""

import numpy as np
import pytest

from pangaea_tpu.kernels import scan as scan_mod
from pangaea_tpu.kernels.scan import _BLOCK, _scan1d_pallas


LENGTHS = [1, 7, 128, 129, 4096, _BLOCK - 1, _BLOCK, _BLOCK + 1,
           3 * _BLOCK + 12345]


def _np_ref(x, op):
    if op == "max":
        return np.maximum.accumulate(x)
    if op == "min":
        return np.minimum.accumulate(x)
    return np.cumsum(x).astype(np.int32)


@pytest.mark.parametrize("op", ["max", "min", "sum"])
@pytest.mark.parametrize("n", LENGTHS)
def test_pallas_scan_matches_numpy(op, n):
    rng = np.random.RandomState(n * 31 + len(op))
    lo, hi = (-2 ** 30, 2 ** 30) if op != "sum" else (-100, 100)
    x = rng.randint(lo, hi, n, dtype=np.int64).astype(np.int32)
    got = np.asarray(_scan1d_pallas(x, op, interpret=True))
    np.testing.assert_array_equal(got, _np_ref(x, op))


@pytest.mark.parametrize("op", ["max", "min"])
def test_pallas_scan_reverse_composition(op):
    """reverse = flip(forward(flip(x))) — what cummin_reverse does."""
    rng = np.random.RandomState(0)
    x = rng.randint(-2 ** 30, 2 ** 30, 100_000, dtype=np.int64) \
        .astype(np.int32)
    got = np.asarray(np.flip(_scan1d_pallas(np.flip(x).copy(), op,
                                            interpret=True)))
    want = np.flip(_np_ref(np.flip(x), op))
    np.testing.assert_array_equal(got, want)


def test_xla_fallback_paths(monkeypatch):
    """On non-TPU backends the public API must use the XLA scans and
    still match numpy (this is what the whole CPU test suite runs)."""
    monkeypatch.setenv("PANGAEA_SCAN_IMPL", "xla")
    rng = np.random.RandomState(1)
    x = rng.randint(-2 ** 30, 2 ** 30, 50_000, dtype=np.int64) \
        .astype(np.int32)
    np.testing.assert_array_equal(np.asarray(scan_mod.cummax(x)),
                                  np.maximum.accumulate(x))
    np.testing.assert_array_equal(
        np.asarray(scan_mod.cummin_reverse(x)),
        np.flip(np.minimum.accumulate(np.flip(x))))
    s = rng.randint(-100, 100, 50_000, dtype=np.int64).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(scan_mod.cumsum(s)),
                                  np.cumsum(s).astype(np.int32))
