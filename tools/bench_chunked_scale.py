#!/usr/bin/env python
"""Chunked sort-join at 10x the headline dataset on one chip (VERDICT r1
item 4 'Done' bar: >= 2.4M reads, per-window cost within ~1.3x of the
in-cap sort-join).

Measures phase B only (keys -> per-window bins) — phase A/C are
identical per window in both modes. Baseline: the exact single sort at
the 240k-read scale (33.8M windows, fits the cap). Chunked: 345.6M
windows (2.4M-read scale) against a 256M cap => 2 key ranges, via
FeatureExtractor._chunked_sortjoin_bins. Reports the per-window ratio
and the phase split (host partition / H2D+sort+D2H per range / host
unpermute), because on the tunneled dev chip host<->device transfers are
~2 orders slower than PCIe — the projection for co-located hosts uses
the measured device-sort time plus partition only.

  PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 python \
      tools/bench_chunked_scale.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pangaea_tpu.config import FeatureConfig
from pangaea_tpu.features import FeatureExtractor
from pangaea_tpu.kernels.features import sortjoin_bins, sortjoin_pad_size
from pangaea_tpu.utils import device_sync, enable_compilation_cache

enable_compilation_cache()

import os

K, WINDOW, VEC = 15, 10, 400
PER_BATCH = 16384 * 138          # rows x windows/row at 152-wide rows
N1_BATCHES = int(os.environ.get("CS_N1", 15))   # ~33.9M windows (240k reads)
N2_BATCHES = int(os.environ.get("CS_N2", 150))  # ~339M windows (2.4M reads)
# CAP sets the per-range sort size. The default 32M keeps every compiled
# program near the headline 34M shape (tunnel compiles are minutes per
# distinct shape and the axon backend can die mid-compile); the
# production default 256M changes only the range count, not the math.
CAP = int(os.environ.get("CS_CAP", 32 * 1024 * 1024))


def gen_batches(n_batches, seed):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 4 ** K, PER_BATCH, dtype=np.int64)
            .astype(np.int32) for _ in range(n_batches)]


def main():
    print("backend:", jax.default_backend(), jax.devices())
    import pangaea_tpu.features as fmod

    # ---- baseline: one in-cap exact sort at the headline scale
    keys1 = gen_batches(N1_BATCHES, 0)
    total1 = PER_BATCH * N1_BATCHES
    pad1 = sortjoin_pad_size(total1)
    flat = np.full(pad1, 4 ** K, np.int32)
    flat[:total1] = np.concatenate(keys1)
    dkeys = jnp.asarray(flat)
    bins = sortjoin_bins(dkeys, k=K, window=WINDOW, vector_size=VEC)
    device_sync(bins)  # compile
    t0 = time.time()
    bins = sortjoin_bins(dkeys, k=K, window=WINDOW, vector_size=VEC)
    device_sync(bins)
    t1 = time.time() - t0
    print(f"in-cap exact sort: {total1} windows in {t1:.3f}s "
          f"({t1/total1*1e9:.2f} ns/window)")
    del dkeys, bins, flat, keys1

    # ---- chunked at 10x
    keys2 = gen_batches(N2_BATCHES, 1)
    total2 = PER_BATCH * N2_BATCHES
    fe = FeatureExtractor(FeatureConfig(kmer=K, sortjoin_max_windows=CAP),
                          "/tmp/bench_chunked_feat")
    host_parts = [(k,) for k in keys2]
    # phase-split instrumentation: wrap the dispatch to time device work
    t_dev = [0.0]
    orig = fe._sortjoin_bins_dispatch

    def timed_dispatch(keys, row_windows=None, weighted=False):
        t = time.time()
        out = orig(keys, row_windows=row_windows, weighted=weighted)
        out = np.asarray(out)   # sync: includes H2D of this range + D2H
        t_dev[0] += time.time() - t
        return out

    fe._sortjoin_bins_dispatch = timed_dispatch
    # warm the per-range compile at the EXACT padded range shape the
    # chunked join uses (all ranges pad to pad_size(cap); a mismatched
    # warm shape would put a cold tunnel compile inside the timing)
    nparts = -(-total2 // max(1, CAP * 19 // 20))
    warm_n = fe._sortjoin_pad_size(CAP)
    w = jnp.asarray(np.full(warm_n, 4 ** K, np.int32))
    device_sync(sortjoin_bins(w, k=K, window=WINDOW, vector_size=VEC))
    del w

    t0 = time.time()
    bins_all = fe._chunked_sortjoin_bins(host_parts)
    t2 = time.time() - t0
    print(f"chunked ({nparts} ranges): {total2} windows in {t2:.3f}s "
          f"({t2/total2*1e9:.2f} ns/window); device+transfer portion "
          f"{t_dev[0]:.3f}s, host partition/unpermute {t2-t_dev[0]:.3f}s")
    ratio = (t2 / total2) / (t1 / total1)
    print(f"per-window ratio chunked/in-cap: {ratio:.2f}x (target ~<=1.3x "
          "on co-located hosts; tunnel transfers inflate this figure)")
    # sanity: bins are valid and dense
    assert bins_all.shape[0] == total2
    frac = float((bins_all >= 0).mean())
    print(f"valid-bin fraction: {frac:.3f}")


if __name__ == "__main__":
    main()
