#!/usr/bin/env python
"""Micro-profile of sortjoin_bins_rowgrouped internals at the headline
shape: sort1 (keys,rowidx), the boundary fills (cummax/cummin + bin
compute), and the packed restore sort — each synced separately.

profile_sortjoin.py puts the whole fused phase at ~318-323 ms while a
raw 33.5M key+payload sort costs ~90 ms (tools/ab_partitioned_sort.py),
leaving ~140 ms unattributed between the two scans and the where/compare
chain. This pins where it actually goes before any optimization.

  PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python \
      tools/ab_sortjoin_phases.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pangaea_tpu.kernels.features import (kmer_key_sentinel,
                                          sortjoin_bins_rowgrouped)
from pangaea_tpu.utils import device_sync, enable_compilation_cache

enable_compilation_cache()

K = 15
N = int(os.environ.get("AB_N", 34603008))  # headline padded shape
ROW_WINDOWS = 138
REPS = 3


def bench(fn, *args):
    out = fn(*args)
    device_sync(*out) if isinstance(out, tuple) else device_sync(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    device_sync(*out) if isinstance(out, tuple) else device_sync(out)
    return (time.time() - t0) / REPS


def main():
    print("backend:", jax.default_backend(), "N:", N, flush=True)
    rng = np.random.RandomState(0)
    # zipf-ish key multiplicities like real k-mer streams
    keys = jnp.asarray(rng.randint(0, 4 ** K, N, dtype=np.int64)
                       .astype(np.int32))

    @jax.jit
    def sort1(k):
        rowidx = jnp.arange(N, dtype=jnp.int32) // jnp.int32(ROW_WINDOWS)
        return jax.lax.sort((k, rowidx), num_keys=1)

    @jax.jit
    def fills(sk, srow):
        pos = jnp.arange(N, dtype=jnp.int32)
        start = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
        end = jnp.concatenate([start[1:], jnp.ones(1, bool)])
        run_start = jax.lax.cummax(jnp.where(start, pos, 0))
        run_end = jax.lax.cummin(jnp.where(end, pos, N), reverse=True)
        count = run_end - run_start + 1
        bins = count // jnp.int32(10)
        ok = (sk < kmer_key_sentinel(K)) & (bins < 400)
        return jnp.where(ok, bins, -1), srow

    @jax.jit
    def restore(binv, srow):
        from pangaea_tpu.kernels.features import _rowgrouped_restore
        return _rowgrouped_restore(srow, binv)

    @jax.jit
    def fused(k):
        return sortjoin_bins_rowgrouped(k, k=K, window=10, vector_size=400,
                                        row_windows=ROW_WINDOWS)

    sk, srow = sort1(keys)
    device_sync(sk, srow)
    binv, _ = fills(sk, srow)
    device_sync(binv)

    t_s1 = bench(sort1, keys)
    t_fl = bench(fills, sk, srow)
    t_rs = bench(restore, binv, srow)
    t_fu = bench(fused, keys)
    print(f"sort1 (key,row):  {t_s1*1e3:8.1f} ms")
    print(f"fills (2 scans):  {t_fl*1e3:8.1f} ms")
    print(f"restore (packed): {t_rs*1e3:8.1f} ms")
    print(f"sum:              {(t_s1+t_fl+t_rs)*1e3:8.1f} ms")
    print(f"fused rowgrouped: {t_fu*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
