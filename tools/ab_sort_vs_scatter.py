#!/usr/bin/env python
"""A/B on real TPU: global k-mer counting via dense-table scatter-add
(current path) vs one whole-dataset sort + run-length counting.

The scatter path costs ~15 ns/update serialized (DESIGN.md §2). A sort
path would replace the 4 GiB table entirely: sort all canonical k-mers
once, derive each instance's global count from its run length, and
histogram by (seg, count//window) with the segsum kernels. This measures
the sort leg only — jnp.sort of N int32x2 (lo/hi split of the 30-bit
canonical value is not needed: k=15 fits int32? 4^15=2^30 fits int32) —
vs N scatter updates, at N = 4M (one batch) and 32M (bench dataset).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 900 python tools/ab_sort_vs_scatter.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from pangaea_tpu.utils import device_sync


def timeit(fn, *args):
    out = fn(*args)
    device_sync(out)
    t0 = time.time()
    out = fn(*args)
    device_sync(out)
    return time.time() - t0


def main():
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    for n in (1 << 22, 1 << 25):
        keys = jnp.asarray(rng.randint(0, 1 << 30, n, dtype=np.int32))

        @jax.jit
        def sort_count(k):
            s = jnp.sort(k)
            # run starts -> per-instance count via boundary searchsorted
            starts = jnp.concatenate(
                [jnp.ones(1, bool), s[1:] != s[:-1]])
            run_id = jnp.cumsum(starts) - 1
            # count per run = diff of start positions
            pos = jnp.arange(s.shape[0], dtype=jnp.int32)
            start_pos = jnp.where(starts, pos, 0)
            seg_start = jax.lax.cummax(start_pos)
            # end = next start; compute via reverse cummin of positions
            nxt = jnp.where(starts, pos, s.shape[0])
            seg_end = jax.lax.cummin(nxt[::-1])[::-1]
            # shift: end of run i = start of run i+1
            seg_end = jnp.concatenate(
                [seg_end[1:], jnp.full(1, s.shape[0], jnp.int32)])
            seg_end = jax.lax.cummax(jnp.where(starts, 0, 0) + seg_end)
            return run_id, seg_start

        @jax.jit
        def sort_only(k):
            return jnp.sort(k)

        @jax.jit
        def argsort_only(k):
            return jnp.argsort(k)

        @jax.jit
        def sort_pair(k):
            # sort with payload (needed to route counts back to (seg,window))
            payload = jnp.arange(k.shape[0], dtype=jnp.int32)
            return jax.lax.sort((k, payload), num_keys=1)

        table = jnp.zeros(1 << 30, jnp.int32)

        @jax.jit
        def scatter_add(t, k):
            return t.at[k].add(1, mode="drop")

        t_sort = timeit(sort_only, keys)
        t_pair = timeit(sort_pair, keys)
        t_scat = timeit(scatter_add, table, keys)
        print(f"n={n>>20}M  sort={t_sort*1e3:.1f}ms  sort+payload="
              f"{t_pair*1e3:.1f}ms  scatter={t_scat*1e3:.1f}ms  "
              f"({t_scat/max(t_pair,1e-9):.2f}x)")


if __name__ == "__main__":
    main()
