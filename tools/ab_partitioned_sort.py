#!/usr/bin/env python
"""A/B: one big lax.sort vs batched independent sub-sorts (the upper
bound for ANY bucket-partition sort, Pallas or XLA).

DESIGN.md §10's candidate two-pass bucket-partition sort wins only if
sorting K independent buckets of N/K elements costs meaningfully less
than one N-element sort — the partition pass itself (histogram + block
DMA) can only ADD time on top of (b). If (b) is not far below (a), the
whole approach is dead on this hardware and the negative result gets
recorded. Also A/Bs the uint64 key<<32|payload single-operand packing
against the (key, payload) two-operand sort used by the sort-join's
first phase.

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python \
      tools/ab_partitioned_sort.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pangaea_tpu.utils import device_sync, enable_compilation_cache

enable_compilation_cache()

import os
N = int(os.environ.get("AB_N", 32 * 1024 * 1024))
PARTS = tuple(int(x) for x in os.environ.get("AB_PARTS", "8,16,32,64,128").split(","))
REPS = 3


def bench(fn, *args):
    out = fn(*args)
    device_sync(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    device_sync(out)
    return (time.time() - t0) / REPS


def main():
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    keys = jnp.asarray(rng.randint(0, 4 ** 15, N, dtype=np.int64)
                       .astype(np.int32))
    payload = jnp.asarray(np.arange(N, dtype=np.int32))

    @jax.jit
    def one_sort(k):
        return jax.lax.sort(k)

    @jax.jit
    def one_sort_kv(k, v):
        # return BOTH outputs: returning only [0] lets XLA dead-code the
        # payload operand and silently benches a key-only sort (the r2
        # session's first run of this tool hit exactly that)
        return jax.lax.sort((k, v), num_keys=1)

    @jax.jit
    def one_sort_u32(k):
        return jax.lax.sort(k.astype(jnp.uint32))

    t_one = bench(one_sort, keys)
    print(f"single sort        N={N}: {t_one*1e3:8.1f} ms "
          f"({t_one/N*1e9:.2f} ns/elem)")
    for parts in PARTS:
        k2 = keys.reshape(parts, N // parts)

        @jax.jit
        def part_sort(k):
            return jax.lax.sort(k, dimension=1)

        t = bench(part_sort, k2)
        print(f"batched {parts:3d} x {N//parts//1024}k sorts:   "
              f"{t*1e3:8.1f} ms ({t/N*1e9:.2f} ns/elem, "
              f"{t/t_one:.2f}x of single)")

    for parts in PARTS:
        k2 = keys.reshape(parts, N // parts)
        v2 = payload.reshape(parts, N // parts)

        @jax.jit
        def part_sort_kv(k, v):
            return jax.lax.sort((k, v), dimension=1, num_keys=1)

        t = bench(part_sort_kv, k2, v2)
        print(f"batched kv {parts:3d} x {N//parts//1024}k: "
              f"{t*1e3:8.1f} ms ({t/N*1e9:.2f} ns/elem)")

    t_kv = bench(one_sort_kv, keys, payload)
    print(f"key+payload sort:   {t_kv*1e3:8.1f} ms "
          f"({t_kv/N*1e9:.2f} ns/elem)")
    t_u = bench(one_sort_u32, keys)
    print(f"uint32 single sort: {t_u*1e3:8.1f} ms "
          f"({t_u/N*1e9:.2f} ns/elem, {t_u/t_one:.2f}x of int32)")


if __name__ == "__main__":
    main()
