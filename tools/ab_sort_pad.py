#!/usr/bin/env python
"""Does lax.sort cost step at pow2 boundaries, and do batched sorts
keep their win at non-pow2 chunk lengths?

Background: a 2^25-element int32 sort measured 89.9 ms while the
34,603,008-element (2^25 + 1M) restore sort measured ~120 ms — +33% for
+3% elements, suggesting an internal pow2 pad. If so, the 1M-quantum
sortjoin padding (kernels/features.sortjoin_pad_size) is already paying
the 2^26 tier just past the boundary, and the row-grouped restore can
dodge the whole question by sorting row-aligned CHUNKS batched along a
leading dimension (rows never span chunks, so concatenated chunk sorts
are still globally row-grouped).

  PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python \
      tools/ab_sort_pad.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pangaea_tpu.utils import device_sync, enable_compilation_cache

enable_compilation_cache()

REPS = 3


def bench(fn, *args):
    out = fn(*args)
    device_sync(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    device_sync(out)
    return (time.time() - t0) / REPS


@jax.jit
def sort1(x):
    return jax.lax.sort(x)


@jax.jit
def sort2(x):
    return jax.lax.sort(x, dimension=1)


@jax.jit
def sort_kv(k, v):
    return jax.lax.sort((k, v), num_keys=1)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)

    for n in (1 << 25, 34_603_008, 40 << 20, 48 << 20, 1 << 26):
        x = jnp.asarray(rng.randint(0, 1 << 30, n, dtype=np.int64)
                        .astype(np.int32))
        t = bench(sort1, x)
        print(f"single sort n={n:>9}: {t*1e3:8.1f} ms "
              f"({t/n*1e9:.2f} ns/elem)", flush=True)
        del x

    for c, m in ((64, 1 << 19), (64, 540_672), (66, 524_288),
                 (68, 508_870)):
        n = c * m
        x = jnp.asarray(rng.randint(0, 1 << 30, n, dtype=np.int64)
                        .astype(np.int32)).reshape(c, m)
        t = bench(sort2, x)
        print(f"batched {c} x {m:>7}: {t*1e3:8.1f} ms "
              f"({t/n*1e9:.2f} ns/elem)", flush=True)
        del x

    for n in (1 << 25, 34_603_008):
        k = jnp.asarray(rng.randint(0, 1 << 30, n, dtype=np.int64)
                        .astype(np.int32))
        v = jnp.arange(n, dtype=jnp.int32)
        t = bench(sort_kv, k, v)
        print(f"kv sort (honest) n={n:>9}: {t*1e3:8.1f} ms "
              f"({t/n*1e9:.2f} ns/elem)", flush=True)
        del k, v


if __name__ == "__main__":
    main()
