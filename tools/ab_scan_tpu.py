#!/usr/bin/env python
"""A/B the Pallas 1-D scan kernel vs XLA's cumulative ops on hardware,
plus a correctness check at an awkward length.

  PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python \
      tools/ab_scan_tpu.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pangaea_tpu.kernels.scan import _scan1d_pallas
from pangaea_tpu.utils import device_sync, enable_compilation_cache

enable_compilation_cache()

N = int(os.environ.get("AB_N", 34603008))
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
    print("backend:", jax.default_backend(), "N:", N, flush=True)
    rng = np.random.RandomState(0)
    x_small = rng.randint(-2 ** 30, 2 ** 30, 1_000_001,
                          dtype=np.int64).astype(np.int32)
    got = np.asarray(_scan1d_pallas(jnp.asarray(x_small), "max"))
    np.testing.assert_array_equal(got, np.maximum.accumulate(x_small))
    print("correctness @1M+1 cummax: OK", flush=True)

    x = jnp.asarray(rng.randint(-2 ** 30, 2 ** 30, N, dtype=np.int64)
                    .astype(np.int32))

    @jax.jit
    def xla_cummax(v):
        return jax.lax.cummax(v)

    @jax.jit
    def pl_cummax(v):
        return _scan1d_pallas(v, "max")

    @jax.jit
    def xla_cumsum(v):
        return jax.lax.cumsum(v)

    @jax.jit
    def pl_cumsum(v):
        return _scan1d_pallas(v, "sum")

    t = bench(xla_cummax, x)
    print(f"xla cummax:    {t*1e3:8.1f} ms ({t/N*1e9:.3f} ns/elem)")
    t = bench(pl_cummax, x)
    print(f"pallas cummax: {t*1e3:8.1f} ms ({t/N*1e9:.3f} ns/elem)")
    t = bench(xla_cumsum, x)
    print(f"xla cumsum:    {t*1e3:8.1f} ms ({t/N*1e9:.3f} ns/elem)")
    t = bench(pl_cumsum, x)
    print(f"pallas cumsum: {t*1e3:8.1f} ms ({t/N*1e9:.3f} ns/elem)")


if __name__ == "__main__":
    main()
