#!/usr/bin/env python
"""A/B the group-feature implementations on real TPU: XLA scatter-add vs
the scatter-free segsum path (cumsum segment-sum + 128-lane row-gather
table lookups), for both the TNF and the abundance feature.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 900 python tools/ab_hist_tpu.py

Timing uses utils.device_sync (a forced scalar transfer): on the axon
backend jax.block_until_ready is a no-op and would time only dispatch.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from pangaea_tpu.kernels.encode import canonical_rank_lut, \
    num_canonical_kmers
from pangaea_tpu.kernels.features import (abundance_histogram,
                                          abundance_histogram_segsum,
                                          count_kmers_global,
                                          make_global_table, tnf_histogram,
                                          tnf_histogram_segsum)
from pangaea_tpu.utils import device_sync, enable_compilation_cache

enable_compilation_cache()
print("devices:", jax.devices())
R, L, G = 16384, 256, 2048
K, TNFK, WINDOW, VEC = 15, 4, 10, 400
REPS = 10
rng = np.random.RandomState(0)
codes = jnp.asarray(rng.randint(0, 4, (R, L)).astype(np.uint8))
lengths = jnp.asarray(np.full(R, 150, np.int32))
seg = jnp.asarray(np.sort(rng.randint(0, G, R)).astype(np.int32))
cont = jnp.asarray(np.zeros(R, np.uint8))
ncols = num_canonical_kmers(TNFK)
lut = jnp.asarray(canonical_rank_lut(TNFK))


def timed(tag, fn):
    out = fn()
    device_sync(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn()
    device_sync(out)
    dt = (time.time() - t0) / REPS
    print(f"{tag:22s} {dt*1000:8.2f} ms/batch  ({R/dt:10,.0f} reads/s)",
          flush=True)
    return out, dt


# ---- TNF ----
h, t_xla = timed("TNF scatter", lambda: tnf_histogram(
    jnp.zeros(G * ncols, jnp.int32), lut, codes, lengths, seg, cont,
    k=TNFK, num_cols=ncols, overlap=0))
p, t_seg = timed("TNF segsum", lambda: tnf_histogram_segsum(
    jnp.zeros((G, ncols), jnp.int32), codes, lengths, seg, cont,
    k=TNFK, num_cols=ncols, overlap=0, n_groups=G))
print(f"TNF speedup {t_xla/t_seg:.2f}x")
np.testing.assert_array_equal(np.asarray(p),
                              np.asarray(h).reshape(G, ncols))
print("TNF parity OK")

# ---- abundance ----
table = make_global_table(K)
table = count_kmers_global(table, codes, lengths, cont, k=K, overlap=0)
device_sync(table)

h, t_xla = timed("ABD scatter", lambda: abundance_histogram(
    jnp.zeros(G * VEC, jnp.int32), table, codes, lengths, seg, cont,
    k=K, window=WINDOW, vector_size=VEC, overlap=0))
p, t_seg = timed("ABD segsum", lambda: abundance_histogram_segsum(
    jnp.zeros((G, VEC), jnp.int32), table, codes, lengths, seg, cont,
    k=K, window=WINDOW, vector_size=VEC, overlap=0, n_groups=G))
print(f"ABD speedup {t_xla/t_seg:.2f}x")
np.testing.assert_array_equal(np.asarray(p), np.asarray(h).reshape(G, VEC))
print("ABD parity OK")
