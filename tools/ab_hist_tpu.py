#!/usr/bin/env python
"""A/B the group-histogram implementations on real TPU: XLA scatter vs
Pallas VMEM accumulation (run when the chip is available).

    PYTHONPATH=/root/repo:/root/.axon_site timeout 560 python tools/ab_hist_tpu.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from pangaea_tpu.kernels.encode import canonical_rank_lut, \
    num_canonical_kmers
from pangaea_tpu.kernels.features import tnf_histogram
from pangaea_tpu.kernels.pallas_tnf import tnf_histogram_pallas

print("devices:", jax.devices())
R, L, G = 16384, 256, 2048
K = 4
rng = np.random.RandomState(0)
codes = jnp.asarray(rng.randint(0, 4, (R, L)).astype(np.uint8))
lengths = jnp.asarray(np.full(R, 150, np.int32))
seg = jnp.asarray(np.sort(rng.randint(0, G, R)).astype(np.int32))
cont = jnp.asarray(np.zeros(R, np.uint8))
ncols = num_canonical_kmers(K)
lut = jnp.asarray(canonical_rank_lut(K))

# XLA scatter path
h = tnf_histogram(jnp.zeros(G * ncols, jnp.int32), lut, codes, lengths,
                  seg, cont, k=K, num_cols=ncols, overlap=0)
jax.block_until_ready(h)
t0 = time.time()
for _ in range(10):
    h = tnf_histogram(jnp.zeros(G * ncols, jnp.int32), lut, codes, lengths,
                      seg, cont, k=K, num_cols=ncols, overlap=0)
jax.block_until_ready(h)
t_xla = (time.time() - t0) / 10
print(f"XLA scatter:  {t_xla*1000:.2f} ms/batch "
      f"({R/t_xla:,.0f} reads/s)")

# Pallas path
p = tnf_histogram_pallas(codes, lengths, seg, cont, jnp.int32(0), k=K,
                         overlap=0, gspan=G)
jax.block_until_ready(p)
t0 = time.time()
for _ in range(10):
    p = tnf_histogram_pallas(codes, lengths, seg, cont, jnp.int32(0), k=K,
                             overlap=0, gspan=G)
jax.block_until_ready(p)
t_pal = (time.time() - t0) / 10
print(f"Pallas VMEM:  {t_pal*1000:.2f} ms/batch "
      f"({R/t_pal:,.0f} reads/s)  speedup {t_xla/t_pal:.2f}x")

ref = np.asarray(h).reshape(G, ncols)
got = np.asarray(p)[:, :ncols]
np.testing.assert_array_equal(got, ref)
print("parity OK")
