#!/usr/bin/env python
"""Per-phase timing of the sort-join feature path on the real device.

Breaks bench.py's device_features() into its constituent kernels and
times each with a proper device_sync (block_until_ready is a no-op on
the axon tunnel — CLAUDE.md). Phases:

  keys   batch_kmer_keys per batch (window encode + canonicalize)
  tnf    tnf_histogram_segsum per batch (compare-expand + cumsum)
  sort   sortjoin_bins (key sort + boundary fill + index sort)
  hist   abundance_histogram_from_bins per batch (compare-expand)

NOTE each phase syncs once at its end; per-phase sums can exceed the
fused end-to-end time (bench.py) because the fused run overlaps
dispatch. Use the ratios, not the absolute sum.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax.numpy as jnp
    from bench import build_batches, K, TNFK, WINDOW, VEC, N_BARCODES
    from pangaea_tpu.kernels.encode import num_canonical_kmers
    from bench import ROW_LEN
    from pangaea_tpu.kernels.features import (
        abundance_histogram_from_bins, batch_kmer_keys, kmer_key_sentinel,
        sortjoin_bins, sortjoin_bins_rowgrouped, sortjoin_pad_size,
        tnf_histogram_segsum)
    from pangaea_tpu.utils import device_sync, enable_compilation_cache

    enable_compilation_cache()
    batches, n_reads = build_batches()
    ncols = num_canonical_kmers(TNFK)
    dev = [(jnp.asarray(b.codes), jnp.asarray(b.lengths),
            jnp.asarray(b.seg_ids), jnp.asarray(b.cont)) for b in batches]
    G = N_BARCODES

    def run_keys():
        return [batch_kmer_keys(c, l, ct, k=K, overlap=K - 1)
                for c, l, s, ct in dev]

    def run_tnf():
        th = jnp.zeros((G, ncols), jnp.int32)
        for c, l, s, ct in dev:
            th = tnf_histogram_segsum(th, c, l, s, ct, k=TNFK,
                                      num_cols=ncols, overlap=K - 1,
                                      n_groups=G)
        return th

    def run_sort(keys):
        return sortjoin_bins(keys, k=K, window=WINDOW, vector_size=VEC)

    def run_hist(bins, per_batch, rows):
        import jax
        h = jnp.zeros((G, VEC), jnp.int32)
        off = 0
        for c, l, s, ct in dev:
            bsl = jax.lax.dynamic_slice(bins, (off,), (per_batch,))
            h = abundance_histogram_from_bins(h, bsl.reshape(rows, -1), s,
                                              vector_size=VEC, n_groups=G)
            off += per_batch
        return h

    # --- build the padded key array once (shared by sort runs) ---
    kp = run_keys()
    per_batch = kp[0].shape[0]
    total = sum(p.shape[0] for p in kp)
    npad = sortjoin_pad_size(total)
    parts = kp + ([jnp.full(npad - total, kmer_key_sentinel(K), jnp.int32)]
                  if npad > total else [])
    keys = jnp.concatenate(parts)
    device_sync(keys)

    def timed(name, fn):
        out = fn()           # warmup/compile at exact shapes
        device_sync(out)
        t0 = time.time()
        out = fn()
        device_sync(out)
        dt = time.time() - t0
        print(f"{name:6s} {dt*1e3:8.1f} ms")
        return out, dt

    print(f"n_reads={n_reads} windows={total} padded={npad} "
          f"batches={len(dev)}")
    _, t_k = timed("keys", lambda: jnp.stack(
        [p.sum() for p in run_keys()]))
    _, t_t = timed("tnf", run_tnf)
    _, t_se = timed("sortEX", lambda: run_sort(keys))
    bins, t_s = timed("sortRG", lambda: sortjoin_bins_rowgrouped(
        keys, k=K, window=WINDOW, vector_size=VEC,
        row_windows=ROW_LEN - K + 1))
    rows = dev[0][0].shape[0]
    _, t_h = timed("hist", lambda: run_hist(bins, per_batch, rows))
    tot = t_k + t_t + t_s + t_h
    for n, t in [("keys", t_k), ("tnf", t_t), ("sortRG", t_s),
                 ("hist", t_h)]:
        print(f"{n:6s} {100*t/tot:5.1f}%")


if __name__ == "__main__":
    main()
