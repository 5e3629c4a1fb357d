#!/usr/bin/env python
"""Check DESIGN.md §3c's scaling cost model against MEASURED routing
stats on the virtual 8-device mesh (VERDICT r2 item 7).

The model's inputs, none previously measured:
  (a) per-device routed a2a volume = RLE pairs x 8 B, bounded by
      capacity_factor * N/n_dev x 8 B and predicted to sit far below it
      (distinct keys per device << N/n_dev for Zipfian multiplicities);
  (b) bucket occupancy: max routed pairs per (src, dest) bucket vs the
      fixed capacity cap = capacity_factor * N/n_dev^2 — slack
      utilization tells whether capacity_factor=2 is justified;
  (c) per-device sort volume = N/n_dev (by construction — verified).

Run on realistic keys (simulated linked reads through the real encode
path) and on adversarial uniform-random keys.

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/validate_scaling_model.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def keys_from_sim(tmp, n_barcodes=400, pairs=40, k=13):
    from pangaea_tpu.io.sim import simulate_linked_reads
    from pangaea_tpu.io.packing import ReadPacker
    from pangaea_tpu.kernels.features import batch_kmer_keys
    fq = os.path.join(tmp, "reads.fq.gz")
    if not os.path.exists(fq):
        simulate_linked_reads(out_interleaved=fq, n_species=6,
                              genome_len=60_000, n_barcodes=n_barcodes,
                              pairs_per_barcode=pairs, seed=5)
    packer = ReadPacker(max_read_len=152, overlap=k - 1,
                        reads_per_batch=8192)

    def seqs():
        from pangaea_tpu.io.fastq import iter_fastq_records
        for rec in iter_fastq_records(fq):
            yield rec.seq, rec.qual

    parts = []
    for b in packer.iter_batches(seqs()):
        parts.append(np.asarray(batch_kmer_keys(
            jnp.asarray(b.codes), jnp.asarray(b.lengths),
            jnp.asarray(b.cont), k=k, overlap=k - 1)))
    return np.concatenate(parts), k


def analyze(name, keys, k, n_dev=8, capacity_factor=2.0):
    from pangaea_tpu.kernels.features import kmer_key_sentinel
    from pangaea_tpu.parallel import data_mesh
    from pangaea_tpu.parallel.dist import make_sharded_sortjoin
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = data_mesh(n_dev)
    n = len(keys) - (len(keys) % n_dev)
    keys = keys[:n]
    bins_fn, row = make_sharded_sortjoin(mesh, k, 10, 400,
                                         capacity_factor=capacity_factor,
                                         with_stats=True)
    keys_d = jax.device_put(jnp.asarray(keys), row)
    bins, overflow, counts = bins_fn(keys_d)
    counts = np.asarray(counts)  # (n_dev src, n_dev dest) routed pairs
    n_local = n // n_dev
    cap = int(capacity_factor * n_local / n_dev)
    valid = keys < kmer_key_sentinel(k)
    distinct_per_dev = []
    for d in range(n_dev):
        sl = keys[d * n_local:(d + 1) * n_local]
        distinct_per_dev.append(len(np.unique(sl[sl[:n_local] <
                                                 kmer_key_sentinel(k)])))
    routed_per_src = counts.sum(axis=1)
    print(f"\n== {name}: N={n} ({int(valid.sum())} valid), n_dev={n_dev}, "
          f"N/dev={n_local}, bucket cap={cap}")
    print(f"  overflow                  : {int(np.asarray(overflow).sum())}")
    print(f"  per-device sort volume    : {n_local} (model: N/n_dev)")
    print(f"  distinct keys/dev (model) : min {min(distinct_per_dev)} "
          f"max {max(distinct_per_dev)}")
    print(f"  routed pairs/src (meas)   : min {routed_per_src.min()} "
          f"max {routed_per_src.max()}")
    print(f"  routed bytes/dev each way : {8 * routed_per_src.max()} "
          f"(bound {8 * n_dev * cap} = cf*N/dev*8B; "
          f"util {routed_per_src.max() / (n_dev * cap):.1%})")
    print(f"  a2a volume vs raw keys    : "
          f"{routed_per_src.max() / n_local:.2f}x N/dev "
          f"(RLE compression {valid.sum() / max(1, counts.sum()):.1f}:1)")
    occ = counts / cap
    print(f"  bucket occupancy          : mean {occ.mean():.1%} "
          f"max {occ.max():.1%} of cap")
    # the §3c claim: routed pairs/src <= distinct keys per source
    assert routed_per_src.max() <= max(distinct_per_dev) + 1
    return {
        "n": n, "n_dev": n_dev, "cap": cap,
        "routed_max": int(routed_per_src.max()),
        "occ_max": float(occ.max()), "occ_mean": float(occ.mean()),
        "distinct_max": max(distinct_per_dev),
    }


def main():
    import tempfile
    tmp = os.environ.get("SCALE_TMP", "/tmp/scaling_model")
    os.makedirs(tmp, exist_ok=True)
    keys, k = keys_from_sim(tmp)
    analyze("simulated linked reads (k=13, Zipfian)", keys, k)
    rng = np.random.default_rng(0)
    n = len(keys)
    from pangaea_tpu.kernels.encode import revcomp_kmers_np
    raw = rng.integers(0, 4 ** k, n, dtype=np.int64).astype(np.uint32)
    uni = np.minimum(raw, revcomp_kmers_np(raw, k)).astype(np.int32)
    analyze("uniform canonical keys (adversarial: no RLE win)", uni, k)


if __name__ == "__main__":
    main()
