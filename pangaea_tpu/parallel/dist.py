"""Data-parallel versions of the three hot paths.

Replaces, at mesh scale, the reference's intra-node parallelism
(ThreadPool over barcodes in count_kmer.cpp:136,216; OpenMP over BAM
batches; the neutered nn.DataParallel at VAENET.py:28-29):

1. feature extraction — read-batch rows shard over ('data',); the global
   k-mer table and per-group histograms are computed per shard and merged
   by XLA-inserted collectives (scatter-add onto a replicated accumulator
   => all-reduce), exactly the psum-merge of SURVEY.md §2.5.
2. VAE training — the per-batch gather output shards over the batch dim;
   batch-norm moments and loss means become cross-shard psums inserted by
   GSPMD; gradients all-reduce onto replicated params.
3. final k-means — X rows shard; the (N, k) assignment matmul is local,
   the segment-sum cluster stats all-reduce.

All three are plain jit-with-shardings (GSPMD) rather than shard_map:
every cross-shard dependency here is a reduction XLA already places
optimally, and the same code runs on a 1-device mesh unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pangaea_tpu.config import FeatureConfig
from pangaea_tpu.features import FeatureExtractor
from pangaea_tpu.kernels.features import (abundance_histogram,
                                          count_kmers_global, tnf_histogram)


class ShardedFeatureExtractor(FeatureExtractor):
    """FeatureExtractor whose device batches shard rows over the mesh."""

    def __init__(self, cfg: FeatureConfig, feature_dir: str, mesh: Mesh):
        super().__init__(cfg, feature_dir)
        self.mesh = mesh
        n = mesh.devices.size
        # rows per batch must divide evenly across shards
        if cfg.reads_per_batch % n:
            cfg.reads_per_batch += n - cfg.reads_per_batch % n
        self._row_sharding = NamedSharding(mesh, P("data"))
        self._mat_sharding = NamedSharding(mesh, P("data", None))
        self._repl = NamedSharding(mesh, P())

    def _shard_batch(self, b):
        return (jax.device_put(jnp.asarray(b.codes), self._mat_sharding),
                jax.device_put(jnp.asarray(b.lengths), self._row_sharding),
                jax.device_put(jnp.asarray(b.seg_ids), self._row_sharding),
                jax.device_put(jnp.asarray(b.cont), self._row_sharding))

    def global_kmer_table(self, reads1: str = "", reads2: str = "",
                          interleaved: str = ""):
        from pangaea_tpu.io.packing import ReadPacker
        from pangaea_tpu.kernels.features import make_global_table
        c = self.cfg
        min_qual = c.min_qual_char if (reads1 and reads2) else None
        packer = ReadPacker(max_read_len=c.max_read_len, overlap=c.kmer - 1,
                            reads_per_batch=c.reads_per_batch,
                            min_qual_char=min_qual)
        table = jax.device_put(make_global_table(c.kmer), self._repl)
        for b in packer.iter_batches(
                self._seq_stream(reads1, reads2, interleaved)):
            codes, lengths, _, cont = self._shard_batch(b)
            table = count_kmers_global(table, codes, lengths, cont,
                                       k=c.kmer, overlap=c.kmer - 1)
        return table


def sharded_train_block(trainer, mesh: Mesh):
    """Rebind a VAETrainer's train block with explicit mesh shardings:
    index/mask batches shard over the batch dim, state is replicated."""
    repl = NamedSharding(mesh, P())
    idx_sh = NamedSharding(mesh, P(None, "data"))
    mask_sh = NamedSharding(mesh, P(None, "data", None))
    return jax.jit(
        trainer._train_block_impl,
        donate_argnums=(0, 1, 2),
        in_shardings=(repl, repl, repl, repl, repl, repl, idx_sh, mask_sh),
        out_shardings=(repl, repl, repl, repl, repl),
    )


def sharded_lloyd(mesh: Mesh, max_iter: int = 300):
    """kmeans Lloyd with X rows sharded over the mesh."""
    from pangaea_tpu.cluster.kmeans import _lloyd
    repl = NamedSharding(mesh, P())
    x_sh = NamedSharding(mesh, P("data", None))
    w_sh = NamedSharding(mesh, P("data"))
    # outputs: centers (k,d) replicated, labels (n,) row-sharded,
    # inertia + n_iter replicated scalars
    return jax.jit(functools.partial(_lloyd.__wrapped__, max_iter=max_iter),
                   in_shardings=(x_sh, w_sh, repl, repl),
                   out_shardings=(repl, w_sh, repl, repl))
