"""Multi-device / multi-host layer (greenfield — SURVEY.md §2.5).

The reference is single-node CPU (ThreadPool/OpenMP/bash jobs); its
honest TPU-native equivalent is barcode-batch data parallelism over a
('data',) mesh axis with XLA collectives, plus jax.distributed for
multi-host."""

from pangaea_tpu.parallel.mesh import (data_mesh, data_sharding,
                                       replicated_sharding,
                                       initialize_distributed)
from pangaea_tpu.parallel.dist import (ShardedFeatureExtractor,
                                       make_sharded_kmer_counter,
                                       make_sharded_sortjoin,
                                       make_sharded_sortjoin_pair,
                                       sharded_train_block, sharded_unit_chunk,
                                       sharded_lloyd)

__all__ = ["data_mesh", "data_sharding", "replicated_sharding",
           "initialize_distributed", "ShardedFeatureExtractor",
           "make_sharded_kmer_counter", "make_sharded_sortjoin",
           "make_sharded_sortjoin_pair",
           "sharded_train_block",
           "sharded_unit_chunk",
           "sharded_lloyd"]
