"""Mesh construction + sharding helpers.

One mesh axis ('data') is the right topology for this workload: the model
is ~1M params (no TP/PP — SURVEY.md §2.5 documents those as non-goals),
while reads/barcodes/latent rows shard naturally. Shardings are
NamedSharding so the same jitted functions run single-chip (trivial mesh)
and multi-chip/host unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pangaea_tpu.config import ParallelConfig


def initialize_distributed(cfg: ParallelConfig) -> None:
    """jax.distributed bring-up for multi-host runs (no-op single host)."""
    if cfg.use_distributed and cfg.coordinator_address:
        jax.distributed.initialize(
            coordinator_address=cfg.coordinator_address,
            num_processes=cfg.num_processes,
            process_id=cfg.process_id)


def data_mesh(num_devices: Optional[int] = None,
              axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(devices, (axis,))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, sharded_dim: int = 0, ndim: int = 2,
                  axis: str = "data") -> NamedSharding:
    """Shard dimension `sharded_dim` of an ndim-array over the data axis."""
    spec = [None] * ndim
    spec[sharded_dim] = axis
    return NamedSharding(mesh, P(*spec))
