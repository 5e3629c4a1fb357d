"""Multi-host input sharding + cross-process reductions.

SURVEY.md §2.5/§5 TPU-native plan: per-host input pipelines read disjoint
FASTQ shards whose boundaries respect barcode groups (the stream is
barcode-sorted, so splitting at group boundaries keeps every barcode on
one host), and per-host partial results merge with collectives:

- global k-mer table: per-host partial table -> psum.
- per-barcode features: disjoint by construction (no merge needed).
- latent all-gather before clustering: process_allgather.

The reference has no distributed layer at all (single node, pipes+files).
"""

from __future__ import annotations

import logging
import os
from typing import List, Tuple

import numpy as np

log = logging.getLogger(__name__)


def split_interleaved_by_barcode(path: str, out_prefix: str,
                                 n_shards: int) -> List[str]:
    """Split a barcode-sorted interleaved FASTQ into n shards at barcode
    boundaries (approximately byte-balanced). Returns shard paths.

    Grouping quirk note: the reference's boundary leak moves the first
    pair of each barcode into the previous group, so a split at a barcode
    boundary keeps even the leaked pair on one shard — every shard's
    groups are self-contained except the leading group of shards 2..n,
    whose leaked-in pair stays on the previous shard; feature counts are
    additive either way because groups never span shards.
    """
    from pangaea_tpu.io.fastq import BarcodeParser, open_maybe_gzip
    parser = BarcodeParser()
    outs = [open(f"{out_prefix}.shard{i}.fq", "w") for i in range(n_shards)]
    total = os.path.getsize(path)
    per_shard = max(total // n_shards, 1)
    cur = 0
    written = 0
    last_bc = None
    try:
        with open_maybe_gzip(path) as f:
            it = iter(f)
            for h1 in it:
                rec = [h1] + [next(it) for _ in range(7)]
                _, bc = parser.parse(h1.rstrip("\n").lstrip("@"))
                if (written > per_shard * (cur + 1) and bc != last_bc
                        and cur < n_shards - 1):
                    cur += 1
                block = "".join(rec)
                outs[cur].write(block)
                written += len(block)
                last_bc = bc
    finally:
        for f in outs:
            f.close()
    return [f"{out_prefix}.shard{i}.fq" for i in range(n_shards)]


def allreduce_table(table) -> "jax.Array":  # noqa: F821
    """Sum per-process partial k-mer tables across hosts (psum over the
    global mesh). No-op with one process."""
    import jax
    if jax.process_count() == 1:
        return table
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(table).sum(axis=0)


def allgather_rows(local: np.ndarray) -> np.ndarray:
    """Concatenate per-process row blocks (latent/barcode gather before
    clustering). No-op with one process."""
    import jax
    if jax.process_count() == 1:
        return np.asarray(local)
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(np.asarray(local))
    return np.concatenate(list(gathered), axis=0)
