"""Worker for tests/test_multihost.py: one process of a 2-process
jax.distributed CPU run (SURVEY.md §4: multi-host tests via a
multi-process CPU mesh).

Per-host flow (the real multi-host recipe, parallel/multihost.py):
shard the barcode-sorted FASTQ at barcode boundaries -> per-host partial
global k-mer table -> cross-process table merge (allreduce_table) ->
per-host group features against the MERGED table -> ragged latent
allgather. Results are dumped to npz for the launching test to compare
with a single-process run.

Usage: python multihost_worker.py <fq> <outdir> <port> <pid> <nprocs>
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

fq, outdir, port, pid, nprocs = sys.argv[1:6]
pid, nprocs = int(pid), int(nprocs)
jax.distributed.initialize(f"localhost:{port}", nprocs, pid)

import numpy as np  # noqa: E402

from pangaea_tpu.config import FeatureConfig  # noqa: E402
from pangaea_tpu.features import FeatureExtractor  # noqa: E402
from pangaea_tpu.parallel.multihost import (allgather_rows,  # noqa: E402
                                            allreduce_table,
                                            split_interleaved_by_barcode)

# every process computes the same deterministic split; each takes its own
# shard (on a real deployment the split runs once on shared storage)
shards = split_interleaved_by_barcode(
    fq, os.path.join(outdir, f"p{pid}"), nprocs, compress=False)
mine = shards[pid]

cfg = FeatureConfig(kmer=9, min_length=100, max_read_len=64,
                    reads_per_batch=32, hist_impl="scatter",
                    min_qual_char=None, auto_row_len=False,
                    bug_compat_boundary_leak=False)
fe = FeatureExtractor(cfg, os.path.join(outdir, f"feat{pid}"))

# partial global table over this host's shard -> psum across processes.
# The partial is an ARTIFACT (like every pipeline stage): a worker
# relaunched after a mid-run death resumes from it instead of re-reading
# its shard (tests/test_multihost.py kill-and-resume).
partial_path = os.path.join(outdir, f"partial{pid}.npy")
if os.path.exists(partial_path):
    print(f"worker {pid}: resuming partial table from artifact")
    import jax.numpy as jnp
    partial = jnp.asarray(np.load(partial_path))
else:
    partial = fe.global_kmer_table(interleaved=mine)
    tmp = partial_path + ".tmp"
    with open(tmp, "wb") as f:
        np.save(f, np.asarray(partial))
    os.replace(tmp, partial_path)
if os.environ.get("PANGAEA_MH_DIE_AFTER_PARTIAL") == str(pid):
    print(f"worker {pid}: injected death after partial-table artifact",
          flush=True)
    os._exit(17)
merged = allreduce_table(partial)

# per-barcode features against the MERGED table (bins depend on global
# counts, so a per-shard table would be wrong — that is the point)
names, abd, tnf = fe.group_features(merged, interleaved=mine)

# ragged all-gather: feature rows double as the "latent" payload here
all_abd = allgather_rows(abd.astype(np.float32))
all_tnf = allgather_rows(tnf.astype(np.float32))

np.savez(os.path.join(outdir, f"result{pid}.npz"),
         names=np.asarray(names, dtype="U"), abd=abd, tnf=tnf,
         all_abd=all_abd, all_tnf=all_tnf,
         merged_table_sum=np.asarray(merged).sum(dtype=np.int64),
         n_local=len(names))
print(f"worker {pid}: {len(names)} groups, gathered {all_abd.shape[0]}")
