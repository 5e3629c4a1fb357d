"""Multi-process distributed proof (VERDICT r1 item 5).

Launches TWO real OS processes under jax.distributed (localhost
coordinator, CPU backend) running tests/multihost_worker.py — shard
split, per-host partial k-mer table, cross-process psum merge, per-host
group features against the merged table, ragged latent allgather — and
asserts the distributed results equal a single-process run over the
whole file. This exercises the actual multi-host runtime (Gloo
collectives between processes), not the in-process virtual mesh the rest
of the suite uses.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from pangaea_tpu.io.sim import simulate_linked_reads
    d = tmp_path_factory.mktemp("mh")
    fq = str(d / "reads.fq")
    simulate_linked_reads(out_interleaved=fq, n_species=3,
                          genome_len=20_000, n_barcodes=40,
                          pairs_per_barcode=8, read_len=48, seed=9)
    return str(d), fq


def test_two_process_distributed_features(dataset):
    base, fq = dataset
    outdir = os.path.join(base, "dist")
    os.makedirs(outdir, exist_ok=True)
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no virtual mesh inside the workers
    procs = [subprocess.Popen(
        [sys.executable, WORKER, fq, outdir, str(port), str(i), "2"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(2)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so}\n{se[-3000:]}"

    r0 = np.load(os.path.join(outdir, "result0.npz"))
    r1 = np.load(os.path.join(outdir, "result1.npz"))

    # single-process truth over the whole file, same config
    from pangaea_tpu.config import FeatureConfig
    from pangaea_tpu.features import FeatureExtractor
    cfg = FeatureConfig(kmer=9, min_length=100, max_read_len=64,
                        reads_per_batch=32, hist_impl="scatter",
                        min_qual_char=None, auto_row_len=False,
                        bug_compat_boundary_leak=False)
    fe = FeatureExtractor(cfg, os.path.join(base, "single"))
    names, abd, tnf = fe.extract_features(interleaved=fq)
    table = fe.global_kmer_table(interleaved=fq)

    # both processes saw the same psum-merged table (== whole-file table)
    want_sum = int(np.asarray(table).sum(dtype=np.int64))
    assert int(r0["merged_table_sum"]) == want_sum
    assert int(r1["merged_table_sum"]) == want_sum

    # shard-local features concatenate to exactly the single-process run
    # (split is at barcode boundaries; groups never span shards)
    got_names = np.concatenate([r0["names"], r1["names"]])
    np.testing.assert_array_equal(got_names, np.asarray(names, dtype="U"))
    np.testing.assert_array_equal(
        np.concatenate([r0["abd"], r1["abd"]]), abd)
    np.testing.assert_array_equal(
        np.concatenate([r0["tnf"], r1["tnf"]]), tnf)
    # both shards hold real work
    assert len(r0["names"]) > 0 and len(r1["names"]) > 0

    # ragged allgather reassembled the global matrices on every process
    for r in (r0, r1):
        np.testing.assert_array_equal(r["all_abd"],
                                      abd.astype(np.float32))
        np.testing.assert_array_equal(r["all_tnf"],
                                      tnf.astype(np.float32))
