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


def _single_truth(base, fq):
    from pangaea_tpu.config import FeatureConfig
    from pangaea_tpu.features import FeatureExtractor
    cfg = FeatureConfig(kmer=9, min_length=100, max_read_len=64,
                        reads_per_batch=32, hist_impl="scatter",
                        min_qual_char=None, auto_row_len=False,
                        bug_compat_boundary_leak=False)
    fe = FeatureExtractor(cfg, os.path.join(base, "single"))
    names, abd, tnf = fe.extract_features(interleaved=fq)
    table = fe.global_kmer_table(interleaved=fq)
    return names, abd, tnf, table


def _check_results(outdir, n, names, abd, tnf, table):
    rs = [np.load(os.path.join(outdir, f"result{i}.npz"))
          for i in range(n)]
    want_sum = int(np.asarray(table).sum(dtype=np.int64))
    for r in rs:
        assert int(r["merged_table_sum"]) == want_sum
    got_names = np.concatenate([r["names"] for r in rs])
    np.testing.assert_array_equal(got_names, np.asarray(names, dtype="U"))
    np.testing.assert_array_equal(
        np.concatenate([r["abd"] for r in rs]), abd)
    np.testing.assert_array_equal(
        np.concatenate([r["tnf"] for r in rs]), tnf)
    sizes = [len(r["names"]) for r in rs]
    assert all(s > 0 for s in sizes)
    for r in rs:
        np.testing.assert_array_equal(r["all_abd"], abd.astype(np.float32))
        np.testing.assert_array_equal(r["all_tnf"], tnf.astype(np.float32))
    return sizes


@pytest.mark.parametrize("nprocs", [2, 3, 4])
def test_multiprocess_distributed_features(dataset, nprocs):
    """N-process jax.distributed run (VERDICT r4 item 9: past 2
    symmetric processes — 40 barcodes over 3/4 shards split at barcode
    boundaries are RAGGED) equals the single-process run."""
    base, fq = dataset
    outdir = os.path.join(base, f"dist{nprocs}")
    os.makedirs(outdir, exist_ok=True)
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no virtual mesh inside the workers
    procs = [subprocess.Popen(
        [sys.executable, WORKER, fq, outdir, str(port), str(i),
         str(nprocs)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(nprocs)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so}\n{se[-3000:]}"
    names, abd, tnf, table = _single_truth(base, fq)
    sizes = _check_results(outdir, nprocs, names, abd, tnf, table)
    if nprocs > 2:
        assert len(set(sizes)) > 1, f"shards not ragged: {sizes}"


def test_worker_kill_and_resume(dataset):
    """One worker SIGKILLed mid-run (after its partial-table artifact,
    before the allreduce): the survivors cannot complete the collective
    and the job is torn down; a FULL relaunch resumes — survivors load
    their partial tables from artifacts instead of re-reading shards —
    and completes with results identical to single-process
    (VERDICT r4 item 9)."""
    base, fq = dataset
    nprocs = 3
    outdir = os.path.join(base, "kill")
    os.makedirs(outdir, exist_ok=True)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    # attempt 1: worker 1 dies right after writing its artifact
    port = _free_port()
    env1 = dict(env, PANGAEA_MH_DIE_AFTER_PARTIAL="1")
    procs = [subprocess.Popen(
        [sys.executable, WORKER, fq, outdir, str(port), str(i),
         str(nprocs)],
        env=env1, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(nprocs)]
    # the doomed worker exits 17; the others block in the allreduce (or
    # die on the broken connection) — tear the attempt down like a
    # supervisor would. communicate(), not wait(): with PIPEs a worker
    # that fills the ~64 KB pipe buffer with gRPC/absl logging would
    # block on write and never exit.
    procs[1].communicate(timeout=300)
    assert procs[1].returncode == 17
    for i, p in enumerate(procs):
        if i != 1:
            try:
                p.communicate(timeout=20)
            except subprocess.TimeoutExpired:
                p.kill()
                p.communicate()
    assert os.path.exists(os.path.join(outdir, "partial1.npy"))
    assert not os.path.exists(os.path.join(outdir, "result0.npz"))
    # attempt 2: full relaunch on a fresh port; every worker finds a
    # partial-table artifact (worker 1 wrote its own before dying)
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, WORKER, fq, outdir, str(port), str(i),
         str(nprocs)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(nprocs)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"relaunch failed:\n{so}\n{se[-3000:]}"
        assert "resuming partial table from artifact" in so
    names, abd, tnf, table = _single_truth(base, fq)
    _check_results(outdir, nprocs, names, abd, tnf, table)
