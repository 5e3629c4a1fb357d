#!/usr/bin/env python
"""Headline bench: feature-extraction + VAE binning reads/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The reference publishes no numbers (BASELINE.md), so the baseline is
self-measured on this host against the REAL reference stack (VERDICT r1
item 1): the reference's count_kmer/count_tnf binaries compiled from
/root/reference/src/cpptools, fed a precomputed jellyfish-format dump
(jellyfish itself is not in this image, so its global-count time is
EXCLUDED — generous to the reference), plus a torch replica of the
reference VAE train step (tools/refstack.py). The reference runs
count_kmer and count_tnf concurrently (src/feature.py:28-39), so its
feature wall is max() of the two.

Two numerators are measured on the same simulated linked-read dataset:

  * value / vs_baseline — END-TO-END: FeatureExtractor.extract_features
    straight from the FASTQ (host parse + packing + device sort-join
    feature pass) plus the jitted VAE train block. This is the honest
    like-for-like against the reference binaries, which also parse the
    FASTQ themselves.
  * device_compute_reads_per_s — the device-only feature+train path with
    batches pre-packed (the former headline; kept as the compute ceiling).

Run on a 2-CPU host the reference numbers use -t 2; the reference's
intended deployment is a 50-150-thread server (src/run_pangaea:83), so
vs_baseline is per-THIS-host, not per-reference-server.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

K, TNFK, WINDOW, VEC, MIN_LEN = 15, 4, 10, 400, 2000
READ_LEN = 150
ROW_LEN = 152  # what FeatureConfig.auto_row_len picks for 150 bp reads
N_BARCODES = int(os.environ.get("BENCH_BARCODES", 3000))
PAIRS_PER_BC = int(os.environ.get("BENCH_PAIRS", 40))
TRAIN_STEPS = int(os.environ.get("BENCH_TRAIN_STEPS", 200))
DATA_DIR = os.environ.get(
    "BENCH_DATA_DIR",
    f"/tmp/pangaea_bench_data/v1_{N_BARCODES}x{PAIRS_PER_BC}")


# ---------------------------------------------------------------- dataset

def prepare_dataset() -> dict:
    """Simulated linked-read FASTQ + jellyfish-format dump, cached on disk.

    Both stacks consume the same files: ours via extract_features, the
    reference via `count_kmer -i reads.fq.gz -g table.dump`.
    """
    os.makedirs(DATA_DIR, exist_ok=True)
    fq = os.path.join(DATA_DIR, "reads.fq.gz")
    dump = os.path.join(DATA_DIR, "table.dump")
    meta = os.path.join(DATA_DIR, "meta.json")
    if not (os.path.exists(fq) and os.path.exists(dump)
            and os.path.exists(meta)):
        from pangaea_tpu.io.sim import simulate_linked_reads
        from tools.refstack import write_jellyfish_dump
        simulate_linked_reads(out_interleaved=fq, n_species=8,
                              genome_len=200_000, n_barcodes=N_BARCODES,
                              pairs_per_barcode=PAIRS_PER_BC,
                              read_len=READ_LEN, seed=7)
        n_reads = write_jellyfish_dump(fq, dump, k=K)
        with open(meta, "w") as f:
            json.dump({"n_reads": n_reads}, f)
    with open(meta) as f:
        n_reads = json.load(f)["n_reads"]
    return {"fq": fq, "dump": dump, "n_reads": n_reads}


# ------------------------------------------------- device compute (packed)

def build_batches():
    """Synthetic packed batches, no FASTQ involved (device-compute bench)."""
    from pangaea_tpu.io.packing import PackedBatch
    rng = np.random.RandomState(0)
    rows_per_batch = 16384
    n_reads = N_BARCODES * PAIRS_PER_BC * 2
    reads_per_bc = PAIRS_PER_BC * 2
    batches = []
    for start in range(0, n_reads, rows_per_batch):
        n = min(rows_per_batch, n_reads - start)
        codes = np.full((rows_per_batch, ROW_LEN), 4, np.uint8)
        codes[:n, :READ_LEN] = rng.randint(0, 4, (n, READ_LEN),
                                           dtype=np.uint8)
        lengths = np.zeros(rows_per_batch, np.int32)
        lengths[:n] = READ_LEN
        seg = np.full(rows_per_batch, -1, np.int32)
        seg[:n] = (start + np.arange(n)) // reads_per_bc
        batches.append(PackedBatch(codes, lengths, seg,
                                   np.zeros(rows_per_batch, np.uint8)))
    return batches, n_reads


def device_features(batches, n_groups):
    """Sort-join feature pass (the hist_impl='auto' TPU path at this
    dataset size): one sweep collects k-mer keys + TNF, one sort derives
    global counts, a replay histograms the bins (features.py:
    group_features_sortjoin)."""
    import jax
    import jax.numpy as jnp
    from pangaea_tpu.kernels.encode import num_canonical_kmers
    from pangaea_tpu.kernels.features import (abundance_histogram_from_bins,
                                              batch_kmer_keys,
                                              kmer_key_sentinel,
                                              sortjoin_bins_rowgrouped,
                                              sortjoin_pad_size,
                                              tnf_histogram_segsum)
    from pangaea_tpu.utils import device_sync

    ncols = num_canonical_kmers(TNFK)
    dev_batches = [(jnp.asarray(b.codes), jnp.asarray(b.lengths),
                    jnp.asarray(b.seg_ids), jnp.asarray(b.cont))
                   for b in batches]

    def feature_pass():
        thist = jnp.zeros((n_groups, ncols), jnp.int32)
        keys_parts = []
        for codes, lengths, seg, cont in dev_batches:
            keys_parts.append(batch_kmer_keys(codes, lengths, cont, k=K,
                                              overlap=K - 1))
            thist = tnf_histogram_segsum(
                thist, codes, lengths, seg, cont, k=TNFK, num_cols=ncols,
                overlap=K - 1, n_groups=n_groups)
        per_batch = keys_parts[0].shape[0]
        total_orig = sum(p.shape[0] for p in keys_parts)
        # trim the final batch's pad-row windows (all sentinels) before
        # the sort — mirrors features.group_features_sortjoin; at this
        # geometry it is what keeps the sort under the 2^25 pow2 tier
        wrow = ROW_LEN - K + 1
        n_last = batches[-1].lengths.nonzero()[0]
        rows_used = int(n_last[-1]) + 1 if n_last.size else 0
        tail = (batches[-1].lengths.shape[0] - rows_used) * wrow
        if tail:
            keys_parts[-1] = keys_parts[-1][:per_batch - tail]
        total = total_orig - tail
        npad = sortjoin_pad_size(total)
        if npad > total:
            keys_parts.append(jnp.full(npad - total, kmer_key_sentinel(K),
                                       jnp.int32))
        # row-grouped restore: the second sort is one packed int32
        # operand (within-row order is free to the histogram)
        bins = sortjoin_bins_rowgrouped(
            jnp.concatenate(keys_parts), k=K, window=WINDOW,
            vector_size=VEC, row_windows=wrow)
        if bins.shape[0] < total_orig:
            bins = jnp.concatenate(
                [bins, jnp.full(total_orig - bins.shape[0], -1, jnp.int32)])
        hist = jnp.zeros((n_groups, VEC), jnp.int32)
        rows = dev_batches[0][0].shape[0]
        off = 0
        for _, _, seg, _ in dev_batches:
            bslice = jax.lax.dynamic_slice(bins, (off,), (per_batch,))
            hist = abundance_histogram_from_bins(
                hist, bslice.reshape(rows, -1), seg, vector_size=VEC,
                n_groups=n_groups)
            off += per_batch
        return hist, thist

    # warmup/compile at the timed shapes (device_sync, NOT
    # block_until_ready: the latter is a no-op on proxied backends and
    # would leave compile/execution inside the timed region)
    hist, thist = feature_pass()
    device_sync(hist, thist)

    t0 = time.time()
    hist, thist = feature_pass()
    device_sync(hist, thist)
    t_feat = time.time() - t0
    return t_feat, np.array(hist), np.array(thist)


def train_bench(abd, tnf, n_groups, train_steps):
    import jax.numpy as jnp
    import jax.random as jrandom
    from pangaea_tpu.config import ModelConfig
    from pangaea_tpu.model import BarcodeDataset, VAE, VAETrainer
    from pangaea_tpu.model.vae import init_vae
    from pangaea_tpu.utils import device_sync

    abd = np.array(abd)
    tnf = np.array(tnf)
    # guard degenerate all-zero rows for normalization
    abd[abd.sum(1) == 0, 0] = 1
    tnf[tnf.sum(1) == 0, 0] = 1
    names = np.array([f"BC{i}" for i in range(n_groups)])
    ds = BarcodeDataset(names, abd, tnf)
    model = VAE(abd_dim=abd.shape[1], tnf_dim=tnf.shape[1])
    trainer = VAETrainer(model, ModelConfig(batch_size=2048))
    params, bn = init_vae(jrandom.PRNGKey(0), model)
    opt = trainer.tx.init(params)
    abd_all = jnp.asarray(ds.abd)
    tnf_all = jnp.asarray(ds.tnf)
    rng = np.random.RandomState(0)
    idx = rng.randint(0, n_groups, (train_steps, min(2048, n_groups))
                      ).astype(np.int32)
    mask = np.ones(idx.shape + (1,), np.float32)
    key = jrandom.PRNGKey(1)
    idx_d, mask_d = jnp.asarray(idx), jnp.asarray(mask)
    # compile at the EXACT timed shape (a different scan length would put
    # a fresh compile inside the timed region), real sync via transfer
    p2, o2, b2, k2, stats = trainer._train_block(
        params, opt, bn, key, abd_all, tnf_all, idx_d, mask_d)
    device_sync(stats)
    t0 = time.time()
    p2, o2, b2, k2, stats = trainer._train_block(
        p2, o2, b2, k2, abd_all, tnf_all, idx_d, mask_d)
    device_sync(stats)
    return time.time() - t0


# --------------------------------------------------------- measure modes

def run_device_compute() -> dict:
    from pangaea_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    batches, n_reads = build_batches()
    t_feat, abd, tnf = device_features(batches, N_BARCODES)
    t_train = train_bench(abd, tnf, N_BARCODES, TRAIN_STEPS)
    return {"reads_per_s": n_reads / (t_feat + t_train), "t_feat": t_feat,
            "t_train": t_train, "n_reads": n_reads, "steps": TRAIN_STEPS}


def run_device_e2e() -> dict:
    """FASTQ -> features on device (host parse + pack included) + train."""
    import shutil
    import tempfile
    from pangaea_tpu.config import FeatureConfig
    from pangaea_tpu.features import FeatureExtractor
    from pangaea_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    ds = prepare_dataset()
    cfg = FeatureConfig(kmer=K, tnf_kmer=TNFK, window_size=WINDOW,
                        vector_size=VEC, min_length=MIN_LEN)
    # warm the compile cache at the exact shapes with a throwaway run
    # (first compile via the TPU tunnel can dominate; the steady-state
    # cost is what a production run pays per dataset shard)
    work = tempfile.mkdtemp(prefix="bench_e2e_")
    fe = FeatureExtractor(cfg, os.path.join(work, "warm"))
    fe.extract_features(interleaved=ds["fq"])
    t0 = time.time()
    fe = FeatureExtractor(cfg, os.path.join(work, "timed"))
    names, abd, tnf = fe.extract_features(interleaved=ds["fq"])
    t_feat = time.time() - t0
    t_train = train_bench(abd, tnf, len(names), TRAIN_STEPS)
    shutil.rmtree(work, ignore_errors=True)
    return {"reads_per_s": ds["n_reads"] / (t_feat + t_train),
            "t_feat": t_feat, "t_train": t_train,
            "n_reads": ds["n_reads"], "n_groups": len(names),
            "steps": TRAIN_STEPS}


def run_reference_stack() -> dict:
    """The compiled reference binaries + torch VAE on the same dataset."""
    import gzip
    import tempfile
    # the axon TPU plugin ignores the JAX_PLATFORMS env var (CLAUDE.md);
    # force CPU via jax.config so a cold prepare_dataset() in this child
    # cannot touch (or hang on) the TPU backend
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tools import refstack

    if not refstack.build_ref_tools():
        raise RuntimeError("reference tools unavailable")
    ds = prepare_dataset()
    work = tempfile.mkdtemp(prefix="bench_ref_")
    kmer_gz = os.path.join(work, "abundance.gz")
    tnf_gz = os.path.join(work, "tnf.gz")
    t_kmer = refstack.run_count_kmer(ds["fq"], ds["dump"], kmer_gz, k=K,
                                     min_len=MIN_LEN, window=WINDOW,
                                     vector=VEC)
    t_tnf = refstack.run_count_tnf(ds["fq"], tnf_gz, k=TNFK,
                                   min_len=MIN_LEN)

    def parse(path):
        rows = []
        with gzip.open(path, "rt") as f:
            for line in f:
                rows.append([float(x) for x in
                             line.rstrip("\n").split(",")[1:]])
        return np.array(rows, np.float32)

    abd = parse(kmer_gz)
    tnf = parse(tnf_gz)
    t_train = refstack.torch_train_seconds(abd, tnf, TRAIN_STEPS)
    # count_kmer and count_tnf run concurrently in the reference
    # (src/feature.py:28-39): charge max(), not sum()
    t_feat = max(t_kmer, t_tnf)
    return {"reads_per_s": ds["n_reads"] / (t_feat + t_train),
            "t_kmer": t_kmer, "t_tnf": t_tnf, "t_train": t_train,
            "n_reads": ds["n_reads"], "n_groups": abd.shape[0],
            "steps": TRAIN_STEPS, "threads": os.cpu_count()}


def _spawn(tag: str, flag: str, timeout: int) -> dict:
    env = dict(os.environ)
    if flag == "--reference-stack":
        env["JAX_PLATFORMS"] = "cpu"  # no TPU involvement in the baseline
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), flag],
        capture_output=True, text=True, timeout=timeout, env=env)
    lines = [l for l in out.stdout.splitlines() if l.startswith(tag)]
    if not lines:
        raise RuntimeError(
            f"{flag} produced no result: {out.stderr[-800:]}")
    return json.loads(lines[-1][len(tag):])


def main():
    if "--device-compute" in sys.argv:
        print("DEVICECOMPUTE " + json.dumps(run_device_compute()))
        return
    if "--device-e2e" in sys.argv:
        print("DEVICEE2E " + json.dumps(run_device_e2e()))
        return
    if "--reference-stack" in sys.argv:
        print("REFERENCESTACK " + json.dumps(run_reference_stack()))
        return
    # Dataset generation happens once here, outside the timed children.
    prepare_dataset()
    # All measurements run in child processes: a wedged TPU backend
    # (compute RPCs hanging) must not hang the whole bench.
    note = []
    dev_timeout = int(os.environ.get("BENCH_DEVICE_TIMEOUT", 2400))
    e2e = comp = ref = None
    try:
        e2e = _spawn("DEVICEE2E ", "--device-e2e", dev_timeout)
    except Exception as e:
        print(f"device e2e failed: {e}", file=sys.stderr)
        note.append("tpu_e2e_failed")
    try:
        comp = _spawn("DEVICECOMPUTE ", "--device-compute", dev_timeout)
    except Exception as e:
        print(f"device compute failed: {e}", file=sys.stderr)
        note.append("tpu_compute_failed")
    try:
        ref = _spawn("REFERENCESTACK ", "--reference-stack", 3600)
    except Exception as e:
        print(f"reference stack failed: {e}", file=sys.stderr)
        note.append("ref_stack_failed")
    value = e2e["reads_per_s"] if e2e else 0.0
    vs = (value / ref["reads_per_s"]) if (e2e and ref) else None
    result = {
        "metric": "e2e_fastq_to_bins_throughput",
        "value": round(value, 1),
        "unit": "reads/s/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "device_compute_reads_per_s":
            round(comp["reads_per_s"], 1) if comp else None,
        "ref_stack_reads_per_s":
            round(ref["reads_per_s"], 1) if ref else None,
        "detail": {"e2e": e2e, "ref": ref},
        "baseline_def": ("compiled reference count_kmer/count_tnf "
                         "(concurrent, max) + torch VAE train steps on "
                         f"{os.cpu_count()} host CPUs; jellyfish global "
                         "count excluded (not installed; dump precomputed "
                         "for both stacks)"),
    }
    if note:
        result["note"] = ",".join(note)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
