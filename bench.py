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

Three numerators are measured on the same simulated linked-read dataset:

  * value / vs_baseline — DRIVER-LEVEL (the headline since r4, VERDICT
    r3 item 2): raw UNSORTED interleaved FASTQ -> clusters.tsv on one
    chip — step-0 barcode sort + features + the REAL training loop
    (early stop, eval cadence) + RPH-KMeans clustering — against the
    VERBATIM reference pipeline (its own awk|sort step 0 with a POSIX
    awk standing in for gawk's match(), then src/pangaea.py steps 1-3
    run unmodified with torch + rph_kmeans) on the same input.
  * e2e_kernel_reads_per_s — kernel-level e2e: extract_features straight
    from the FASTQ plus a fixed 200-step train block, vs the compiled
    count_kmer/count_tnf + a torch replica of the train step. Kept as
    the like-for-like KERNEL comparison (fixed work on both sides).
  * device_compute_reads_per_s — device-only with pre-packed batches
    (the compute ceiling).

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


def prepare_unsorted() -> str:
    """Deterministically pair-shuffled PLAIN interleaved FASTQ — the raw
    input both drivers must barcode-sort (step 0) before steps 1-3.

    Headers use the SPACE-separated ``@name BX:Z:..`` form that
    ``seqtk mergepe`` produces in the reference flow (run_pangaea:224):
    its awk|sort|cut|tr stage joins record lines with tabs, so a TAB
    inside the header (the pre-interleave ``preprocess_*`` form) would
    be split by the final ``tr "\\t" "\\n"``. Our own sorter handles
    both forms (io/fastq.py)."""
    import gzip
    ds = prepare_dataset()
    out = os.path.join(DATA_DIR, "reads.unsorted.fq")
    if os.path.exists(out):
        return out
    with gzip.open(ds["fq"], "rt") as f:
        lines = f.read().splitlines()
    for i in range(0, len(lines), 4):
        lines[i] = lines[i].replace("\t", " ", 1)
    blocks = ["\n".join(lines[i:i + 8]) for i in range(0, len(lines), 8)]
    rng = np.random.RandomState(123)
    rng.shuffle(blocks)
    tmp = out + ".tmp"
    with open(tmp, "w") as f:
        for b in blocks:
            f.write(b + "\n")
    os.replace(tmp, out)
    return out


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


def run_driver_ours() -> dict:
    """Raw unsorted FASTQ -> clusters.tsv on one chip: step-0 external
    barcode sort + pipeline steps 1-3 (features, REAL training loop with
    early stop, RPH-KMeans + bin extraction). Timed on a second run over
    fresh dirs so the persistent compile cache is warm — the steady
    state a production deployment pays per dataset (first-ever run adds
    one-time compiles; see PARITY.md)."""
    import logging
    import shutil
    import tempfile
    from pangaea_tpu.config import (ClusterConfig, FeatureConfig,
                                    PangaeaConfig)
    from pangaea_tpu.io.fastq import barcode_sort_interleaved
    from pangaea_tpu.pipeline.run import Pipeline
    from pangaea_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    logging.disable(logging.WARNING)
    ds = prepare_dataset()
    ufq = prepare_unsorted()

    def one_run(base):
        os.makedirs(base, exist_ok=True)
        t0 = time.time()
        sorted_fq = os.path.join(base, "interleaved.sorted.fastq")
        tmp = sorted_fq + ".tmp"
        barcode_sort_interleaved(ufq, tmp)
        os.replace(tmp, sorted_fq)
        t_sort = time.time() - t0
        cfg = PangaeaConfig(
            interleaved_reads=sorted_fq, output=os.path.join(base, "run"),
            steps="1,2,3",
            feature=FeatureConfig(kmer=K, tnf_kmer=TNFK,
                                  window_size=WINDOW, vector_size=VEC,
                                  min_length=MIN_LEN),
            cluster=ClusterConfig(n_clusters=8))
        pipe = Pipeline(cfg)
        split = {}
        t0 = time.time()
        t1 = time.time()
        feats = pipe.step1_features()
        split["s1"] = round(time.time() - t1, 2)
        t1 = time.time()
        pipe.step2_train(*feats)  # in-memory handoff, as Pipeline.run does
        split["s2"] = round(time.time() - t1, 2)
        t1 = time.time()
        pipe.step3_cluster()
        pipe.finish()  # join the deferred step-1 artifact write INSIDE
        # the timed window (overlap removes dead time, not work)
        split["s3"] = round(time.time() - t1, 2)
        t_steps = time.time() - t0
        tsv = os.path.join(base, "run", "3.clustering", "clusters.tsv")
        assert os.path.getsize(tsv) > 0
        _assert_driver_quality(tsv)
        return t_sort, t_steps, split

    work = tempfile.mkdtemp(prefix="bench_driver_")
    one_run(os.path.join(work, "warm"))
    # best of two timed runs: the shared host's co-tenant noise swings
    # single runs +/-25% at this geometry (PARITY.md); min-of-N is the
    # standard steady-state estimator and the reference leg gets the
    # same best-of-2 treatment
    n_runs = int(os.environ.get("BENCH_DRIVER_RUNS", 2))
    runs = [one_run(os.path.join(work, f"timed{i}")) for i in range(n_runs)]
    t_sort, t_steps, split = min(runs, key=lambda r: r[0] + r[1])
    shutil.rmtree(work, ignore_errors=True)
    total = t_sort + t_steps
    return {"reads_per_s": ds["n_reads"] / total, "t_sort": t_sort,
            "t_steps": t_steps, "split": split, "n_reads": ds["n_reads"],
            "runs_total_s": [round(r[0] + r[1], 2) for r in runs]}


def _assert_driver_quality(clusters_tsv: str) -> None:
    """The timed run must also be CORRECT: binning ARI vs the sim's
    ground truth >= 0.95 (the bench mixture is easy — both stacks score
    1.0 — so anything less means the speedup came from broken output).
    Truth is regenerated from the sim seed (deterministic; the
    barcode->species assignment does not depend on pairs_per_barcode)."""
    from sklearn.metrics import adjusted_rand_score
    from pangaea_tpu.io.sim import simulate_linked_reads
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".fq") as f:
        res = simulate_linked_reads(
            out_interleaved=f.name, n_species=8, genome_len=200_000,
            n_barcodes=N_BARCODES, pairs_per_barcode=1, seed=7)
    truth = res.barcode_species
    m = {}
    with open(clusters_tsv) as f:
        for line in f:
            cid, bcs = line.rstrip("\n").split("\t")
            for bc in bcs.split(","):
                m[bc.split("-")[0]] = cid
    common = sorted(set(m) & set(truth))
    assert len(common) > 0.95 * len(truth), "cluster barcodes missing"
    ari = adjusted_rand_score([truth[b] for b in common],
                              [m[b] for b in common])
    assert ari >= 0.95, f"driver bench output quality broke: ARI {ari}"


# POSIX-awk equivalent of the reference's gawk barcode-key extraction
# (src/run_pangaea:237-252; gawk's 3-arg match() is unavailable — only
# mawk exists here — so RSTART/RLENGTH substr does the same job; the
# sort/cut/tr stages are verbatim)
_REF_SORT_AWK = r"""
/^@/ {
    hdr = $0
    block = $0
    for (i = 1; i < 8; i++) {
        getline line
        block = block "\t" line
    }
    tag = "~~~"
    if (match(hdr, /BX:Z:[^ \t]+/)) {
        tag = substr(hdr, RSTART, RLENGTH)
    }
    print tag "\t" block
}
"""


def run_driver_reference() -> dict:
    """The verbatim reference pipeline from the same raw unsorted FASTQ:
    its own step-0 awk|LANG=C sort|cut|tr (run_pangaea:237-252), then
    src/pangaea.py steps 1-3 UNMODIFIED (torch VAENET with the real
    early-stop loop, rph_kmeans, extract_reads) — jellyfish excluded on
    both sides (dump precomputed)."""
    import tempfile
    from tools import refstack
    from tools.ref_pipeline_compare import make_ref_home, run_reference

    if not refstack.build_ref_tools():
        raise RuntimeError("reference tools unavailable")
    bin_dir = refstack.BIN
    ds = prepare_dataset()
    ufq = prepare_unsorted()
    work = tempfile.mkdtemp(prefix="bench_driver_ref_")
    home = make_ref_home(work, bin_dir)

    stubs = os.path.join(work, "stubs")  # populated by make_ref_home

    def one_run(tag):
        sub = os.path.join(work, tag)
        os.makedirs(sub, exist_ok=True)
        sorted_fq = os.path.join(sub, "interleaved.sorted.fastq")
        t0 = time.time()
        cmd = (f"awk '{_REF_SORT_AWK}' {ufq} | LANG=C sort -k1,1 "
               f"| cut -f2- | tr '\\t' '\\n' > {sorted_fq}")
        subprocess.run(["bash", "-c", cmd], check=True)
        t_sort = time.time() - t0
        t_steps = run_reference(home, stubs, sorted_fq,
                                os.path.join(sub, "out"), ds["dump"], K, 8,
                                os.cpu_count() or 2, steps="1,2,3")
        tsv = os.path.join(sub, "out", "3.clustering", "clusters.tsv")
        assert os.path.getsize(tsv) > 0
        return t_sort, t_steps

    # best of N runs — the same treatment the TPU driver leg gets
    # (co-tenant noise on this shared host swings both sides)
    n_runs = int(os.environ.get("BENCH_DRIVER_RUNS", 2))
    runs = [one_run(f"r{i}") for i in range(n_runs)]
    t_sort, t_steps = min(runs, key=lambda r: r[0] + r[1])
    total = t_sort + t_steps
    return {"reads_per_s": ds["n_reads"] / total, "t_sort": t_sort,
            "t_steps": t_steps, "n_reads": ds["n_reads"],
            "threads": os.cpu_count(),
            "runs_total_s": [round(r[0] + r[1], 2) for r in runs]}


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


def _spawn(tag: str, flag: str, timeout: int,
           env_extra: dict | None = None) -> dict:
    env = dict(os.environ)
    if flag in ("--reference-stack", "--driver-ref"):
        env["JAX_PLATFORMS"] = "cpu"  # no TPU involvement in the baseline
    if env_extra:
        env.update(env_extra)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), flag],
        capture_output=True, text=True, timeout=timeout, env=env)
    lines = [l for l in out.stdout.splitlines() if l.startswith(tag)]
    if not lines:
        raise RuntimeError(
            f"{flag} produced no result: {out.stderr[-800:]}")
    return json.loads(lines[-1][len(tag):])


# Headline geometry: 800k reads (10000 barcodes x 40 pairs). The old
# 240k default sits where both stacks' fixed costs are largest and the
# ~15% run-to-run wander swings the ratio the most (VERDICT r4 weak-6);
# at 800k fixed costs amortize on both sides and the ratio is stable.
# The 240k point is still measured and quoted alongside.
_HEADLINE_BARCODES = int(os.environ.get("BENCH_HEADLINE_BARCODES", 10000))


def _calibrate_host() -> float:
    """Fixed pure-CPU workload (min-of-3 sort of 10M float32): a storm
    indicator embedded in the artifact. Hypervisor steal on this shared
    box comes in multi-minute storms that inflate latency-sensitive
    walls (ours ~3x) far more than throughput-bound ones (reference
    ~1.2x) — a reading far above _CAL_QUIET_S flags the run."""
    rng = np.random.RandomState(0)
    x = rng.rand(10_000_000).astype(np.float32)
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.sort(x)
        walls.append(time.perf_counter() - t0)
    return min(walls)


_CAL_QUIET_S = 0.057  # measured quiet-host floor, 2026-08-22


def main():
    if "--prepare" in sys.argv:
        prepare_dataset()
        prepare_unsorted()
        return
    if "--device-compute" in sys.argv:
        print("DEVICECOMPUTE " + json.dumps(run_device_compute()))
        return
    if "--device-e2e" in sys.argv:
        print("DEVICEE2E " + json.dumps(run_device_e2e()))
        return
    if "--reference-stack" in sys.argv:
        print("REFERENCESTACK " + json.dumps(run_reference_stack()))
        return
    if "--driver-ours" in sys.argv:
        print("DRIVEROURS " + json.dumps(run_driver_ours()))
        return
    if "--driver-ref" in sys.argv:
        print("DRIVERREF " + json.dumps(run_driver_reference()))
        return
    if "--driver" in sys.argv:
        # driver-level metric only (VERDICT r3 item 2's bench.py --driver)
        prepare_dataset()
        prepare_unsorted()
        dev_timeout = int(os.environ.get("BENCH_DEVICE_TIMEOUT", 2400))
        drv = _spawn("DRIVEROURS ", "--driver-ours", 2 * dev_timeout)
        drv_ref = _spawn("DRIVERREF ", "--driver-ref", 3600)
        print(json.dumps({
            "metric": "driver_fastq_to_clusters_throughput",
            "value": round(drv["reads_per_s"], 1),
            "unit": "reads/s/chip",
            "vs_baseline": round(drv["reads_per_s"]
                                 / drv_ref["reads_per_s"], 2),
            "detail": {"driver": drv, "driver_ref": drv_ref}}))
        return
    # Dataset generation happens once here, outside the timed children —
    # at BOTH geometries (the headline 800k set via a --prepare child
    # with the env override, since the constants are module-level).
    prepare_dataset()
    prepare_unsorted()
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--prepare"],
        check=True, timeout=1800,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "BENCH_BARCODES": str(_HEADLINE_BARCODES)})
    # All measurements run in child processes: a wedged TPU backend
    # (compute RPCs hanging) must not hang the whole bench.
    note = []
    cal_start = _calibrate_host()
    dev_timeout = int(os.environ.get("BENCH_DEVICE_TIMEOUT", 2400))
    hl_env = {"BENCH_BARCODES": str(_HEADLINE_BARCODES)}
    drv = drv_ref = e2e = comp = ref = None
    drv_s = drv_ref_s = None

    def driver_pair(env_extra, ref_timeout, fail_note, samples=2):
        """INTERLEAVED A/B/A/B sampling of the two driver legs, best-of
        per side: the host's co-tenant noise drifts on a minutes scale,
        so back-to-back best-of-2 per leg can still time one side
        entirely inside a slow window and poison the ratio (a 00:40
        storm measured ours 1.9x slower but the reference only 1.2x).
        Each child runs ONE timed run (BENCH_DRIVER_RUNS=1)."""
        ours, refs = [], []
        one = dict(env_extra, BENCH_DRIVER_RUNS="1")
        for i in range(samples):
            try:
                ours.append(_spawn("DRIVEROURS ", "--driver-ours",
                                   2 * dev_timeout, env_extra=one))
            except Exception as e:
                print(f"driver bench failed: {e}", file=sys.stderr)
            try:
                refs.append(_spawn("DRIVERREF ", "--driver-ref",
                                   ref_timeout, env_extra=one))
            except Exception as e:
                print(f"driver reference failed: {e}", file=sys.stderr)
        best = lambda rs: (max(rs, key=lambda r: r["reads_per_s"])
                           if rs else None)
        a, b = best(ours), best(refs)
        if a:
            a["samples_reads_per_s"] = [round(r["reads_per_s"], 1)
                                        for r in ours]
        if b:
            b["samples_reads_per_s"] = [round(r["reads_per_s"], 1)
                                        for r in refs]
        if not a or not b:
            note.append(fail_note)
        return a, b

    drv, drv_ref = driver_pair(hl_env, 7200, "driver_headline_failed",
                               samples=3)
    # the small-geometry driver pair (the r3/r4 headline point), quoted
    # alongside so the scale trend stays visible
    drv_s, drv_ref_s = driver_pair({}, 3600, "driver_small_failed")
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
    value = drv["reads_per_s"] if drv else 0.0
    vs = (value / drv_ref["reads_per_s"]) if (drv and drv_ref) else None
    result = {
        # headline = what a user actually runs: raw unsorted FASTQ ->
        # clusters.tsv, real training loop included (VERDICT r3 item 2),
        # at the 800k-read geometry where the ratio is stable across the
        # ~15% run-to-run wander (VERDICT r4 item 10)
        "metric": "driver_fastq_to_clusters_throughput",
        "value": round(value, 1),
        "unit": "reads/s/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "headline_reads": (drv or {}).get("n_reads"),
        "driver_small_reads_per_s":
            round(drv_s["reads_per_s"], 1) if drv_s else None,
        "driver_small_vs_baseline":
            (round(drv_s["reads_per_s"] / drv_ref_s["reads_per_s"], 2)
             if (drv_s and drv_ref_s) else None),
        "timing_note": ("driver legs sampled INTERLEAVED A/B/A/B, best "
                        "of 2 per side (ours after a warm-up run: "
                        "persistent compile cache = per-dataset steady "
                        "state); host steal storms swing latency-"
                        "sensitive walls ~3x — see host_calibration"),
        "driver_ref_reads_per_s":
            round(drv_ref["reads_per_s"], 1) if drv_ref else None,
        "e2e_kernel_reads_per_s":
            round(e2e["reads_per_s"], 1) if e2e else None,
        "e2e_kernel_vs_baseline":
            (round(e2e["reads_per_s"] / ref["reads_per_s"], 2)
             if (e2e and ref) else None),
        "device_compute_reads_per_s":
            round(comp["reads_per_s"], 1) if comp else None,
        "ref_stack_reads_per_s":
            round(ref["reads_per_s"], 1) if ref else None,
        "detail": {"driver": drv, "driver_ref": drv_ref,
                   "driver_small": drv_s, "driver_small_ref": drv_ref_s,
                   "e2e": e2e, "ref": ref},
        "baseline_def": ("headline: the VERBATIM reference pipeline "
                         "(awk|sort step 0 + src/pangaea.py steps 1-3 "
                         "with torch VAENET + rph_kmeans) on "
                         f"{os.cpu_count()} host CPUs from the same raw "
                         "FASTQ; kernel metric: compiled count_kmer/"
                         "count_tnf (concurrent, max) + torch VAE train "
                         "steps; jellyfish global count excluded on both "
                         "sides (not installed; dump precomputed)"),
    }
    cal_end = _calibrate_host()
    result["host_calibration"] = {
        "start_s": round(cal_start, 4), "end_s": round(cal_end, 4),
        "quiet_s": _CAL_QUIET_S,
        "slowdown": round(max(cal_start, cal_end) / _CAL_QUIET_S, 2)}
    if note:
        result["note"] = ",".join(note)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
