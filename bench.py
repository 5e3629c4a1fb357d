#!/usr/bin/env python
"""Headline bench: feature-extraction + VAE binning reads/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so the baseline is
self-measured on this host's CPU: a numpy sort-based k-mer counter
(jellyfish-class algorithm — sort/unique global table, searchsorted
lookups, np.add.at histograms) plus the VAE train step on the XLA CPU
backend, standing in for the reference's jellyfish + C++ count_kmer/tnf +
torch-CPU stack. vs_baseline = TPU reads/s / host-CPU reads/s.

The bench times the DEVICE path (packed read batches prepared up front):
global k-mer pass + per-barcode abundance/TNF pass + VAE train steps per
epoch-equivalent. Host-side FASTQ parsing is benched separately by
tests/bench_io (native IO milestone).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

K, TNFK, WINDOW, VEC = 15, 4, 10, 400
READ_LEN = 150
ROW_LEN = 152  # row width at the read length rounded up to 8 — exactly
               # what FeatureConfig.auto_row_len picks for 150 bp reads.
               # Padding windows carry the sort sentinel but still cost
               # sort time, and the sort is ~70% of feature time, so row
               # width is sort volume (160 wasted ~5%).
N_BARCODES = int(os.environ.get("BENCH_BARCODES", 3000))
PAIRS_PER_BC = int(os.environ.get("BENCH_PAIRS", 40))
TRAIN_STEPS = int(os.environ.get("BENCH_TRAIN_STEPS", 200))
CPU_SCALE = 8  # CPU proxy runs 1/CPU_SCALE of the batches


def build_batches():
    """Synthetic packed batches, no FASTQ involved (device-path bench)."""
    from pangaea_tpu.io.packing import PackedBatch
    rng = np.random.RandomState(0)
    rows_per_batch = 16384
    n_reads = N_BARCODES * PAIRS_PER_BC * 2
    reads_per_bc = PAIRS_PER_BC * 2
    batches = []
    seg_base = 0
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
        seg_base += n
    return batches, n_reads


def cpu_feature_baseline(batches, n_groups):
    """Numpy sort-based feature extraction (the CPU baseline)."""
    from pangaea_tpu.kernels.encode import (canonical_rank_lut,
                                            num_canonical_kmers,
                                            revcomp_kmers_np)

    def window_vals(codes, lengths, k):
        R, L = codes.shape
        W = L - k + 1
        c = codes.astype(np.int64)
        safe = np.where(c < 4, c, 0)
        acc = np.zeros((R, W), np.int64)
        for j in range(k):
            acc = (acc << 2) | safe[:, j:j + W]
        bad = (c >= 4).astype(np.int32)
        cs = np.cumsum(bad, axis=1)
        nbad = cs[:, k - 1:] - np.pad(cs, ((0, 0), (1, 0)))[:, :W]
        starts = np.arange(W)[None, :]
        valid = (nbad == 0) & (starts + k <= lengths[:, None])
        return acc, valid

    t0 = time.time()
    ncols = num_canonical_kmers(TNFK)
    lut = canonical_rank_lut(TNFK)
    # global pass: sort-based counting (jellyfish-class)
    parts = []
    for b in batches:
        vals, valid = window_vals(b.codes, b.lengths, K)
        canon = np.minimum(vals, revcomp_kmers_np(vals.astype(np.uint32), K)
                           .astype(np.int64))
        parts.append(canon[valid])
    keys, counts = np.unique(np.concatenate(parts), return_counts=True)
    del parts
    # group pass
    hist = np.zeros(n_groups * VEC, np.int64)
    thist = np.zeros(n_groups * ncols, np.int64)
    for b in batches:
        vals, valid = window_vals(b.codes, b.lengths, K)
        canon = np.minimum(vals, revcomp_kmers_np(vals.astype(np.uint32), K)
                           .astype(np.int64))
        keep = valid & (b.seg_ids[:, None] >= 0)
        canon_f = canon[keep]
        pos = np.searchsorted(keys, canon_f)
        pos = np.clip(pos, 0, len(keys) - 1)
        cnt = np.where(keys[pos] == canon_f, counts[pos], 0)
        bins = cnt // WINDOW
        seg = np.broadcast_to(b.seg_ids[:, None], keep.shape)[keep]
        ok = (cnt > 0) & (bins < VEC)
        np.add.at(hist, seg[ok] * VEC + bins[ok], 1)
        tvals, tvalid = window_vals(b.codes, b.lengths, TNFK)
        tkeep = tvalid & (b.seg_ids[:, None] >= 0)
        ranks = lut[tvals[tkeep]]
        tseg = np.broadcast_to(b.seg_ids[:, None], tkeep.shape)[tkeep]
        np.add.at(thist, tseg * ncols + ranks, 1)
    t_feat = time.time() - t0
    return t_feat, hist.reshape(n_groups, VEC), thist.reshape(n_groups,
                                                              ncols)


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
        total = sum(p.shape[0] for p in keys_parts)
        npad = sortjoin_pad_size(total)
        if npad > total:
            keys_parts.append(jnp.full(npad - total, kmer_key_sentinel(K),
                                       jnp.int32))
        # row-grouped restore: the second sort is one packed uint32
        # operand (within-row order is free to the histogram)
        bins = sortjoin_bins_rowgrouped(
            jnp.concatenate(keys_parts), k=K, window=WINDOW,
            vector_size=VEC, row_windows=ROW_LEN - K + 1)
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
    import jax
    import jax.numpy as jnp
    import jax.random as jrandom
    from pangaea_tpu.config import ModelConfig
    from pangaea_tpu.model import BarcodeDataset, VAE, VAETrainer
    from pangaea_tpu.model.vae import init_vae

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
    from pangaea_tpu.utils import device_sync
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


def run_measure(cpu_proxy: bool) -> dict:
    if cpu_proxy:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from pangaea_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    batches, n_reads = build_batches()
    if cpu_proxy:
        batches = batches[: max(1, len(batches) // CPU_SCALE)]
        n_reads = sum(int((b.lengths > 0).sum()) for b in batches)
        steps = max(10, TRAIN_STEPS // CPU_SCALE)
        t_feat, abd, tnf = cpu_feature_baseline(batches, N_BARCODES)
    else:
        steps = TRAIN_STEPS
        t_feat, abd, tnf = device_features(batches, N_BARCODES)
    # steps scale with the data slice, so reads/s compares directly
    t_train = train_bench(abd, tnf, N_BARCODES, steps)
    return {"reads_per_s": n_reads / (t_feat + t_train), "t_feat": t_feat,
            "t_train": t_train, "n_reads": n_reads, "steps": steps}


def _spawn(tag: str, flag: str, timeout: int) -> dict:
    env = dict(os.environ)
    if flag == "--cpu-proxy":
        env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), flag],
        capture_output=True, text=True, timeout=timeout, env=env)
    line = [l for l in out.stdout.splitlines() if l.startswith(tag)][-1]
    return json.loads(line[len(tag):])


def main():
    if "--cpu-proxy" in sys.argv:
        print("CPUPROXY " + json.dumps(run_measure(cpu_proxy=True)))
        return
    if "--device-path" in sys.argv:
        print("DEVICEPATH " + json.dumps(run_measure(cpu_proxy=False)))
        return
    # Both measurements run in child processes: a wedged TPU backend
    # (compute RPCs hanging) must not hang the whole bench.
    note = None
    dev_timeout = int(os.environ.get("BENCH_DEVICE_TIMEOUT", 1500))
    try:
        dev = _spawn("DEVICEPATH ", "--device-path", dev_timeout)
        reads_per_s = dev["reads_per_s"]
    except Exception as e:
        print(f"device path failed: {e}", file=sys.stderr)
        dev = None
        reads_per_s = 0.0
        note = "tpu_unavailable"
    try:
        cpu = _spawn("CPUPROXY ", "--cpu-proxy", 1800)
        vs = reads_per_s / cpu["reads_per_s"] if dev else None
    except Exception as e:
        print(f"cpu proxy failed: {e}", file=sys.stderr)
        vs = None
    result = {
        "metric": "feature_extract_plus_vae_binning_throughput",
        "value": round(reads_per_s, 1),
        "unit": "reads/s/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }
    if note:
        result["note"] = note
    print(json.dumps(result))


if __name__ == "__main__":
    main()
