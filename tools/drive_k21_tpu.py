#!/usr/bin/env python
"""Drive the feature path end-to-end on the REAL device (verify recipe).

Simulated error-free linked reads -> FeatureExtractor at k=15 (row-grouped
restore) and k=21 (split-word sort-join). Exactness checks that need no
oracle (skill: .claude/skills/verify):

  - abundance row sum == number of valid windows of the group's reads
    whose global count//window < vector_size (window=1, vector_size
    large enough to keep every bin -> row sum == total valid windows);
  - per-group TNF total == n_reads_in_group * (read_len - tnf_k + 1);
  - group set == barcodes whose concatenated length > min_len.
"""

import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    print("backend:", jax.default_backend())
    from pangaea_tpu.config import FeatureConfig
    from pangaea_tpu.features import FeatureExtractor
    from pangaea_tpu.io.sim import simulate_linked_reads

    tmp = tempfile.mkdtemp(prefix="drive_k21_")
    fq = os.path.join(tmp, "sim.fq.gz")
    n_bc, ppb, rl = 50, 20, 120
    simulate_linked_reads(out_interleaved=fq, n_species=3,
                          genome_len=50_000, n_barcodes=n_bc,
                          pairs_per_barcode=ppb, read_len=rl, seed=3)
    # kept reads under the reference's boundary-leak grouping (the first
    # pair leaks into the dropped leading empty-barcode group)
    from pangaea_tpu.io.grouping import (iter_barcode_groups,
                                         iter_read_pairs_interleaved)
    kept_reads = 0
    for bc, pairs in iter_barcode_groups(
            iter(iter_read_pairs_interleaved(fq)), bug_compat=True):
        seqs = [s for p in pairs for s in (p.seq1, p.seq2)]
        if bc and sum(len(s) for s in seqs) > 2000:
            kept_reads += len(seqs)
    for k in (15, 21):
        cfg = FeatureConfig(kmer=k, tnf_kmer=4, min_length=2000,
                            max_read_len=128, reads_per_batch=2048,
                            window_size=1, vector_size=400,
                            min_qual_char=None)
        fe = FeatureExtractor(cfg, os.path.join(tmp, f"k{k}"))
        names, abd, tnf = fe.extract_features(interleaved=fq)
        # every barcode has 20*2*120 = 4800 bases > min_len -> all kept,
        # minus the reference boundary-leak regrouping (names preserved)
        assert len(names) == n_bc, (k, len(names))
        wpr = rl - k + 1
        tot_windows = kept_reads * wpr
        # abundance keeps a window only while its global count//window <
        # vector_size; error-free sim repeats rarely exceed that, so
        # assert near-total coverage
        kept = int(abd.sum())
        assert tot_windows * 0.99 <= kept <= tot_windows, \
            (k, kept, tot_windows)
        twpr = rl - 4 + 1
        assert int(tnf.sum()) == kept_reads * twpr, \
            (k, int(tnf.sum()), kept_reads * twpr)
        print(f"k={k}: {len(names)} groups, abd windows {kept}/"
              f"{tot_windows}, tnf total {int(tnf.sum())} OK")

    # ---- k=21 BYTE-PARITY on silicon (VERDICT r3 item 6) -------------
    # our split-word sort-join runs on the REAL chip; the reference
    # count_kmer (compiled from /root/reference) runs on the host fed a
    # jellyfish-format k=21 dump; abundance CSVs must agree exactly.
    import subprocess
    from tools.refstack import build_ref_tools, BIN, write_jellyfish_dump
    if not build_ref_tools(["count_kmer"]):
        print("reference tools unavailable; PARITY SKIPPED")
        return
    k = 21
    dump = os.path.join(tmp, "k21.dump")
    write_jellyfish_dump(fq, dump, k=k)
    cfg = FeatureConfig(kmer=k, tnf_kmer=4, min_length=2000,
                        max_read_len=128, reads_per_batch=2048,
                        min_qual_char=None)
    fe = FeatureExtractor(cfg, os.path.join(tmp, "k21_parity"))
    names, abd, _tnf = fe.extract_features(interleaved=fq)
    ref_out = os.path.join(tmp, "ref_k21.gz")
    subprocess.run([os.path.join(BIN, "count_kmer"), "-i", fq, "-g", dump,
                    "-k", str(k), "-l", "2000", "-w", "10", "-v", "400",
                    "-t", "2", "-o", ref_out],
                   check=True, capture_output=True)
    import gzip
    ref_names, ref_rows = [], []
    with gzip.open(ref_out, "rt") as f:
        for line in f:
            parts = line.rstrip("\n").split(",")
            ref_names.append(parts[0])
            ref_rows.append([float(x) for x in parts[1:]])
    assert list(names) == ref_names, "group names/order mismatch"
    ref_mat = np.array(ref_rows)
    assert abd.shape == ref_mat.shape
    assert (abd.astype(np.float64) == ref_mat).all(), "abundance mismatch"
    print(f"K21 PARITY PASS ({len(names)} groups, {abd.shape[1]} bins)")

    # ---- timed split-word pair sort at a headline shape --------------
    # 2^25 (hi, lo) windows — the one sort shape never timed on silicon
    # before r4. Consumes ALL sort outputs (CLAUDE.md: a key-only sort
    # lets XLA dead-code the payload).
    import time
    import jax
    import jax.numpy as jnp
    from pangaea_tpu.kernels.features import (kmer_key_sentinel_pair,
                                              sortjoin_bins_pair)
    from pangaea_tpu.utils import device_sync
    n = 1 << 25
    rng = np.random.default_rng(0)
    hi = rng.integers(0, 1 << 20, n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 22, n, dtype=np.uint32)
    shi, slo = kmer_key_sentinel_pair(21)
    inv = rng.random(n) < 0.1
    hi[inv], lo[inv] = shi, slo
    hi_d, lo_d = jnp.asarray(hi), jnp.asarray(lo)
    bins = sortjoin_bins_pair(hi_d, lo_d, k=21, window=10,
                              vector_size=400)
    device_sync(bins)  # compile + warm at the exact shape
    t0 = time.time()
    bins = sortjoin_bins_pair(hi_d, lo_d, k=21, window=10,
                              vector_size=400)
    device_sync(bins)
    dt = time.time() - t0
    print(f"PAIR SORTJOIN {n} windows: {dt*1e9/n:.2f} ns/window "
          f"({dt:.3f} s)")
    print("DRIVE OK")


if __name__ == "__main__":
    main()
