#!/usr/bin/env python
"""k=15 feature byte-parity vs the reference binaries ON THE REAL TPU
(VERDICT r1 item 8: the CI parity suite runs k=11/k=21 on the CPU
backend; this drives the default k=15 — 4 GiB dense-table territory,
sort-join path — on hardware and compares against the compiled
count_kmer/count_tnf on the same FASTQ).

  PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python \
      tools/drive_k15_parity.py [--barcodes N] [--pairs N]
"""

import argparse
import gzip
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--barcodes", type=int, default=600)
    ap.add_argument("--pairs", type=int, default=30)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    assert jax.default_backend() == "tpu", jax.default_backend()

    from pangaea_tpu.config import FeatureConfig
    from pangaea_tpu.features import FeatureExtractor
    from pangaea_tpu.io.sim import simulate_linked_reads
    from tools.refstack import (BIN, build_ref_tools, run_count_kmer,
                                run_count_tnf, write_jellyfish_dump)

    if not build_ref_tools():
        raise SystemExit("cannot build reference tools")
    d = args.out or tempfile.mkdtemp(prefix="k15_parity_")
    os.makedirs(d, exist_ok=True)
    fq = os.path.join(d, "reads.fq.gz")
    dump = os.path.join(d, "table.dump")
    if not os.path.exists(fq):
        simulate_linked_reads(out_interleaved=fq, n_species=5,
                              genome_len=120_000, n_barcodes=args.barcodes,
                              pairs_per_barcode=args.pairs, seed=77)
        write_jellyfish_dump(fq, dump, k=15)

    t0 = time.time()
    fe = FeatureExtractor(FeatureConfig(kmer=15), os.path.join(d, "ours"))
    fe.extract_features(interleaved=fq)
    print(f"TPU extraction ({jax.devices()[0]}): {time.time()-t0:.1f}s")

    ref_abd = os.path.join(d, "ref_abd.gz")
    ref_tnf = os.path.join(d, "ref_tnf.gz")
    run_count_kmer(fq, dump, ref_abd, k=15)
    run_count_tnf(fq, ref_tnf)

    def gz(p):
        with gzip.open(p, "rb") as f:
            return f.read()

    abd_eq = gz(fe.abd_gz) == gz(ref_abd)
    tnf_eq = gz(fe.tnf_gz) == gz(ref_tnf)
    n = args.barcodes * args.pairs * 2
    print(f"k=15 parity on {n} reads: abundance byte-equal={abd_eq}, "
          f"tnf byte-equal={tnf_eq}")
    assert abd_eq and tnf_eq
    print("K15 PARITY PASS")


if __name__ == "__main__":
    main()
