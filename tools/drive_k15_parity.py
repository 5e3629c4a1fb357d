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

    # ---- paired quality-MASKED leg (the weighted sort-join) ON the chip:
    # error-injected heterogeneous-quality paired reads, masked dump,
    # reference count_kmer -1/-2 vs our weighted join
    from tools.refstack import run_count_kmer_paired
    r1 = os.path.join(d, "m_r1.fq.gz")
    r2 = os.path.join(d, "m_r2.fq.gz")
    mdump = os.path.join(d, "masked.dump")
    if not os.path.exists(r1):
        simulate_linked_reads(out_r1=r1, out_r2=r2, n_species=5,
                              genome_len=120_000,
                              n_barcodes=args.barcodes,
                              pairs_per_barcode=args.pairs,
                              error_rate=0.005, low_qual_rate=0.15,
                              seed=78)
        write_jellyfish_dump([r1, r2], mdump, k=15, min_qual_char="?")
    t0 = time.time()
    fe_m = FeatureExtractor(FeatureConfig(kmer=15),
                            os.path.join(d, "ours_masked"))
    fe_m.extract_features(reads1=r1, reads2=r2)
    print(f"TPU masked paired extraction: {time.time()-t0:.1f}s")
    ref_mabd = os.path.join(d, "ref_masked_abd.gz")
    run_count_kmer_paired(r1, r2, mdump, ref_mabd, k=15)
    mabd_eq = gz(fe_m.abd_gz) == gz(ref_mabd)
    print(f"masked paired k=15 parity: abundance byte-equal={mabd_eq}")
    assert mabd_eq
    print("MASKED PAIRED PARITY PASS")


if __name__ == "__main__":
    main()
