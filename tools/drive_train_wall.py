"""Measure the per-stage pipeline wall on the real TPU at driver geometry.

r3's hardware driver run (PARITY.md) measured: features 44.6 s, VAE
training 99.8 s, clustering 6.3 s for 100k error-injected reads — with
the training wall dominated by ~200 tunnel round trips (one dispatch per
eval cadence: reference contract src/models/VAENET.py:64-91). This drive
reproduces that geometry through pipeline steps 1-3 and prints the stage
walls plus the fused trainer's phase split (VERDICT r3 item 1).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
      python tools/drive_train_wall.py [--reads 100000] [--out DIR]
"""
import argparse
import logging
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=100_000)
    ap.add_argument("--out", default="/tmp/train_wall_drive")
    ap.add_argument("--loop", choices=("fused", "stepwise"),
                    default="fused")
    args = ap.parse_args()
    os.environ["PANGAEA_TRAIN_LOOP"] = args.loop

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    from pangaea_tpu.config import PangaeaConfig
    from pangaea_tpu.io.sim import simulate_linked_reads
    from pangaea_tpu.pipeline.run import Pipeline
    from pangaea_tpu.utils import enable_compilation_cache
    enable_compilation_cache()  # the CLI path does this via init_all

    out = args.out
    os.makedirs(out, exist_ok=True)
    inter = os.path.join(out, "reads.fq.gz")
    n_pairs = args.reads // 2
    n_barcodes = max(1, n_pairs // 40)
    if not os.path.exists(inter):
        t0 = time.time()
        sim = simulate_linked_reads(
            out_interleaved=inter, n_species=8, genome_len=300_000,
            n_barcodes=n_barcodes, pairs_per_barcode=40, read_len=150,
            error_rate=0.005, low_qual_rate=0.15, seed=11)
        print(f"sim: {n_pairs*2} reads, {n_barcodes} barcodes "
              f"({time.time()-t0:.1f} s)", flush=True)

    cfg = PangaeaConfig(interleaved_reads=inter,
                        output=os.path.join(out, "run"), steps="1,2,3")
    cfg.cluster.n_clusters = 8
    pipe = Pipeline(cfg)
    walls = {}
    for name, fn in (("features", pipe.step1_features),
                     ("train", pipe.step2_train),
                     ("cluster", pipe.step3_cluster)):
        t0 = time.time()
        fn()
        walls[name] = time.time() - t0
        print(f"STAGE {name}: {walls[name]:.1f} s", flush=True)
    print("WALLS", {k: round(v, 1) for k, v in walls.items()}, flush=True)


if __name__ == "__main__":
    sys.exit(main())
