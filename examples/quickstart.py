#!/usr/bin/env python
"""Quickstart: simulate a small metagenome, run the binning pipeline,
score against ground truth.

    python examples/quickstart.py /tmp/pangaea_demo
"""

import os
import sys

import numpy as np


def main(outdir: str) -> None:
    from sklearn.metrics import adjusted_rand_score

    from pangaea_tpu.config import (ClusterConfig, FeatureConfig,
                                    ModelConfig, PangaeaConfig)
    from pangaea_tpu.io.sim import simulate_linked_reads
    from pangaea_tpu.pipeline import Pipeline

    os.makedirs(outdir, exist_ok=True)
    reads = os.path.join(outdir, "reads.fq.gz")
    print("simulating 5-species linked-read metagenome ...")
    res = simulate_linked_reads(out_interleaved=reads, n_species=5,
                                genome_len=40_000, n_barcodes=400,
                                pairs_per_barcode=40, seed=7)
    cfg = PangaeaConfig(
        interleaved_reads=reads,
        output=os.path.join(outdir, "out"),
        steps="1,2,3,4",
        feature=FeatureConfig(),
        model=ModelConfig(epochs=20, batch_size=128,
                          eval_every_batches=3),
        cluster=ClusterConfig(n_clusters=5, n_init=5),
    )
    Pipeline(cfg).run()

    tsv = os.path.join(cfg.output, "3.clustering", "clusters.tsv")
    lab, pred = [], []
    for line in open(tsv):
        cid, bcs = line.rstrip("\n").split("\t")
        for bc in bcs.split(","):
            if bc in res.barcode_species:
                lab.append(res.barcode_species[bc])
                pred.append(int(cid))
    print(f"binning ARI vs ground truth: "
          f"{adjusted_rand_score(lab, pred):.3f}")
    print(f"final assembly: {os.path.join(cfg.output, 'final_asm.fa')}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/pangaea_demo")
