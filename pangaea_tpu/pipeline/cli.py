"""CLI mirroring the reference's argparse surface (src/pangaea.py:129-175).

Usage: ``python -m pangaea_tpu.pipeline.cli -i reads.fq.gz -o out -c 30``
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

from pangaea_tpu.config import (AssemblyConfig, ClusterConfig, FeatureConfig,
                                ModelConfig, PangaeaConfig)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pangaea_tpu")
    p.add_argument("-1", "--reads1", default="",
                   help="path to reads1 file (linked-reads)")
    p.add_argument("-2", "--reads2", default="",
                   help="path to reads2 file (linked-reads)")
    p.add_argument("-i", "--interleaved_reads", default="",
                   help="path to interleaved reads file")
    p.add_argument("-o", "--output", required=True, help="output directory")
    # feature
    p.add_argument("-l", "--min_length", type=int, default=2000)
    p.add_argument("-k", "--kmer", type=int, default=15)
    p.add_argument("-tnf_k", "--tnf_kmer", type=int, default=4)
    p.add_argument("-s", "--window_size", type=int, default=10)
    p.add_argument("-v", "--vector_size", type=int, default=400)
    # model
    p.add_argument("-r", "--lr", type=float, default=0.005)
    p.add_argument("-w", "--weight_decay", type=float, default=0.0001)
    p.add_argument("-e", "--epochs", type=int, default=100)
    p.add_argument("-b", "--batch_size", type=int, default=2048)
    p.add_argument("-d", "--dropout", type=float, default=0.2)
    p.add_argument("-p", "--patience", type=int, default=20)
    p.add_argument("-wa", "--weight_alpha", type=float, default=0.1)
    p.add_argument("-wk", "--weight_kl", type=float, default=0.015)
    p.add_argument("-ld", "--latent_dim", type=int, default=32)
    p.add_argument("--matmul_dtype", choices=("float32", "bfloat16"),
                   default="float32",
                   help="VAE matmul precision: bfloat16 runs the MXU in "
                        "bf16 with fp32 accumulation (faster; reference "
                        "numerics are float32)")
    # others
    p.add_argument("-c", "--clusters", type=int, default=None)
    p.add_argument("--cluster_device_min_elems", type=int,
                   default=ClusterConfig.device_min_elems,
                   help="latent-matrix elements below which step-3 "
                        "clustering runs on the host CPU backend "
                        "(tunneled-TPU round trips dominate tiny fits)")
    p.add_argument("--spill_store",
                   choices=("auto", "device", "host", "disk"),
                   default="auto",
                   help="where past-the-cap spill run-ids live "
                        "(config.FeatureConfig.spill_store)")
    p.add_argument("--spill_dir", default=None,
                   help="directory for disk-backed spill files "
                        "(flat host RSS; implies spill_store=disk "
                        "under 'auto')")
    p.add_argument("-m", "--metaphlan_db", type=str, default="")
    p.add_argument("-t", "--threads", type=int, default=0)
    p.add_argument("-sp", "--spades", type=str, default="")
    p.add_argument("-lc", "--local_assembly", type=str, default="")
    p.add_argument("-at", "--athena", type=str, default="")
    p.add_argument("-lt", "--low_abd_cut", type=str, default="10,30")
    p.add_argument("-la", "--low_assembler", type=str, default="megahit")
    p.add_argument("-st", "--steps", type=str, default="1,2,3,4")
    return p


def config_from_args(args: argparse.Namespace) -> PangaeaConfig:
    return PangaeaConfig(
        reads1=args.reads1, reads2=args.reads2,
        interleaved_reads=args.interleaved_reads,
        output=args.output, threads=args.threads,
        spades=args.spades, local_assembly=args.local_assembly,
        athena=args.athena, metaphlan_db=args.metaphlan_db,
        steps=args.steps,
        feature=FeatureConfig(
            kmer=args.kmer, tnf_kmer=args.tnf_kmer,
            window_size=args.window_size, vector_size=args.vector_size,
            min_length=args.min_length,
            spill_store=getattr(args, "spill_store", "auto"),
            spill_dir=getattr(args, "spill_dir", None)),
        model=ModelConfig(
            latent_dim=args.latent_dim, lr=args.lr,
            weight_decay=args.weight_decay, epochs=args.epochs,
            batch_size=args.batch_size, dropout=args.dropout,
            patience=args.patience, weight_alpha=args.weight_alpha,
            weight_kl=args.weight_kl,
            matmul_dtype=getattr(args, "matmul_dtype", "float32")),
        cluster=ClusterConfig(
            n_clusters=args.clusters,
            device_min_elems=getattr(args, "cluster_device_min_elems",
                                     ClusterConfig.device_min_elems)),
        assembly=AssemblyConfig(low_abd_cut=args.low_abd_cut,
                                low_assembler=args.low_assembler),
    )


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    from pangaea_tpu.utils import init_all
    init_all(seed=cfg.model.seed, threads=cfg.threads, logfile="log",
             level=logging.INFO, outdir=cfg.output)
    logging.info("command: " + " ".join(sys.argv))
    from pangaea_tpu.pipeline.run import Pipeline
    Pipeline(cfg).run()


if __name__ == "__main__":
    main()
