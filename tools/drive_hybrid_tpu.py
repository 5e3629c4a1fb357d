"""Hybrid-mode driver flow on the REAL TPU (r4 evidence gap).

The hybrid path (src/run_pangaea:167-218: long-read virtual barcodes ->
add_barcode srand(2023) draws -> assign_barcodes -> interleave -> sort)
had only CPU-backend coverage (tests/test_hybrid_e2e.py). This drive
runs it on the chip with the builtin TPU k-mer mapper doing the
short->long assignment, then continues through pipeline steps 1-3 to
clusters.tsv and scores barcode-assignment accuracy + binning ARI
against the known source genomes.

  PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
      python tools/drive_hybrid_tpu.py
"""
import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def rand_seq(n, rng, probs=None):
    if probs is None:
        return "".join("ACGT"[b] for b in rng.randint(0, 4, n))
    return "".join("ACGT"[b] for b in rng.choice(4, n, p=probs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genomes", type=int, default=4)
    ap.add_argument("--longs-per-genome", type=int, default=120)
    ap.add_argument("--pairs-per-long", type=int, default=15)
    args = ap.parse_args()

    import jax
    print("devices:", jax.devices(), flush=True)
    from pangaea_tpu.asm.tools import ToolRunner
    from pangaea_tpu.config import ClusterConfig, PangaeaConfig
    from pangaea_tpu.io.fastq import iter_fastq_records
    from pangaea_tpu.pipeline.driver import preprocess_reads
    from pangaea_tpu.pipeline.run import Pipeline
    from pangaea_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    tmp = tempfile.mkdtemp(prefix="drive_hybrid_")
    rng = np.random.RandomState(0)
    G, LPG, PPL = args.genomes, args.longs_per_genome, args.pairs_per_long
    win = 5_000
    # composition-biased genomes (like io/sim): binning needs a TNF
    # signal; each long read becomes ONE virtual barcode, so the number
    # of long reads is the clustering problem size
    genomes = [rand_seq(LPG * win, rng,
                        probs=rng.dirichlet(np.full(4, 1.5)))
               for _ in range(G)]
    long_fq = os.path.join(tmp, "long.fq")
    longs = []
    with open(long_fq, "w") as f:
        for gi, g in enumerate(genomes):
            for i in range(LPG):
                seq = g[i * win:(i + 1) * win]
                name = f"long_{gi}_{i}"
                longs.append((name, gi, i * win))
                f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    r1p, r2p = os.path.join(tmp, "s1.fq"), os.path.join(tmp, "s2.fq")
    truth_long = {}   # short name -> source long read
    truth_gen = {}    # long name -> genome id
    for name, gi, _ in longs:
        truth_gen[name] = gi
    with open(r1p, "w") as f1, open(r2p, "w") as f2:
        for name, gi, start in longs:
            g = genomes[gi]
            # distinct per-genome coverage => abundance signal too
            for p in range(PPL * (1 + gi)):
                pos = start + rng.randint(0, win - 400)
                frag = g[pos:pos + 400]
                sname = f"short_{name}_{p}"
                truth_long[sname] = name
                rc = frag[-150:].translate(
                    str.maketrans("ACGT", "TGCA"))[::-1]
                f1.write(f"@{sname}\n{frag[:150]}\n+\n{'I' * 150}\n")
                f2.write(f"@{sname}\n{rc}\n+\n{'I' * 150}\n")
    n_pairs = len(truth_long)
    print(f"hybrid sim: {n_pairs} pairs, {len(longs)} long reads, "
          f"{G} genomes", flush=True)

    ns = argparse.Namespace(short_type="short", reads1=r1p, reads2=r2p,
                            longreads=long_fq, index="", whitelist="",
                            output=os.path.join(tmp, "out"), threads=2)
    t0 = time.time()
    sorted_fq = preprocess_reads(
        ns, os.path.join(tmp, "out", "0_preprocess_reads"), ToolRunner())
    t_pre = time.time() - t0
    recs = list(iter_fastq_records(sorted_fq))
    good = total = 0
    for rec in recs[::2]:
        name = rec.header.split()[0].split("\t")[0]
        if "BX:Z:" in rec.header:
            bc = rec.header.split("BX:Z:")[1].split("-")[0]
            total += 1
            if truth_long.get(name) == bc:
                good += 1
    print(f"preprocess {t_pre:.1f}s: {total}/{n_pairs} barcoded, "
          f"assignment accuracy {good/max(total,1):.3f}", flush=True)
    assert total > n_pairs * 0.9
    assert good / total > 0.8

    cfg = PangaeaConfig(interleaved_reads=sorted_fq,
                        output=os.path.join(tmp, "run"), steps="1,2,3",
                        cluster=ClusterConfig(n_clusters=G))
    t0 = time.time()
    pipe = Pipeline(cfg)
    pipe.step1_features()
    pipe.step2_train()
    pipe.step3_cluster()
    t_steps = time.time() - t0

    m = {}
    with open(os.path.join(tmp, "run", "3.clustering",
                           "clusters.tsv")) as f:
        for line in f:
            cid, bcs = line.rstrip("\n").split("\t")
            for bc in bcs.split(","):
                m[bc.split("-")[0]] = cid
    from sklearn.metrics import adjusted_rand_score
    common = sorted(set(m) & set(truth_gen))
    assert common, "no cluster barcodes match long-read names"
    ari = adjusted_rand_score([truth_gen[b] for b in common],
                              [m[b] for b in common])
    print(f"steps 1-3 {t_steps:.1f}s: {len(common)} virtual barcodes "
          f"clustered, binning ARI vs genome truth = {ari:.4f}",
          flush=True)
    assert ari > 0.8, ari
    print("HYBRID DRIVE OK", flush=True)


if __name__ == "__main__":
    main()
