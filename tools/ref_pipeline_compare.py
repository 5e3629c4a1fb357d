#!/usr/bin/env python
"""Run the REFERENCE pipeline (verbatim, from /root/reference) and
pangaea_tpu on identical input, then compare features + bins.

BASELINE.md's correctness bar (VERDICT r1 item 3): byte-identical feature
tables and cluster-assignment agreement on the same data. The bundled
ATCC example is git-LFS-missing, so input is a simulated linked-read
dataset (io/sim.py) at a size given on the CLI (default >= 1M reads).

How the reference runs unmodified without jellyfish:

  * a script home is assembled in --out/ref_home from SYMLINKS into
    /root/reference/src (pangaea.py resolves script_path via
    os.path.abspath, which keeps symlinks, so `bin/` resolves to our
    /tmp/pangaea_ref_bin build of its own C++ tools);
  * jellyfish's outputs are pre-placed in ref_out/1.features —
    `abundance.k15.count` (placeholder) and `abundance.k15.dump` (exact
    canonical counts from tools/refstack.write_jellyfish_dump) — and
    feature.py's own resume logic (src/feature.py:72-104) skips the
    jellyfish invocations and runs count_kmer/count_tnf for real;
  * rph_kmeans imports from /root/reference/third_parties via PYTHONPATH
    with a stub `kneed` module (only k_selection needs it, which the
    pipeline never calls); its missing Cython reducer falls back to the
    py reducer by its own code path (rph_kmeans_.py:79-86).

Outputs a markdown report (--report, default REFCOMPARE.md in --out)
with: feature byte-equality at k=15, cluster agreement (ARI between the
two pipelines' clusters.tsv), both pipelines' ARI vs simulation truth,
and wall-clock for each stage.

Usage:
  python tools/ref_pipeline_compare.py --out /tmp/refcompare \
      --barcodes 10000 --pairs 50 --clusters 10
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_SRC = "/root/reference/src"
RPH_PATH = "/root/reference/third_parties/rph_kmeans"


def make_ref_home(base: str, bin_dir: str) -> str:
    """Symlink farm so the reference's script_path-relative lookups
    resolve: pangaea.py + its sibling modules + bin/ -> our build of the
    reference C++ tools."""
    home = os.path.join(base, "ref_home")
    os.makedirs(home, exist_ok=True)
    for name in ("pangaea.py", "feature.py", "data.py", "clustering.py",
                 "utils.py", "models", "scripts"):
        dst = os.path.join(home, name)
        if not os.path.lexists(dst):
            os.symlink(os.path.join(REF_SRC, name), dst)
    dst = os.path.join(home, "bin")
    if not os.path.lexists(dst):
        os.symlink(bin_dir, dst)
    stubs = os.path.join(base, "stubs")
    os.makedirs(stubs, exist_ok=True)
    with open(os.path.join(stubs, "kneed.py"), "w") as f:
        f.write("class KneeLocator:  # k_selection-only; never called\n"
                "    def __init__(self, *a, **k):\n"
                "        self.knee = None\n")
    # numpy-2 compat launcher: the reference uses np.Inf (removed in
    # numpy 2.0, src/utils.py:32); restore the alias, then execute the
    # reference verbatim
    with open(os.path.join(stubs, "run_ref.py"), "w") as f:
        f.write("import sys\n"
                "import numpy as np\n"
                "if not hasattr(np, 'Inf'):\n"
                "    np.Inf = np.inf\n"
                "import runpy\n"
                "path = sys.argv.pop(1)\n"
                "sys.argv[0] = path\n"
                "runpy.run_path(path, run_name='__main__')\n")
    return home


def run_reference(home: str, stubs: str, fq, out: str, dump: str,
                  k: int, clusters: int, threads: int,
                  steps: str = "1,2,3") -> float:
    """fq: interleaved path, or an (r1, r2) tuple for the paired
    (quality-masked jellyfish) flow, src/feature.py:76-86."""
    feat = os.path.join(out, "1.features")
    os.makedirs(feat, exist_ok=True)
    # pre-place jellyfish artifacts: feature.py:72,101-104 skips the
    # jellyfish calls when .count and .dump exist
    with open(os.path.join(feat, f"abundance.k{k}.count"), "w") as f:
        f.write("placeholder: jellyfish not installed; dump precomputed\n")
    with open(dump) as src, \
            open(os.path.join(feat, f"abundance.k{k}.dump"), "w") as dst:
        dst.write(src.read())
    env = dict(os.environ)
    # home first: pangaea.py is launched via the compat shim, so its own
    # directory is not sys.path[0] the way `python pangaea.py` would set it
    env["PYTHONPATH"] = f"{home}:{RPH_PATH}:{stubs}"
    env.pop("JAX_PLATFORMS", None)
    inp = (["-i", fq] if isinstance(fq, str)
           else ["-1", fq[0], "-2", fq[1]])
    argv = [sys.executable, os.path.join(stubs, "run_ref.py"),
            os.path.join(home, "pangaea.py"),
            *inp, "-o", out, "-k", str(k), "-c", str(clusters),
            "-t", str(threads), "-st", steps]
    t0 = time.time()
    r = subprocess.run(argv, env=env, capture_output=True, text=True)
    dt = time.time() - t0
    if r.returncode:
        raise RuntimeError(f"reference pipeline failed:\n{r.stdout[-2000:]}"
                           f"\n{r.stderr[-4000:]}")
    return dt


def run_ours(fq, out: str, k: int, clusters: int,
             steps: str = "1,2,3", backend: str = "") -> float:
    if backend:
        # the axon TPU plugin ignores JAX_PLATFORMS; force via jax.config
        import jax
        jax.config.update("jax_platforms", backend)
    from pangaea_tpu.config import (ClusterConfig, FeatureConfig,
                                    PangaeaConfig)
    from pangaea_tpu.pipeline.run import Pipeline
    from pangaea_tpu.utils import init_all
    inp = (dict(interleaved_reads=fq) if isinstance(fq, str)
           else dict(reads1=fq[0], reads2=fq[1]))
    cfg = PangaeaConfig(
        output=out, steps=steps, **inp,
        feature=FeatureConfig(kmer=k),
        cluster=ClusterConfig(n_clusters=clusters))
    import logging
    os.makedirs(out, exist_ok=True)
    init_all(seed=2021, threads=os.cpu_count(), logfile="log",
             level=logging.INFO, outdir=out)
    t0 = time.time()
    Pipeline(cfg).run()
    return time.time() - t0


def gz_text(path: str) -> bytes:
    with gzip.open(path, "rb") as f:
        return f.read()


def load_clusters_tsv(path: str) -> dict:
    bc2label = {}
    with open(path) as f:
        for line in f:
            cid, bcs = line.rstrip("\n").split("\t")
            for bc in bcs.split(","):
                bc2label[bc] = int(cid)
    return bc2label


def _norm_keys(m: dict) -> dict:
    """clusters.tsv barcodes may or may not carry the BX '-1' suffix
    depending on the input header form; compare on the stripped value."""
    return {(k[:-2] if k.endswith("-1") else k): v for k, v in m.items()}


def ari(map_a: dict, map_b: dict) -> float:
    from sklearn.metrics import adjusted_rand_score
    map_a, map_b = _norm_keys(map_a), _norm_keys(map_b)
    common = sorted(set(map_a) & set(map_b))
    if not common:
        # an empty intersection silently scores 1.0 — that bug hid
        # key-format mismatches behind perfect-looking truth columns
        raise RuntimeError(
            f"ari(): no common barcodes (sample keys "
            f"{list(map_a)[:2]} vs {list(map_b)[:2]})")
    a = [map_a[x] for x in common]
    b = [map_b[x] for x in common]
    return float(adjusted_rand_score(a, b))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--barcodes", type=int, default=10_000)
    ap.add_argument("--pairs", type=int, default=50)
    ap.add_argument("--species", type=int, default=10)
    ap.add_argument("--genome-len", type=int, default=300_000)
    ap.add_argument("--clusters", type=int, default=10)
    ap.add_argument("--k", type=int, default=15)
    ap.add_argument("--threads", type=int, default=os.cpu_count())
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--error-rate", type=float, default=0.0,
                    help="per-base substitution rate (errored bases get "
                         "low quality)")
    ap.add_argument("--low-qual-rate", type=float, default=0.0,
                    help="extra fraction of bases drawn below '?' "
                         "(exercises the masked global pass)")
    ap.add_argument("--paired", action="store_true",
                    help="feed both pipelines -1/-2 paired files: the "
                         "reference's quality-masked jellyfish flow "
                         "(src/feature.py:76-86); the dump is masked")
    ap.add_argument("--hard", action="store_true",
                    help="hard mixture (VERDICT r3 item 5): half the "
                         "species are 97%%-ANI siblings of the other "
                         "half, Zipf abundances, a 5%% shared "
                         "plasmid-like segment — a regime where the "
                         "reference itself scores ARI < 1")
    ap.add_argument("--realistic", action="store_true",
                    help="realistic reads (VERDICT r4 item 4): 1%% "
                         "indels (homopolymer-style), read-length sd 12, "
                         "2%% uncorrected barcode errors — on top of "
                         "whatever --error-rate/--low-qual-rate say")
    ap.add_argument("--report", default="")
    ap.add_argument("--ours-backend", default="",
                    help="force a jax backend for our side (e.g. cpu)")
    args = ap.parse_args()

    from tools.refstack import build_ref_tools, BIN, write_jellyfish_dump
    if not build_ref_tools(["count_kmer", "count_tnf", "extract_reads"]):
        raise SystemExit("cannot build reference tools")

    base = args.out
    os.makedirs(base, exist_ok=True)
    r1 = os.path.join(base, "reads_1.fq.gz")
    r2 = os.path.join(base, "reads_2.fq.gz")
    inter = os.path.join(base, "reads.fq.gz")
    fq = (r1, r2) if args.paired else inter
    dump = os.path.join(base, "table.dump")
    truth_json = os.path.join(base, "truth.json")
    have = ((os.path.exists(r1) and os.path.exists(r2)) if args.paired
            else os.path.exists(inter))
    if not (have and os.path.exists(dump)):
        from pangaea_tpu.io.sim import simulate_linked_reads
        print(f"simulating {args.barcodes * args.pairs * 2} reads ...")
        kw = (dict(out_r1=r1, out_r2=r2) if args.paired
              else dict(out_interleaved=inter))
        if args.hard:
            # ani=0.95 (not 0.97): at 0.97+zipf the REFERENCE side's
            # point reducer collapses the latent below n_clusters and
            # rph_kmeans raises ('Number of reduced points is too
            # small', rph_kmeans_.py:120) — ours completes there (ARI
            # 0.71), but the comparison needs both sides to finish
            kw.update(ani_siblings=args.species // 2, ani=0.95,
                      abundance="zipf", shared_segment_frac=0.05)
        if args.realistic:
            kw.update(indel_rate=0.01, read_len_sd=12.0,
                      barcode_error_rate=0.02)
        res = simulate_linked_reads(
            n_species=args.species, genome_len=args.genome_len,
            n_barcodes=args.barcodes, pairs_per_barcode=args.pairs,
            error_rate=args.error_rate, low_qual_rate=args.low_qual_rate,
            seed=args.seed, **kw)
        # the paired flow masks the global count (--min-qual-char=?)
        n_reads = write_jellyfish_dump(
            [r1, r2] if args.paired else inter, dump, k=args.k,
            min_qual_char="?" if args.paired else "")
        with open(truth_json, "w") as f:
            json.dump({"barcode_species": res.barcode_species,
                       "n_reads": n_reads}, f)
    with open(truth_json) as f:
        truth = json.load(f)
    n_reads = truth["n_reads"]

    home = make_ref_home(base, BIN)
    stubs = os.path.join(base, "stubs")
    ref_out = os.path.join(base, "ref_out")
    ours_out = os.path.join(base, "ours_out")
    os.makedirs(ref_out, exist_ok=True)

    print("running reference pipeline (steps 1-3) ...")
    t_ref = run_reference(home, stubs, fq, ref_out, dump, args.k,
                          args.clusters, args.threads)
    print(f"reference done in {t_ref:.1f}s; running ours ...")
    t_ours = run_ours(fq, ours_out, args.k, args.clusters,
                      backend=args.ours_backend)
    print(f"ours done in {t_ours:.1f}s; comparing ...")

    stem = f"abundance.k{args.k}.v400.w10.m2000.gz"
    abd_equal = (gz_text(os.path.join(ref_out, "1.features", stem))
                 == gz_text(os.path.join(ours_out, "1.features", stem)))
    tnf_equal = (gz_text(os.path.join(ref_out, "1.features", "tnf.m2000.gz"))
                 == gz_text(os.path.join(ours_out, "1.features",
                                         "tnf.m2000.gz")))

    ref_map = load_clusters_tsv(os.path.join(ref_out, "3.clustering",
                                             "clusters.tsv"))
    our_map = load_clusters_tsv(os.path.join(ours_out, "3.clustering",
                                             "clusters.tsv"))
    truth_map = dict(truth["barcode_species"])  # raw-barcode keys
    cross = ari(ref_map, our_map)
    ref_truth = ari(ref_map, truth_map)
    our_truth = ari(our_map, truth_map)

    report = args.report or os.path.join(base, "REFCOMPARE.md")
    lines = [
        "# Reference-pipeline comparison",
        "",
        f"Input: {n_reads} simulated linked reads "
        f"({args.barcodes} barcodes x {args.pairs} pairs, "
        f"{args.species} species, genome {args.genome_len} bp, "
        f"seed {args.seed}, error rate {args.error_rate}, "
        f"low-qual rate {args.low_qual_rate}, "
        f"{'PAIRED -1/-2 (masked jellyfish)' if args.paired else 'interleaved'}); "
        f"k={args.k}, clusters={args.clusters}, "
        f"threads={args.threads} (host: {os.cpu_count()} CPUs).",
        "",
        "Reference ran VERBATIM from /root/reference (steps 1-3; its own",
        "feature.py resume logic consumed a precomputed jellyfish dump —",
        "jellyfish is not installed; same dump content both sides).",
        "",
        "| check | result |",
        "|---|---|",
        f"| abundance CSV byte-equal (k={args.k}) | **{abd_equal}** |",
        f"| TNF CSV byte-equal | **{tnf_equal}** |",
        f"| cluster agreement ARI (ref vs ours) | **{cross:.4f}** |",
        f"| reference ARI vs simulation truth | {ref_truth:.4f} |",
        f"| ours ARI vs simulation truth | {our_truth:.4f} |",
        f"| reference wall (steps 1-3) | {t_ref:.1f} s |",
        f"| ours wall (steps 1-3) | {t_ours:.1f} s |",
        "",
        f"Barcode sets: ref={len(ref_map)} ours={len(our_map)} "
        f"common={len(set(ref_map) & set(our_map))}.",
    ]
    with open(report, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nreport -> {report}")


if __name__ == "__main__":
    main()
