"""Genome-scale driver soak past the spill cap (VERDICT r3 item 7).

Pushes >= 2.5M reads (> the 256M-window single-sort cap, so step 1 runs
the chunked host-spill sort-join) through the REAL driver path on
hardware, as small retryable units:

  unit 0: simulate + pair-shuffle the raw unsorted interleaved FASTQ
  unit 1: step-0 external barcode sort (C++ radix backend)
  units 2-5: pipeline steps 1..4 via pangaea_tpu.pipeline.cli, each in
      its own subprocess under a timeout, retried on transient backend
      deaths (markers make every step resumable)

Records per-unit wall, child peak RSS, and retry events to --log (also
stdout). Reference contract: count_kmer.cpp:186-292 + jellyfish's
RAM-bounded streaming — arbitrary input size on one box.

  PYTHONPATH=/root/repo:/root/.axon_site nohup python tools/drive_soak.py \
      --out /tmp/soak --reads 2500000 &
"""
import argparse
import json
import os
import resource
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def log(msg, path):
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    with open(path, "a") as f:
        f.write(line + "\n")


def run_unit(argv, what, logp, timeout_s, retries=3):
    """Run a child; retry on transient device errors (including a child
    that outlasts timeout_s — wedges recover in ~10-20 min, so a timeout
    IS the transient this tool exists for). Returns (wall,
    cumulative_child_maxrss_gib, attempts). RSS is ru_maxrss over ALL
    children so far — a cumulative peak, not per-unit (the kernel
    counter cannot be reset per child)."""
    attempts = 0
    while True:
        attempts += 1
        t0 = time.time()
        try:
            r = subprocess.run(argv, capture_output=True, text=True,
                               timeout=timeout_s)
        except subprocess.TimeoutExpired:
            wall = time.time() - t0
            log(f"{what} attempt {attempts} TIMED OUT after {wall:.0f}s "
                "(treated as a transient wedge)", logp)
            if attempts > retries:
                raise RuntimeError(f"{what} timed out {attempts} times")
            delay = min(720, 120 * attempts)
            log(f"{what}: retrying in {delay}s", logp)
            time.sleep(delay)
            continue
        wall = time.time() - t0
        rss = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
        rss_gib = rss / (1 << 20)
        if r.returncode == 0:
            return wall, rss_gib, attempts
        transient = any(m in (r.stderr + r.stdout) for m in
                        ("FAILED_PRECONDITION", "TPU backend error",
                         "DEADLINE_EXCEEDED", "UNAVAILABLE"))
        log(f"{what} attempt {attempts} FAILED "
            f"(transient={transient}): {r.stderr[-400:]}", logp)
        if not transient or attempts > retries:
            raise RuntimeError(f"{what} failed:\n{r.stderr[-3000:]}")
        delay = min(720, 120 * attempts)
        log(f"{what}: retrying in {delay}s", logp)
        time.sleep(delay)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/soak")
    ap.add_argument("--reads", type=int, default=2_500_000)
    ap.add_argument("--steps", default="0,1,2,3,4")
    ap.add_argument("--spill-dir", default="",
                    help="forward to the CLI: disk-backed spill "
                         "(flat host RSS)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    logp = os.path.join(args.out, "soak.log")
    results = {}
    steps = args.steps.split(",")

    n_pairs = args.reads // 2
    n_bc = n_pairs // 40
    raw = os.path.join(args.out, "raw_unsorted.fq")

    if "0" in steps and not os.path.exists(raw):
        from pangaea_tpu.io.sim import simulate_linked_reads
        import numpy as np
        t0 = time.time()
        srt = os.path.join(args.out, "sim_sorted.fq")
        if not os.path.exists(srt):
            simulate_linked_reads(
                out_interleaved=srt + ".tmp", n_species=10,
                genome_len=400_000, n_barcodes=n_bc,
                pairs_per_barcode=40, read_len=150, error_rate=0.005,
                low_qual_rate=0.15, seed=31)
            os.replace(srt + ".tmp", srt)
        # pair-block shuffle, bytes-based (one small object per pair —
        # the old splitlines list held every LINE as a str and tripled
        # RSS at the 10M-read scale)
        blocks = []
        with open(srt, "rb") as f:
            while True:
                b = b"".join(f.readline() for _ in range(8))
                if not b:
                    break
                blocks.append(b)
        rng = np.random.RandomState(7)
        rng.shuffle(blocks)
        with open(raw + ".tmp", "wb") as f:
            for b in blocks:
                f.write(b)
        os.replace(raw + ".tmp", raw)
        os.unlink(srt)
        results["sim"] = {"wall": round(time.time() - t0, 1)}
        log(f"sim+shuffle: {results['sim']['wall']}s "
            f"({args.reads} reads, {n_bc} barcodes)", logp)

    sorted_fq = os.path.join(args.out, "interleaved.sorted.fastq")
    if "1" in steps and not os.path.exists(sorted_fq):
        t0 = time.time()
        from pangaea_tpu.io.fastq import barcode_sort_interleaved
        barcode_sort_interleaved(raw, sorted_fq + ".tmp")
        os.replace(sorted_fq + ".tmp", sorted_fq)
        results["sort0"] = {
            "wall": round(time.time() - t0, 1),
            "mb": round(os.path.getsize(sorted_fq) / 1e6)}
        log(f"step0 radix sort: {results['sort0']}", logp)

    rundir = os.path.join(args.out, "run")
    for st in ("1", "2", "3", "4"):
        if st not in steps:
            continue
        argv = [sys.executable, "-m", "pangaea_tpu.pipeline.cli",
                "-i", sorted_fq, "-o", rundir, "-c", "10", "-st", st]
        if args.spill_dir:
            argv += ["--spill_dir", args.spill_dir]
        wall, rss, att = run_unit(argv, f"step{st}", logp,
                                  timeout_s=4 * 3600)
        results[f"step{st}"] = {"wall": round(wall, 1),
                                "rss_cum_peak_gib": round(rss, 2),
                                "attempts": att}
        log(f"step{st}: {results[f'step{st}']}", logp)

    log("SOAK RESULT " + json.dumps(results), logp)


if __name__ == "__main__":
    main()
