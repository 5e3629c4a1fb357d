#!/usr/bin/env python
"""Phase timers inside the e2e FASTQ->features flow at the bench
geometry: host chunk build, per-batch key/TNF dispatch, sort, replay,
D2H. Monkey-patches timing hooks around FeatureExtractor internals; each
phase syncs (overstating overlap-able phases) — use to find the big one,
not to sum.

  PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python \
      tools/profile_e2e.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

os.environ.setdefault(
    "BENCH_DATA_DIR", "/tmp/pangaea_bench_data/v1_3000x40")

import jax
import jax.numpy as jnp

from bench import prepare_dataset, K, TNFK, WINDOW, VEC, MIN_LEN
from pangaea_tpu.config import FeatureConfig
from pangaea_tpu import features as fmod
from pangaea_tpu.features import FeatureExtractor
from pangaea_tpu.utils import device_sync, enable_compilation_cache

enable_compilation_cache()


def main():
    print("backend:", jax.default_backend(), flush=True)
    ds = prepare_dataset()
    cfg = FeatureConfig(kmer=K, tnf_kmer=TNFK, window_size=WINDOW,
                        vector_size=VEC, min_length=MIN_LEN)

    t = {}

    def wrap(obj, name, key, sync=False):
        orig = getattr(obj, name)

        def timed(*a, **kw):
            t0 = time.time()
            out = orig(*a, **kw)
            if sync:
                device_sync(out)
            t[key] = t.get(key, 0.0) + time.time() - t0
            t[key + "_n"] = t.get(key + "_n", 0) + 1
            return out
        setattr(obj, name, timed)

    saved = {n: getattr(fmod, n) for n in
             ("tnf_histogram_segsum", "abundance_histogram_from_bins")}
    for run in ("warm", "timed"):
        t.clear()
        for n, f in saved.items():
            setattr(fmod, n, f)
        fe = FeatureExtractor(cfg, f"/tmp/prof_e2e_{run}")
        wrap(fe, "_sortjoin_chunks", "estimate+open")
        wrap(fe, "_batch_keys", "keys_dispatch")
        wrap(fe, "_device_chunk_batches", "upload_gen")
        wrap(fe, "_sortjoin_bins_dispatch", "sort_sync", sync=True)
        wrap(fmod, "tnf_histogram_segsum", "tnf_dispatch")
        wrap(fmod, "abundance_histogram_from_bins", "hist_dispatch")
        t0 = time.time()
        names, abd, tnf = fe.extract_features(interleaved=ds["fq"])
        wall = time.time() - t0
        if run == "warm":
            print(f"warm wall: {wall:.2f}s", flush=True)
            continue
        print(f"timed wall: {wall:.2f}s  groups={len(names)}")
        for k in sorted(t):
            if k.endswith("_n"):
                continue
            print(f"  {k:16s} {t[k]*1e3:9.1f} ms  x{t.get(k+'_n', 0)}")


if __name__ == "__main__":
    main()
