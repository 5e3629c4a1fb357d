#!/usr/bin/env python
"""Phase timers inside the e2e FASTQ->features flow at the bench
geometry. Times where the CONSUMER loop actually blocks:

  pipeline_wait - next() on the pipelined event stream (parse + pack +
                 upload run in producer threads; this is the stall the
                 pipeline could NOT hide behind dispatch)
  keys/tnf/hist dispatch - async kernel dispatch (cheap unless the
                 dispatch queue itself blocks)
  sort_sync    - device_sync on the sort output (device compute + any
                 still-queued uploads ahead of it)
  tail         - everything after (replay dispatch + final D2H + save)

  PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python \
      tools/profile_e2e.py
"""

import os
import sys
import tempfile
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

    def add(key, dt):
        t[key] = t.get(key, 0.0) + dt
        t[key + "_n"] = t.get(key + "_n", 0) + 1

    def timed_iter(it, key):
        it = iter(it)
        while True:
            t0 = time.time()
            try:
                item = next(it)
            except StopIteration:
                return
            add(key, time.time() - t0)
            yield item

    def wrap_call(obj, name, key, sync=False):
        orig = getattr(obj, name)

        def timed(*a, **kw):
            t0 = time.time()
            out = orig(*a, **kw)
            if sync:
                device_sync(out)
            add(key, time.time() - t0)
            return out
        setattr(obj, name, timed)

    saved = {n: getattr(fmod, n) for n in
             ("tnf_histogram_segsum", "abundance_histogram_from_bins")}
    import pangaea_tpu.io.prefetch as pfmod
    orig_prefetch = pfmod.prefetch
    for run in ("warm", "timed"):
        t.clear()
        for n, f in saved.items():
            setattr(fmod, n, f)
        pfmod.prefetch = lambda it, depth=2: timed_iter(
            orig_prefetch(it, depth), "pipeline_wait")
        # fresh dir every run: a reused dir has cached feature artifacts
        # and extract_features would just load them (zero phases timed)
        fe = FeatureExtractor(cfg, tempfile.mkdtemp(prefix=f"prof_{run}_"))
        ub = os.environ.get("PANGAEA_UPLOAD_BATCHES")
        if ub:
            fe._upload_batches = int(ub)
        wrap_call(fe, "_batch_keys", "keys_dispatch")
        wrap_call(fe, "_sortjoin_bins_dispatch", "sort_sync", sync=True)
        wrap_call(fe, "_save", "save")
        wrap_call(fe, "_auto_row_len", "row_len_scan")
        wrap_call(fe, "_estimate_stream_windows", "estimate")
        wrap_call(fmod, "tnf_histogram_segsum", "tnf_dispatch")
        wrap_call(fmod, "abundance_histogram_from_bins", "hist_dispatch")
        t0 = time.time()
        names, abd, tnf = fe.extract_features(interleaved=ds["fq"])
        wall = time.time() - t0
        pfmod.prefetch = orig_prefetch
        if run == "warm":
            print(f"warm wall: {wall:.2f}s", flush=True)
            continue
        print(f"timed wall: {wall:.2f}s  groups={len(names)}")
        for k_, v in getattr(fe, "_phase_times", {}).items():
            print(f"  [{k_}] {v*1e3:9.1f} ms")
        acct = 0.0
        for k in sorted(t):
            if k.endswith("_n"):
                continue
            acct += t[k]
            print(f"  {k:16s} {t[k]*1e3:9.1f} ms  x{t.get(k+'_n', 0)}")
        print(f"  {'tail (rest)':16s} {(wall-acct)*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
