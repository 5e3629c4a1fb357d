#!/usr/bin/env python
"""Characterize host->device transfer cost on this backend: is it
bandwidth-bound or per-transfer-latency-bound, and do transfers of
separate arrays pipeline?

The e2e feature pass ships 4 arrays per batch (packed codes, lengths,
seg_ids, cont — ~800 KB total) x ~15 batches and measured ~270 ms of
per-batch overhead on the tunneled dev chip (PARITY.md). If the cost is
per-CALL latency, fusing each batch's arrays into ONE buffer (or
shipping several batches per transfer) is the fix; if it is bandwidth,
nothing short of more compression helps.

  PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python \
      tools/ab_transfer.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pangaea_tpu.utils import device_sync, enable_compilation_cache

enable_compilation_cache()

REPS = 5


def timed(label, fn):
    # sync the warm-up: on the async tunnel backend an in-flight warm
    # transfer would queue ahead of the first timed rep and inflate
    # small-transfer latencies
    device_sync(fn())
    t0 = time.time()
    for _ in range(REPS):
        out = fn()
    device_sync(out)
    dt = (time.time() - t0) / REPS
    print(f"{label}: {dt*1e3:8.1f} ms", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    one_mb = rng.randint(0, 255, 1 << 20, dtype=np.uint8)
    bufs = {s: rng.randint(0, 255, s, dtype=np.uint8)
            for s in (1 << 10, 1 << 16, 1 << 20, 800 << 10, 8 << 20,
                      64 << 20)}

    @jax.jit
    def consume(x):
        return jnp.sum(x, dtype=jnp.int32)

    for s, b in bufs.items():
        timed(f"1 transfer of {s>>10:6d} KiB", lambda b=b: consume(
            jax.device_put(b)))

    # 4 separate arrays (one batch's worth) vs one fused buffer
    parts = [rng.randint(0, 255, 200 << 10, dtype=np.uint8)
             for _ in range(4)]
    fused = np.concatenate(parts)

    @jax.jit
    def consume4(a, b, c, d):
        return (jnp.sum(a, dtype=jnp.int32) + jnp.sum(b, dtype=jnp.int32)
                + jnp.sum(c, dtype=jnp.int32) + jnp.sum(d, dtype=jnp.int32))

    timed("4 x 200 KiB separate ", lambda: consume4(*[jax.device_put(p)
                                                      for p in parts]))
    timed("1 x 800 KiB fused    ", lambda: consume(jax.device_put(fused)))

    # 15 independent 800 KiB transfers, all dispatched then one sync
    # (does the tunnel pipeline them?)
    batches = [rng.randint(0, 255, 800 << 10, dtype=np.uint8)
               for _ in range(15)]

    def many():
        outs = [consume(jax.device_put(b)) for b in batches]
        return outs[-1]

    def manysync():
        outs = [consume(jax.device_put(b)) for b in batches]
        device_sync(*outs)
        return outs[-1]

    timed("15 x 800 KiB async-dispatch", many)
    timed("15 x 800 KiB all-synced    ", manysync)
    timed("1 x 12 MiB (same payload)  ",
          lambda: consume(jax.device_put(np.concatenate(batches))))


if __name__ == "__main__":
    main()
