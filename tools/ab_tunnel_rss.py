"""A/B: the axon tunnel client retains host RSS per H2D transfer.

Uploads N x 100 MB arrays, deleting each device array after a forced
use; on a well-behaved client RSS stays flat, on the axon tunnel it
grows ~1 MB per MB EVER transferred (gc / malloc_trim / clear_caches
immune — measured 2026-08-21: 163 MB -> 3054 MB after 30 uploads).
This is why long spill runs' process RSS scales with total transfer
volume even though the spill algorithm's host working set is bounded
(disk tier: one chunk at a time); the same run on the CPU backend
shows the bounded footprint. Run:

  PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_tunnel_rss.py
"""
import sys

import numpy as np


def rss_mb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) // 1024
    return -1


def main(n: int = 30) -> None:
    import jax
    import jax.numpy as jnp
    print(f"backend={jax.default_backend()} start={rss_mb()} MB")
    for i in range(n):
        a = np.random.randint(0, 100, 25_000_000, dtype=np.int32)
        d = jnp.asarray(a)
        float(jnp.sum(d))
        del a, d
        if i % 5 == 4:
            print(f"after {i + 1} x 100MB upload+delete: {rss_mb()} MB")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
