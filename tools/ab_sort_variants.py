#!/usr/bin/env python
"""A/B raw lax.sort variants at the headline shape (36M elements):

  1key      single uint32 operand
  1key_i32  single int32 operand
  kv        (int32 key, int32 payload), num_keys=1
  kkv       (uint32, uint32, int32), num_keys=2   (split-word path)

Informs whether sort cost scales with operand count on this TPU (the
row-grouped restore bet) or is dominated by the comparator passes.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from pangaea_tpu.utils import device_sync, enable_compilation_cache

    enable_compilation_cache()
    n = 36 * 1024 * 1024
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randint(0, 1 << 30, n, dtype=np.int32))
    au = a.astype(jnp.uint32)
    b = jnp.asarray(np.arange(n, dtype=np.int32))
    bu = b.astype(jnp.uint32)

    cases = {
        "1key": lambda: jax.lax.sort(au),
        "1key_i32": lambda: jax.lax.sort(a),
        "kv": lambda: jax.lax.sort((a, b), num_keys=1)[1],
        "kkv": lambda: jax.lax.sort((au, bu, b), num_keys=2)[2],
    }
    for name, fn in cases.items():
        out = fn()
        device_sync(out)
        t0 = time.time()
        out = fn()
        device_sync(out)
        print(f"{name:9s} {(time.time()-t0)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
