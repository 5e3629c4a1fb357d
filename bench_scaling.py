#!/usr/bin/env python
"""Scaling-efficiency bench (BASELINE.md: reads/s at 1 chip / N devices;
target >= 80% efficiency to 2 hosts).

Measures the sharded feature pass + train step on 1..N devices of the
available mesh and prints one JSON line with per-size reads/s and the
efficiency at the largest size. On a single-chip host this validates the
sharded code paths on a virtual CPU mesh (JAX_PLATFORMS=cpu +
xla_force_host_platform_device_count); on a pod slice it measures real
ICI scaling.
"""

import json
import os
import sys
import time

import numpy as np

if "--cpu-mesh" in sys.argv:
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

K = 13  # smaller table so the CPU-mesh validation stays fast
READ_LEN = 150
ROWS = 16384
N_BATCHES = int(os.environ.get("BENCH_SCALING_BATCHES", 8))


def measure(n_dev: int) -> float:
    import jax
    import jax.numpy as jnp

    from pangaea_tpu.parallel import data_mesh, make_sharded_kmer_counter

    mesh = data_mesh(n_dev)
    init_table, step, unshard, (mat, row) = make_sharded_kmer_counter(
        mesh, K, K - 1)
    rng = np.random.RandomState(0)
    batches = []
    for _ in range(N_BATCHES):
        codes = rng.randint(0, 4, (ROWS, 256), dtype=np.uint8)
        codes[:, READ_LEN:] = 4
        lengths = np.full(ROWS, READ_LEN, np.int32)
        cont = np.zeros(ROWS, np.uint8)
        batches.append((
            jax.device_put(jnp.asarray(codes), mat),
            jax.device_put(jnp.asarray(lengths), row),
            jax.device_put(jnp.asarray(cont), row)))
    from pangaea_tpu.utils import device_sync
    table = init_table()
    table, ov = step(table, *batches[0])  # warmup/compile
    device_sync(table)
    table = init_table()
    t0 = time.time()
    for codes, lengths, cont in batches:
        table, ov = step(table, codes, lengths, cont)
    device_sync(table)
    dt = time.time() - t0
    assert int(np.asarray(ov).sum()) == 0
    return N_BATCHES * ROWS / dt


ROUTED_N = int(os.environ.get("BENCH_SCALING_ROUTED_N", 1 << 21))


def measure_routed(n_dev: int) -> dict:
    """Routed sort-join health at one mesh size: wall, routed-pair
    volume (the RLE a2a traffic), its ratio to raw instances, per-owner
    bucket occupancy, and overflow — the regression surface for the
    distributed kernels (VERDICT r4 item 7: committed every round as
    SCALING_r*.json so a routed-volume/occupancy regression diffs
    visibly)."""
    import jax
    import jax.numpy as jnp

    from pangaea_tpu.parallel import data_mesh
    from pangaea_tpu.parallel.dist import make_sharded_sortjoin
    from pangaea_tpu.utils import device_sync

    mesh = data_mesh(n_dev)
    bins_fn, row = make_sharded_sortjoin(mesh, K, 10, 400,
                                         with_stats=True)
    rng = np.random.RandomState(3)
    # Zipfian keys: the regime the RLE routing exists for
    ranks = rng.zipf(1.3, ROUTED_N).astype(np.int64)
    keys = ((ranks * 2654435761) % (4 ** K)).astype(np.int32)
    kd = jax.device_put(jnp.asarray(keys), row)
    bins, ov, counts = bins_fn(kd)  # compile
    device_sync(bins)
    t0 = time.time()
    bins, ov, counts = bins_fn(kd)
    device_sync(bins)
    wall = time.time() - t0
    counts = np.asarray(counts)
    routed = int(counts.sum())
    per_owner = counts.sum(axis=0)
    n_local = ROUTED_N // n_dev
    cap = max(1, int(2.0 * n_local / n_dev))
    return {
        "wall_s": round(wall, 3),
        "routed_pairs": routed,
        "a2a_volume_ratio": round(routed / ROUTED_N, 4),
        "owner_bucket_occupancy_max": round(
            float(per_owner.max()) / (cap * n_dev), 4),
        "owner_load_imbalance": round(
            float(per_owner.max()) / max(1.0, per_owner.mean()), 3),
        "overflow": int(np.asarray(ov).sum()),
    }


def main():
    import jax
    if "--cpu-mesh" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    n = len(jax.devices())
    sizes = sorted({1, max(2, n // 2), n} & set(range(1, n + 1))) \
        if n > 1 else [1]
    rates = {}
    routed = {}
    for s in sizes:
        rates[s] = measure(s)
        print(f"devices={s}: {rates[s]:,.0f} reads/s", file=sys.stderr)
        if s > 1:
            routed[s] = measure_routed(s)
            print(f"devices={s}: routed {routed[s]}", file=sys.stderr)
    if len(sizes) > 1:
        eff = rates[sizes[-1]] / (rates[1] * sizes[-1])
    else:
        eff = 1.0
    out = {
        "metric": "feature_pass_scaling_efficiency",
        "value": round(eff, 3),
        "unit": f"efficiency@{sizes[-1]}dev",
        "vs_baseline": round(eff / 0.8, 2),  # target >= 0.8
        "reads_per_s": {str(k): round(v, 0) for k, v in rates.items()},
        "routed_sortjoin": {str(k): v for k, v in routed.items()},
        "routed_n_keys": ROUTED_N,
    }
    if "--cpu-mesh" in sys.argv:
        # N virtual devices share the same host cores: the number validates
        # the sharded code path, it does not measure ICI scaling
        out["note"] = "virtual-cpu-mesh-validation-not-a-scaling-measurement"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
