"""Runtime init, logging, subprocess helpers (reference: src/utils.py)."""

from __future__ import annotations

import logging
import os
import subprocess
import sys
from typing import List, Optional


class GlibcRand:
    """Bit-exact replica of glibc's ``rand()`` (TYPE_3 additive-feedback
    generator, the default for ``srand``/``rand``).

    Used to reproduce the reference's virtual-barcode draws byte-for-byte:
    add_barcode seeds ``srand(2023)`` (/root/reference/src/cpptools/
    add_barcode.cpp:105) and consumes one ``rand() % n`` per read group
    with >=1 qualifying alignment (:71-72). The reference runs that loop
    under OpenMP, where ``rand()`` interleaving is nondeterministic; this
    replica matches the OMP_NUM_THREADS=1 stream, which is the only
    deterministic ordering the reference itself has.

    Algorithm (glibc stdlib/random_r.c): 31-word state seeded by a
    Park-Miller LCG via Schrage's method, recurrence
    ``r[i] = (r[i-31] + r[i-3]) mod 2^32`` with the first 310 outputs
    discarded; each output is ``r[i] >> 1``. Verified against compiled C
    by tests/test_hybrid_e2e.py::test_glibc_rand_matches_libc.
    """

    def __init__(self, seed: int) -> None:
        word = (seed & 0xFFFFFFFF) or 1
        if word >= 0x80000000:
            word -= 0x100000000
        r = [word]
        for _ in range(30):
            # Schrage step with C semantics: glibc computes hi/lo with
            # truncating division (random_r.c seeds via `long int`), which
            # differs from Python's floor divmod when word is negative —
            # i.e. for seeds >= 2^31, whose initial word is a negative
            # int32. Only the first iteration can see word < 0 (the step
            # maps into [0, 2^31) afterwards).
            if word < 0:
                hi = -(-word // 127773)
                lo = word - hi * 127773
            else:
                hi, lo = divmod(word, 127773)
            word = 16807 * lo - 2836 * hi
            if word < 0:
                word += 2147483647
            r.append(word)
        r += r[:3]
        for i in range(34, 344):
            r.append((r[i - 31] + r[i - 3]) & 0xFFFFFFFF)
        self._r = r[-31:]
        self._i = 0

    def rand(self) -> int:
        r, i = self._r, self._i
        val = (r[i] + r[i - 3]) & 0xFFFFFFFF
        r[i] = val
        self._i = (i + 1) % 31
        return val >> 1


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Persist XLA compilations across processes. The first TPU compile of
    the feature/cluster graphs costs minutes; with the cache, re-runs and
    resumed pipelines pay ~0 (greenfield vs the reference, which has no
    compiled artifacts to cache)."""
    import jax
    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "pangaea_tpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # persist EVERYTHING: the quality-masked upload path is built from
    # dozens of sub-second programs, and through a tunneled backend each
    # per-process recompile pays a full round trip — measured ~35 s of
    # first-extract wall per process on error-injected input that the
    # 1.0 s threshold silently excluded from the cache (r4).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def device_sync(*arrays) -> None:
    """Hard barrier: wait until every given jax array is actually computed.

    ``jax.block_until_ready`` is a no-op on some proxied backends (measured
    on the axon TPU tunnel: a 6.9-TFLOP program "completed" in 0 s), which
    silently turns any enqueue-then-block timing into a dispatch-only
    measurement. Forcing a device->host copy of a scalar reduction is the
    only sync that provably waits, so all timing paths (bench.py,
    bench_scaling.py, tools/ab_hist_tpu.py, profiling stage timers) use
    this instead.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    for a in jax.tree_util.tree_leaves(arrays):
        if hasattr(a, "dtype") and hasattr(a, "addressable_shards"):
            np.asarray(jnp.sum(jnp.ravel(a)[:1]))


def init_all(seed: int, threads: int, logfile: str, level: int,
             outdir: str) -> None:
    """src/utils.py:84-105: seed numpy, create outdir, root logger to
    file + stderr with the reference's timestamp format."""
    import numpy as np
    np.random.seed(seed)
    os.makedirs(outdir, exist_ok=True)
    root = logging.getLogger()
    root.setLevel(level)
    fmt = logging.Formatter("%(asctime)s (%(levelname)s): %(message)s",
                            "%Y-%m-%d %H:%M:%S")
    for handler in (logging.FileHandler(os.path.join(outdir, logfile)),
                    logging.StreamHandler()):
        handler.setLevel(level)
        handler.setFormatter(fmt)
        root.addHandler(handler)
    root.info("program start up")
    enable_compilation_cache()


def run_cmd(command: List[str], log_file: Optional[str] = None) -> None:
    """src/utils.py:69-81: run, log, exit(1) on failure."""
    log_pipe = open(log_file, "a") if log_file else subprocess.DEVNULL
    logging.info("command started: " + " ".join(command))
    ret = subprocess.run(command, stdout=subprocess.PIPE, stderr=log_pipe,
                         stdin=subprocess.PIPE, text=True)
    if ret.returncode:
        logging.error("command failed: " + " ".join(command))
        sys.exit(1)
    logging.info("command completed: " + " ".join(command))


def run_cmd_with_pipe(command: List[str],
                      pipe_file: Optional[str] = None) -> None:
    """src/utils.py:55-67: stdout+stderr to a file."""
    log_pipe = open(pipe_file, "a") if pipe_file else subprocess.DEVNULL
    logging.info("command started: " + " ".join(command))
    ret = subprocess.run(command, stdout=log_pipe, stderr=log_pipe)
    if ret.returncode:
        logging.error("command failed: " + " ".join(command))
        sys.exit(1)
    logging.info("command completed: " + " ".join(command))


def which(tool: str) -> Optional[str]:
    import shutil
    return shutil.which(tool)
