"""Barcode-feature kernels: global k-mer counts, abundance histograms, TNF.

These replace, TPU-natively, the reference's three feature hot loops
(SURVEY.md §3.2):

1. jellyfish global canonical k-mer counting (src/feature.py:76-103)
   -> :func:`count_kmers_global`: a dense HBM count table indexed by the
   canonical k-mer value, updated by a fused XLA scatter-add. For k=15 the
   table has 4^15 = 2^30 entries (int32, 4 GiB) — resident in HBM on one
   chip; data-parallel shards merge via psum (parallel/collectives.py).

2. count_kmer per-barcode abundance histogram (count_kmer.cpp:55-108)
   -> :func:`abundance_histogram`: gather the global count of every valid
   canonical k-mer, bin by count//window, drop bins >= vector_size
   (count_kmer.cpp:90-95), and scatter-add into a (groups, vector_size)
   histogram keyed by the read's barcode-group segment id.

3. count_tnf per-barcode TNF counts (count_tnf.cpp:78-113)
   -> :func:`tnf_histogram`: map each 4-mer to the rank of its canonical
   form (the std::map column order of count_tnf.cpp:108) and scatter-add
   into a (groups, 136) table.

All functions are functional (table in -> table out) and meant to be jit'ed
with the accumulator donated, so the 4 GiB table updates in place.
Group-level filtering (empty barcode, concatenated length <= min_len,
boundary-leak grouping) happens on the host (io/grouping.py); reads from
dropped groups arrive with seg_id == -1 and fall out via mode='drop'.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pangaea_tpu.kernels.encode import canonical_kmers, kmer_window_values


def make_global_table(k: int) -> jax.Array:
    """Dense canonical-k-mer count table. Entry i holds the global count of
    k-mer value i (only canonical values are ever written; the rest stay 0,
    which also encodes 'absent' — jellyfish dumps only counts >= 1, and
    count_kmer.cpp:87 skips k-mers missing from the dump)."""
    return jnp.zeros(4 ** k, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "overlap"),
                   donate_argnames=("table",))
def count_kmers_global(table: jax.Array, codes: jax.Array, lengths: jax.Array,
                       cont: jax.Array, *, k: int, overlap: int) -> jax.Array:
    """Add this read batch's canonical k-mer counts to the global table.

    ``cont`` (R,) marks continuation rows of split long reads; the first
    max(0, overlap-(k-1)) windows of such rows were already counted by the
    previous row and are skipped.
    """
    skip = cont.astype(jnp.int32) * max(0, overlap - (k - 1))
    vals, valid = kmer_window_values(codes, lengths, k, win_skip=skip)
    canon = canonical_kmers(vals, k)
    oob = jnp.int32(table.shape[0])
    idx = jnp.where(valid, canon, oob)
    return table.at[idx.ravel()].add(1, mode="drop")


@functools.partial(
    jax.jit,
    static_argnames=("k", "window", "vector_size", "overlap"),
    donate_argnames=("hist",),
)
def abundance_histogram(hist: jax.Array, table: jax.Array, codes: jax.Array,
                        lengths: jax.Array, seg_ids: jax.Array, cont: jax.Array,
                        *, k: int, window: int, vector_size: int,
                        overlap: int) -> jax.Array:
    """Accumulate per-barcode-group abundance histograms.

    Args:
      hist: (num_groups * vector_size,) int32 flat accumulator (donated).
      table: (4^k,) int32 global canonical counts.
      codes/lengths: (R, L) uint8 / (R,) int32 read batch.
      seg_ids: (R,) int32 barcode-group index per read; -1 = dropped group.

    Contract (count_kmer.cpp:86-96): for each valid canonical k-mer present
    in the global table, bin = global_count // window; increment only if
    bin < vector_size.
    """
    skip = cont.astype(jnp.int32) * max(0, overlap - (k - 1))
    vals, valid = kmer_window_values(codes, lengths, k, win_skip=skip)
    canon = canonical_kmers(vals, k)
    cnt = table[jnp.where(valid, canon, 0)]
    bins = cnt // jnp.int32(window)
    keep = valid & (cnt > 0) & (bins < vector_size) & (seg_ids[:, None] >= 0)
    flat = seg_ids[:, None].astype(jnp.int32) * vector_size + bins
    flat = jnp.where(keep, flat, jnp.int32(hist.shape[0]))
    return hist.at[flat.ravel()].add(1, mode="drop")


@functools.partial(
    jax.jit,
    static_argnames=("k", "num_cols", "overlap"),
    donate_argnames=("hist",),
)
def tnf_histogram(hist: jax.Array, rank_lut: jax.Array, codes: jax.Array,
                  lengths: jax.Array, seg_ids: jax.Array, cont: jax.Array,
                  *, k: int, num_cols: int, overlap: int) -> jax.Array:
    """Accumulate per-barcode-group canonical k-mer (TNF) counts.

    Args:
      hist: (num_groups * num_cols,) int32 flat accumulator (donated).
      rank_lut: (4^k,) int32 value -> canonical rank (encode.canonical_rank_lut).

    Contract (count_tnf.cpp:89-109): every valid k-mer occurrence counts;
    columns ordered by ascending canonical encoded value.
    """
    skip = cont.astype(jnp.int32) * max(0, overlap - (k - 1))
    vals, valid = kmer_window_values(codes, lengths, k, win_skip=skip)
    ranks = rank_lut[jnp.where(valid, vals, 0)]
    keep = valid & (seg_ids[:, None] >= 0)
    flat = seg_ids[:, None].astype(jnp.int32) * num_cols + ranks
    flat = jnp.where(keep, flat, jnp.int32(hist.shape[0]))
    return hist.at[flat.ravel()].add(1, mode="drop")
