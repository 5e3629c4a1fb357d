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
import numpy as np

from pangaea_tpu.kernels import scan as pscan
from pangaea_tpu.kernels.encode import (canonical_kmers, canonical_order,
                                        kmer_window_values)


def make_global_table(k: int) -> jax.Array:
    """Dense canonical-k-mer count table. Entry i holds the global count of
    k-mer value i (only canonical values are ever written; the rest stay 0,
    which also encodes 'absent' — jellyfish dumps only counts >= 1, and
    count_kmer.cpp:87 skips k-mers missing from the dump)."""
    assert k <= 15, (f"k={k}: the dense 4^k table only exists for k <= 15;"
                     " large k runs via the split-word sort-join")
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


# ---------------------------------------------------------------------------
# Scatter-free implementations (TPU fast path)
#
# XLA TPU lowers gathers and scatter-adds of per-element indices to a
# serialized ~13-17 ns/element loop regardless of table size (measured on
# v5e: 4M-element gather 52 ms from a 4 GiB table and 34 ms from a 256 KiB
# one; 4M-update scatter-add 60-70 ms). The two per-barcode feature
# passes are therefore reformulated without any per-element scatter:
#
#   1. per-ROW histograms via a compare-expand against the (small) column
#      space — pure VPU work XLA fuses and tiles (~6 ms for 4M windows x
#      400 bins);
#   2. per-GROUP totals via an exact int32 cumsum over rows + one gather
#      of the group-boundary rows — valid because the read stream is
#      barcode-sorted, so seg_ids are non-decreasing within a batch;
#   3. the abundance global-count lookup gathers 128-lane ROWS of the
#      table (bandwidth-shaped: 24 ms vs 52 ms scalar on v5e) and selects
#      the lane with a compare+sum, halving the lookup cost.
#
# The scatter variants above remain the CPU-backend implementation (CPU
# scatters are fast; the compare-expand is what's slow there) and the
# small-shape reference for parity tests. utils/feature orchestrators
# choose per backend via use_segsum_impl().
# ---------------------------------------------------------------------------


def use_segsum_impl(override: str = "auto") -> bool:
    """Pick the histogram implementation: 'scatter' | 'segsum' | 'auto'
    (auto = segsum everywhere except the CPU backend)."""
    if override == "segsum":
        return True
    if override == "scatter":
        return False
    return jax.default_backend() != "cpu"


def _segment_sum_sorted(row_mat: jax.Array, seg_ids: jax.Array,
                        n_groups: int) -> jax.Array:
    """Exact int32 per-group row sums for NON-DECREASING seg_ids.

    seg_ids == -1 rows (padding / dropped groups) are excluded; the
    remaining ids must be non-decreasing (the barcode-sorted stream
    guarantees this; io/packing.GroupPacker emits them in order).
    cumsum over rows + a gather of each group's last row replaces the
    (G*C)-target scatter-add.
    """
    keep = seg_ids >= 0
    rm = row_mat * keep[:, None].astype(row_mat.dtype)
    segs_m = jax.lax.cummax(jnp.where(keep, seg_ids, -1))
    cum = jnp.cumsum(rm, axis=0)
    ends = jnp.searchsorted(
        segs_m, jnp.arange(n_groups, dtype=seg_ids.dtype), side="right") - 1
    zero = jnp.zeros((1, row_mat.shape[1]), cum.dtype)
    cum_ext = jnp.concatenate([zero, cum], axis=0)
    at_end = cum_ext[ends + 1]
    prev = jnp.concatenate([zero, at_end[:-1]], axis=0)
    return at_end - prev


_LOOKUP_CHUNK = 4 * 1024 * 1024  # rows gathered per step: 2 GiB peak


def _pick_rows(t2: jax.Array, idx: jax.Array, valid: jax.Array) -> jax.Array:
    rows = t2[idx >> 7]  # (N, 128) row gather
    lane = (idx & 127)[:, None]
    iota = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    picked = jnp.sum(rows * (iota == lane).astype(rows.dtype), axis=-1)
    return jnp.where(valid, picked, 0)


def lookup_table_rows(table: jax.Array, idx: jax.Array,
                      valid: jax.Array) -> jax.Array:
    """table[idx] (idx int32 in [0, len(table))) via 128-lane row gathers.

    Gathering (N, 128) rows of the reshaped (len/128, 128) table moves
    512-byte aligned tiles (bandwidth-shaped: measured 24 ms vs 52 ms for
    4M scalar gathers on v5e) and selects the wanted lane with an iota
    compare + sum. Entries where ``valid`` is False return 0. The gather
    runs in lax.map chunks so the (N, 128) intermediate stays <= 2 GiB.
    Falls back to a scalar gather when the table is not 128-divisible
    (tiny test tables).
    """
    if table.shape[0] % 128 != 0:
        return jnp.where(valid, table[jnp.where(valid, idx, 0)], 0)
    t2 = table.reshape(-1, 128)
    flat_idx = jnp.where(valid, idx, 0).ravel()
    flat_valid = valid.ravel()
    n = flat_idx.shape[0]
    if n <= _LOOKUP_CHUNK:
        return _pick_rows(t2, flat_idx, flat_valid).reshape(idx.shape)
    pad = (-n) % _LOOKUP_CHUNK
    fi = jnp.pad(flat_idx, (0, pad)).reshape(-1, _LOOKUP_CHUNK)
    fv = jnp.pad(flat_valid, (0, pad)).reshape(-1, _LOOKUP_CHUNK)
    picked = jax.lax.map(lambda args: _pick_rows(t2, *args), (fi, fv))
    return picked.ravel()[:n].reshape(idx.shape)


@functools.partial(
    jax.jit,
    static_argnames=("k", "window", "vector_size", "overlap", "n_groups"),
    donate_argnames=("hist",),
)
def abundance_histogram_segsum(hist: jax.Array, table: jax.Array,
                               codes: jax.Array, lengths: jax.Array,
                               seg_ids: jax.Array, cont: jax.Array, *,
                               k: int, window: int, vector_size: int,
                               overlap: int, n_groups: int) -> jax.Array:
    """Scatter-free twin of :func:`abundance_histogram`.

    hist: (n_groups, vector_size) int32 accumulator (donated).
    Same contract (count_kmer.cpp:86-96); requires barcode-sorted seg_ids.
    """
    skip = cont.astype(jnp.int32) * max(0, overlap - (k - 1))
    vals, valid = kmer_window_values(codes, lengths, k, win_skip=skip)
    canon = canonical_kmers(vals, k)
    cnt = lookup_table_rows(table, canon, valid)
    bins = cnt // jnp.int32(window)
    keep = valid & (cnt > 0) & (bins < vector_size)
    routed = jnp.where(keep, bins, -1)
    cols = jnp.arange(vector_size, dtype=jnp.int32)
    row_hist = jnp.sum(routed[:, :, None] == cols[None, None, :], axis=1,
                       dtype=jnp.int32)
    return hist + _segment_sum_sorted(row_hist, seg_ids, n_groups)


# ---------------------------------------------------------------------------
# Sort-join abundance (TPU fastest path for datasets that fit HBM)
#
# The dense-table path pays two serialized per-element memory ops per
# window: a scatter-add into the 4 GiB table (global pass) and a table
# lookup (group pass). A device sort costs far less and scales
# sub-linearly in practice (measured v5e, tools/ab_sort_vs_scatter.py:
# 32M-element key+payload sort 143 ms vs 433 ms for the same-size
# scatter-add alone). When every window of the dataset fits in HBM, the
# global table disappears entirely:
#
#   1. one streaming pass collects each window's canonical k-mer key
#      (sentinel 4^k for invalid windows) — the SAME stream the group
#      pass uses, so the FASTQ is read once, not twice;
#   2. one sort by key groups equal k-mers into runs; the run length IS
#      the jellyfish global count (valid because the stream contains
#      every read exactly once, including dropped-group reads as
#      seg_id -1 rows, and unmasked — matching jellyfish over the
#      interleaved file, src/feature.py:76-86 interleaved path);
#      per-instance counts come from run-boundary fill-forward cumops,
#      no gathers;
#   3. a second sort by original index puts each window's abundance BIN
#      back in stream order, where the existing compare-expand + segment
#      -sum machinery histograms it per barcode.
#
# Exactness: in the unmasked single-stream case the reference's
# `count > 0` check (count_kmer.cpp:87) is automatic — every group-pass
# k-mer was itself counted, so its run length is >= 1. Quality-masked
# global counting (the paired-reads path, --min-qual-char) runs the
# WEIGHTED join instead (see §quality-masked sort-join below): the
# masked global multiset is recovered from per-window weights, no
# second element set or table needed.
# ---------------------------------------------------------------------------


def kmer_key_sentinel(k: int) -> int:
    """Sort key for invalid windows: sorts after every real k-mer value."""
    return 4 ** k


_SORTJOIN_PAD_QUANTUM = 1 << 20  # 1M


def sortjoin_pad_size(n: int) -> int:
    """Padded sort length: pow2 below 1M (tests), else the next 1M
    multiple — sort cost is ~linear in operand length, so fine-grained
    padding beats pow2 (a 36M dataset would otherwise sort 64M), at the
    price of one cached compilation per distinct multiple. 1M (not the
    earlier 4M) because sentinel padding is pure sort cost: at the
    headline 33.9M-window shape a 4M quantum re-added 11% sentinels,
    silently eating the auto_row_len win.

    lax.sort steps ~32% just past each pow2 boundary (measured v5e,
    tools/ab_sort_pad.py: 2^25 int32 = 90 ms but 2^25+1M = 118 ms,
    2.69 -> 3.42 ns/elem) — trimming the tail-batch pad windows
    (features._TRIM_QUANTUM) is what keeps n under the tier. No special
    pow2 case is needed here: the quantum is itself a power of two, so
    every pow2 >= 1M is already a grid point (a pow2 strictly between n
    and the next 1M multiple cannot exist)."""
    if n <= _SORTJOIN_PAD_QUANTUM:
        return 1 << max(0, (n - 1)).bit_length()
    q = _SORTJOIN_PAD_QUANTUM
    return ((n + q - 1) // q) * q


@functools.partial(jax.jit, static_argnames=("k", "overlap"))
def batch_kmer_keys(codes: jax.Array, lengths: jax.Array, cont: jax.Array,
                    *, k: int, overlap: int) -> jax.Array:
    """(R*W,) int32 canonical k-mer per window; invalid -> 4^k sentinel."""
    skip = cont.astype(jnp.int32) * max(0, overlap - (k - 1))
    vals, valid = kmer_window_values(codes, lengths, k, win_skip=skip)
    canon = canonical_kmers(vals, k)
    return jnp.where(valid, canon, jnp.int32(kmer_key_sentinel(k))).ravel()


def _sortjoin_bins_impl(keys: jax.Array, k: int, window: int,
                        vector_size: int) -> jax.Array:
    """Traceable core of :func:`sortjoin_bins` (reused by the distributed
    variant in parallel/dist.py on each shard's routed keys)."""
    n = keys.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    sk, si = jax.lax.sort((keys, idx), num_keys=1)
    pos = jnp.arange(n, dtype=jnp.int32)
    start = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    end = jnp.concatenate([start[1:], jnp.ones(1, bool)])
    run_start = pscan.cummax(jnp.where(start, pos, 0))
    run_end = pscan.cummin_reverse(jnp.where(end, pos, n))
    count = run_end - run_start + 1
    bins = count // jnp.int32(window)
    ok = (sk < kmer_key_sentinel(k)) & (bins < vector_size)
    binv = jnp.where(ok, bins, -1)
    _, bins_orig = jax.lax.sort((si, binv), num_keys=1)
    return bins_orig


def _sortjoin_bins_weighted(keys: jax.Array, weights: jax.Array, k: int,
                            window: int, vector_size: int) -> jax.Array:
    """Weighted twin of :func:`_sortjoin_bins_impl`: each element carries a
    pre-aggregated count (the distributed path routes one (key, local run
    length) pair per source device instead of every instance, so a hot
    key — genomic k-mer multiplicities are Zipfian — loads its owner with
    at most n_dev elements). Per-element global count = run weight sum,
    via the same monotone boundary fills on the weight cumsum."""
    n = keys.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    sk, sw, si = jax.lax.sort((keys, weights, idx), num_keys=1)
    start = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    end = jnp.concatenate([start[1:], jnp.ones(1, bool)])
    cw = pscan.cumsum(sw)
    excl = cw - sw
    run_before = pscan.cummax(jnp.where(start, excl, 0))
    run_total = pscan.cummin_reverse(
        jnp.where(end, cw, jnp.iinfo(jnp.int32).max))
    count = run_total - run_before
    bins = count // jnp.int32(window)
    ok = (sk < kmer_key_sentinel(k)) & (count > 0) & (bins < vector_size)
    binv = jnp.where(ok, bins, -1)
    _, bins_orig = jax.lax.sort((si, binv), num_keys=1)
    return bins_orig


# ---- row-grouped restore (the fast single-device path) ------------------
#
# sortjoin_bins restores exact stream order with a second (index, bin)
# two-operand sort. But the consumer (abundance_histogram_from_bins)
# reduces bins per ROW with an order-insensitive compare-expand — only
# WHICH row a bin belongs to matters, never its position within the row.
# So the restore sort can carry the row id instead of the window index
# and pack (rowidx << 9 | bin+1) into ONE uint32 (bins < 512; the k=15
# headline shape: 36M windows / 146 per row = 258k rows, 18 bits), making
# the second sort single-operand — measured 338 -> ~210 ms for the whole
# sort phase on v5e. Requires total_rows < 2^22 (callers fall back to the
# exact variant otherwise) and vector_size <= 511.


def _rowgrouped_restore(srow: jax.Array, binv: jax.Array) -> jax.Array:
    # int32 packing (srow < 2^22 keeps the word positive, so signed and
    # unsigned order agree; measured cost-identical to uint32 — 1.02x,
    # tools/ab_partitioned_sort.py). The restore's cost is simply a
    # single-operand sort at the padded length: keeping that length
    # under a pow2 tier is what matters (sortjoin_pad_size).
    packed = (srow << 9) | (binv + 1)
    spacked = jax.lax.sort(packed)
    return (spacked & jnp.int32(511)) - 1


@functools.partial(jax.jit, static_argnames=("k", "window", "vector_size",
                                             "row_windows"))
def sortjoin_bins_rowgrouped(keys: jax.Array, *, k: int, window: int,
                             vector_size: int, row_windows: int
                             ) -> jax.Array:
    """Per-window abundance bins grouped by original ROW (row blocks in
    stream order, arbitrary order within each row) — the contract
    :func:`abundance_histogram_from_bins` actually needs. keys as in
    :func:`sortjoin_bins`; ``row_windows`` = windows per packed row, so
    element i belongs to row i // row_windows."""
    assert vector_size <= 511
    n = keys.shape[0]
    # real windows fill whole rows (per_batch = rows*row_windows);
    # sentinel padding may end in a partial tail pseudo-row, which
    # sorts last and is never consumed
    assert n // row_windows < (1 << 22)
    rowidx = jnp.arange(n, dtype=jnp.int32) // jnp.int32(row_windows)
    sk, srow = jax.lax.sort((keys, rowidx), num_keys=1)
    pos = jnp.arange(n, dtype=jnp.int32)
    start = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    end = jnp.concatenate([start[1:], jnp.ones(1, bool)])
    run_start = pscan.cummax(jnp.where(start, pos, 0))
    run_end = pscan.cummin_reverse(jnp.where(end, pos, n))
    count = run_end - run_start + 1
    bins = count // jnp.int32(window)
    ok = (sk < kmer_key_sentinel(k)) & (bins < vector_size)
    return _rowgrouped_restore(srow, jnp.where(ok, bins, -1))


# ---- quality-masked (weighted) sort-join --------------------------------
#
# The paired-reads path quality-masks the GLOBAL count only: jellyfish
# runs with --min-qual-char=? (src/feature.py:76-86, bases below '?'
# become N before counting) while count_kmer's group scan reads raw
# bases and just looks counts up (count_kmer.cpp:87). Masking never maps
# one valid k-mer to another — a masked base makes the window invalid —
# so the masked global count of key K is exactly the number of K's
# instances whose window contains no masked base. One weighted sort
# therefore serves both sides: every window routes its UNMASKED key as
# the query, carrying weight 1 iff the window survives masking; the run
# weight sum is the jellyfish masked count, and `count > 0` reproduces
# the "absent from the dump" skip. No second element set, no table.


@functools.partial(jax.jit, static_argnames=("k", "overlap"))
def batch_kmer_keys_weighted(codes: jax.Array, lowq: jax.Array,
                             lengths: jax.Array, cont: jax.Array, *,
                             k: int, overlap: int):
    """(keys, weights) per window: keys as :func:`batch_kmer_keys`
    (unmasked), weight 1 iff the window is valid AFTER quality masking
    (no invalid base and no low-quality base among its k bases —
    jellyfish --min-qual-char semantics). ``lowq``: (R, L) nonzero where
    quality < min_qual_char."""
    from pangaea_tpu.kernels.encode import _window_validity
    skip = cont.astype(jnp.int32) * max(0, overlap - (k - 1))
    vals, valid = kmer_window_values(codes, lengths, k, win_skip=skip)
    canon = canonical_kmers(vals, k)
    keys = jnp.where(valid, canon, jnp.int32(kmer_key_sentinel(k)))
    masked = jnp.where(lowq != 0, jnp.uint8(4), codes).astype(jnp.int32)
    wvalid = _window_validity(masked, lengths, k, keys.shape[1], skip)
    return keys.ravel(), wvalid.astype(jnp.int32).ravel()


@functools.partial(jax.jit, static_argnames=("k", "overlap"))
def batch_kmer_keys_pair_weighted(codes: jax.Array, lowq: jax.Array,
                                  lengths: jax.Array, cont: jax.Array, *,
                                  k: int, overlap: int):
    """Split-word twin of :func:`batch_kmer_keys_weighted` for
    15 < k <= 31: ((hi, lo), weights)."""
    from pangaea_tpu.kernels.encode import (_window_validity,
                                            canonical_kmers_pair,
                                            kmer_window_values_pair)
    skip = cont.astype(jnp.int32) * max(0, overlap - (k - 1))
    hi, lo, valid = kmer_window_values_pair(codes, lengths, k,
                                            win_skip=skip)
    chi, clo = canonical_kmers_pair(hi, lo, k)
    shi, slo = kmer_key_sentinel_pair(k)
    keys_hi = jnp.where(valid, chi, jnp.uint32(shi)).ravel()
    keys_lo = jnp.where(valid, clo, jnp.uint32(slo)).ravel()
    masked = jnp.where(lowq != 0, jnp.uint8(4), codes).astype(jnp.int32)
    wvalid = _window_validity(masked, lengths, k, valid.shape[1], skip)
    return (keys_hi, keys_lo), wvalid.astype(jnp.int32).ravel()


@functools.partial(jax.jit, static_argnames=("k", "window", "vector_size"))
def sortjoin_bins_weighted(keys: jax.Array, weights: jax.Array, *, k: int,
                           window: int, vector_size: int) -> jax.Array:
    """Masked-global sort-join: per-window abundance bin in original
    order where the global count is the window's run WEIGHT SUM (-1 for
    invalid windows, keys absent from the masked global multiset
    [count 0], or bin >= vector_size). Exact-order public twin of the
    distributed core :func:`_sortjoin_bins_weighted`."""
    return _sortjoin_bins_weighted(keys, weights, k, window, vector_size)


@functools.partial(jax.jit, static_argnames=("k", "window", "vector_size",
                                             "row_windows"))
def sortjoin_bins_weighted_rowgrouped(keys: jax.Array, weights: jax.Array,
                                      *, k: int, window: int,
                                      vector_size: int, row_windows: int
                                      ) -> jax.Array:
    """Row-grouped twin of :func:`sortjoin_bins_weighted` (packed
    single-operand restore, see :func:`sortjoin_bins_rowgrouped`)."""
    assert vector_size <= 511
    n = keys.shape[0]
    assert n // row_windows < (1 << 22)
    rowidx = jnp.arange(n, dtype=jnp.int32) // jnp.int32(row_windows)
    sk, sw, srow = jax.lax.sort((keys, weights, rowidx), num_keys=1)
    start = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    end = jnp.concatenate([start[1:], jnp.ones(1, bool)])
    cw = pscan.cumsum(sw)
    excl = cw - sw
    run_before = pscan.cummax(jnp.where(start, excl, 0))
    run_total = pscan.cummin_reverse(
        jnp.where(end, cw, jnp.iinfo(jnp.int32).max))
    count = run_total - run_before
    bins = count // jnp.int32(window)
    ok = (sk < kmer_key_sentinel(k)) & (count > 0) & (bins < vector_size)
    return _rowgrouped_restore(srow, jnp.where(ok, bins, -1))


@functools.partial(jax.jit, static_argnames=("k", "window", "vector_size"))
def sortjoin_bins_weighted_pair(hi: jax.Array, lo: jax.Array,
                                weights: jax.Array, *, k: int, window: int,
                                vector_size: int) -> jax.Array:
    """Split-word twin of :func:`sortjoin_bins_weighted`."""
    return _sortjoin_bins_weighted_pair(hi, lo, weights, k, window,
                                        vector_size)


@functools.partial(jax.jit, static_argnames=("k", "window", "vector_size",
                                             "row_windows"))
def sortjoin_bins_weighted_pair_rowgrouped(
        hi: jax.Array, lo: jax.Array, weights: jax.Array, *, k: int,
        window: int, vector_size: int, row_windows: int) -> jax.Array:
    """Row-grouped split-word masked-global sort-join."""
    assert vector_size <= 511
    n = hi.shape[0]
    assert n // row_windows < (1 << 22)
    rowidx = jnp.arange(n, dtype=jnp.int32) // jnp.int32(row_windows)
    shi, slo, sw, srow = jax.lax.sort((hi, lo, weights, rowidx),
                                      num_keys=2)
    start = jnp.concatenate(
        [jnp.ones(1, bool), (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])])
    end = jnp.concatenate([start[1:], jnp.ones(1, bool)])
    cw = pscan.cumsum(sw)
    excl = cw - sw
    run_before = pscan.cummax(jnp.where(start, excl, 0))
    run_total = pscan.cummin_reverse(
        jnp.where(end, cw, jnp.iinfo(jnp.int32).max))
    count = run_total - run_before
    bins = count // jnp.int32(window)
    sent_hi, _ = kmer_key_sentinel_pair(k)
    ok = (shi < jnp.uint32(sent_hi)) & (count > 0) & (bins < vector_size)
    return _rowgrouped_restore(srow, jnp.where(ok, bins, -1))


# ---- split-word (15 < k <= 31) sort-join --------------------------------
#
# The reference encodes k-mers in uint64 (count_kmer.cpp:79-86), allowing
# any k <= 31 via jellyfish -m. TPUs have no useful 64-bit integer
# datapath, and the dense table is out of the question (4^k entries), so
# large k is served EXCLUSIVELY by the sort-join path with the k-mer
# carried as an uint32 (hi, lo) pair (encode.kmer_window_values_pair) and
# lax.sort(num_keys=2) ordering pairs exactly like the 64-bit value.


def kmer_key_sentinel_pair(k: int) -> tuple[int, int]:
    """(hi, lo) sort key for invalid windows: hi = 4^(k-16) sorts after
    every real window's hi (which is < 4^(k-16))."""
    return 4 ** (k - 16), 0


@functools.partial(jax.jit, static_argnames=("k", "overlap"))
def batch_kmer_keys_pair(codes: jax.Array, lengths: jax.Array,
                         cont: jax.Array, *, k: int, overlap: int):
    """(R*W,) uint32 (hi, lo) canonical k-mer per window; invalid ->
    sentinel pair. Split-word twin of :func:`batch_kmer_keys`."""
    from pangaea_tpu.kernels.encode import (canonical_kmers_pair,
                                            kmer_window_values_pair)
    skip = cont.astype(jnp.int32) * max(0, overlap - (k - 1))
    hi, lo, valid = kmer_window_values_pair(codes, lengths, k,
                                            win_skip=skip)
    chi, clo = canonical_kmers_pair(hi, lo, k)
    shi, slo = kmer_key_sentinel_pair(k)
    return (jnp.where(valid, chi, jnp.uint32(shi)).ravel(),
            jnp.where(valid, clo, jnp.uint32(slo)).ravel())


@functools.partial(jax.jit, static_argnames=("k", "window", "vector_size"))
def sortjoin_bins_pair(hi: jax.Array, lo: jax.Array, *, k: int,
                       window: int, vector_size: int) -> jax.Array:
    """Split-word twin of :func:`sortjoin_bins`: same run-length global
    counts and boundary fills, with run boundaries defined on the
    (hi, lo) pair and the pair sorted as two lexicographic keys."""
    n = hi.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    shi, slo, si = jax.lax.sort((hi, lo, idx), num_keys=2)
    pos = jnp.arange(n, dtype=jnp.int32)
    start = jnp.concatenate([jnp.ones(1, bool),
                             (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])])
    end = jnp.concatenate([start[1:], jnp.ones(1, bool)])
    run_start = pscan.cummax(jnp.where(start, pos, 0))
    run_end = pscan.cummin_reverse(jnp.where(end, pos, n))
    count = run_end - run_start + 1
    bins = count // jnp.int32(window)
    sent_hi, _ = kmer_key_sentinel_pair(k)
    ok = (shi < jnp.uint32(sent_hi)) & (bins < vector_size)
    binv = jnp.where(ok, bins, -1)
    _, bins_orig = jax.lax.sort((si, binv), num_keys=1)
    return bins_orig


def _sortjoin_bins_weighted_pair(hi: jax.Array, lo: jax.Array,
                                 weights: jax.Array, k: int, window: int,
                                 vector_size: int) -> jax.Array:
    """Split-word twin of :func:`_sortjoin_bins_weighted` (the distributed
    path's owner-side core): per-element global count = weight sum of the
    element's (hi, lo) run."""
    n = hi.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    shi, slo, sw, si = jax.lax.sort((hi, lo, weights, idx), num_keys=2)
    start = jnp.concatenate([jnp.ones(1, bool),
                             (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])])
    end = jnp.concatenate([start[1:], jnp.ones(1, bool)])
    cw = pscan.cumsum(sw)
    excl = cw - sw
    run_before = pscan.cummax(jnp.where(start, excl, 0))
    run_total = pscan.cummin_reverse(
        jnp.where(end, cw, jnp.iinfo(jnp.int32).max))
    count = run_total - run_before
    bins = count // jnp.int32(window)
    sent_hi, _ = kmer_key_sentinel_pair(k)
    ok = (shi < jnp.uint32(sent_hi)) & (count > 0) & (bins < vector_size)
    binv = jnp.where(ok, bins, -1)
    _, bins_orig = jax.lax.sort((si, binv), num_keys=1)
    return bins_orig


@functools.partial(jax.jit, static_argnames=("k", "window", "vector_size",
                                             "row_windows"))
def sortjoin_bins_pair_rowgrouped(hi: jax.Array, lo: jax.Array, *, k: int,
                                  window: int, vector_size: int,
                                  row_windows: int) -> jax.Array:
    """Row-grouped twin of :func:`sortjoin_bins_pair` (see
    :func:`sortjoin_bins_rowgrouped` for the packed single-operand
    restore)."""
    assert vector_size <= 511
    n = hi.shape[0]
    # real windows fill whole rows (per_batch = rows*row_windows);
    # sentinel padding may end in a partial tail pseudo-row, which
    # sorts last and is never consumed
    assert n // row_windows < (1 << 22)
    rowidx = jnp.arange(n, dtype=jnp.int32) // jnp.int32(row_windows)
    shi, slo, srow = jax.lax.sort((hi, lo, rowidx), num_keys=2)
    pos = jnp.arange(n, dtype=jnp.int32)
    start = jnp.concatenate([jnp.ones(1, bool),
                             (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])])
    end = jnp.concatenate([start[1:], jnp.ones(1, bool)])
    run_start = pscan.cummax(jnp.where(start, pos, 0))
    run_end = pscan.cummin_reverse(jnp.where(end, pos, n))
    count = run_end - run_start + 1
    bins = count // jnp.int32(window)
    sent_hi, _ = kmer_key_sentinel_pair(k)
    ok = (shi < jnp.uint32(sent_hi)) & (bins < vector_size)
    return _rowgrouped_restore(srow, jnp.where(ok, bins, -1))


@functools.partial(jax.jit, static_argnames=("k", "window", "vector_size"))
def sortjoin_bins(keys: jax.Array, *, k: int, window: int,
                  vector_size: int) -> jax.Array:
    """Per-window abundance bin (count//window) in original order; -1 for
    windows that contribute nothing (invalid, or bin >= vector_size).

    keys: (N,) int32 from :func:`batch_kmer_keys` (padding entries must be
    the sentinel). Each instance's global count is the length of its run
    in the sorted order, recovered without gathers: run starts/ends are
    elementwise compares, and their positions fill forward/backward via
    cummax / reverse-cummin (positions are monotone along the array, so
    the fills are exact).
    """
    return _sortjoin_bins_impl(keys, k, window, vector_size)


# ---- spill pre-aggregation (past-the-cap streaming) ---------------------
#
# Past the device window cap, phase-A windows must leave the device. The
# r4 spill shipped RAW keys (~8 B/window D2H + 4 B/window of bins back up
# + an O(N) host partition), which collapsed throughput to ~1.05 us/window
# at soak scale — the one measured regression vs the reference's
# constant-rate streaming (count_kmer.cpp:186-292 + jellyfish's
# RAM-bounded hash, src/feature.py:76-86). Genomic k-mer multiplicities
# are Zipfian, so the spilled stream is massively duplicated; this kernel
# aggregates each in-cap chunk ON DEVICE before anything crosses the
# link:
#
#   1. sort the chunk's windows by key (9 ns/elem, the already-
#      characterized cost);
#   2. RLE: run starts, per-run length m and weight sum w (w == m on the
#      unmasked path; the quality-masked paired path routes its 0/1
#      window weights);
#   3. restore each window's RUN ID to stream order (second sort) — the
#      only per-window artifact, an int32 that can stay device-resident,
#      or go to host RAM / disk when HBM is the bound;
#   4. compact the unique (key, w) runs to a prefix (third sort by
#      (is-run-start, position)) — the ONLY thing transferred D2H, one
#      entry per DISTINCT key per chunk instead of one per window.
#
# Phase B then joins the unique entries through the existing weighted
# sort-join (run weight sums are exact under partitioning because equal
# keys share a range), and phase C maps run ids -> bins with one
# bandwidth-shaped table lookup per chunk. Windows never round-trip.


def _spill_aggregate_impl(words, weights, sentinel_first_word):
    """Traceable core: (run_ids_stream, unique_words, unique_w, n_runs,
    n_valid_runs). ``words`` is the key tuple (1 or 2 uint32/int32
    operands, lexicographic); ``weights`` None on the unmasked path
    (per-window weight 1, so the run weight sum is the run length).
    Invalid windows carry the sentinel key (first word ==
    ``sentinel_first_word``), sort last, and form trailing runs whose
    n_valid_runs..n_runs-1 unique entries the host drops."""
    n = words[0].shape[0]
    nw = len(words)
    idx = jnp.arange(n, dtype=jnp.int32)
    if weights is None:
        sorted_ops = jax.lax.sort(words + (idx,), num_keys=nw)
        sw = None
    else:
        sorted_ops = jax.lax.sort(words + (weights, idx), num_keys=nw)
        sw = sorted_ops[nw]
    skw = sorted_ops[:nw]
    si = sorted_ops[-1]
    pos = jnp.arange(n, dtype=jnp.int32)
    diff = skw[0][1:] != skw[0][:-1]
    for wd in skw[1:]:
        diff = diff | (wd[1:] != wd[:-1])
    start = jnp.concatenate([jnp.ones(1, bool), diff])
    end = jnp.concatenate([start[1:], jnp.ones(1, bool)])
    if sw is None:
        run_start = pscan.cummax(jnp.where(start, pos, 0))
        run_end = pscan.cummin_reverse(jnp.where(end, pos, n))
        wsum = run_end - run_start + 1
    else:
        cw = pscan.cumsum(sw)
        excl = cw - sw
        run_before = pscan.cummax(jnp.where(start, excl, 0))
        run_total = pscan.cummin_reverse(
            jnp.where(end, cw, jnp.iinfo(jnp.int32).max))
        wsum = run_total - run_before
    run_id = pscan.cumsum(start.astype(jnp.int32)) - 1
    # restore run ids to stream order
    _, run_ids_stream = jax.lax.sort((si, run_id), num_keys=1)
    # compact unique runs to a prefix, preserving sorted-key order (so
    # valid runs precede the sentinel runs)
    notstart = jnp.logical_not(start).astype(jnp.int32)
    comp = jax.lax.sort((notstart, pos) + skw + (wsum,), num_keys=2)
    uniq_words = comp[2:2 + nw]
    uniq_w = comp[2 + nw]
    valid = skw[0] < sentinel_first_word
    n_runs = jnp.sum(start.astype(jnp.int32))
    n_valid = jnp.sum((start & valid).astype(jnp.int32))
    return run_ids_stream, uniq_words, uniq_w, n_runs, n_valid


@functools.partial(jax.jit, static_argnames=("k",))
def spill_aggregate(keys: jax.Array, *, k: int):
    """Single-word unmasked chunk aggregation (see module note above)."""
    return _spill_aggregate_impl((keys,), None,
                                 jnp.int32(kmer_key_sentinel(k)))


@functools.partial(jax.jit, static_argnames=("k",))
def spill_aggregate_weighted(keys: jax.Array, weights: jax.Array, *,
                             k: int):
    """Single-word quality-masked chunk aggregation."""
    return _spill_aggregate_impl((keys,), weights,
                                 jnp.int32(kmer_key_sentinel(k)))


@functools.partial(jax.jit, static_argnames=("k",))
def spill_aggregate_pair(hi: jax.Array, lo: jax.Array, *, k: int):
    """Split-word (15 < k <= 31) unmasked chunk aggregation."""
    sent_hi, _ = kmer_key_sentinel_pair(k)
    return _spill_aggregate_impl((hi, lo), None, jnp.uint32(sent_hi))


@functools.partial(jax.jit, static_argnames=("k",))
def spill_aggregate_pair_weighted(hi: jax.Array, lo: jax.Array,
                                  weights: jax.Array, *, k: int):
    """Split-word quality-masked chunk aggregation."""
    sent_hi, _ = kmer_key_sentinel_pair(k)
    return _spill_aggregate_impl((hi, lo), weights, jnp.uint32(sent_hi))


@jax.jit
def map_run_bins(table: jax.Array, run_ids: jax.Array) -> jax.Array:
    """Per-window bins from a per-run bin table (phase C of the
    aggregated spill): table[run_id] via the bandwidth-shaped 128-lane
    row gather. ``table`` is padded to a multiple of 128 with -1, and the
    sentinel run's slot holds -1, so pad/invalid windows come back -1
    exactly like :func:`sortjoin_bins`."""
    return lookup_table_rows(table, run_ids,
                             jnp.ones(run_ids.shape, bool))


@functools.partial(
    jax.jit,
    static_argnames=("vector_size", "n_groups"),
    donate_argnames=("hist",),
)
def abundance_histogram_from_bins(hist: jax.Array, bins: jax.Array,
                                  seg_ids: jax.Array, *, vector_size: int,
                                  n_groups: int) -> jax.Array:
    """Accumulate (n_groups, vector_size) histogram from per-window bins
    (-1 = skip) of one packed batch; seg_ids as in the segsum kernels."""
    cols = jnp.arange(vector_size, dtype=jnp.int32)
    row_hist = jnp.sum(bins[:, :, None] == cols[None, None, :], axis=1,
                       dtype=jnp.int32)
    return hist + _segment_sum_sorted(row_hist, seg_ids, n_groups)


@functools.partial(
    jax.jit,
    static_argnames=("k", "num_cols", "overlap", "n_groups"),
    donate_argnames=("hist",),
)
def tnf_histogram_segsum(hist: jax.Array, codes: jax.Array,
                         lengths: jax.Array, seg_ids: jax.Array,
                         cont: jax.Array, *, k: int, num_cols: int,
                         overlap: int, n_groups: int) -> jax.Array:
    """Scatter-free twin of :func:`tnf_histogram`.

    hist: (n_groups, num_cols) int32 accumulator (donated). Column j
    counts the j-th smallest canonical k-mer (count_tnf.cpp:108 order) —
    compared directly against the canonical values, so the rank LUT
    gather disappears entirely.
    """
    skip = cont.astype(jnp.int32) * max(0, overlap - (k - 1))
    vals, valid = kmer_window_values(codes, lengths, k, win_skip=skip)
    canon = canonical_kmers(vals, k)
    routed = jnp.where(valid, canon, -1)
    order = jnp.asarray(canonical_order(k).astype(np.int32))
    assert order.shape[0] == num_cols
    row_hist = jnp.sum(routed[:, :, None] == order[None, None, :], axis=1,
                       dtype=jnp.int32)
    return hist + _segment_sum_sorted(row_hist, seg_ids, n_groups)
