"""Data-parallel versions of the three hot paths.

Replaces, at mesh scale, the reference's intra-node parallelism
(ThreadPool over barcodes in count_kmer.cpp:136,216; OpenMP over BAM
batches; the neutered nn.DataParallel at VAENET.py:28-29):

1. feature extraction — read-batch rows shard over ('data',); the global
   k-mer table shards by KEY RANGE and batch indices are routed to their
   owning shard (make_sharded_kmer_counter: all_to_all buckets or
   all_gather+mask — an explicit shard_map, because GSPMD's default for a
   scatter onto a replicated accumulator is a full-table all-reduce per
   batch, ~50x slower measured on an 8-way mesh).
2. VAE training — the per-batch gather output shards over the batch dim;
   batch-norm moments and loss means become cross-shard psums inserted by
   GSPMD; gradients all-reduce onto replicated params.
3. final k-means — X rows shard; the (N, k) assignment matmul is local,
   the segment-sum cluster stats all-reduce.

2 and 3 are plain jit-with-shardings (GSPMD): their cross-shard
dependencies are reductions XLA already places optimally, and the same
code runs on a 1-device mesh unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pangaea_tpu.config import FeatureConfig
from pangaea_tpu.features import FeatureExtractor
from pangaea_tpu.kernels.features import (abundance_histogram,
                                          count_kmers_global, tnf_histogram)


def make_sharded_kmer_counter(mesh: Mesh, k: int, overlap: int,
                              route: str = "auto",
                              capacity_factor: float = 4.0):
    """Global k-mer counting with the table SHARDED by key range.

    Scattering into a replicated table would make GSPMD all-reduce the
    whole 4^k table every batch (268 MB for k=13, 4 GiB for k=15); the
    dataflow must move the (small) update indices instead. Two routings:

    - ``all_to_all`` (default, speed-of-light): each shard sorts its
      indices by destination key range and all_to_all's fixed-capacity
      buckets, so every shard scatter-adds only ~1/n_dev of the updates.
      Canonical k-mers are min(v, revcomp(v)), whose key density falls
      off linearly (2x the mean at the low end of the key space), so the
      default ``capacity_factor`` 4.0 covers the peak plus variance;
      overflow is *counted* and returned so the caller can assert
      exactness (a nonzero count means redo with a bigger factor — never
      silent loss). Routing buffers are tiny (cap*n_dev int32), so the
      slack is free.
    - ``all_gather``: every shard scans all gathered indices and keeps
      its range. Simple, exact, but per-device scatter work stays
      constant as devices grow (no strong scaling of the scatter stage).

    Returns (init_table, step, unshard, (mat_sharding, row_sharding));
    step(table, codes, lengths, cont) -> (table, overflow_count).
    """
    import jax.numpy as jnp
    from jax import shard_map

    from pangaea_tpu.kernels.encode import canonical_kmers, \
        kmer_window_values

    n_dev = mesh.devices.size
    total = 4 ** k
    shard = -(-total // n_dev)
    padded = shard * n_dev
    table_spec = NamedSharding(mesh, P("data"))
    mat = NamedSharding(mesh, P("data", None))
    row = NamedSharding(mesh, P("data"))

    def _indices(codes, lengths, cont):
        skip = cont.astype(jnp.int32) * max(0, overlap - (k - 1))
        vals, valid = kmer_window_values(codes, lengths, k, win_skip=skip)
        canon = canonical_kmers(vals, k)
        return jnp.where(valid, canon, jnp.int32(padded)).ravel()

    def _step_gather(table_shard, codes, lengths, cont):
        idx = _indices(codes, lengths, cont)
        all_idx = jax.lax.all_gather(idx, "data", tiled=True)
        rank = jax.lax.axis_index("data")
        local = all_idx - rank * shard
        local = jnp.where((local >= 0) & (local < shard), local,
                          jnp.int32(shard))
        return (table_shard.at[local].add(1, mode="drop"),
                jnp.zeros((1,), jnp.int32))

    def _step_a2a(table_shard, codes, lengths, cont):
        idx = _indices(codes, lengths, cont)  # (N_local,)
        n_local = idx.shape[0]
        cap = int(capacity_factor * n_local / n_dev)
        dest = jnp.minimum(idx // shard, n_dev - 1)  # OOB sentinel -> last+
        is_valid = idx < padded
        dest = jnp.where(is_valid, dest, n_dev)  # invalid -> bucket n_dev
        order = jnp.argsort(dest)
        sidx = idx[order]
        sdest = dest[order]
        starts = jnp.searchsorted(sdest, jnp.arange(n_dev, dtype=dest.dtype))
        ends = jnp.searchsorted(sdest, jnp.arange(n_dev, dtype=dest.dtype),
                                side="right")
        counts = ends - starts
        overflow = jnp.sum(jnp.maximum(counts - cap, 0))
        # gather each destination's slice into a fixed (n_dev, cap) buffer
        pos = jax.lax.broadcasted_iota(jnp.int32, (n_dev, cap), 1)
        src = starts[:, None] + pos
        take = pos < counts[:, None]
        src = jnp.where(take, src, n_local - 1)
        buckets = jnp.where(take, sidx[src], jnp.int32(padded))
        recv = jax.lax.all_to_all(buckets, "data", split_axis=0,
                                  concat_axis=0, tiled=True)
        rank = jax.lax.axis_index("data")
        local = recv.ravel() - rank * shard
        local = jnp.where((local >= 0) & (local < shard), local,
                          jnp.int32(shard))
        new_table = table_shard.at[local].add(1, mode="drop")
        return new_table, overflow[None]

    if route == "auto":
        # all_to_all's bucketization sort only pays off once the
        # duplicated-scatter work of all_gather exceeds it (bigger meshes)
        route = "all_to_all" if n_dev > 4 else "all_gather"
    body = _step_a2a if route == "all_to_all" else _step_gather
    step = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P("data"), P("data", None), P("data"), P("data")),
        out_specs=(P("data"), P("data"))), donate_argnums=(0,))

    def init_table():
        return jax.device_put(jnp.zeros(padded, jnp.int32), table_spec)

    def unshard(table):
        return np.asarray(table)[:total]

    return init_table, step, unshard, (mat, row)


def make_sharded_sortjoin(mesh: Mesh, k: int, window: int, vector_size: int,
                          capacity_factor: float = 2.0,
                          with_stats: bool = False,
                          weighted: bool = False):
    """Distributed sort-join (kernels/features.py §sort-join) over a
    ('data',) mesh: per-window global-count bins without any global sort
    or gathered key array.

    Equal keys must meet on one device to be counted, so each shard
    hash-partitions its keys (any deterministic key->shard map preserves
    exact counts). Routing is RUN-LENGTH COMPRESSED: each shard sorts its
    keys locally and routes one (key, local_count) pair per distinct key
    — genomic k-mer multiplicities are Zipfian, and routing raw
    instances would pile a hot key's entire load onto its owning shard
    (measured: simulated reads overflow any reasonable bucket capacity).
    The owner sums the routed counts per key (weighted sort-join core)
    and each source fills the returned run-start bins forward through
    its local runs with a segmented associative_scan. All per-device
    work is local sort volumes of N/n_dev elements, so both compute and
    the HBM window cap scale with the mesh.

    Bucket overflow is counted and returned, never silently dropped
    (same contract as make_sharded_kmer_counter): a nonzero count means
    rerun with a larger capacity_factor; compressed routing bounds a
    key's load on its owner at n_dev elements, so overflow needs
    adversarial hash collisions, not natural data.

    Returns (bins_fn, row_sharding): ``bins_fn(keys)`` maps a P('data')
    (N,) int32 key array (sentinel 4^k = invalid) to (bins, overflow)
    with bins aligned to keys in original order (-1 = no contribution).
    ``with_stats`` adds a third output: the (n_dev, n_dev) routed-pair
    count matrix [source, dest] — the RLE routing volume the DESIGN §3c
    cost model predicts (tools/validate_scaling_model.py checks it).

    ``weighted``: ``bins_fn(keys, weights)`` — the quality-masked paired
    global join (kernels/features.py §quality-masked) distributed the
    same way: the routed value per (source, distinct key) becomes the
    LOCAL WEIGHT SUM instead of the run length (the same Zipfian RLE
    bound holds — still at most one routed pair per distinct key per
    source), the owner's weighted core already sums arbitrary weights,
    and its ``count > 0`` check reproduces the absent-from-masked-dump
    skip.
    """
    from jax import shard_map

    from pangaea_tpu.kernels.features import (_sortjoin_bins_weighted,
                                              kmer_key_sentinel)

    n_dev = mesh.devices.size
    sentinel = jnp.int32(kmer_key_sentinel(k))
    row = NamedSharding(mesh, P("data"))

    def body(keys, weights=None):
        n_local = keys.shape[0]
        cap = max(1, int(capacity_factor * n_local / n_dev))
        pos0 = jnp.arange(n_local, dtype=jnp.int32)
        posi = pos0
        # local sort by key: runs pre-aggregate duplicates, so each key
        # routes AT MOST ONCE per source device — genomic k-mer
        # multiplicities are Zipfian, and routing every instance would
        # pile a hot key's entire load onto its owning shard
        if weighted:
            skeys, sw, spos = jax.lax.sort((keys, weights, pos0),
                                           num_keys=1)
        else:
            skeys, spos = jax.lax.sort((keys, pos0), num_keys=1)
        start = jnp.concatenate([jnp.ones(1, bool), skeys[1:] != skeys[:-1]])
        end = jnp.concatenate([start[1:], jnp.ones(1, bool)])
        if weighted:
            # routed value = local WEIGHT SUM of the run (valid at run
            # starts), recovered with the same monotone boundary fills
            # as the owner core
            cw = jnp.cumsum(sw)
            excl = cw - sw
            run_before = jax.lax.cummax(jnp.where(start, excl, 0))
            run_total = jax.lax.cummin(
                jnp.where(end, cw, jnp.iinfo(jnp.int32).max), reverse=True)
            run_len = run_total - run_before
        else:
            run_end = jax.lax.cummin(jnp.where(end, posi, n_local),
                                     reverse=True)
            run_len = run_end - posi + 1  # valid at run starts
        route = start & (skeys < sentinel)
        h = skeys.astype(jnp.uint32) * jnp.uint32(2654435761)
        # multiplicative hashing must take HIGH bits: h % n_dev on a
        # pow2 mesh keeps only the product's low bits, which depend only
        # on key mod n_dev — composition-biased genomes then skew the
        # buckets (caught by the mesh-cap regression test). Map the
        # well-mixed upper half onto [0, n_dev) instead.
        dest = jnp.where(
            route, (((h >> 16) * jnp.uint32(n_dev)) >> 16).astype(jnp.int32),
            jnp.int32(n_dev))
        sdest, rkeys, rcnt, rpos = jax.lax.sort(
            (dest, skeys, run_len, posi), num_keys=1)
        bounds = jnp.arange(n_dev, dtype=jnp.int32)
        starts = jnp.searchsorted(sdest, bounds).astype(jnp.int32)
        ends = jnp.searchsorted(sdest, bounds, side="right").astype(jnp.int32)
        counts = ends - starts
        overflow = jnp.sum(jnp.maximum(counts - cap, 0))
        # contiguous dynamic slices (buckets are runs of the dest-sorted
        # array — no per-element gather anywhere on this path). Total
        # moved data is n_dev * cap ~= capacity_factor * n_local
        # regardless of mesh size; lax.map keeps the PROGRAM size
        # mesh-independent too (an unrolled loop would grow the HLO and
        # compile time linearly with n_dev)
        kpad = jnp.concatenate([rkeys, jnp.full(cap, sentinel, jnp.int32)])
        cpad = jnp.concatenate([rcnt, jnp.zeros(cap, jnp.int32)])
        lane = jnp.arange(cap, dtype=jnp.int32)

        def make_bucket(d):
            take = lane < counts[d]
            kk = jnp.where(take, jax.lax.dynamic_slice(
                kpad, (starts[d],), (cap,)), sentinel)
            cc = jnp.where(take, jax.lax.dynamic_slice(
                cpad, (starts[d],), (cap,)), 0)
            return kk, cc

        bk, bc = jax.lax.map(make_bucket, jnp.arange(n_dev))
        recv_k = jax.lax.all_to_all(bk, "data", split_axis=0,
                                    concat_axis=0, tiled=True)
        recv_c = jax.lax.all_to_all(bc, "data", split_axis=0,
                                    concat_axis=0, tiled=True)
        rbins = _sortjoin_bins_weighted(recv_k.ravel(), recv_c.ravel(),
                                        k, window, vector_size)
        back = jax.lax.all_to_all(rbins.reshape(n_dev, cap), "data",
                                  split_axis=0, concat_axis=0, tiled=True)
        # unpack: write each bucket's bins back over its dest-sorted run
        # (ascending d: bucket d's masked tail spills -1 into d+1's region,
        # which d+1's own write then covers; the last spill lands in the
        # unrouted tail, where -1 is the right placeholder)
        def put_bucket(d, acc):
            piece = jnp.where(lane < counts[d], back[d], -1)
            return jax.lax.dynamic_update_slice(acc, piece, (starts[d],))

        # mark the carry as device-varying: inside shard_map a literal
        # init is 'unvarying' and fori_loop requires carry types to match
        init = jax.lax.pcast(jnp.full(n_local + cap, -1, jnp.int32),
                             ("data",), to="varying")
        out = jax.lax.fori_loop(0, n_dev, put_bucket, init)
        # back to key-sorted order: run starts now hold their run's bin
        _, kb = jax.lax.sort((rpos, out[:n_local]), num_keys=1)
        # segmented fill-forward: every element inherits its run start's
        # bin (sentinel runs keep -1 from their own unrouted start)
        _, filled = jax.lax.associative_scan(
            lambda a, b: (a[0] | b[0], jnp.where(b[0], b[1], a[1])),
            (start, kb))
        _, bins = jax.lax.sort((spos, filled), num_keys=1)
        if with_stats:
            return bins, overflow[None], counts[None, :]
        return bins, overflow[None]

    out_specs = (P("data"), P("data")) + (
        (P("data", None),) if with_stats else ())
    in_specs = (P("data"), P("data")) if weighted else (P("data"),)
    bins_fn = jax.jit(shard_map(body, mesh=mesh, in_specs=in_specs,
                                out_specs=out_specs))
    return bins_fn, row


def make_sharded_sortjoin_pair(mesh: Mesh, k: int, window: int,
                               vector_size: int,
                               capacity_factor: float = 2.0,
                               weighted: bool = False):
    """Split-word (15 < k <= 31) twin of :func:`make_sharded_sortjoin`:
    keys travel as uint32 (hi, lo) pairs (encode.kmer_window_values_pair),
    runs and routing hashes are defined on the pair, and the owner-side
    core is the weighted pair sort. Same RLE routing, overflow contract,
    and original-order bins.

    ``bins_fn(hi, lo)`` -> (bins, overflow), all P('data') row-sharded.
    ``weighted``: ``bins_fn(hi, lo, weights)`` — masked-global counts
    with local weight sums routed instead of run lengths (see
    :func:`make_sharded_sortjoin`).
    """
    from jax import shard_map

    from pangaea_tpu.kernels.features import (_sortjoin_bins_weighted_pair,
                                              kmer_key_sentinel_pair)

    n_dev = mesh.devices.size
    sent_hi, sent_lo = kmer_key_sentinel_pair(k)
    sent_hi = jnp.uint32(sent_hi)
    sent_lo = jnp.uint32(sent_lo)
    row = NamedSharding(mesh, P("data"))

    def body(hi, lo, weights=None):
        n_local = hi.shape[0]
        cap = max(1, int(capacity_factor * n_local / n_dev))
        pos0 = jnp.arange(n_local, dtype=jnp.int32)
        if weighted:
            shi, slo, sw, spos = jax.lax.sort((hi, lo, weights, pos0),
                                              num_keys=2)
        else:
            shi, slo, spos = jax.lax.sort((hi, lo, pos0), num_keys=2)
        start = jnp.concatenate(
            [jnp.ones(1, bool), (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])])
        end = jnp.concatenate([start[1:], jnp.ones(1, bool)])
        if weighted:
            cw = jnp.cumsum(sw)
            excl = cw - sw
            run_before = jax.lax.cummax(jnp.where(start, excl, 0))
            run_total = jax.lax.cummin(
                jnp.where(end, cw, jnp.iinfo(jnp.int32).max), reverse=True)
            run_len = run_total - run_before  # local weight sum at starts
        else:
            run_end = jax.lax.cummin(jnp.where(end, pos0, n_local),
                                     reverse=True)
            run_len = run_end - pos0 + 1  # valid at run starts
        route = start & (shi < sent_hi)
        h = (shi * jnp.uint32(2654435761)) ^ (slo * jnp.uint32(40503)) \
            ^ (slo >> 16)
        # high-half range mapping, same rationale as the single-word path
        dest = jnp.where(
            route, (((h >> 16) * jnp.uint32(n_dev)) >> 16).astype(jnp.int32),
            jnp.int32(n_dev))
        sdest, rhi, rlo, rcnt, rpos = jax.lax.sort(
            (dest, shi, slo, run_len, pos0), num_keys=1)
        bounds = jnp.arange(n_dev, dtype=jnp.int32)
        starts = jnp.searchsorted(sdest, bounds).astype(jnp.int32)
        ends = jnp.searchsorted(sdest, bounds, side="right").astype(jnp.int32)
        counts = ends - starts
        overflow = jnp.sum(jnp.maximum(counts - cap, 0))
        hpad = jnp.concatenate([rhi, jnp.full(cap, sent_hi, jnp.uint32)])
        lpad = jnp.concatenate([rlo, jnp.full(cap, sent_lo, jnp.uint32)])
        cpad = jnp.concatenate([rcnt, jnp.zeros(cap, jnp.int32)])
        lane = jnp.arange(cap, dtype=jnp.int32)
        def make_bucket(d):
            take = lane < counts[d]
            hh = jnp.where(take, jax.lax.dynamic_slice(
                hpad, (starts[d],), (cap,)), sent_hi)
            ll = jnp.where(take, jax.lax.dynamic_slice(
                lpad, (starts[d],), (cap,)), sent_lo)
            cc = jnp.where(take, jax.lax.dynamic_slice(
                cpad, (starts[d],), (cap,)), 0)
            return hh, ll, cc

        bh, bl, bc = jax.lax.map(make_bucket, jnp.arange(n_dev))
        a2a = functools.partial(jax.lax.all_to_all, axis_name="data",
                                split_axis=0, concat_axis=0, tiled=True)
        recv_h, recv_l, recv_c = (a2a(x) for x in (bh, bl, bc))
        rbins = _sortjoin_bins_weighted_pair(
            recv_h.ravel(), recv_l.ravel(), recv_c.ravel(), k, window,
            vector_size)
        back = a2a(rbins.reshape(n_dev, cap))
        def put_bucket(d, acc):
            piece = jnp.where(lane < counts[d], back[d], -1)
            return jax.lax.dynamic_update_slice(acc, piece, (starts[d],))

        # mark the carry as device-varying: inside shard_map a literal
        # init is 'unvarying' and fori_loop requires carry types to match
        init = jax.lax.pcast(jnp.full(n_local + cap, -1, jnp.int32),
                             ("data",), to="varying")
        out = jax.lax.fori_loop(0, n_dev, put_bucket, init)
        _, kb = jax.lax.sort((rpos, out[:n_local]), num_keys=1)
        _, filled = jax.lax.associative_scan(
            lambda a, b: (a[0] | b[0], jnp.where(b[0], b[1], a[1])),
            (start, kb))
        _, bins = jax.lax.sort((spos, filled), num_keys=1)
        return bins, overflow[None]

    in_specs = ((P("data"),) * 3 if weighted
                else (P("data"), P("data")))
    bins_fn = jax.jit(shard_map(body, mesh=mesh, in_specs=in_specs,
                                out_specs=(P("data"), P("data"))))
    return bins_fn, row


class ShardedFeatureExtractor(FeatureExtractor):
    """FeatureExtractor whose device batches shard rows over the mesh."""

    # Beyond-cap datasets spill keys to host RAM and join one key-VALUE
    # range at a time, like the base class — but each range's join runs
    # through THIS class's mesh-routed kernel (_chunked_sortjoin_bins
    # dispatches via _sortjoin_bins_dispatch, and the cap/pad hooks
    # below scale the range size and n_dev-divisible padding with the
    # mesh). The stream is still read exactly once; no table-path
    # restart.
    _host_spill = True
    # The aggregated spill (features._SpillAgg) assumes single-device
    # part arrays; this class's parts live sharded over the mesh, so it
    # keeps the raw-key spill whose per-range joins route through the
    # mesh kernels. (A shard_map-local aggregation would compose - each
    # shard RLE-compresses its local windows and duplicate runs across
    # shards merge in the weighted join - left for when multi-host spill
    # walls matter.)
    _spill_aggregate = False
    # Fused stacked uploads work on the mesh too: _put_stacked places
    # each (n_batches, R, ...) plane with rows sharded over ('data',),
    # so per-batch slices inherit exactly the shardings _device_batch
    # would have used — single-host multi-chip gets the same transfer
    # amortization as one chip.
    _fuse_uploads = True

    def _put_stacked(self, arr):
        spec = P(None, "data") if arr.ndim == 2 else P(None, "data", None)
        return jax.device_put(jnp.asarray(arr),
                              NamedSharding(self.mesh, spec))
    # masked paired input runs the WEIGHTED routed join (single-word and
    # split-word: make_sharded_sortjoin[_pair](weighted=True) — routed
    # values are local weight sums instead of run lengths)
    _weighted_sortjoin = True

    def __init__(self, cfg: FeatureConfig, feature_dir: str, mesh: Mesh):
        super().__init__(cfg, feature_dir)
        self.mesh = mesh
        n = mesh.devices.size
        # rows per batch must divide evenly across shards; round on a
        # COPY — writing through cfg would mutate the caller's shared
        # config (and compound across re-construction)
        if cfg.reads_per_batch % n:
            import dataclasses
            self.cfg = cfg = dataclasses.replace(
                cfg, reads_per_batch=cfg.reads_per_batch
                + n - cfg.reads_per_batch % n)
        self._row_sharding = NamedSharding(mesh, P("data"))
        self._mat_sharding = NamedSharding(mesh, P("data", None))
        self._repl = NamedSharding(mesh, P())
        self._sortjoin_fn = None  # built lazily on first use
        self._weighted_fn = None  # weighted (masked paired) twin

    def _sortjoin_window_cap(self) -> int:
        # The window cap scales with the mesh: make_sharded_sortjoin
        # holds and sorts only N/n_dev keys per device. Used by both the
        # eligibility estimate AND the mid-stream overflow check (the
        # latter previously compared against the unscaled config cap,
        # which silently sent exactly the above-cap datasets this class
        # exists for back to the table path).
        return self.cfg.sortjoin_max_windows * self.mesh.devices.size

    def _sortjoin_pad_size(self, total: int) -> int:
        from pangaea_tpu.kernels.features import sortjoin_pad_size
        npad = sortjoin_pad_size(total)
        n = self.mesh.devices.size
        return npad + (-npad) % n  # P('data') needs n_dev-divisible length

    def _sortjoin_pad(self, n: int) -> jnp.ndarray:
        return jax.device_put(super()._sortjoin_pad(n), self._row_sharding)

    def _sortjoin_bins_single(self, keys: jnp.ndarray, row_windows
                              ) -> jnp.ndarray:
        # the routed distributed kernel already restores exact order
        # internally; the base class's row-grouped restore shortcut does
        # not compose with its all_to_all flow
        return self._sortjoin_bins(keys)

    def _sortjoin_bins(self, keys: jnp.ndarray) -> jnp.ndarray:
        """Distributed sort-join: keys (already row-sharded, since every
        batch_kmer_keys output inherits the batch's 'data' sharding) run
        through the all_to_all-routed kernel; overflow is asserted zero
        (make_sharded_sortjoin contract — never silently dropped)."""
        c = self.cfg
        if self._sortjoin_fn is None:
            self._sortjoin_fn = make_sharded_sortjoin(
                self.mesh, c.kmer, c.window_size, c.vector_size)[0]
        keys = jax.device_put(keys, self._row_sharding)
        bins, overflow = self._sortjoin_fn(keys)
        ov = int(np.asarray(overflow).sum())
        if ov:
            raise RuntimeError(
                f"sort-join routing bucket overflow ({ov} keys): raise "
                "capacity_factor (pathologically skewed key hash)")
        return bins

    def _sortjoin_pad_tuple(self, n: int, weighted: bool = False):
        return tuple(jax.device_put(w, self._row_sharding)
                     for w in super()._sortjoin_pad_tuple(
                         n, weighted=weighted))

    def _sortjoin_bins_weighted_single(self, keys, row_windows
                                       ) -> jnp.ndarray:
        """Masked-global distributed join: keys = (words, weights), both
        routed through the weighted RLE kernel (local weight sums ride
        where run lengths did); same overflow contract."""
        c = self.cfg
        if self._weighted_fn is None:
            self._weighted_fn = make_sharded_sortjoin(
                self.mesh, c.kmer, c.window_size, c.vector_size,
                weighted=True)[0]
        placed = [jax.device_put(w, self._row_sharding) for w in keys]
        bins, overflow = self._weighted_fn(*placed)
        ov = int(np.asarray(overflow).sum())
        if ov:
            raise RuntimeError(
                f"sort-join routing bucket overflow ({ov} keys): raise "
                "capacity_factor (pathologically skewed key hash)")
        return bins

    def _sortjoin_bins_weighted_pair(self, keys, row_windows
                                     ) -> jnp.ndarray:
        """Split-word masked-global distributed join: keys =
        (hi, lo, weights), all routed."""
        c = self.cfg
        if self._weighted_fn is None:
            self._weighted_fn = make_sharded_sortjoin_pair(
                self.mesh, c.kmer, c.window_size, c.vector_size,
                weighted=True)[0]
        placed = [jax.device_put(w, self._row_sharding) for w in keys]
        bins, overflow = self._weighted_fn(*placed)
        ov = int(np.asarray(overflow).sum())
        if ov:
            raise RuntimeError(
                f"sort-join routing bucket overflow ({ov} keys): raise "
                "capacity_factor (pathologically skewed key hash)")
        return bins

    def _sortjoin_bins_pair(self, keys, row_windows) -> jnp.ndarray:
        """Distributed split-word sort-join (15 < k <= 31): same routed
        kernel with (hi, lo) uint32 words and the pair-weighted owner
        core (make_sharded_sortjoin_pair); same overflow contract."""
        c = self.cfg
        if self._sortjoin_fn is None:
            self._sortjoin_fn = make_sharded_sortjoin_pair(
                self.mesh, c.kmer, c.window_size, c.vector_size)[0]
        hi, lo = (jax.device_put(w, self._row_sharding) for w in keys)
        bins, overflow = self._sortjoin_fn(hi, lo)
        ov = int(np.asarray(overflow).sum())
        if ov:
            raise RuntimeError(
                f"sort-join routing bucket overflow ({ov} keys): raise "
                "capacity_factor (pathologically skewed key hash)")
        return bins

    def _shard_batch(self, b):
        args = (jax.device_put(jnp.asarray(b.codes), self._mat_sharding),
                jax.device_put(jnp.asarray(b.lengths), self._row_sharding),
                jax.device_put(jnp.asarray(b.seg_ids), self._row_sharding),
                jax.device_put(jnp.asarray(b.cont), self._row_sharding))
        if b.lowq is not None:
            # the masked-join lowq plane shards like the code matrix
            args += (jax.device_put(jnp.asarray(b.lowq),
                                    self._mat_sharding),)
        return args

    def _device_batch(self, b):
        # group pass: reads shard over the mesh; the (G, 400/136) hist
        # accumulators stay replicated — their per-batch all-reduce is
        # ~13 MB, far cheaper than routing (unlike the 4^k global table)
        return self._shard_batch(b)

    def global_kmer_table(self, reads1: str = "", reads2: str = "",
                          interleaved: str = ""):
        from pangaea_tpu.io.packing import ReadPacker
        c = self.cfg
        min_qual = c.min_qual_char if (reads1 and reads2) else None
        packer = ReadPacker(max_read_len=c.max_read_len, overlap=c.kmer - 1,
                            reads_per_batch=c.reads_per_batch,
                            min_qual_char=min_qual)
        init_table, step, unshard, _ = make_sharded_kmer_counter(
            self.mesh, c.kmer, c.kmer - 1)
        table = init_table()
        overflows = []
        for b in packer.iter_batches(
                self._seq_stream(reads1, reads2, interleaved)):
            codes, lengths, _, cont = self._shard_batch(b)
            table, ov = step(table, codes, lengths, cont)
            overflows.append(ov)
        total_ov = sum(int(np.asarray(o).sum()) for o in overflows)
        if total_ov:
            raise RuntimeError(
                f"k-mer routing bucket overflow ({total_ov} updates): "
                f"raise capacity_factor (pathologically skewed keys)")
        # downstream group kernels index the table with global keys;
        # return it replicated (one transfer, not per-batch)
        import jax.numpy as jnp
        return jax.device_put(jnp.asarray(unshard(table)), self._repl)


def sharded_train_block(trainer, mesh: Mesh):
    """Rebind a VAETrainer's train block with explicit mesh shardings:
    index/mask batches shard over the batch dim, state is replicated."""
    repl = NamedSharding(mesh, P())
    idx_sh = NamedSharding(mesh, P(None, "data"))
    mask_sh = NamedSharding(mesh, P(None, "data", None))
    return jax.jit(
        trainer._train_block_impl,
        donate_argnums=(0, 1, 2),
        in_shardings=(repl, repl, repl, repl, repl, repl, idx_sh, mask_sh),
        out_shardings=(repl, repl, repl, repl, repl),
    )


def sharded_unit_chunk(trainer, mesh: Mesh):
    """Rebind a VAETrainer's fused multi-epoch chunk (model/train.py
    _unit_chunk_impl) with mesh shardings: batch index matrices shard
    over the batch dim, all state (params/opt/bn/early-stop/best) is
    replicated — the same data-parallel layout as sharded_train_block,
    for the loop that now runs whole epoch blocks per dispatch."""
    repl = NamedSharding(mesh, P())
    idx3_sh = NamedSharding(mesh, P(None, None, "data"))
    return jax.jit(
        trainer._unit_chunk_impl,
        donate_argnums=(0, 1, 2, 3, 4, 5, 6),
        in_shardings=(repl,) * 9 + (idx3_sh, repl, repl, idx3_sh, repl),
        out_shardings=(repl,) * 8)  # outs is one stacked (C, 8) row


def sharded_lloyd(mesh: Mesh, max_iter: int = 300):
    """kmeans Lloyd with X rows sharded over the mesh."""
    from pangaea_tpu.cluster.kmeans import _lloyd
    repl = NamedSharding(mesh, P())
    x_sh = NamedSharding(mesh, P("data", None))
    w_sh = NamedSharding(mesh, P("data"))
    # outputs: centers (k,d) replicated, labels (n,) row-sharded,
    # inertia + n_iter replicated scalars
    return jax.jit(functools.partial(_lloyd.__wrapped__, max_iter=max_iter),
                   in_shardings=(x_sh, w_sh, repl, repl),
                   out_shardings=(repl, w_sh, repl, repl))
