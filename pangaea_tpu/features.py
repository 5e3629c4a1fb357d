"""Step-1 orchestrator: streams reads through the TPU feature kernels.

Replaces the reference's three-process fan-out (src/feature.py:28-39 runs
jellyfish + count_kmer + count_tnf as subprocesses over 3 threads, reading
the input FASTQ three times) with two streaming passes:

  pass 1  global canonical k-mer table  (jellyfish equivalent)
  pass 2  per-barcode abundance histogram + TNF counts in ONE pass
          (count_kmer + count_tnf equivalents share the packed batches)

Artifact names and resume semantics mirror src/feature.py:42-44,67-123:
``abundance.k{k}.v{v}.w{w}.m{m}.pkl`` / ``.gz``, ``tnf.m{m}.pkl`` /
``.gz``, and the ``feature_finished`` marker. The .gz CSVs are
comma-separated ``barcode,c0,c1,...`` like the C++ tools' output.

Quality masking parity: jellyfish is invoked with ``--min-qual-char=?``
only on the paired-reads path (src/feature.py:76-86); the interleaved path
counts unmasked. Masking therefore applies only to the *global* counts —
count_kmer scans raw bases and relies on table lookups
(count_kmer.cpp:87). Both implementations reproduce this: the table path
masks codes in the global pass only, and the sort-join path runs the
WEIGHTED join (each window routes its unmasked key with weight 1 iff it
survives masking; kernels/features.py §quality-masked sort-join).
"""

from __future__ import annotations

import gzip
import logging
import os
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pangaea_tpu.config import FeatureConfig
from pangaea_tpu.io.fastq import iter_fastq_records
from pangaea_tpu.io.grouping import (iter_barcode_groups,
                                     iter_read_pairs_interleaved,
                                     iter_read_pairs_paired)
from pangaea_tpu.io.packing import GroupPacker, ReadPacker
from pangaea_tpu.kernels.encode import canonical_rank_lut, num_canonical_kmers
from pangaea_tpu.kernels.features import (abundance_histogram,
                                          abundance_histogram_from_bins,
                                          abundance_histogram_segsum,
                                          batch_kmer_keys, count_kmers_global,
                                          kmer_key_sentinel,
                                          make_global_table, sortjoin_bins,
                                          sortjoin_pad_size,
                                          tnf_histogram,
                                          tnf_histogram_segsum,
                                          use_segsum_impl)

log = logging.getLogger(__name__)


def pack_codes_host(codes: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(R, L) uint8 base codes (0-3 = base, >=4 = N/pad) -> 2-bit packed
    (R, L//4) + invalid bitmask (R, L//8), for 8x3/8 = 2.67x smaller
    host->device transfers. L must be a multiple of 8 (row widths are)."""
    invalid = codes >= 4
    safe = np.where(invalid, 0, codes).astype(np.uint8)
    packed = (safe[:, 0::4] | (safe[:, 1::4] << 2)
              | (safe[:, 2::4] << 4) | (safe[:, 3::4] << 6))
    mask = np.packbits(invalid, axis=1, bitorder="little")
    return packed, mask


def pack_codes_host_inread(codes: np.ndarray, lengths: np.ndarray
                           ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Like :func:`pack_codes_host` but the mask covers only IN-READ
    invalid bases (N / quality-masked), not the pad columns beyond each
    read — every kernel already excludes those via the length check
    (encode._window_validity in_read), so pad codes may decode as 0
    instead of 4 with identical results. Most real batches then have an
    all-zero mask, returned as None: the fused upload skips the whole
    mask plane (~28% of the code-matrix transfer)."""
    invalid = (codes >= 4) & (np.arange(codes.shape[1])[None, :]
                              < lengths[:, None])
    safe = np.where(codes >= 4, 0, codes).astype(np.uint8)
    packed = (safe[:, 0::4] | (safe[:, 1::4] << 2)
              | (safe[:, 2::4] << 4) | (safe[:, 3::4] << 6))
    if not invalid.any():
        return packed, None
    return packed, np.packbits(invalid, axis=1, bitorder="little")


@jax.jit
def _unpack_codes(packed: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Device-side inverse of :func:`pack_codes_host` (cheap VPU
    shifts; the unpacked (R, L) uint8 array lives in HBM exactly as an
    unpacked transfer would, so every consumer is unchanged)."""
    R, Q = packed.shape
    codes = jnp.stack([(packed >> (2 * j)) & 3 for j in range(4)],
                      axis=-1).reshape(R, Q * 4).astype(jnp.uint8)
    bits = jnp.stack([(mask >> j) & 1 for j in range(8)],
                     axis=-1).reshape(R, Q * 4)
    return jnp.where(bits != 0, jnp.uint8(4), codes)


@jax.jit
def _unpack_bits(packed: jnp.ndarray) -> jnp.ndarray:
    """(R, L//8) little-order bit plane -> (R, L) uint8 0/1 (the lowq
    plane travels 8x packed like the invalid mask)."""
    R, Q = packed.shape
    return jnp.stack([(packed >> j) & 1 for j in range(8)],
                     axis=-1).reshape(R, Q * 8).astype(jnp.uint8)


@jax.jit
def _unpack_codes_clean(packed: jnp.ndarray) -> jnp.ndarray:
    """Mask-free unpack for batches with no in-read invalid bases (the
    common case): pad columns decode as 0 instead of 4, which every
    kernel treats identically (windows there are excluded by the length
    check, never by the code value)."""
    R, Q = packed.shape
    return jnp.stack([(packed >> (2 * j)) & 3 for j in range(4)],
                     axis=-1).reshape(R, Q * 4).astype(jnp.uint8)


# Tail-batch pad rows are trimmed from the sort in multiples of this many
# rows: exact trims would mint one compiled slice/pad shape per distinct
# rows_used value, while quantizing bounds the shape set at
# reads_per_batch / _TRIM_QUANTUM (<= 32 at the default geometry) for a
# worst-case 2047 wasted pad rows per chunk tail.
_TRIM_QUANTUM = 2048


def _pow2_ceil(n: int) -> int:
    return 1 << max(0, (n - 1)).bit_length()


class _SpillAgg:
    """Device-side pre-aggregation store for the past-the-cap spill.

    Phase A feeds whole untrimmed batch parts; every ``S`` parts are
    concatenated and aggregated ON DEVICE (kernels/features.py
    ``spill_aggregate*``: 3 sorts -> per-window run ids + compacted
    unique (key, weight-sum) runs). Only the unique runs are transferred
    D2H (one entry per distinct key per chunk — the spilled stream is
    Zipfian-duplicated, so this is the duplication-factor win over the
    r4 raw-key spill); run ids stay on the device, in host RAM, or on
    disk per FeatureConfig.spill_store. ``finalize_bins`` then joins the
    unique entries through the existing weighted sort-join and builds
    one run->bin table per chunk; ``batch_bins`` maps a batch's windows
    to bins with a single bandwidth-shaped table lookup, entirely on
    device. Matches the reference's constant-rate streaming contract
    (count_kmer.cpp:186-292 + jellyfish's RAM-bounded hash,
    src/feature.py:76-86).
    """

    def __init__(self, fe: "FeatureExtractor", weighted: bool,
                 per_batch: int):
        cfg = fe.cfg
        self.fe = fe
        self.weighted = weighted
        self.per_batch = per_batch
        self.S = max(1, min(cfg.spill_agg_windows,
                            fe._sortjoin_window_cap()) // per_batch)
        self.nw = 1 if cfg.kmer <= 15 else 2
        store = cfg.spill_store
        if store == "auto":
            store = "disk" if cfg.spill_dir else "device"
        if store == "disk" and not cfg.spill_dir:
            raise ValueError("spill_store='disk' requires spill_dir")
        self.store = store
        self.budget = cfg.spill_device_budget
        self.dev_bytes = 0
        self.buf: List[Tuple] = []
        self.groups: List[dict] = []
        if cfg.spill_dir:
            os.makedirs(cfg.spill_dir, exist_ok=True)
        self._cur_g = -1
        self._cur_bins = None
        # disk mode keeps host RSS FLAT: unique runs append to
        # key-hash-partitioned bucket files (equal keys share a bucket,
        # so per-bucket joins are global and exact) carrying
        # (chunk, run_id) back-pointers, and the per-chunk run->bin
        # tables live in memmapped files — phase B touches one bucket
        # at a time, phase C one chunk at a time.
        self.n_buckets = 64
        if self.store == "disk":
            self._bucket_paths = [
                os.path.join(cfg.spill_dir, f"spill_bucket_{b}.bin")
                for b in range(self.n_buckets)]
            for p in self._bucket_paths:
                open(p, "wb").close()

    # ---- phase A ---------------------------------------------------------

    def add_part(self, part: Tuple) -> None:
        """part: untrimmed (word0[, word1][, weights]) device arrays of
        exactly per_batch windows (the final part of the stream may be
        shorter only if the packer emitted a short batch — it never
        does; uniform shapes keep the compiled-shape set bounded)."""
        self.buf.append(part)
        if len(self.buf) == self.S:
            self._flush()

    def finish(self) -> None:
        if self.buf:
            self._flush()

    def _flush(self) -> None:
        from pangaea_tpu.kernels.features import (
            spill_aggregate, spill_aggregate_pair,
            spill_aggregate_pair_weighted, spill_aggregate_weighted)
        parts, self.buf = self.buf, []
        nw = self.nw
        cat = (lambda i: parts[0][i] if len(parts) == 1 else
               jnp.concatenate([p[i] for p in parts]))
        words = tuple(cat(i) for i in range(nw))
        k = self.fe.cfg.kmer
        if self.weighted:
            w = cat(nw)
            if nw == 1:
                out = spill_aggregate_weighted(words[0], w, k=k)
            else:
                out = spill_aggregate_pair_weighted(*words, w, k=k)
        else:
            if nw == 1:
                out = spill_aggregate(words[0], k=k)
            else:
                out = spill_aggregate_pair(*words, k=k)
        run_ids, uwords, uwt, n_runs_d, n_valid_d = out
        n_runs, n_valid = (int(x) for x in
                           np.asarray(jnp.stack([n_runs_d, n_valid_d])))
        n_win = int(words[0].shape[0])
        # compacted unique prefix at a pow2-quantized length so the
        # slice programs stay a bounded, dataset-deterministic set
        uq = min(_pow2_ceil(max(1, n_valid)), n_win)
        grp = {"n_windows": n_win, "n_runs": n_runs, "n_valid": n_valid,
               "uq": uq, "bins_table": None}
        store = self.store
        if store == "device" and \
                self.dev_bytes + 4 * n_win + 12 * uq > self.budget:
            log.info("spill run-id store: device budget reached "
                     "(%d B); later chunks go to host RAM",
                     self.dev_bytes)
            store = self.store = "host"
        if store == "device":
            # fully device-resident chunk: the uniques stay on the chip
            # too (entries in (n_valid, uq] masked to sentinel/0 so the
            # pow2 slice can join verbatim), and NOTHING crosses the
            # link for this chunk but two scalars
            ar = jnp.arange(uq, dtype=jnp.int32)
            live = ar < n_valid_d
            sent = self.fe._sortjoin_pad_tuple(1, weighted=True)
            grp["uniq_dev"] = tuple(
                jnp.where(live, wd[:uq], sv[0])
                for wd, sv in zip(uwords, sent[:-1]))
            grp["uw_dev"] = jnp.where(live, uwt[:uq], 0)
            grp["run_ids"] = run_ids
            self.dev_bytes += 4 * n_win + 12 * uq
        elif store == "host":
            grp["uniq"] = tuple(np.asarray(wd[:uq])[:n_valid]
                                for wd in uwords)
            grp["uw"] = np.asarray(uwt[:uq])[:n_valid]
            grp["run_ids"] = np.asarray(run_ids)
        else:  # disk: run ids to a per-chunk file, uniques to buckets
            path = os.path.join(self.fe.cfg.spill_dir,
                                f"spill_runids_{len(self.groups)}.bin")
            np.asarray(run_ids).tofile(path)
            grp["run_ids"] = path
            uniq = [np.asarray(wd[:uq])[:n_valid] for wd in uwords]
            uw_np = np.asarray(uwt[:uq])[:n_valid]
            self._bucket_append(uniq, uw_np, len(self.groups))
        self.groups.append(grp)
        log.info("spill chunk %d aggregated: %d windows -> %d unique "
                 "runs (%.1fx), store=%s", len(self.groups), n_win,
                 max(1, n_valid), n_win / max(1, n_valid), store)

    def _bucket_append(self, uniq: List[np.ndarray], uw: np.ndarray,
                       chunk_id: int) -> None:
        """Append this chunk's unique runs to the key-hash bucket files
        as (key words..., w, chunk, run_id) int32 rows."""
        nv = uw.shape[0]
        if nv == 0:
            return
        if self.nw == 1:
            hv = uniq[0].astype(np.uint32)
        else:
            hv = uniq[0] ^ (uniq[1] * np.uint32(2654435761))
        b = ((hv * np.uint32(2654435761)) >> np.uint32(26)).astype(np.int64)
        runs = np.arange(nv, dtype=np.int32)
        cols = [w.view(np.int32) if w.dtype == np.uint32 else
                w.astype(np.int32) for w in uniq]
        cols += [uw.astype(np.int32),
                 np.full(nv, chunk_id, np.int32), runs]
        rows = np.column_stack(cols)
        for bi in np.unique(b):
            with open(self._bucket_paths[bi], "ab") as f:
                rows[b == bi].tofile(f)

    # ---- phase B ---------------------------------------------------------

    def _finalize_disk(self) -> None:
        """Flat-RSS phase B: one bucket in memory at a time; bins
        scatter into per-chunk memmapped run->bin tables."""
        fe = self.fe
        cap = fe._sortjoin_window_cap()
        ncols = self.nw + 3
        tables = []
        for i, g in enumerate(self.groups):
            T = max(128, _pow2_ceil(max(1, g["n_runs"])))
            path = os.path.join(fe.cfg.spill_dir, f"spill_table_{i}.npy")
            mm = np.lib.format.open_memmap(path, mode="w+",
                                           dtype=np.int32, shape=(T,))
            mm[:] = -1
            tables.append(mm)
            g["bins_table"] = path
        sizes = [os.path.getsize(p) // (4 * ncols)
                 for p in self._bucket_paths]
        pad_n = fe._sortjoin_pad_size(max(1, min(cap, max(sizes, default=1))))
        for bi, p in enumerate(self._bucket_paths):
            if sizes[bi] == 0:
                continue
            rows = np.fromfile(p, np.int32).reshape(-1, ncols)
            if self.nw == 1:
                words = [rows[:, 0]]
            else:
                words = [rows[:, 0].view(np.uint32),
                         rows[:, 1].view(np.uint32)]
            w = rows[:, self.nw]
            chunks = rows[:, self.nw + 1]
            runs = rows[:, self.nw + 2]
            E_b = rows.shape[0]
            if E_b > cap:
                bins = fe._chunked_sortjoin_bins(
                    [tuple(words) + (w,)], weighted=True)
            else:
                pad = fe._sortjoin_pad_tuple(pad_n - E_b, weighted=True)
                dev = tuple(jnp.asarray(np.concatenate([c, np.asarray(pw)]))
                            for c, pw in zip(words + [w], pad))
                bins = np.asarray(fe._sortjoin_bins_dispatch(
                    dev, row_windows=None, weighted=True))[:E_b]
            for c in np.unique(chunks):
                m = chunks == c
                tables[c][runs[m]] = bins[m]
            del rows
            log.info("disk spill: bucket %d/%d joined (%d entries)",
                     bi + 1, self.n_buckets, E_b)
        for mm in tables:
            mm.flush()
        del tables

    def finalize_bins(self) -> None:
        """Join all chunks' unique (key, weight) entries; build one
        run->bin table per chunk (padded to pow2 multiples of 128 with
        -1 so the phase-C lookup compiles a bounded shape set).
        Device-resident chunks contribute their on-chip uniques directly
        (their masked uq-prefix entries), so a fully device-resident
        spill joins and builds tables with zero per-entry link traffic;
        host/disk chunks upload their exact n_valid prefix."""
        fe = self.fe
        groups = self.groups
        if self.store == "disk":
            self._finalize_disk()
            return

        def n_entries(g):
            return g["uq"] if "uniq_dev" in g else len(g["uw"])

        E = sum(n_entries(g) for g in groups)
        tsize = (lambda g: max(128, _pow2_ceil(max(1, g["n_runs"]))))
        if E == 0:
            for g in groups:
                g["bins_table"] = jnp.full(tsize(g), -1, jnp.int32)
            return
        cap = fe._sortjoin_window_cap()
        if E <= cap:
            npad = fe._sortjoin_pad_size(E)
            cols = []
            for i in range(self.nw):
                cols.append([g["uniq_dev"][i] if "uniq_dev" in g
                             else jnp.asarray(g["uniq"][i])
                             for g in groups])
            wcol = [g["uw_dev"] if "uniq_dev" in g
                    else jnp.asarray(g["uw"]) for g in groups]
            if npad > E:
                pad = fe._sortjoin_pad_tuple(npad - E, weighted=True)
                for i in range(self.nw):
                    cols[i].append(pad[i])
                wcol.append(pad[-1])
            dev = tuple(jnp.concatenate(c) if len(c) > 1 else c[0]
                        for c in cols)
            dev = dev + (jnp.concatenate(wcol) if len(wcol) > 1
                         else wcol[0],)
            bins_dev = fe._sortjoin_bins_dispatch(
                dev, row_windows=None, weighted=True)
            off = 0
            for g in groups:
                ne = n_entries(g)
                T = tsize(g)
                sl = bins_dev[off:off + ne]
                # masked entries (device chunks, ids in [n_valid, uq))
                # carry the sentinel key and already joined to -1; ids in
                # [uq/n_valid, n_runs) are sentinel runs -> -1 fill
                g["bins_table"] = (jnp.concatenate(
                    [sl, jnp.full(T - ne, -1, jnp.int32)])
                    if T > ne else sl[:T])
                off += ne
        else:
            # beyond-cap unique set: fall back to the host ranged join
            # (device chunks transfer their uniques once)
            host_parts = []
            for g in groups:
                if "uniq_dev" in g:
                    nv = g["n_valid"]
                    g["uniq"] = tuple(np.asarray(w)[:nv]
                                      for w in g["uniq_dev"])
                    g["uw"] = np.asarray(g["uw_dev"])[:nv]
                    g.pop("uniq_dev"), g.pop("uw_dev")
                if len(g["uw"]):
                    host_parts.append(g["uniq"] + (g["uw"],))
            bins_np = fe._chunked_sortjoin_bins(host_parts, weighted=True)
            off = 0
            for g in groups:
                nv = len(g["uw"])
                table = np.full(tsize(g), -1, np.int32)
                table[:nv] = bins_np[off:off + nv]
                off += nv
                g["bins_table"] = table
            assert off == len(bins_np)
        for g in groups:
            for key in ("uniq", "uw", "uniq_dev", "uw_dev"):
                g.pop(key, None)  # free

    # ---- phase C ---------------------------------------------------------

    def batch_bins(self, j: int) -> jnp.ndarray:
        """Device (per_batch,) bins for global batch index j (stream
        order). Loads/maps one chunk at a time."""
        g, r = divmod(j, self.S)
        if g != self._cur_g:
            self._load_group(g)
        lo = r * self.per_batch
        return self._cur_bins[lo:lo + self.per_batch]

    def _load_group(self, g: int) -> None:
        from pangaea_tpu.kernels.features import map_run_bins
        grp = self.groups[g]
        rid = grp["run_ids"]
        if isinstance(rid, str):
            rid = jnp.asarray(np.fromfile(rid, dtype=np.int32))
        elif isinstance(rid, np.ndarray):
            rid = jnp.asarray(rid)
        table = grp["bins_table"]
        if isinstance(table, str):
            table = np.load(table)
        table = jnp.asarray(table)
        self._cur_bins = map_run_bins(table, rid)
        self._cur_g = g

    def cleanup(self) -> None:
        if self.fe.cfg.spill_dir:
            for g in self.groups:
                for key in ("run_ids", "bins_table"):
                    if isinstance(g.get(key), str):
                        try:
                            os.remove(g[key])
                        except OSError:
                            pass
            for p in getattr(self, "_bucket_paths", []):
                try:
                    os.remove(p)
                except OSError:
                    pass


class SortJoinOverflow(RuntimeError):
    """Dataset exceeded the window cap mid-stream on an extractor with
    host spill disabled; the caller restarts on the streaming
    global-table path. Both stock extractors (single-device AND sharded)
    spill to the chunked host join instead — this remains only as the
    escape hatch for subclasses that opt out of spilling."""


class FeatureExtractor:
    def __init__(self, cfg: FeatureConfig, feature_dir: str):
        self.cfg = cfg
        self._rl: Optional[int] = None  # auto row length for this extract
        self.dir = feature_dir
        os.makedirs(feature_dir, exist_ok=True)
        c = cfg
        stem = f"abundance.k{c.kmer}.v{c.vector_size}.w{c.window_size}.m{c.min_length}"
        self.abd_gz = os.path.join(feature_dir, stem + ".gz")
        self.abd_pkl = os.path.join(feature_dir, stem + ".pkl")
        self.tnf_gz = os.path.join(feature_dir, f"tnf.m{c.min_length}.gz")
        self.tnf_pkl = os.path.join(feature_dir, f"tnf.m{c.min_length}.pkl")
        self.marker = os.path.join(feature_dir, "feature_finished")

    # ---- input streams ----------------------------------------------------

    def _pair_stream(self, reads1: str, reads2: str, interleaved: str):
        if interleaved:
            return iter_read_pairs_interleaved(interleaved)
        if reads1 and reads2:
            return iter_read_pairs_paired(reads1, reads2)
        raise ValueError("reads must be specified")

    def _seq_stream(self, reads1: str, reads2: str, interleaved: str
                    ) -> Iterator[Tuple[str, str]]:
        """All sequences with quals, for the global pass."""
        if interleaved:
            for rec in iter_fastq_records(interleaved):
                yield rec.seq, rec.qual
        elif reads1 and reads2:
            for path in (reads1, reads2):
                for rec in iter_fastq_records(path):
                    yield rec.seq, rec.qual
        else:
            raise ValueError("reads must be specified")

    # ---- row geometry -----------------------------------------------------

    @property
    def row_len(self) -> int:
        """Packed row width: the auto-sampled length when enabled, else
        cfg.max_read_len. Rows narrower than the longest read are still
        exact — the python packer splits overlong reads across
        continuation rows; the native path raises OverlongReadError and
        extract_features retries once at cfg.max_read_len."""
        return self._rl or self.cfg.max_read_len

    def _auto_row_len(self, reads1: str, reads2: str, interleaved: str,
                      sample: int = 50_000) -> Optional[int]:
        """Max read length over a prefix sample, rounded up to 8. Padding
        windows beyond the read carry the sentinel but still cost sort
        and histogram compute (150 bp reads in 256-wide rows waste ~44%
        of the feature pass). 50k reads (~60 ms) is plenty for the
        homogeneous read lengths of real runs, and an underestimate is
        merely a retry (OverlongReadError -> one pass at max_read_len),
        never wrong output."""
        c = self.cfg
        paths = [interleaved] if interleaved else [
            p for p in (reads1, reads2) if p]
        if not paths:
            return None
        mx = 0
        scanned = False
        try:
            from pangaea_tpu.native import (NativeFastqReader,
                                            native_available)
            if native_available():
                remaining = sample
                for p in paths:
                    with NativeFastqReader(p, max_len=1) as rd:
                        while remaining > 0:
                            out = rd.read(min(65536, remaining))
                            if out is None:
                                break
                            mx = max(mx, int(out[1].max(initial=0)))
                            remaining -= len(out[1])
                scanned = True
        except Exception as e:
            log.debug("native row-length scan failed (%s)", e)
        if not scanned:
            n = 0
            for p in paths:
                for rec in iter_fastq_records(p):
                    mx = max(mx, len(rec.seq))
                    n += 1
                    if n >= sample:
                        break
                if n >= sample:
                    break
        if mx == 0:
            return None
        row = min(c.max_read_len, max(c.kmer, -(-mx // 8) * 8))
        if row != c.max_read_len:
            log.info("auto row length %d (sampled max read %d, "
                     "max_read_len %d)", row, mx, c.max_read_len)
        return row

    # ---- passes -----------------------------------------------------------

    def _global_batches(self, reads1: str, reads2: str, interleaved: str):
        """Native C++ reader when available; Python packer otherwise."""
        c = self.cfg
        min_qual = c.min_qual_char if (reads1 and reads2) else None
        # path choice is made eagerly (never mid-stream, which could
        # double-count); OverlongReadError propagates with advice
        use_native = False
        try:
            from pangaea_tpu.native import native_available
            use_native = native_available()
        except Exception as e:
            log.warning("native IO unavailable (%s)", e)
        if use_native:
            from pangaea_tpu.io.fast_packing import native_seq_batches
            paths = [interleaved] if interleaved else [reads1, reads2]
            yield from native_seq_batches(
                paths, self.row_len, c.reads_per_batch,
                min_qual_char=min_qual)
            return
        packer = ReadPacker(max_read_len=self.row_len, overlap=c.kmer - 1,
                            reads_per_batch=c.reads_per_batch,
                            min_qual_char=min_qual)
        yield from packer.iter_batches(
            self._seq_stream(reads1, reads2, interleaved))

    def global_kmer_table(self, reads1: str = "", reads2: str = "",
                          interleaved: str = "") -> jnp.ndarray:
        from pangaea_tpu.io.prefetch import prefetch
        c = self.cfg
        table = make_global_table(c.kmer)
        n = 0
        events = (("batch", b)
                  for b in self._global_batches(reads1, reads2, interleaved))
        for _, (b, args) in prefetch(self._device_event_batches(events),
                                     depth=4):
            codes, lengths, _, cont = args
            table = count_kmers_global(table, codes, lengths, cont,
                                       k=c.kmer, overlap=c.kmer - 1)
            n += b.codes.shape[0]
            if n % (50 * c.reads_per_batch) == 0:
                log.info("global pass: %d read rows", n)
        return table

    def _group_events(self, reads1: str, reads2: str, interleaved: str,
                      keep_dropped: bool = False):
        """("batch", b)/("chunk", names) event stream for the group pass
        (native C++ parse when available, Python packer otherwise).
        Returns (groups_per_chunk, events).

        Paired (-1/-2) sort-join streams additionally carry (a) the lowq
        plane when min_qual_char is set (the weighted masked-global join,
        src/feature.py:76-86) and (b) mismatched R1/R2 pairs as
        global-only seg -1 reads (jellyfish counts them even though
        count_kmer.cpp:195-197 skips them from grouping)."""
        c = self.cfg
        masked = bool(keep_dropped and reads1 and reads2
                      and not interleaved and c.min_qual_char)
        gp = GroupPacker(min_len=c.min_length, max_read_len=self.row_len,
                         overlap=c.kmer - 1,
                         reads_per_batch=c.reads_per_batch,
                         keep_dropped=keep_dropped,
                         min_qual_char=c.min_qual_char if masked else None)
        use_native = False
        if c.bug_compat_boundary_leak:
            try:
                from pangaea_tpu.native import native_available
                use_native = native_available()
            except Exception:
                pass
        if use_native and interleaved:
            from pangaea_tpu.io.fast_packing import native_group_events
            return gp.groups_per_chunk, native_group_events(
                interleaved, c.min_length, self.row_len,
                c.reads_per_batch, gp.groups_per_chunk,
                keep_dropped=keep_dropped)
        if use_native and reads1 and reads2 and keep_dropped:
            # paired native path (lockstep readers; mismatched pairs as
            # global-only rows; lowq plane when masked). The table-path
            # group pass (keep_dropped=False) keeps the python packer:
            # it predates this path and is not the hot configuration.
            from pangaea_tpu.io.fast_packing import \
                native_group_events_paired
            return gp.groups_per_chunk, native_group_events_paired(
                reads1, reads2, c.min_length, self.row_len,
                c.reads_per_batch, gp.groups_per_chunk,
                keep_dropped=True,
                min_qual_char=c.min_qual_char if masked else None)
        if interleaved or not keep_dropped:
            pairs = self._pair_stream(reads1, reads2, interleaved)
        else:
            # sort-join global counts must cover mismatched pairs too
            pairs = iter_read_pairs_paired(reads1, reads2,
                                           drop_unpaired=False)
        groups = iter_barcode_groups(
            pairs, bug_compat=c.bug_compat_boundary_leak)
        return gp.groups_per_chunk, gp.iter_events(groups)

    def group_features(self, table: jnp.ndarray, reads1: str = "",
                       reads2: str = "", interleaved: str = ""
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Pass 2: per-barcode abundance + TNF in one stream."""
        c = self.cfg
        overlap = c.kmer - 1
        ncols = num_canonical_kmers(c.tnf_kmer)
        lut = jnp.asarray(canonical_rank_lut(c.tnf_kmer))
        G, events = self._group_events(reads1, reads2, interleaved)
        from pangaea_tpu.io.prefetch import prefetch
        segsum = use_segsum_impl(c.hist_impl)
        names: List[str] = []
        abd_rows, tnf_rows = [], []

        def fresh():
            if segsum:
                return (jnp.zeros((G, c.vector_size), jnp.int32),
                        jnp.zeros((G, ncols), jnp.int32))
            return (jnp.zeros(G * c.vector_size, jnp.int32),
                    jnp.zeros(G * ncols, jnp.int32))

        hist, thist = fresh()
        for kind, payload in prefetch(self._device_event_batches(events),
                                      depth=4):
            if kind == "chunk":
                names += payload
                g = len(payload)
                # trim to the chunk's real group count ON DEVICE so the
                # final transfer moves len(names) rows, not chunks * G
                abd_rows.append(hist.reshape(G, c.vector_size)[:g])
                tnf_rows.append(thist.reshape(G, ncols)[:g])
                hist, thist = fresh()
                log.info("group pass: %d barcodes", len(names))
                continue
            b, args = payload
            if segsum:
                hist = abundance_histogram_segsum(
                    hist, table, *args, k=c.kmer, window=c.window_size,
                    vector_size=c.vector_size, overlap=overlap,
                    n_groups=G)
                thist = tnf_histogram_segsum(
                    thist, *args, k=c.tnf_kmer, num_cols=ncols,
                    overlap=overlap, n_groups=G)
            else:
                hist = abundance_histogram(
                    hist, table, *args, k=c.kmer, window=c.window_size,
                    vector_size=c.vector_size, overlap=overlap)
                thist = tnf_histogram(thist, lut, *args, k=c.tnf_kmer,
                                      num_cols=ncols, overlap=overlap)
        if not names:
            return (np.array([], dtype=object),
                    np.zeros((0, c.vector_size), np.int32),
                    np.zeros((0, ncols), np.int32))
        # one blocking transfer for all chunks (see group_features_sortjoin)
        abd_all = np.asarray(jnp.concatenate(abd_rows)
                             if len(abd_rows) > 1 else abd_rows[0])
        tnf_all = np.asarray(jnp.concatenate(tnf_rows)
                             if len(tnf_rows) > 1 else tnf_rows[0])
        return np.array(names), abd_all, tnf_all

    # ---- sort-join fast path ----------------------------------------------

    # Masked paired sort-join support (the weighted join,
    # kernels/features.py §quality-masked). True everywhere — the
    # sharded extractor routes weights too (dist.py
    # make_sharded_sortjoin[_pair](weighted=True)); subclasses without a
    # weighted kernel can flip this off to fall back to the table path.
    _weighted_sortjoin = True

    def sortjoin_eligible(self, reads1: str, reads2: str,
                          interleaved: str) -> bool:
        """Sort-join (kernels/features.py) is exact when the global k-mer
        multiset equals the group stream's — automatic on interleaved
        input; on paired (-1/-2) input the quality-masked global pass
        (src/feature.py:76-86) is reproduced by the WEIGHTED join, so
        paired input is eligible wherever the weighted kernels are
        (everywhere but the sharded extractor) — and the whole window set
        fits on the device."""
        import jax
        c = self.cfg
        if c.hist_impl in ("scatter", "segsum"):
            return False
        if not interleaved:
            if not (reads1 and reads2):
                return False
            if c.min_qual_char and not self._weighted_sortjoin:
                return False
        if c.kmer > 15:
            # sort-join is the ONLY large-k implementation (the dense 4^k
            # table and int32 window values stop at k=15); the overflow
            # cap is enforced mid-stream, not estimated away here
            return True
        if c.hist_impl == "sortjoin":
            return True
        if jax.default_backend() == "cpu":
            return False  # CPU scatters are fast; sorts win on TPU
        if self._host_spill:
            # the chunked host-spill join removes the device window cap
            # (the estimate now only picks the starting mode); matches
            # count_kmer.cpp:186-292, which streams arbitrarily large
            # inputs — the remaining bound is host RAM, as jellyfish's is
            return True
        est_windows = self._estimate_stream_windows(
            interleaved if interleaved else (reads1, reads2))
        if est_windows is None:
            return False
        # 5% headroom: a wrong guess is not fatal (the mid-stream overflow
        # restart is graceful) but still costs the restart
        return est_windows * 21 // 20 <= self._sortjoin_window_cap()

    def _estimate_stream_windows(self, path_or_paths) -> Optional[int]:
        """Sorted-window count the sort-join would produce, estimated by
        parsing a decompressed prefix sample: records/compressed-byte and
        packed rows/record are measured, then scaled to the file size.
        Replaces the old gz-ratio guess (bytes*4/2), which assumed a fixed
        compression ratio and read length and could be off by >2x either
        way. Exact (not an estimate) when the sample covers the file.
        A (reads1, reads2) tuple estimates each file and sums."""
        if isinstance(path_or_paths, tuple):
            parts = [self._estimate_stream_windows(p)
                     for p in path_or_paths]
            if any(p is None for p in parts):
                return None
            return sum(parts)
        interleaved = path_or_paths
        import zlib
        c = self.cfg
        try:
            size = os.path.getsize(interleaved)
            with open(interleaved, "rb") as f:
                raw = f.read(4 << 20)
        except OSError:
            return None
        if not raw:
            return 0
        consumed = len(raw)
        if interleaved.endswith((".gz", ".bgz")):
            data = bytearray()
            buf = bytes(raw)
            try:
                while buf:
                    d = zlib.decompressobj(wbits=31)
                    data += d.decompress(buf)
                    if not d.eof:
                        break  # member continues past the prefix
                    buf = d.unused_data
            except zlib.error:
                pass  # truncated tail of the prefix — expected
            text = bytes(data)
        else:
            text = raw
        lines = text.split(b"\n")
        nrec = (len(lines) - 1) // 4  # drop the trailing partial record
        if nrec == 0:
            return None
        rl, step = self.row_len, self.row_len - (c.kmer - 1)
        rows = 0
        for seq in lines[1:4 * nrec:4]:
            n = len(seq)
            rows += 1 if n <= rl else 1 + -(-(n - rl) // step)
        if consumed >= size:
            est_rows = rows  # whole file sampled: exact
        else:
            est_rows = int(rows * (size / consumed)) + 1
        wrow = rl - c.kmer + 1
        est_batches = -(-est_rows // c.reads_per_batch)
        return est_batches * c.reads_per_batch * wrow

    def _sortjoin_events(self, reads1: str, reads2: str, interleaved: str):
        """Group events for the sort-join pass (keep_dropped: the global
        counts must cover every read, like jellyfish over the whole
        file — src/feature.py:76-86)."""
        return self._group_events(reads1, reads2, interleaved,
                                  keep_dropped=True)

    # Sort-join past the device window cap spills keys to host RAM and
    # joins one key-VALUE range at a time. The sharded extractor spills
    # too — each range runs through its mesh-routed kernel (its cap/pad
    # hooks scale range size and padding with the mesh).
    _host_spill = True

    # Aggregated spill (device-side sort+RLE per chunk, _SpillAgg) is the
    # default; the sharded extractor flips this off — its batches live
    # sharded on the mesh and run the raw-key spill through its routed
    # kernels instead.
    _spill_aggregate = True

    def _spill_impl(self) -> str:
        """'agg' (device pre-aggregation) or 'raw' (r4 raw-key spill,
        kept for A/B). PANGAEA_SPILL_IMPL overrides the config — but
        never the class opt-out: the sharded extractor's batches live
        sharded over the mesh and _SpillAgg assumes single-device
        arrays, so 'agg' there would dispatch with wrong placement."""
        if not self._spill_aggregate:
            return "raw"
        env = os.environ.get("PANGAEA_SPILL_IMPL")
        if env in ("raw", "agg"):
            return env
        if self.cfg.spill_agg == "off":
            return "raw"
        return "agg"

    def group_features_sortjoin(self, reads1: str = "", reads2: str = "",
                                interleaved: str = ""
                                ) -> Tuple[np.ndarray, np.ndarray,
                                           np.ndarray]:
        """Single-pass features via the sort-join abundance kernel.

        Phase A streams the (keep_dropped) group chunks once: per batch it
        collects the canonical k-mer key of every window and accumulates
        the TNF histogram. Phase B sorts all keys to derive each window's
        global count == abundance bin. Phase C replays the recorded
        seg_ids to histogram the bins per barcode. The FASTQ is read once
        (the table path reads it twice).

        On paired (-1/-2) input with ``min_qual_char`` set, the join is
        WEIGHTED: each window routes its unmasked key with weight 1 iff
        no base of the window falls below the quality threshold, so run
        weight sums reproduce jellyfish's --min-qual-char global counts
        exactly (src/feature.py:76-86; see kernels/features.py
        §quality-masked sort-join). ``count > 0`` then reproduces
        count_kmer.cpp:87's absent-from-dump skip.

        Datasets whose window set exceeds ``sortjoin_max_windows`` run the
        same join CHUNKED: phase-A keys spill to host RAM (decided upfront
        by the sampled estimate, or mid-stream on overflow — either way
        the stream is still read once) and phase B becomes
        :meth:`_chunked_sortjoin_bins`, which partitions the keys by key
        value so every range fits the device cap and joins each range
        independently and exactly.
        """
        import jax
        from pangaea_tpu.io.prefetch import prefetch
        c = self.cfg
        overlap = c.kmer - 1
        ncols = num_canonical_kmers(c.tnf_kmer)
        # interleaved wins when both input forms are given (matching
        # _pair_stream/_group_events), and the interleaved flow counts
        # UNMASKED (src/feature.py:94) — so weighting requires paired-only
        weighted = bool(reads1 and reads2 and not interleaved
                        and c.min_qual_char)
        G, events = self._sortjoin_events(reads1, reads2, interleaved)
        cap = self._sortjoin_window_cap()
        rows = c.reads_per_batch
        wrow = self.row_len - c.kmer + 1
        per_batch = rows * wrow
        spill = False
        agg: Optional[_SpillAgg] = None
        if self._host_spill:
            est = self._estimate_stream_windows(
                interleaved if interleaved else (reads1, reads2))
            if est is not None and est * 21 // 20 > cap:
                log.info("sort-join host-spill mode: ~%d windows > device "
                         "cap %d", est, cap)
                spill = True
                if self._spill_impl() == "agg":
                    agg = _SpillAgg(self, weighted, per_batch)
        keys_parts: List[Tuple] = []  # device tuples; np tuples when spill
        chunk_meta = []  # (names, [(seg_ids, kept_rows)], thist)
        total = 0
        thist = None
        segs = []
        # Every tail batch (a chunk's last, not just the stream's) carries
        # trailing pad rows whose windows are pure sentinel sort cost —
        # often the difference between landing just above vs below a pow2
        # sort tier (+32% measured, sortjoin_pad_size). rows_used is
        # recorded at pack time; the kept row count quantizes up to
        # _TRIM_QUANTUM rows so the slice/re-pad ops keep a bounded set of
        # compiled shapes while the histogram replay below re-pads each
        # part to the uniform (rows, wrow) the jitted kernel expects.
        for kind, payload in prefetch(self._device_event_batches(events),
                                      depth=4):
            if kind == "chunk":
                chunk_meta.append((payload, segs,
                                   thist if thist is not None else
                                   jnp.zeros((G, ncols), jnp.int32)))
                segs, thist = [], None
                log.info("sortjoin pass A: %d barcodes, %d windows",
                         sum(len(m[0]) for m in chunk_meta), total)
                continue
            b, dev_args = payload
            codes, lengths, seg, cont = dev_args[:4]
            if thist is None:
                thist = jnp.zeros((G, ncols), jnp.int32)
            kept_rows = rows
            if b.rows_used < rows:
                kept_rows = min(rows, -(-b.rows_used // _TRIM_QUANTUM)
                                * _TRIM_QUANTUM)
            if weighted:
                # the masked-join weights come from the lowq plane; a
                # silently missing plane would produce UNMASKED counts,
                # so its absence is an error, not a default
                assert len(dev_args) > 4, \
                    "masked sort-join batch arrived without a lowq plane"
                words, wts = self._batch_keys_weighted(
                    codes, dev_args[4], lengths, cont)
                part = words + (wts,)
            else:
                part = self._batch_keys(codes, lengths, cont)
            if agg is not None:
                # aggregated spill: parts stay UNTRIMMED (uniform
                # per_batch shapes for the aggregation programs; trailing
                # pad windows are sentinel-keyed and collapse into the
                # sentinel run, so they cost sort passes, never output)
                agg.add_part(part)
                total += part[0].shape[0]
            else:
                if kept_rows < rows:
                    kw = kept_rows * wrow
                    part = tuple(w[:kw] for w in part)
                if spill:
                    part = tuple(np.asarray(w) for w in part)
                keys_parts.append(part)
                total += part[0].shape[0]
            segs.append((seg, kept_rows))
            thist = tnf_histogram_segsum(
                thist, codes, lengths, seg, cont, k=c.tnf_kmer,
                num_cols=ncols, overlap=overlap, n_groups=G)
            if not spill and total > cap:
                if not self._host_spill:
                    raise SortJoinOverflow(
                        f"{total} windows > the mesh window cap {cap}")
                log.warning(
                    "sort-join overflow (%d windows > cap %d); spilling "
                    "collected keys and continuing chunked "
                    "(the stream is still read only once)",
                    total, c.sortjoin_max_windows)
                if self._spill_impl() == "agg":
                    agg = _SpillAgg(self, weighted, per_batch)
                    for p in keys_parts:
                        short = per_batch - p[0].shape[0]
                        if short:
                            # re-pad parts the trim already cut: the cut
                            # windows were sentinel-keyed pad anyway
                            padt = self._sortjoin_pad_tuple(
                                short, weighted=weighted)
                            p = tuple(jnp.concatenate([w, pw])
                                      for w, pw in zip(p, padt))
                        agg.add_part(p)
                else:
                    keys_parts = [tuple(np.asarray(w) for w in t)
                                  for t in keys_parts]
                keys_parts = [] if agg is not None else keys_parts
                spill = True
        if thist is not None or segs:
            # trailing batches with no closing chunk event (defensive;
            # the packers always close)
            chunk_meta.append(([], segs,
                               thist if thist is not None else
                               jnp.zeros((G, ncols), jnp.int32)))
        if not chunk_meta or total == 0:
            return (np.array([], dtype=object),
                    np.zeros((0, c.vector_size), np.int32),
                    np.zeros((0, ncols), np.int32))
        bins_at = None
        if agg is not None:
            agg.finish()
            agg.finalize_bins()
        elif spill:
            bins_host = self._chunked_sortjoin_bins(keys_parts,
                                                    weighted=weighted)
            del keys_parts

            def bins_at(off, kw):
                s = bins_host[off:off + kw]
                if kw < per_batch:
                    s = np.concatenate(
                        [s, np.full(per_batch - kw, -1, np.int32)])
                return jnp.asarray(s)
        else:
            npad = self._sortjoin_pad_size(total)
            if npad > total:
                keys_parts.append(
                    self._sortjoin_pad_tuple(npad - total,
                                             weighted=weighted))
            nwords = len(keys_parts[0])
            keys = tuple(jnp.concatenate([p[i] for p in keys_parts])
                         for i in range(nwords))
            del keys_parts
            bins = self._sortjoin_bins_dispatch(keys, row_windows=wrow,
                                                weighted=weighted)
            del keys

            def bins_at(off, kw):
                s = jax.lax.dynamic_slice(bins, (off,), (kw,))
                if kw < per_batch:
                    s = jnp.concatenate(
                        [s, jnp.full(per_batch - kw, -1, jnp.int32)])
                return s
        import time as _time
        t_replay0 = _time.time()
        names: List[str] = []
        abd_dev, tnf_dev = [], []
        off = 0
        bi = 0
        for cnames, segs, thist in chunk_meta:
            hist = jnp.zeros((G, c.vector_size), jnp.int32)
            for seg, kept_rows in segs:
                if agg is not None:
                    bmat = agg.batch_bins(bi).reshape(rows, wrow)
                else:
                    kw = kept_rows * wrow
                    bmat = bins_at(off, kw).reshape(rows, wrow)
                    off += kw
                bi += 1
                hist = abundance_histogram_from_bins(
                    hist, bmat, seg,
                    vector_size=c.vector_size, n_groups=G)
            names += list(cnames)
            # trim to the chunk's real group count ON DEVICE: the final
            # transfer then moves len(names) rows, not chunks * G
            # (17 MB -> 6.4 MB at the bench geometry)
            g = len(cnames)
            abd_dev.append(hist[:g])
            tnf_dev.append(thist[:g])
        self._phase_times = {"replay_dispatch": _time.time() - t_replay0}
        log.info("sortjoin done: %d barcodes, %d windows", len(names), total)
        if not names:
            return (np.array([], dtype=object),
                    np.zeros((0, c.vector_size), np.int32),
                    np.zeros((0, ncols), np.int32))
        # ONE blocking device->host transfer for all chunks: per-chunk
        # np.asarray forced a tunnel round trip per chunk (2 per chunk x
        # dozens of chunks dominated e2e time on remote chips); rows are
        # already trimmed per chunk on device.
        t_d2h0 = _time.time()
        abd_all = np.asarray(jnp.concatenate(abd_dev)
                             if len(abd_dev) > 1 else abd_dev[0])
        tnf_all = np.asarray(jnp.concatenate(tnf_dev)
                             if len(tnf_dev) > 1 else tnf_dev[0])
        self._phase_times["final_d2h_sync"] = _time.time() - t_d2h0
        if agg is not None:
            agg.cleanup()
        return np.array(names), abd_all, tnf_all

    def _chunked_sortjoin_bins(self, host_parts: List[Tuple[np.ndarray, ...]],
                               weighted: bool = False) -> np.ndarray:
        """Exact sort-join over host-resident keys, one key-VALUE range at
        a time, each range within the device window cap (which the
        sharded extractor scales with the mesh).

        Partitioning by key value means equal keys always share a range,
        so per-range joins are independent and exact — no cross-range
        merge. Every window is still sorted exactly twice (the same device
        sort volume as the single-pass path); the extra costs are the host
        counting partition (O(N) numpy) and one extra host<->device round
        trip of ~8 bytes/window. Range boundaries come from quantiles of a
        <=1M-key sample, so ranges balance even though canonical-key
        density is 2x mean at the low end of the key space; exact range
        sizes are then verified by bincount, and all ranges pad to one
        shared shape (a single extra XLA compilation). A hot key with more
        instances than the cap cannot be split (its range just runs
        larger, with a warning) — the join is still exact.

        Returns per-window abundance bins in stream order (-1 = masked or
        out-of-range), matching :func:`sortjoin_bins` semantics. With
        ``weighted`` each part carries a trailing weight word (the
        quality-masked paired global join); weights ride the partition —
        equal keys share a range, so per-range weight sums stay exact.
        """
        c = self.cfg
        nw = len(host_parts[0]) - (1 if weighted else 0)
        w_all = (np.concatenate([p[-1] for p in host_parts])
                 if weighted else None)
        if nw == 1:
            sent = np.int32(kmer_key_sentinel(c.kmer))
            v = np.concatenate([p[0] for p in host_parts])
        else:
            from pangaea_tpu.kernels.features import kmer_key_sentinel_pair
            shi, slo = kmer_key_sentinel_pair(c.kmer)
            sent = (np.uint64(shi) << np.uint64(32)) | np.uint64(slo)
            v = np.concatenate(
                [(p[0].astype(np.uint64) << np.uint64(32))
                 | p[1].astype(np.uint64) for p in host_parts])
        N = v.shape[0]
        bins_all = np.full(N, -1, np.int32)
        valid = v < sent
        nval = int(valid.sum())
        if nval == 0:
            return bins_all
        cap = self._sortjoin_window_cap()
        # 5% headroom so quantile jitter rarely pushes a range past the
        # cap (which would cost a fresh compile shape)
        nparts = max(1, -(-nval // max(1, cap * 19 // 20)))
        if nparts > 1:
            # stride BEFORE masking: v[valid] would copy all valid keys
            # (gigabytes at the scales this path exists for) just to
            # stride them away
            step = max(1, N // 1_000_000)
            vs = v[::step]
            sample = np.sort(vs[vs < sent])
            qpos = (np.arange(1, nparts) * len(sample)) // nparts
            bounds = np.unique(sample[qpos])
        else:
            bounds = np.empty(0, v.dtype)
        inval_digit = len(bounds) + 1
        dt = np.uint8 if inval_digit < 255 else np.int32
        digits = np.searchsorted(bounds, v, side="right").astype(dt)
        digits[~valid] = inval_digit
        counts = np.bincount(digits, minlength=inval_digit + 1)[:inval_digit]
        # pad every range to the cap's padded shape, NOT the
        # data-dependent max count: the compile shape is then a pure
        # function of the config (warmable, persistent-cache-friendly —
        # tunnel compiles cost minutes per distinct shape) at the price
        # of a few % sentinel slack. Quantile-balanced ranges sit a
        # little under the cap; only a hot-key range can exceed it.
        pad_n = self._sortjoin_pad_size(cap if counts.max() <= cap
                                        else int(counts.max()))
        if counts.max() > cap:
            log.warning(
                "chunked sort-join: a key range holds %d windows > cap %d "
                "(hot keys cannot split across ranges); running one "
                "larger sort", int(counts.max()), cap)

        # Range membership via one flatnonzero scan per range (a dozen
        # sequential passes), NOT a stable argsort of all N digits: the
        # argsort was measured at most of the host partition cost at the
        # 339M-window scale (tools/bench_chunked_scale.py), and its int64
        # permutation alone is 8 B/window of transient RAM.
        def build_range(p):
            idx = np.flatnonzero(digits == p)
            if idx.size == 0:
                return None
            kv = v[idx]
            if nw == 1:
                w0 = np.full(pad_n, sent, np.int32)
                w0[:kv.size] = kv
                words = (w0,)
            else:
                hi = np.full(pad_n, np.uint32(shi), np.uint32)
                lo = np.full(pad_n, np.uint32(slo), np.uint32)
                hi[:kv.size] = (kv >> np.uint64(32)).astype(np.uint32)
                lo[:kv.size] = (kv & np.uint64(0xFFFFFFFF)
                                ).astype(np.uint32)
                words = (hi, lo)
            if weighted:
                wv = np.zeros(pad_n, np.int32)
                wv[:kv.size] = w_all[idx]
                words = words + (wv,)
            return idx, tuple(jnp.asarray(w) for w in words)

        # Two-deep pipeline: range p+1's host scan/gather and H2D upload
        # are dispatched before range p's bins are synced, so host prep
        # and transfers overlap the device sorts instead of serializing
        # (the joins are independent — partitioning is by key value).
        pending = None  # (idx, device bins)

        def drain():
            nonlocal pending
            idx, dev = pending
            bins_all[idx] = np.asarray(dev)[:idx.size]
            pending = None

        done = 0
        for p in range(len(counts)):
            built = build_range(p)
            if built is None:
                continue
            idx, words = built
            dev = self._sortjoin_bins_dispatch(words, row_windows=None,
                                               weighted=weighted)
            if pending is not None:
                drain()
            pending = (idx, dev)
            done += 1
            log.info("chunked sort-join: range %d/%d (%d windows) "
                     "dispatched", done, int((counts > 0).sum()),
                     int(idx.size))
        if pending is not None:
            drain()
        return bins_all

    def _sortjoin_pad_size(self, total: int) -> int:
        """Padded sort length (sharded twin rounds to the mesh size)."""
        return sortjoin_pad_size(total)

    def _sortjoin_window_cap(self) -> int:
        """Windows the device path may hold at once; the sharded twin
        scales this with the mesh (each device sorts N/n_dev), so the
        mid-stream overflow check must use it, not the raw config cap."""
        return self.cfg.sortjoin_max_windows

    def _sortjoin_pad(self, n: int) -> jnp.ndarray:
        """Sentinel padding for the sort (sharded twin places it on the
        mesh)."""
        return jnp.full(n, kmer_key_sentinel(self.cfg.kmer), jnp.int32)

    def _sortjoin_bins(self, keys: jnp.ndarray) -> jnp.ndarray:
        """Key array -> per-window bins; ShardedFeatureExtractor overrides
        with the all_to_all-routed distributed sort-join."""
        c = self.cfg
        return sortjoin_bins(keys, k=c.kmer, window=c.window_size,
                             vector_size=c.vector_size)

    # -- split-word (15 < k <= 31) plumbing: keys travel as a tuple of
    #    uint32 words; the single-word k <= 15 path is the 1-tuple so the
    #    sharded overrides of _sortjoin_pad/_sortjoin_bins stay intact.

    def _batch_keys(self, codes, lengths, cont) -> Tuple[jnp.ndarray, ...]:
        c = self.cfg
        if c.kmer <= 15:
            return (batch_kmer_keys(codes, lengths, cont, k=c.kmer,
                                    overlap=c.kmer - 1),)
        from pangaea_tpu.kernels.features import batch_kmer_keys_pair
        return batch_kmer_keys_pair(codes, lengths, cont, k=c.kmer,
                                    overlap=c.kmer - 1)

    def _batch_keys_weighted(self, codes, lowq, lengths, cont
                             ) -> Tuple[Tuple[jnp.ndarray, ...],
                                        jnp.ndarray]:
        """(key words, weights) for the quality-masked paired global join
        (kernels/features.py §quality-masked sort-join)."""
        c = self.cfg
        from pangaea_tpu.kernels.features import (
            batch_kmer_keys_pair_weighted, batch_kmer_keys_weighted)
        if c.kmer <= 15:
            keys, wts = batch_kmer_keys_weighted(
                codes, lowq, lengths, cont, k=c.kmer, overlap=c.kmer - 1)
            return (keys,), wts
        words, wts = batch_kmer_keys_pair_weighted(
            codes, lowq, lengths, cont, k=c.kmer, overlap=c.kmer - 1)
        return words, wts

    def _sortjoin_pad_tuple(self, n: int, weighted: bool = False
                            ) -> Tuple[jnp.ndarray, ...]:
        c = self.cfg
        if c.kmer <= 15:
            words = (self._sortjoin_pad(n),)
        else:
            from pangaea_tpu.kernels.features import kmer_key_sentinel_pair
            shi, slo = kmer_key_sentinel_pair(c.kmer)
            words = (jnp.full(n, shi, jnp.uint32),
                     jnp.full(n, slo, jnp.uint32))
        if weighted:
            words += (jnp.zeros(n, jnp.int32),)
        return words

    def _sortjoin_bins_dispatch(self, keys: Tuple[jnp.ndarray, ...],
                                row_windows: Optional[int] = None,
                                weighted: bool = False) -> jnp.ndarray:
        c = self.cfg
        rg = (row_windows is not None and c.vector_size <= 511
              and keys[0].shape[0] // row_windows < (1 << 22))
        rw = row_windows if rg else None
        if weighted:
            if len(keys) == 2:
                return self._sortjoin_bins_weighted_single(keys, rw)
            return self._sortjoin_bins_weighted_pair(keys, rw)
        if len(keys) == 1:
            return self._sortjoin_bins_single(keys[0], rw)
        return self._sortjoin_bins_pair(keys, rw)

    def _sortjoin_bins_weighted_single(self, keys, row_windows
                                       ) -> jnp.ndarray:
        """Masked-global single-word bins: keys = (words, weights)."""
        c = self.cfg
        from pangaea_tpu.kernels.features import (
            sortjoin_bins_weighted, sortjoin_bins_weighted_rowgrouped)
        if row_windows is not None:
            return sortjoin_bins_weighted_rowgrouped(
                *keys, k=c.kmer, window=c.window_size,
                vector_size=c.vector_size, row_windows=row_windows)
        return sortjoin_bins_weighted(*keys, k=c.kmer,
                                      window=c.window_size,
                                      vector_size=c.vector_size)

    def _sortjoin_bins_weighted_pair(self, keys, row_windows
                                     ) -> jnp.ndarray:
        """Masked-global split-word bins: keys = (hi, lo, weights)."""
        c = self.cfg
        from pangaea_tpu.kernels.features import (
            sortjoin_bins_weighted_pair,
            sortjoin_bins_weighted_pair_rowgrouped)
        if row_windows is not None:
            return sortjoin_bins_weighted_pair_rowgrouped(
                *keys, k=c.kmer, window=c.window_size,
                vector_size=c.vector_size, row_windows=row_windows)
        return sortjoin_bins_weighted_pair(
            *keys, k=c.kmer, window=c.window_size,
            vector_size=c.vector_size)

    def _sortjoin_bins_pair(self, keys: Tuple[jnp.ndarray, ...],
                            row_windows: Optional[int]) -> jnp.ndarray:
        """Split-word bins; ShardedFeatureExtractor overrides with the
        routed distributed pair kernel."""
        c = self.cfg
        from pangaea_tpu.kernels.features import (
            sortjoin_bins_pair, sortjoin_bins_pair_rowgrouped)
        if row_windows is not None:
            return sortjoin_bins_pair_rowgrouped(
                *keys, k=c.kmer, window=c.window_size,
                vector_size=c.vector_size, row_windows=row_windows)
        return sortjoin_bins_pair(*keys, k=c.kmer, window=c.window_size,
                                  vector_size=c.vector_size)

    def _sortjoin_bins_single(self, keys: jnp.ndarray,
                              row_windows: Optional[int]) -> jnp.ndarray:
        """Single-word bins: the row-grouped restore (one packed uint32
        sort instead of the exact two-operand index sort — the consumer
        reduces per row, so within-row order is free) when geometry
        allows; ShardedFeatureExtractor overrides this back to its
        routed exact-order path."""
        c = self.cfg
        if row_windows is not None:
            from pangaea_tpu.kernels.features import sortjoin_bins_rowgrouped
            return sortjoin_bins_rowgrouped(
                keys, k=c.kmer, window=c.window_size,
                vector_size=c.vector_size, row_windows=row_windows)
        return self._sortjoin_bins(keys)

    def _device_batch(self, b):
        """Host batch -> device arrays; ShardedFeatureExtractor overrides
        this with mesh placements. A 5th element (the lowq plane) rides
        along on the quality-masked paired path."""
        args = (self._device_codes(b.codes), jnp.asarray(b.lengths),
                jnp.asarray(b.seg_ids), jnp.asarray(b.cont))
        if b.lowq is not None:
            if self._pack_transfers and b.lowq.shape[1] % 8 == 0:
                lq = _unpack_bits(jnp.asarray(np.packbits(
                    b.lowq != 0, axis=1, bitorder="little")))
            else:
                lq = jnp.asarray(b.lowq)
            args += (lq,)
        return args

    # Host->device links are bandwidth-curved, not per-call: the SAME
    # 12 MiB measured 1143 ms as 15 x 800 KiB uploads but 295 ms as one
    # transfer (tools/ab_transfer.py, tunneled v5e; PCIe curves the same
    # way, just higher). So ship up to this many batches per upload.
    _upload_batches = 16
    _fuse_uploads = True

    def _put_stacked(self, arr: np.ndarray) -> jnp.ndarray:
        """Place one stacked (n_batches, R, ...) fused-upload plane on
        the device. ShardedFeatureExtractor overrides with a mesh
        sharding over the row axis, so fused transfers work on
        single-host multi-chip too."""
        return jnp.asarray(arr)

    def _device_event_batches(self, events):
        """("batch", b) -> ("batch", (b, device_args)), passing "chunk"
        events through in order.

        Runs the event source (host parse + pack) in a producer thread
        and fuses runs of exactly ``_upload_batches`` consecutive batches
        (shorter at chunk boundaries / stream end) into one stacked
        2-bit-packed host->device transfer; device-side slicing + unpack
        reproduce exactly what per-batch uploads produced, so every
        kernel is unchanged. Run sizes are a function of stream position
        only — availability-adaptive fusion was tried and reverted: its
        timing-dependent run lengths minted fresh compiled shapes for the
        per-batch slices on every run, which on the tunneled backend put
        multi-second compiles inside warm-cached runs. Falls back to
        per-batch uploads on the CPU backend (no transfer to save);
        mesh subclasses place the stacked planes via _put_stacked."""
        if not (self._fuse_uploads and self._pack_transfers):
            for kind, payload in events:
                if kind == "batch":
                    yield kind, (payload, self._device_batch(payload))
                else:
                    yield kind, payload
            return
        from pangaea_tpu.io.prefetch import fixed_runs
        for item in fixed_runs(events, self._upload_batches,
                               lambda ev: ev[0] == "batch"):
            if not isinstance(item, list):
                yield item
                continue
            grp = [ev[1] for ev in item]
            if len(grp) == 1 or grp[0].codes.shape[1] % 8 != 0:
                for b in grp:
                    yield "batch", (b, self._device_batch(b))
                continue
            packed_l, mask_l = zip(*(pack_codes_host_inread(b.codes,
                                                            b.lengths)
                                     for b in grp))
            packed = self._put_stacked(np.stack(packed_l))
            # the mask plane ships only when some batch has an in-read
            # invalid base; pad columns never need it (kernels exclude
            # them by length), so clean groups save ~28% of the volume
            mask = None
            if any(m is not None for m in mask_l):
                R, L = grp[0].codes.shape
                zero = np.zeros((R, L // 8), np.uint8)
                mask = self._put_stacked(np.stack(
                    [m if m is not None else zero for m in mask_l]))
            # lengths/segs travel 16-bit (reads < 64 KiB; chunk-local
            # group ids < 32k at any sane groups_per_chunk — int32 kept
            # if a huge chunk config ever exceeds that) and widen on
            # device
            len_np = np.stack([b.lengths for b in grp])
            if len_np.max(initial=0) < 65536:
                len_np = len_np.astype(np.uint16)
            lengths = self._put_stacked(len_np)
            seg_np = np.stack([b.seg_ids for b in grp])
            if seg_np.max(initial=0) < 32767:
                seg_np = seg_np.astype(np.int16)
            segs = self._put_stacked(seg_np)
            conts = self._put_stacked(np.stack([b.cont for b in grp]))
            lowq = None
            if grp[0].lowq is not None:
                lowq = self._put_stacked(np.stack(
                    [np.packbits(b.lowq != 0, axis=1, bitorder="little")
                     for b in grp]))
            for i, b in enumerate(grp):
                codes_i = (_unpack_codes_clean(packed[i]) if mask is None
                           else _unpack_codes(packed[i], mask[i]))
                args = (codes_i, lengths[i].astype(jnp.int32),
                        segs[i].astype(jnp.int32), conts[i])
                if lowq is not None:
                    args += (_unpack_bits(lowq[i]),)
                yield "batch", (b, args)

    def _device_codes(self, codes: np.ndarray) -> jnp.ndarray:
        """Code-matrix transfer: 2-bit packed + invalid bitmask when the
        backend is an accelerator (2.67x less host->device traffic —
        transfers dominate e2e time on remote/tunneled chips and are
        ~1/3 of it over PCIe), unpacked on the CPU backend where there
        is no transfer to save."""
        if self._pack_transfers and codes.shape[1] % 8 == 0:
            return _unpack_codes(*map(jnp.asarray, pack_codes_host(codes)))
        return jnp.asarray(codes)

    @property
    def _pack_transfers(self) -> bool:
        mode = self.cfg.pack_transfers
        if mode == "auto":
            return jax.default_backend() != "cpu"
        return bool(mode == "on" or mode is True)

    # ---- artifacts --------------------------------------------------------

    @staticmethod
    def _write_csv_gz(path: str, names: np.ndarray, mat: np.ndarray) -> None:
        """Same bytes as the reference tools' gzipped CSV (name,c0,c1,...)
        but written via pandas' C csv writer at gzip level 1: the naive
        per-value ``str(int(v))`` loop cost 2.1 s for 3000x536 features —
        over half the e2e feature wall (tools/profile_e2e.py); this writes
        the identical decompressed bytes in ~0.3 s. Parity checks compare
        decompressed content, so the compression level is free choice."""
        df = FeatureExtractor._make_frame(names, mat)
        FeatureExtractor._write_frame_gz(df, path)

    @staticmethod
    def _make_frame(names: np.ndarray, mat: np.ndarray):
        """DataFrame CONSTRUCTION stays on the caller's thread: pandas/
        pyarrow string-array construction is not thread-safe in this
        build (two threads building string-column frames segfault
        intermittently); `to_csv` on an already-built frame is safe off
        the main thread."""
        import pandas as pd
        df = pd.DataFrame(np.asarray(mat, dtype=np.int64))
        df.insert(0, "name", np.asarray(names))
        return df

    @staticmethod
    def _write_frame_gz(df, path: str) -> None:
        # write-then-rename: a crash mid-write must not leave a partial
        # .gz that the artifact-cache existence check would trust
        tmp = path + ".tmp"
        with gzip.open(tmp, "wt", compresslevel=1) as f:
            df.to_csv(f, header=False, index=False, lineterminator="\n")
        os.replace(tmp, path)

    @staticmethod
    def _read_csv_gz(path: str) -> Tuple[np.ndarray, np.ndarray]:
        # pandas' C parser: the per-line int() loop cost ~1 s of every
        # resumed step-2 at the 240k-read bench geometry. dtype=str on
        # column 0 so numeric-looking barcodes round-trip verbatim;
        # na_filter=False so a name in pandas' NA set ('NA', 'nan', empty)
        # round-trips byte-for-byte instead of becoming the string 'nan'
        # (and the parse is faster with NA detection off).
        import pandas as pd
        df = pd.read_csv(path, header=None, dtype={0: str},
                         keep_default_na=False, na_filter=False)
        names = df[0].to_numpy().astype(str)
        mat = df.drop(columns=0).to_numpy().astype(np.int32)
        return names, mat

    def _save(self, names, abd, tnf) -> None:
        # Only the gz CSVs — exactly what the reference's count_kmer /
        # count_tnf binaries emit. The .pkl caches are written at load
        # time (load_features), mirroring src/feature.py:115-119 where
        # pd.read_csv(...).to_pickle happens in the Python load step,
        # not in the extraction binaries. Written SEQUENTIALLY on
        # purpose: a two-thread variant segfaulted intermittently in
        # pandas/pyarrow's string-array construction (ArrowStringArray
        # _from_sequence is not thread-safe in this build) — the ~130 ms
        # it saved is not worth a crashing writer.
        self._write_csv_gz(self.abd_gz, names, abd)
        self._write_csv_gz(self.tnf_gz, names, tnf)

    def _write_pkl(self, names, mat, path) -> None:
        """Pickle layout of pd.read_csv(header=None).to_pickle
        (src/feature.py:115-119): column 0 = barcode (object), columns
        1.. = int64 counts."""
        import pandas as pd
        df = pd.DataFrame(np.asarray(mat, dtype=np.int64),
                          columns=range(1, mat.shape[1] + 1))
        df.insert(0, 0, np.asarray(names, dtype=object))
        df.to_pickle(path)

    def _extract_inner(self, reads1: str, reads2: str, interleaved: str
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        c = self.cfg
        if c.kmer > 15:
            # the reference reaches k <= 31 through jellyfish -m + its
            # uint64 encode (count_kmer.cpp:79-86); here large k exists
            # only as the split-word sort-join (no dense 4^k table);
            # paired masked input runs the weighted pair join
            if not self.sortjoin_eligible(reads1, reads2, interleaved):
                raise ValueError(
                    f"k={c.kmer} > 15 requires the sort-join path: pass "
                    "hist_impl='auto'/'sortjoin' (the dense table only "
                    "exists for k <= 15)")
            try:
                return self.group_features_sortjoin(reads1, reads2,
                                                    interleaved)
            except SortJoinOverflow as e:
                raise RuntimeError(
                    f"k={c.kmer} > 15 has no table fallback; raise "
                    "FeatureConfig.sortjoin_max_windows (HBM permitting) "
                    "or shard over more devices") from e
        if self.sortjoin_eligible(reads1, reads2, interleaved):
            try:
                return self.group_features_sortjoin(reads1, reads2,
                                                    interleaved)
            except SortJoinOverflow as e:
                log.warning("sort-join overflow (%s); restarting on the "
                            "streaming table path", e)
        table = self.global_kmer_table(reads1, reads2, interleaved)
        names, abd, tnf = self.group_features(table, reads1, reads2,
                                              interleaved)
        del table
        return names, abd, tnf

    def extract_features(self, reads1: str = "", reads2: str = "",
                         interleaved: str = "", defer_save: bool = False
                         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """``defer_save=True`` moves the artifact write (two gzip CSVs +
        the ``feature_finished`` marker, ~1.1 s of pure host IO at the
        800k-read bench geometry) onto a background thread so it
        overlaps the next pipeline stage's tunnel-idle time. The marker
        is only written AFTER both files land (resume stays correct: a
        crash mid-save re-runs step 1), and the caller must invoke
        :meth:`wait_save` before relying on the artifacts — the
        pipeline joins at the end of its run, inside the measured
        wall."""
        if os.path.exists(self.abd_gz) and os.path.exists(self.tnf_gz):
            log.info("features already extracted, loading")
            return self.load_features()
        self._rl = (self._auto_row_len(reads1, reads2, interleaved)
                    if self.cfg.auto_row_len else None)
        try:
            names, abd, tnf = self._extract_inner(reads1, reads2,
                                                  interleaved)
        except Exception as e:
            from pangaea_tpu.io.fast_packing import OverlongReadError
            if not (isinstance(e, OverlongReadError)
                    and self._rl is not None):
                raise
            # a read longer than the sampled maximum appeared on the
            # native path (the python packer would have split it);
            # retry once at the configured width
            log.warning("auto row length %d too small (%s); retrying at "
                        "max_read_len=%d", self._rl, e,
                        self.cfg.max_read_len)
            self._rl = None
            names, abd, tnf = self._extract_inner(reads1, reads2,
                                                  interleaved)
        if defer_save:
            frames = [(self._make_frame(names, abd), self.abd_gz),
                      (self._make_frame(names, tnf), self.tnf_gz)]

            def _bg():
                for df, path in frames:
                    self._write_frame_gz(df, path)
                with open(self.marker, "w") as f:
                    f.write("feature finished")

            import concurrent.futures
            pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
            self._pending_save = pool.submit(_bg)
            pool.shutdown(wait=False)
        else:
            self._save(names, abd, tnf)
            with open(self.marker, "w") as f:
                f.write("feature finished")
        return names, abd, tnf

    def wait_save(self) -> None:
        """Join a ``defer_save`` background write; re-raises its error
        (the marker is then absent, so a re-run redoes step 1)."""
        pending = getattr(self, "_pending_save", None)
        if pending is not None:
            self._pending_save = None
            pending.result()

    def export_jellyfish_dump(self, table, path: str) -> int:
        """Write the global table as a jellyfish ``dump -c -t`` file
        (``KMER\\tCOUNT`` lines, counts >= 1) — interchange format with the
        reference's count_kmer (src/feature.py:87,101-103), which
        re-canonicalizes on load (count_kmer.cpp:144-169) so any string
        form of each canonical k-mer is accepted."""
        from pangaea_tpu.kernels.encode import decode_kmers
        t = np.asarray(table)
        nz = np.flatnonzero(t)
        strs = decode_kmers(nz, self.cfg.kmer)
        with open(path, "w") as f:
            for s, c in zip(strs, t[nz]):
                f.write(f"{s.decode()}\t{int(c)}\n")
        return len(nz)

    def import_jellyfish_dump(self, path: str) -> jnp.ndarray:
        """Load a jellyfish ``dump -c -t`` file into a dense count table —
        the drop-in analog of count_kmer's ``-g`` input
        (count_kmer.cpp:139-170): each line's k-mer string is
        re-canonicalized on load, so dumps written with either strand
        convention are accepted. Use with :meth:`group_features` to bin
        against externally-computed global counts."""
        from pangaea_tpu.kernels.encode import encode_bases, revcomp_kmers_np
        k = self.cfg.kmer
        vals, counts = [], []
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt") as f:
            for line in f:
                mer, cnt = line.split()
                if len(mer) != k:
                    raise ValueError(
                        f"dump k-mer '{mer}' length {len(mer)} != k={k}")
                codes = encode_bases(mer.upper().encode("ascii"))
                v = 0
                for c in codes:
                    v = (v << 2) | int(c)
                vals.append(v)
                counts.append(int(cnt))
        v = np.asarray(vals, np.uint32)
        canon = np.minimum(v, revcomp_kmers_np(v, k)).astype(np.int64)
        t = np.zeros(4 ** k, np.int32)
        np.add.at(t, canon, np.asarray(counts, np.int32))
        return jnp.asarray(t)

    def load_features(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        import pandas as pd
        if os.path.isfile(self.abd_pkl) and os.path.isfile(self.tnf_pkl):
            a = pd.read_pickle(self.abd_pkl)
            t = pd.read_pickle(self.tnf_pkl)
            names = a[0].to_numpy()
            names_t = t[0].to_numpy()
            abd = a.drop(columns=0).to_numpy().astype(np.int64)
            tnf = t.drop(columns=0).to_numpy().astype(np.int64)
        else:
            names, abd = self._read_csv_gz(self.abd_gz)
            names_t, tnf = self._read_csv_gz(self.tnf_gz)
            # write-through pkl cache, like src/feature.py:115-119 (the
            # reference converts CSV -> pkl on first load, not at
            # extraction)
            try:
                self._write_pkl(names, abd, self.abd_pkl)
                self._write_pkl(names_t, tnf, self.tnf_pkl)
            except OSError:
                pass  # read-only feature dir: the CSVs remain the source
        assert (names == names_t).all()  # src/feature.py:35 invariant
        return names, abd, tnf
