"""Built-in TPU k-mer vote mapper — bwa replacement for the asm layer.

The reference maps reads back to binned contigs with ``bwa mem`` solely to
derive (a) per-contig depth (jgi_summarize_bam_contig_depths) and (b) the
set of read pairs with no good alignment to high-coverage contigs
(bin_assembly.sh:33-45, extract_unmapped.cpp) — plus contig-to-seed
containment in merge_olc.py:32-52. None of those need base-exact
alignments, so the built-in fallback is a k-mer vote mapper that runs on
the TPU:

- index: dense 4^k int32 table (k=13 => 256 MB HBM) mapping canonical
  k-mer -> contig_id+1. On collisions (a k-mer shared by two contigs —
  e.g. a repeat copied between genomes) a per-k-mer hash coin decides
  the winner (min-id vs max-id), so a shared repeat's k-mers split
  ~50/50 between its copies. This mirrors bwa's arbitrary primary-
  alignment tie-break (which jgi depths then count), and halves the
  repeat-migration depth bias of the previous last-writer-wins rule:
  measured on a 3-contig sim with a 15% shared repeat, the repeat-free
  contig's depth is exact and the repeat carriers diverge by about half
  the repeat fraction (tests/test_asm.py::
  test_kmer_mapper_depth_error_bound_and_cutoff_agreement).
- map: for a packed read batch, gather contig ids for every canonical
  k-mer window, sort ids per row, and take the longest equal-run => (best
  contig, vote count, valid window count) per row. Sorting rides the TPU's
  vectorized bitonic sort; the run-length scan is a cummax trick.

Outputs are written as real BAM records (io/bam.py) with cigar ``<len>M``
and an NM tag derived from the vote fraction, so the downstream
extract_unmapped port (asm/unmapped.py) runs identically on external-bwa
and built-in paths. Positions are not estimated (pos=0) — nothing
downstream reads them. When bwa/samtools are installed the pipeline
prefers them (asm/bin_assembly.py).
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pangaea_tpu.io.bam import (BamRecord, BamWriter, FPAIRED, FREAD1,
                                FREAD2, FUNMAP)
from pangaea_tpu.io.packing import _BatchBuilder, _split_rows
from pangaea_tpu.kernels.encode import (canonical_kmers, encode_bases,
                                        kmer_window_values)

DEFAULT_K = 13


def _iter_packed(seqs: Iterator[Tuple[str, int]], max_len: int, overlap: int,
                 rows: int):
    bb = _BatchBuilder(rows, max_len)
    for seq, seg in seqs:
        codes = encode_bases(seq.encode("ascii"))
        for row, is_cont in _split_rows(codes, max_len, overlap):
            out = bb.add_row(row, seg, is_cont)
            if out is not None:
                yield out
    out = bb.flush()
    if out is not None:
        yield out


# empty-table sentinel: below every signed-magnitude entry (see below)
_EMPTY = jnp.int32(-(2 ** 31))


@functools.partial(jax.jit, static_argnames=("k", "overlap"),
                   donate_argnames=("table",))
def _index_batch(table, codes, lengths, seg_ids, cont, *, k, overlap):
    skip = cont.astype(jnp.int32) * max(0, overlap - (k - 1))
    vals, valid = kmer_window_values(codes, lengths, k, win_skip=skip)
    canon = canonical_kmers(vals, k)
    idx = jnp.where(valid & (seg_ids[:, None] >= 0), canon,
                    jnp.int32(table.shape[0]))
    # Collision rule via one max-scatter: a per-k-mer hash bit picks the
    # sign convention, so max() keeps the LARGEST id for half the k-mers
    # (positive entries) and the SMALLEST id for the other half (negative
    # entries, where max = least negative = min id). Contig id is
    # recovered as |entry| - 1; _EMPTY loses every max().
    coin = ((canon * jnp.int32(-1640531527)) >> 15) & 1  # 0x9E3779B9
    mag = (seg_ids[:, None] + 1) * jnp.ones_like(canon)
    val = jnp.where(coin == 1, mag, -mag)
    return table.at[idx.ravel()].max(val.ravel(), mode="drop")


@functools.partial(jax.jit, static_argnames=("k",))
def _map_batch(table, codes, lengths, *, k):
    vals, valid = kmer_window_values(codes, lengths, k)
    canon = canonical_kmers(vals, k)
    ent = table[canon]
    ids = jnp.where(valid & (ent != _EMPTY), jnp.abs(ent), 0)  # 0 = none
    R, W = ids.shape
    s = jnp.sort(ids, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    # longest equal-run of nonzero ids per row: run start indices via
    # cummax of boundary positions, run length = col - last_boundary
    is_new = jnp.concatenate(
        [jnp.ones((R, 1), bool), s[:, 1:] != s[:, :-1]], axis=1)
    boundary = jnp.where(is_new, col, -1)
    last_boundary = jax.lax.cummax(boundary, axis=1)
    runlen = jnp.where(s > 0, col - last_boundary + 1, 0)
    votes = jnp.max(runlen, axis=1)
    best = jnp.take_along_axis(s, jnp.argmax(runlen, axis=1)[:, None],
                               axis=1)[:, 0] - 1  # -1 => none
    nvalid = jnp.sum(valid, axis=1)
    return best, votes, nvalid


class KmerMapper:
    def __init__(self, k: int = DEFAULT_K, max_row_len: int = 1024,
                 rows_per_batch: int = 4096):
        self.k = k
        self.max_row_len = max_row_len
        self.rows = rows_per_batch
        self.table = None
        self.contig_names: List[str] = []
        self.contig_lengths: List[int] = []

    def index_contigs(self, contigs: Sequence[Tuple[str, str]]) -> None:
        """contigs: [(name, seq), ...]"""
        self.contig_names = [c[0].split()[0] for c in contigs]
        self.contig_lengths = [len(c[1]) for c in contigs]
        self.table = jnp.full(4 ** self.k, _EMPTY, jnp.int32)
        seqs = ((seq, i) for i, (_, seq) in enumerate(contigs))
        for b in _iter_packed(seqs, self.max_row_len, self.k - 1, self.rows):
            self.table = _index_batch(
                self.table, jnp.asarray(b.codes), jnp.asarray(b.lengths),
                jnp.asarray(b.seg_ids), jnp.asarray(b.cont),
                k=self.k, overlap=self.k - 1)

    def map_reads(self, seqs: List[str]
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (contig_idx or -1, votes, n_windows) per sequence.

        Reads longer than max_row_len are truncated for mapping (linked
        short reads are ~150 bp; only fallback callers hit this). Row
        width quantizes to 128 at the batch's longest read instead of
        always max_row_len: 150 bp reads in 1024-wide rows were 7x of
        wasted gather/sort volume per mapback batch."""
        R = len(seqs)
        mx = max((len(s) for s in seqs), default=1)
        L = min(self.max_row_len, -(-max(mx, 1) // 128) * 128)
        codes = np.full((R, L), 4, np.uint8)
        lengths = np.zeros(R, np.int32)
        for i, s in enumerate(seqs):
            c = encode_bases(s.encode("ascii"))[:L]
            codes[i, :len(c)] = c
            lengths[i] = len(c)
        best, votes, nvalid = _map_batch(self.table, jnp.asarray(codes),
                                         jnp.asarray(lengths), k=self.k)
        return np.asarray(best), np.asarray(votes), np.asarray(nvalid)


def map_pairs_to_bam(mapper: KmerMapper, pair_iter, bam_path: str,
                     min_vote_frac: float = 0.5,
                     batch_pairs: int = 32768) -> Dict[int, float]:
    """Map read pairs, write BAM records, accumulate per-contig depth.

    Returns {contig_idx: total_bases_mapped} (depth = bases / length).
    A mate maps when votes >= min_vote_frac * windows; its NM tag
    estimates BASE-level mismatches — what bwa's NM counts and what
    extract_unmapped's blast-identity filter ((cols - NM)/cols >= 0.95,
    extract_unmapped.cpp:107-113) expects. One substitution error kills
    up to k consecutive k-mer windows, so base mismatches ~= missing
    windows / k; encoding the raw window-miss FRACTION (the pre-r4
    behavior) overstated NM by ~k and sent every errored read to the
    low-abundance pool: in the 2.5M-read soak (0.5% errors) 83% of all
    reads "failed" the 0.95 identity filter, where bwa would report
    NM~=1 on a 150 bp read (identity 0.993). Truly foreign reads still
    fail: miss_frac ~1 => NM ~= len/k => identity ~0.92 < 0.95.
    """
    depth_bases: Dict[int, float] = {}
    writer = BamWriter(bam_path, mapper.contig_names,
                       mapper.contig_lengths)
    batch: List = []

    def flush():
        if not batch:
            return
        seqs = []
        quals = []
        for name, s1, q1, s2, q2 in batch:
            seqs += [s1, s2]
            quals += [q1, q2]
        best, votes, nvalid = mapper.map_reads(seqs)
        # bulk seq/qual encode: when the batch is uniform-length (the
        # normal short-read case) the nt16 nibble packing and phred
        # offset run as ONE numpy pass over the whole batch and
        # BamWriter.write receives ready slices
        seq_b = qual_b = None
        L = len(seqs[0])
        if L % 2 == 0 and all(len(s) == L for s in seqs):
            from pangaea_tpu.io.bam import _NT16_LUT
            nib = _NT16_LUT[np.frombuffer("".join(seqs).encode("ascii"),
                                          np.uint8)].reshape(-1, L)
            packed = ((nib[:, 0::2] << 4) | nib[:, 1::2]).tobytes()
            half = L // 2
            seq_b = [packed[i * half:(i + 1) * half]
                     for i in range(len(seqs))]
            qraw = (np.frombuffer("".join(quals).encode("ascii"),
                                  np.uint8) - np.uint8(33)).tobytes()
            qual_b = [qraw[i * L:(i + 1) * L] for i in range(len(quals))]
        for j, (name, s1, q1, s2, q2) in enumerate(batch):
            for mate, (seq, qual) in enumerate(((s1, q1), (s2, q2))):
                i = 2 * j + mate
                matched = (best[i] >= 0 and nvalid[i] > 0
                           and votes[i] >= min_vote_frac * nvalid[i])
                flag = FPAIRED | (FREAD1 if mate == 0 else FREAD2)
                if matched:
                    tid = int(best[i])
                    miss_frac = 1.0 - votes[i] / max(int(nvalid[i]), 1)
                    nm = int(round(miss_frac * len(seq) / mapper.k))
                    rec = BamRecord(name, flag, tid, 0, 60,
                                    [("M", len(seq))], seq, qual,
                                    {"NM": nm})
                    depth_bases[tid] = depth_bases.get(tid, 0.0) + len(seq)
                else:
                    rec = BamRecord(name, flag | FUNMAP, -1, -1, 0, [],
                                    seq, qual, {})
                writer.write(rec,
                             seq_bytes=None if seq_b is None else seq_b[i],
                             qual_bytes=None if qual_b is None
                             else qual_b[i])
        batch.clear()

    for pair in pair_iter:
        batch.append(pair)
        if len(batch) >= batch_pairs:
            flush()
    flush()
    writer.close()
    return depth_bases


def write_depth_file(path: str, names: Sequence[str],
                     lengths: Sequence[int],
                     depth_bases: Dict[int, float]) -> None:
    """jgi_summarize_bam_contig_depths-compatible columns
    (extract_unmapped.cpp:155-170 reads name, len, totalAvgDepth)."""
    with open(path, "w") as f:
        f.write("contigName\tcontigLen\ttotalAvgDepth\n")
        for i, (name, ln) in enumerate(zip(names, lengths)):
            d = depth_bases.get(i, 0.0) / max(ln, 1)
            f.write(f"{name}\t{ln}\t{d:.4f}\n")
