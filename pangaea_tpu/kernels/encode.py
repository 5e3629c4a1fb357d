"""2-bit nucleotide encoding and canonical k-mer math (XLA-friendly).

Behavior contract (reference count_kmer.cpp / count_tnf.cpp):

- base code = ``(ascii >> 1) & 3`` for A/C/G/T (count_kmer.cpp:81), i.e.
  A=0, C=1, T=2, G=3. Any other character resets the rolling k-mer
  (count_kmer.cpp:73-78). We use code 4 for "invalid" (N / pad / masked).
- k-mer value = big-endian base-4 integer of the codes (count_kmer.cpp:79-82).
- reverse complement = reverse the 2-bit groups and XOR 0b10 into each
  (count_kmer.cpp:11-21); with this code table complement(x) = x ^ 2.
- canonical k-mer = min(value, revcomp(value)) (count_kmer.cpp:86).

Everything here is pure jnp (vectorized over read batches) so XLA can fuse
it into the downstream gather/scatter kernels; the same functions run on
the TPU and on the CPU backend for parity tests.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# Host-side ASCII -> code lookup (uint8). 4 = invalid.
_ENC_LUT = np.full(256, 4, dtype=np.uint8)
for _b in b"ACGT":
    _ENC_LUT[_b] = (_b >> 1) & 3
INVALID_CODE = np.uint8(4)


def encode_bases(seq: bytes | np.ndarray) -> np.ndarray:
    """Encode an ASCII sequence to uint8 codes (A=0,C=1,T=2,G=3, else 4)."""
    if isinstance(seq, (bytes, bytearray, memoryview)):
        arr = np.frombuffer(seq, dtype=np.uint8)
    else:
        arr = np.asarray(seq, dtype=np.uint8)
    return _ENC_LUT[arr]


def revcomp_kmers(vals: jnp.ndarray, k: int) -> jnp.ndarray:
    """Reverse complement of packed k-mer values, k <= 16.

    32-bit variant of the 64-bit bit-twiddle at count_kmer.cpp:11-21:
    reverse all 2-bit groups in the 32-bit word, complement every group
    (XOR 0xAAAAAAAA), then shift the k meaningful groups down.
    """
    assert k <= 16, "use the 64-bit path for k > 16"
    x = vals.astype(jnp.uint32)
    x = ((x >> 2) & jnp.uint32(0x33333333)) | ((x & jnp.uint32(0x33333333)) << 2)
    x = ((x >> 4) & jnp.uint32(0x0F0F0F0F)) | ((x & jnp.uint32(0x0F0F0F0F)) << 4)
    x = ((x >> 8) & jnp.uint32(0x00FF00FF)) | ((x & jnp.uint32(0x00FF00FF)) << 8)
    x = (x >> 16) | (x << 16)
    x = x ^ jnp.uint32(0xAAAAAAAA)
    return (x >> (2 * (16 - k))).astype(vals.dtype)


def revcomp_kmers_np(vals: np.ndarray, k: int) -> np.ndarray:
    """NumPy twin of :func:`revcomp_kmers` (host-side LUT construction)."""
    assert k <= 16
    x = np.asarray(vals, dtype=np.uint32)
    x = ((x >> 2) & np.uint32(0x33333333)) | ((x & np.uint32(0x33333333)) << 2)
    x = ((x >> 4) & np.uint32(0x0F0F0F0F)) | ((x & np.uint32(0x0F0F0F0F)) << 4)
    x = ((x >> 8) & np.uint32(0x00FF00FF)) | ((x & np.uint32(0x00FF00FF)) << 8)
    x = (x >> 16) | (x << 16)
    x = x ^ np.uint32(0xAAAAAAAA)
    return (x >> np.uint32(2 * (16 - k))).astype(np.asarray(vals).dtype)


def canonical_kmers(vals: jnp.ndarray, k: int) -> jnp.ndarray:
    """min(value, revcomp(value)) — count_kmer.cpp:86."""
    return jnp.minimum(vals, revcomp_kmers(vals, k))


# ---------------------------------------------------------------------------
# Split-word k-mers for 15 < k <= 31 (the reference's uint64 range,
# count_kmer.cpp:79-86). TPUs have no 64-bit integer datapath worth using,
# so a k-mer is carried as an uint32 pair: ``hi`` = the first k-16 bases
# (2(k-16) <= 30 bits), ``lo`` = the last 16 bases (32 bits). Pairs order
# lexicographically exactly like the 64-bit value, so lax.sort with
# num_keys=2 reproduces the sort-join semantics.
# ---------------------------------------------------------------------------


def revcomp_kmers_pair(hi: jnp.ndarray, lo: jnp.ndarray, k: int):
    """Reverse complement of split (hi, lo) k-mer values, 15 < k <= 31.

    rc(A·B) = rc(B)·rc(A) for base strings A (k-16 bases) and B (16
    bases): the 2k-bit rc value is ``rc(B) << 2(k-16) | rc(A)`` with
    disjoint bit ranges, re-split into the same (hi, lo) layout.

    k == 16 (kh == 0) is special-cased: the general formula would shift
    uint32s by 32, which XLA leaves implementation-defined — a backend
    with mod-32 shifts would silently corrupt every canonical k-mer.
    """
    assert 15 < k <= 31, k
    kh = k - 16
    if kh == 0:
        # all 16 bases live in lo; hi is always 0
        return jnp.zeros_like(hi), revcomp_kmers(lo.astype(jnp.uint32), 16)
    rc_b = revcomp_kmers(lo.astype(jnp.uint32), 16)   # 32 bits
    rc_a = revcomp_kmers(hi.astype(jnp.uint32), kh)   # 2*kh bits
    new_hi = rc_b >> (32 - 2 * kh)
    new_lo = (rc_b << (2 * kh)) | rc_a
    return new_hi, new_lo


def canonical_kmers_pair(hi: jnp.ndarray, lo: jnp.ndarray, k: int):
    """Lexicographic min((hi,lo), revcomp(hi,lo)) — the split-word twin of
    :func:`canonical_kmers` (count_kmer.cpp:86 in the uint64 range)."""
    rhi, rlo = revcomp_kmers_pair(hi, lo, k)
    fwd_le = (hi < rhi) | ((hi == rhi) & (lo <= rlo))
    return (jnp.where(fwd_le, hi, rhi), jnp.where(fwd_le, lo, rlo))


def kmer_window_values(codes: jnp.ndarray, lengths: jnp.ndarray, k: int,
                       win_skip: jnp.ndarray | None = None):
    """All k-mer window values of a read batch, with validity mask.

    Args:
      codes: (R, L) uint8 base codes; 4 marks N / pad / quality-masked.
      lengths: (R,) int32 read lengths.
      k: k-mer length (<= 15 so values fit int32).
      win_skip: optional (R,) int32 — windows starting before this offset
        are invalid. Used for reads split across rows with overlap: a
        continuation row repeats the last ``overlap`` bases of its
        predecessor, so for a k' < overlap+1 kernel the first
        ``overlap-(k'-1)`` windows were already counted by the previous row.

    Returns:
      vals:  (R, L-k+1) int32 forward k-mer values (garbage where invalid).
      valid: (R, L-k+1) bool — window is fully in-read and all-ACGT. This
        reproduces the reference's rolling reset on non-ACGT characters
        (count_kmer.cpp:73-78): a window containing any invalid base is
        skipped, which also prevents k-mers from spanning the per-read 'N'
        separators of the concatenated barcode string (count_kmer.cpp:199).
    """
    R, L = codes.shape
    W = L - k + 1
    assert W >= 1, f"max_read_len {L} < k {k}"
    # 2k bits must fit int32 (the reference's uint64 path allows k<=32;
    # k=15 is its default and the practical sweet spot for the dense
    # table — 4^15 int32 = 4 GiB HBM). 15 < k <= 31 is served by the
    # split-word kmer_window_values_pair + the sort-join feature path.
    assert k <= 15, (f"k={k} unsupported here: values must fit int32 "
                     f"(k <= 15); use kmer_window_values_pair for k <= 31")
    c = codes.astype(jnp.int32)
    safe = jnp.where(c < 4, c, 0)
    acc = _assemble_windows(safe, k, W, jnp.int32)
    valid = _window_validity(c, lengths, k, W, win_skip)
    return acc, valid


def _assemble_windows(safe: jnp.ndarray, k: int, W: int, dtype,
                      start: int = 0) -> jnp.ndarray:
    """Packed k-base window values starting at column ``start``.

    Binary-doubling assembly: build span-2^m packed values (a_m[i] packs
    bases i..i+2^m-1), then OR together k's binary decomposition —
    ceil(log2 k) + popcount(k) shifted ORs instead of k (k=15: 7 vs 15
    passes over the (R, W) hot array).
    """
    safe = safe.astype(dtype)
    spans = {1: safe}
    m = 1
    while m * 2 <= k:
        prev = spans[m]
        spans[m * 2] = (prev[:, :prev.shape[1] - m] << (2 * m)) \
            | prev[:, m:]
        m *= 2
    acc = jnp.zeros((safe.shape[0], W), dtype=dtype)
    off, rem = start, k
    while rem:
        span = 1 << (rem.bit_length() - 1)
        part = jax_slice(spans[span], off, W)
        acc = acc | (part << (2 * (rem - span)))
        off += span
        rem -= span
    return acc


def _window_validity(c: jnp.ndarray, lengths: jnp.ndarray, k: int, W: int,
                     win_skip: jnp.ndarray | None) -> jnp.ndarray:
    invalid = (c >= 4).astype(jnp.int32)
    csum = jnp.cumsum(invalid, axis=1)
    # bad(i) = number of invalid codes in [i, i+k)
    upper = csum[:, k - 1:k - 1 + W]
    lower = jnp.pad(csum, ((0, 0), (1, 0)))[:, :W]
    bad = upper - lower
    starts = jnp.arange(W, dtype=jnp.int32)[None, :]
    in_read = starts + k <= lengths[:, None].astype(jnp.int32)
    valid = (bad == 0) & in_read
    if win_skip is not None:
        valid = valid & (starts >= win_skip[:, None].astype(jnp.int32))
    return valid


def kmer_window_values_pair(codes: jnp.ndarray, lengths: jnp.ndarray,
                            k: int, win_skip: jnp.ndarray | None = None):
    """Split-word twin of :func:`kmer_window_values` for 15 < k <= 31.

    Returns ``(hi, lo, valid)``: hi packs the window's first k-16 bases
    (uint32, 2(k-16) <= 30 bits), lo the last 16 bases (full uint32).
    (hi, lo) compares lexicographically like the reference's uint64 value
    (count_kmer.cpp:79-86).
    """
    R, L = codes.shape
    W = L - k + 1
    assert W >= 1, f"max_read_len {L} < k {k}"
    assert 15 < k <= 31, k
    c = codes.astype(jnp.int32)
    safe = jnp.where(c < 4, c, 0)
    hi = _assemble_windows(safe, k - 16, W, jnp.uint32)
    lo = _assemble_windows(safe, 16, W, jnp.uint32, start=k - 16)
    valid = _window_validity(c, lengths, k, W, win_skip)
    return hi, lo, valid


def jax_slice(x: jnp.ndarray, start: int, width: int) -> jnp.ndarray:
    return x[:, start:start + width]


_DECODE = np.frombuffer(b"ACTG", dtype=np.uint8)  # code 0,1,2,3


def decode_kmers(vals: np.ndarray, k: int) -> np.ndarray:
    """k-mer values -> ASCII strings (inverse of the 2-bit encode)."""
    vals = np.asarray(vals, dtype=np.uint64)
    chars = np.empty((len(vals), k), np.uint8)
    for j in range(k):
        chars[:, j] = _DECODE[(vals >> np.uint64(2 * (k - 1 - j)))
                              & np.uint64(3)]
    return chars.view(f"S{k}").ravel()


@functools.lru_cache(maxsize=None)
def _canonical_order(k: int) -> np.ndarray:
    """Sorted unique canonical k-mer values for small k (host-side)."""
    all_vals = np.arange(4 ** k, dtype=np.uint32)
    canon = np.minimum(all_vals, revcomp_kmers_np(all_vals, k))
    return np.unique(canon)


def canonical_order(k: int) -> np.ndarray:
    """Sorted unique canonical k-mer values — the TNF column key order
    (count_tnf.cpp:54-76). Column j of the TNF feature counts value
    canonical_order(k)[j]."""
    return _canonical_order(k)


def num_canonical_kmers(k: int) -> int:
    """136 for k=4, 32 for k=3 — the TNF feature widths
    (count_tnf.cpp:54-76 enumerates them into an ordered std::map)."""
    return int(_canonical_order(k).size)


@functools.lru_cache(maxsize=None)
def canonical_rank_lut(k: int) -> np.ndarray:
    """(4^k,) int32 LUT: k-mer value -> rank of its canonical form.

    The rank order equals the std::map iteration order of
    count_tnf.cpp:108 (ascending canonical encoded value), so TNF feature
    column j counts the j-th smallest canonical k-mer.
    """
    order = _canonical_order(k)
    all_vals = np.arange(4 ** k, dtype=np.uint32)
    canon = np.minimum(all_vals, revcomp_kmers_np(all_vals, k))
    rank_of = np.zeros(4 ** k, dtype=np.int32)
    rank_of[order] = np.arange(order.size, dtype=np.int32)
    return rank_of[canon].astype(np.int32)


def kmer_positions_np(seq, k: int):
    """Host-side (values, positions) of every N-free k-mer window of one
    ASCII sequence, 2-bit packed into uint64 (k <= 31). Shared by the
    asm-layer anchor aligner and any host-side indexing; the batched
    (R, L)-matrix twin of this logic lives in kmer_window_values (device)
    and tools/refstack.write_jellyfish_dump (numpy, matrix form)."""
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    codes = encode_bases(seq)
    n = len(codes)
    if n < k:
        return (np.empty(0, np.uint64), np.empty(0, np.int64))
    W = n - k + 1
    acc = np.zeros(W, np.uint64)
    nbad = np.cumsum(codes >= 4)
    for j in range(k):
        acc = (acc << np.uint64(2)) | codes[j:j + W].astype(np.uint64)
    ok = (nbad[k - 1:] - np.concatenate([[0], nbad[:W - 1]])) == 0
    pos = np.flatnonzero(ok)
    return acc[pos], pos
