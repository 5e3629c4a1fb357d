"""Slow, obviously-correct Python oracle of the reference feature semantics.

A from-the-spec re-statement of the count_kmer.cpp / count_tnf.cpp
contracts (scan the concatenated N-separated barcode string with a rolling
2-bit encoder, reset on non-ACGT, canonical = min(fwd, revcomp)), used to
verify the XLA kernels on small inputs.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Tuple


def code(c: str) -> int:
    return (ord(c) >> 1) & 3


def revcomp_val(v: int, k: int) -> int:
    out = 0
    for _ in range(k):
        out = (out << 2) | ((v & 3) ^ 2)
        v >>= 2
    return out


def canon(v: int, k: int) -> int:
    return min(v, revcomp_val(v, k))


def scan_kmers(s: str, k: int) -> Iterable[int]:
    """Yield canonical k-mer values with the rolling reset on non-ACGT."""
    val, length = 0, 0
    mask = (1 << (2 * k)) - 1
    for ch in s:
        if ch not in "ACGT":
            val, length = 0, 0
            continue
        val = ((val << 2) & mask) | code(ch)
        length += 1
        if length == k:
            length -= 1
            yield canon(val, k)


def concat_group(seqs: List[str]) -> str:
    return "".join(s + "N" for s in seqs)


def global_counts(all_seqs: Iterable[str], k: int) -> Dict[int, int]:
    table: Dict[int, int] = {}
    for s in all_seqs:
        for c in scan_kmers(s, k):
            table[c] = table.get(c, 0) + 1
    return table


def mask_seq(seq: str, qual: str, min_qual_char: str) -> str:
    """jellyfish --min-qual-char: bases with quality below the char
    become N (src/feature.py:76-86)."""
    mq = ord(min_qual_char)
    return "".join("N" if i < len(qual) and ord(qual[i]) < mq else ch
                   for i, ch in enumerate(seq))


def global_counts_masked(seq_quals: Iterable[Tuple[str, str]], k: int,
                         min_qual_char: str) -> Dict[int, int]:
    """Masked jellyfish global counts over (seq, qual) records."""
    return global_counts(
        (mask_seq(s, q, min_qual_char) for s, q in seq_quals), k)


def abundance_hist(seqs: List[str], table: Dict[int, int], k: int,
                   window: int, vector_size: int) -> List[int]:
    hist = [0] * vector_size
    for c in scan_kmers(concat_group(seqs), k):
        if c in table:
            pos = table[c] // window
            if pos < vector_size:
                hist[pos] += 1
    return hist


def canonical_order(k: int) -> List[int]:
    return sorted({canon(v, k) for v in range(4 ** k)})


def tnf_counts(seqs: List[str], k: int) -> List[int]:
    order = canonical_order(k)
    idx = {c: i for i, c in enumerate(order)}
    out = [0] * len(order)
    for c in scan_kmers(concat_group(seqs), k):
        out[idx[c]] += 1
    return out


def group_stream(pairs: List[Tuple[str, str, str]]) -> List[Tuple[str, List[str]]]:
    """Reference grouping with the boundary leak; pairs = (barcode, s1, s2)."""
    groups = []
    last = ""
    acc: List[str] = []
    for bc, s1, s2 in pairs:
        acc += [s1, s2]
        if bc != last:
            groups.append((last, acc))
            last, acc = bc, []
    groups.append((last, acc))
    return groups
