"""Built-in fallback assembler: de Bruijn unitigs.

The reference delegates all assembly to external megahit/metaspades
(bin_assembly.sh:24, low_assembly.sh:12-20). Those tools are optional
dependencies here; this module provides a minimal de-Bruijn-graph unitig
assembler so the full 4-step pipeline (and its tests/benches) can run
end-to-end without them. It is NOT a metagenome assembler replacement —
for production output quality, install megahit and the pipeline will use
it (asm/bin_assembly.py picks the external tool when present).

Algorithm: k-mer graph over both strands; maximal non-branching paths
(unitigs); drop unitigs below min_len; dedupe by canonical orientation.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, List, Set, Tuple

from pangaea_tpu.io.bam import revcomp
from pangaea_tpu.io.fastq import iter_fastq_records


def _kmers_of(seq: str, k: int) -> Iterator[str]:
    for i in range(len(seq) - k + 1):
        km = seq[i:i + k]
        if "N" not in km:
            yield km


def assemble_unitigs(seqs: Iterable[str], k: int = 31,
                     min_len: int = 100,
                     min_count: int | None = None) -> List[str]:
    """min_count=None turns on count-threshold error correction only
    when the data shows errors: sequencing errors at real coverage mint
    a LARGE singleton-k-mer fraction (each error spawns ~k unique
    k-mers), and keeping them fragments the graph at every error branch
    — at 60-90x coverage with 0.5% errors the expected branch spacing
    is a few bp and NO unitig reaches min_len (observed: every cluster
    bin of the 2.5M-read soak assembled to 0 contigs). The rule:

    - depth is measured count-weighted (sum(c^2)/sum(c) — the coverage
      an average INSTANCE sees; plain distinct-average is dragged to ~1
      by the error singletons themselves);
    - when singletons are <20% of distinct k-mers (error-free input:
      only genome edges) or depth < 8 (the low-abundance reassembly
      floors), every k-mer is kept — exactness tests and low-coverage
      recovery are unchanged;
    - otherwise the threshold 1 + depth//12 sits far above the error
      recurrence rate (Poisson(depth*err/3)) and far below the
      true-k-mer depth (Poisson(depth) dropout < 1e-6 at depth >= 12) —
      the one-line version of what megahit's error correction does."""
    counts: Dict[str, int] = {}
    total = 0
    for seq in seqs:
        for strand in (seq, revcomp(seq)):
            for km in _kmers_of(strand.upper(), k):
                counts[km] = counts.get(km, 0) + 1
                total += 1
    if min_count is None:
        min_count = 1
        if counts:
            singletons = sum(1 for c in counts.values() if c == 1)
            if singletons >= 0.2 * len(counts):
                depth_w = sum(c * c for c in counts.values()) / total
                if depth_w >= 8.0:
                    min_count = max(2, int(depth_w // 12) + 1)
    kmers: Set[str] = {km for km, c in counts.items() if c >= min_count}

    def succs(km: str) -> List[str]:
        return [km[1:] + b for b in "ACGT" if km[1:] + b in kmers]

    def preds(km: str) -> List[str]:
        return [b + km[:-1] for b in "ACGT" if b + km[:-1] in kmers]

    visited: Set[str] = set()
    contigs: List[str] = []
    seen_canon: Set[str] = set()
    for start in sorted(kmers):
        if start in visited:
            continue
        # only start unitigs at branch points / tips
        p = preds(start)
        if len(p) == 1 and len(succs(p[0])) == 1:
            continue
        node = start
        path = [node]
        visited.add(node)
        while True:
            s = succs(node)
            if len(s) != 1:
                break
            nxt = s[0]
            if len(preds(nxt)) != 1 or nxt in visited:
                break
            path.append(nxt)
            visited.add(nxt)
            node = nxt
        contig = path[0] + "".join(p[-1] for p in path[1:])
        if len(contig) < min_len:
            continue
        canon = min(contig, revcomp(contig))
        if canon in seen_canon:
            continue
        seen_canon.add(canon)
        contigs.append(canon)
    # isolated cycles (no branch/tip entry): walk remaining k-mers
    for start in sorted(kmers - visited):
        if start in visited:
            continue
        node = start
        path = [node]
        visited.add(node)
        while True:
            s = succs(node)
            if len(s) != 1:
                break
            nxt = s[0]
            if nxt in visited:
                break
            path.append(nxt)
            visited.add(nxt)
            node = nxt
        contig = path[0] + "".join(p[-1] for p in path[1:])
        if len(contig) < min_len:
            continue
        canon = min(contig, revcomp(contig))
        if canon not in seen_canon:
            seen_canon.add(canon)
            contigs.append(canon)
    return contigs


def assemble_fastq(fq_path: str, out_fa: str, k: int = 31,
                   min_len: int = 200, min_count: int | None = None,
                   name_prefix: str = "k{k}_") -> int:
    """Assemble one FASTQ into a fasta; returns contig count."""
    seqs = (rec.seq for rec in iter_fastq_records(fq_path))
    contigs = assemble_unitigs(seqs, k=k, min_len=min_len,
                               min_count=min_count)
    with open(out_fa, "w") as f:
        for i, c in enumerate(contigs, 1):
            f.write(f">{name_prefix.format(k=k)}{i} len={len(c)}\n{c}\n")
    return len(contigs)
