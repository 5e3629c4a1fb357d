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
                     min_len: int = 100, min_count: int = 1) -> List[str]:
    counts: Dict[str, int] = {}
    for seq in seqs:
        for strand in (seq, revcomp(seq)):
            for km in _kmers_of(strand.upper(), k):
                counts[km] = counts.get(km, 0) + 1
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
                   min_len: int = 200, min_count: int = 1,
                   name_prefix: str = "k{k}_") -> int:
    """Assemble one FASTQ into a fasta; returns contig count."""
    seqs = (rec.seq for rec in iter_fastq_records(fq_path))
    contigs = assemble_unitigs(seqs, k=k, min_len=min_len,
                               min_count=min_count)
    with open(out_fa, "w") as f:
        for i, c in enumerate(contigs, 1):
            f.write(f">{name_prefix.format(k=k)}{i} len={len(c)}\n{c}\n")
    return len(contigs)
