"""Deterministic synthetic linked-read generator.

The reference's de-facto end-to-end test is a bundled ATCC dataset whose
payloads are git-LFS pointers absent from the snapshot (SURVEY.md §4.3).
This simulator generates an equivalent small metagenome: N species genomes,
barcodes assigned to species, paired reads drawn from genome fragments —
so unit/e2e tests and benches have ground-truth species labels to score
binning quality (ARI) against.
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
_COMP = {ord("A"): "T", ord("C"): "G", ord("G"): "C", ord("T"): "A"}


def _revcomp(s: str) -> str:
    return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]


@dataclass
class SimResult:
    barcodes: List[str]            # barcode strings, sorted (emission order)
    barcode_species: Dict[str, int]
    n_pairs: int


def simulate_linked_reads(
    out_interleaved: Optional[str] = None,
    out_r1: Optional[str] = None,
    out_r2: Optional[str] = None,
    n_species: int = 5,
    genome_len: int = 50_000,
    n_barcodes: int = 300,
    pairs_per_barcode: int = 40,
    read_len: int = 150,
    insert_len: int = 400,
    error_rate: float = 0.0,
    low_qual_rate: float = 0.0,
    seed: int = 0,
    fmt: str = "10x",
    ani_siblings: int = 0,
    ani: float = 0.97,
    abundance: str = "dirichlet",
    zipf_exponent: float = 1.25,
    shared_segment_frac: float = 0.0,
) -> SimResult:
    """Write barcode-sorted linked reads; returns ground-truth labels.

    fmt='10x' emits headers ``@<name>\\tBX:Z:<barcode>-1`` (the post-
    preprocessing format the reference pipeline consumes); fmt='stlfr'
    emits ``@<name>#<barcode>/1``.

    ``error_rate`` substitutes bases uniformly; ``low_qual_rate`` draws
    that fraction of per-base qualities below '?' (ASCII 63, jellyfish's
    --min-qual-char threshold on the paired path) and the rest at or
    above it — heterogeneous quality strings exercise the masked global
    pass. Errored bases always get a low quality (the realistic
    correlation, and it makes masking matter).

    Hard-mixture knobs (all default OFF and consume no extra rng draws,
    so cached datasets from earlier rounds replay identically):

    - ``ani_siblings``: the LAST this-many species are derived from
      earlier species by point-mutating a ``1 - ani`` fraction of bases
      — e.g. 97% ANI strain pairs whose TNF signatures nearly coincide,
      the regime where the reference's own binning drops below ARI 1.0.
    - ``abundance='zipf'``: species proportions follow a Zipf law with
      ``zipf_exponent`` (rank order shuffled), so tail species get few
      barcodes/coverage instead of the gentle Dirichlet skew.
    - ``shared_segment_frac``: a plasmid-like segment of this fraction
      of the genome length is generated once and spliced into EVERY
      genome at a random position (shared k-mer content across species).
    """
    rng = np.random.default_rng(seed)
    # Species get distinct base-composition biases (Dirichlet-sampled) so
    # their TNF signatures differ, and skewed barcode proportions so their
    # coverages (=> abundance histograms) differ — mirroring real
    # metagenomes, where both signals drive the reference's binning.
    genomes = []
    n_base = n_species - ani_siblings
    for _ in range(n_base):
        probs = rng.dirichlet(np.full(4, 1.5))
        genomes.append("".join("ACGT"[b] for b in
                               rng.choice(4, genome_len, p=probs)))
    for i in range(ani_siblings):
        parent = np.frombuffer(genomes[i % n_base].encode(), np.uint8)
        child = parent.copy()
        mut = rng.random(len(child)) < (1.0 - ani)
        # substitute with a random DIFFERENT base at each mutated site
        child[mut] = _BASES[
            (np.searchsorted(_BASES, child[mut])
             + rng.integers(1, 4, int(mut.sum()))) % 4]
        genomes.append(child.tobytes().decode())
    if shared_segment_frac > 0:
        seg_len = max(1, int(genome_len * shared_segment_frac))
        probs = rng.dirichlet(np.full(4, 1.5))
        seg = "".join("ACGT"[b] for b in rng.choice(4, seg_len, p=probs))
        for i in range(n_species):
            pos = int(rng.integers(0, genome_len - seg_len))
            genomes[i] = (genomes[i][:pos] + seg
                          + genomes[i][pos + seg_len:])

    # distinct fixed-width ACGT barcodes, emitted in sorted order so the
    # stream is barcode-sorted like the reference's step-0 output.
    raw = rng.integers(0, 4, size=(n_barcodes, 16))
    bcs = sorted({"".join("ACGT"[b] for b in row) for row in raw})
    while len(bcs) < n_barcodes:
        extra = "".join("ACGT"[b] for b in rng.integers(0, 4, 16))
        if extra not in bcs:
            bcs.append(extra)
    bcs = sorted(bcs[:n_barcodes])

    # skewed species proportions => distinct coverages per species
    if abundance == "zipf":
        ranks = rng.permutation(n_species) + 1.0
        props = ranks ** (-zipf_exponent)
        props /= props.sum()
    else:
        props = rng.dirichlet(np.full(n_species, 2.0))
    barcode_species = {bc: int(rng.choice(n_species, p=props)) for bc in bcs}

    def mutate(s: str) -> Tuple[str, str]:
        """(sequence, quality). Errored positions get low quality."""
        n = len(s)
        if error_rate <= 0 and low_qual_rate <= 0:
            return s, "I" * n
        errs = (rng.random(n) < error_rate if error_rate > 0
                else np.zeros(n, bool))
        chars = np.frombuffer(s.encode(), np.uint8).copy()
        if errs.any():
            chars[errs] = _BASES[rng.integers(0, 4, int(errs.sum()))]
        low = errs | (rng.random(n) < low_qual_rate)
        qual = np.where(low,
                        rng.integers(33, 63, n),   # below '?' (63)
                        rng.integers(63, 75, n)).astype(np.uint8)
        return chars.tobytes().decode(), qual.tobytes().decode()

    def opener(path):
        return (gzip.open(path, "wt") if path.endswith(".gz")
                else open(path, "w"))

    fi = opener(out_interleaved) if out_interleaved else None
    f1 = opener(out_r1) if out_r1 else None
    f2 = opener(out_r2) if out_r2 else None

    n_pairs = 0
    try:
        for bc in bcs:
            g = genomes[barcode_species[bc]]
            for p in range(pairs_per_barcode):
                pos = int(rng.integers(0, len(g) - insert_len))
                frag = g[pos:pos + insert_len]
                r1, q1 = mutate(frag[:read_len])
                r2, q2 = mutate(_revcomp(frag[-read_len:]))
                name = f"read_{bc}_{p}"
                if fmt == "10x":
                    h1 = f"@{name}\tBX:Z:{bc}-1"
                    h2 = h1
                else:
                    h1 = f"@{name}#{bc}/1"
                    h2 = f"@{name}#{bc}/2"
                if fi:
                    fi.write(f"{h1}\n{r1}\n+\n{q1}\n{h2}\n{r2}\n+\n{q2}\n")
                if f1:
                    f1.write(f"{h1}\n{r1}\n+\n{q1}\n")
                if f2:
                    f2.write(f"{h2}\n{r2}\n+\n{q2}\n")
                n_pairs += 1
    finally:
        for f in (fi, f1, f2):
            if f:
                f.close()
    return SimResult(bcs, barcode_species, n_pairs)
