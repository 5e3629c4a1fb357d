"""Circularization pass (reference: third_parties/Lathe/Snakefile:14-210).

The reference drives Lathe's snakemake workflow for the final
circularization (merge_asm.sh:36-44), with a plain-copy fallback when it
fails. The workflow: contigs > 1.7 Mb (Snakefile:20-34) -> terminal-window
reads (:36-49) -> flye assembly of those reads (:51-66) -> nucmer span
test (spancircle.py) -> trim/splice (:190-210) -> over-circularization
self-alignment check (encircle.py).

Round-1 scope: the Python port of the orchestration with tool gating; a
missing flye/nucmer raises, which merge_asm catches to take the
reference's own fallback path (copy merged_out.fasta). The span/encircle
alignment logic lands with the long-read/hybrid milestone.
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Optional

from pangaea_tpu.asm.fasta import iter_fasta, write_fasta
from pangaea_tpu.asm.tools import ToolRunner
from pangaea_tpu.config import PangaeaConfig

log = logging.getLogger(__name__)


def extract_long_contigs(contigs_fa: str, out_fa: str,
                         min_size: int = 1_700_000) -> int:
    """Lathe Snakefile:20-34: contigs above the circularization size."""
    recs = [(n, s) for n, s in iter_fasta(contigs_fa) if len(s) >= min_size]
    write_fasta(out_fa, recs)
    return len(recs)


def terminal_windows(contigs_fa: str, out_fa: str,
                     window: int = 50_000, min_size: int = 1_700_000) -> int:
    """Terminal regions of long contigs (Snakefile:36-49 pulls the reads
    aligned there; without a position-aware mapping we take the contig
    termini themselves as the re-assembly substrate)."""
    recs = []
    for n, s in iter_fasta(contigs_fa):
        if len(s) < min_size:
            continue
        name = n.split()[0]
        recs.append((f"{name}:start", s[:window]))
        recs.append((f"{name}:end", s[-window:]))
    write_fasta(out_fa, recs)
    return len(recs)


def make_circularizer(cfg: PangaeaConfig, runner: ToolRunner
                      ) -> Optional[Callable[[str, str, str], str]]:
    """Returns circularize(contigs, reads, workdir) -> out_fa, or None."""

    def circularize(contigs_fa: str, reads_fa: str, workdir: str) -> str:
        for tool in ("flye", "nucmer"):
            runner.require(tool)
        circ_dir = os.path.join(workdir, "circular")
        os.makedirs(circ_dir, exist_ok=True)
        long_fa = os.path.join(circ_dir, "long_contigs.fa")
        n = extract_long_contigs(contigs_fa, long_fa,
                                 cfg.assembly.circularize_min_size)
        if n == 0:
            log.info("no contigs above %d bp; circularization is a no-op",
                     cfg.assembly.circularize_min_size)
            return contigs_fa
        raise NotImplementedError(
            "span-circle alignment port pending (Lathe spancircle.py)")

    return circularize
