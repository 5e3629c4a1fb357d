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


def _overcirc_external(runner: ToolRunner, name: str, seq: str,
                       workdir: str):
    """encircle path: nucmer self-alignment -> smoothed corner-cut test."""
    import subprocess

    from pangaea_tpu.asm.circular_logic import (overcirc_region,
                                                parse_show_coords)
    tig_fa = os.path.join(workdir, f"{name}.fa")
    write_fasta(tig_fa, [(name, seq)])
    delta = os.path.join(workdir, name)
    # encircle.py:19-27 parameters
    runner.run(["nucmer", "-p", delta, "-b", "4000", "-l", "2000",
                "--maxmatch", tig_fa, tig_fa], log_name="nucmer.log")
    coords = subprocess.run(
        ["show-coords", "-T", "-L", "2000", delta + ".delta"],
        capture_output=True, text=True, check=True).stdout
    rows = parse_show_coords("\n".join(coords.splitlines()[4:]))
    region = overcirc_region(rows)
    if region is None:
        return None
    start, end = region
    return seq[start - 1:end]  # 1-based inclusive region kept


def make_circularizer(cfg: PangaeaConfig, runner: ToolRunner
                      ) -> Optional[Callable[[str, str, str], str]]:
    """Returns circularize(contigs, reads, workdir) -> out_fa.

    Per long contig (> cfg.assembly.circularize_min_size): detect
    over-circularization and trim. With nucmer installed the Lathe
    encircle self-alignment test runs; otherwise the builtin exact
    terminal-repeat test (asm/circular_logic.exact_overlap_trim). The
    trimmed sequences replace their originals in the output fasta
    (Lathe Snakefile circularize_final, :190-210).
    """

    def circularize(contigs_fa: str, reads_fa: str, workdir: str) -> str:
        from pangaea_tpu.asm.circular_logic import exact_overlap_trim
        circ_dir = os.path.join(workdir, "circular")
        os.makedirs(circ_dir, exist_ok=True)
        min_size = cfg.assembly.circularize_min_size
        use_nucmer = runner.available("nucmer")
        out_fa = os.path.join(circ_dir, "circularized.fasta")
        n_circ = 0

        def gen():
            nonlocal n_circ
            for name, seq in iter_fasta(contigs_fa):
                short = name.split()[0]
                if len(seq) >= min_size:
                    trimmed = None
                    if use_nucmer:
                        try:
                            trimmed = _overcirc_external(runner, short, seq,
                                                         circ_dir)
                        except Exception as e:
                            log.warning("nucmer encircle failed on %s: %s",
                                        short, e)
                    if trimmed is None:
                        keep = exact_overlap_trim(seq)
                        if keep is not None:
                            trimmed = seq[:keep]
                    if trimmed is not None:
                        log.info("circularized %s: %d -> %d bp", short,
                                 len(seq), len(trimmed))
                        n_circ += 1
                        yield f"{short}_circularized", trimmed
                        continue
                yield name, seq

        write_fasta(out_fa, gen())
        log.info("circularization: %d contig(s) trimmed", n_circ)
        return out_fa

    return circularize
