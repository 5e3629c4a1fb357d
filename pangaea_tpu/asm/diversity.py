"""Auto-k via community diversity (reference: src/scripts/
calculate_diversity.sh + calculate_diversity.R + metaphlan_tables.py).

Contract: metaphlan4 profiles the reads (calculate_diversity.sh:59); the
species-level relative abundances feed a Shannon alpha-diversity
computation (the reference does this in R via microbiome::diversity,
calculate_diversity.R); the pipeline then uses k = int(8 * shannon)
(src/clustering.py:100-101).

The R stage is replaced with the direct computation: Shannon
H = -sum(p_i * ln(p_i)) over the normalized species abundances.
"""

from __future__ import annotations

import logging
import math
import os
from typing import List

from pangaea_tpu.asm.tools import ToolRunner

log = logging.getLogger(__name__)


def shannon_from_profile(profile_path: str) -> float:
    """Species-level (s__, not t__) Shannon diversity of one metaphlan
    profile (relative-abundance column)."""
    abunds: List[float] = []
    with open(profile_path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 3:
                continue
            clade = parts[0]
            if "s__" in clade and "t__" not in clade:
                try:
                    abunds.append(float(parts[2]))
                except ValueError:
                    continue
    total = sum(abunds)
    if total <= 0:
        return 0.0
    h = 0.0
    for a in abunds:
        p = a / total
        if p > 0:
            h -= p * math.log(p)
    return h


def metaphlan_shannon(reads: str, db_path: str, workdir: str,
                      threads: int = 8) -> float:
    """Run metaphlan and return the Shannon diversity; writes
    ``metaphlan_tmp/diversity_analysis/profiles_table_shannon.txt`` for
    parity with the reference's layout (src/clustering.py:100)."""
    runner = ToolRunner(log_dir=workdir)
    runner.require("metaphlan")
    tmp = os.path.join(workdir, "metaphlan_tmp")
    div_dir = os.path.join(tmp, "diversity_analysis")
    os.makedirs(div_dir, exist_ok=True)
    profile = os.path.join(tmp, "profile.txt")
    bt2 = os.path.join(tmp, "bowtie2.bz2")
    if not os.path.isfile(profile):
        runner.run(["metaphlan", reads, "--input_type", "fastq",
                    "--bowtie2db", db_path, "--bowtie2out", bt2,
                    "--nproc", str(threads), "-o", profile],
                   log_name="metaphlan.log")
    h = shannon_from_profile(profile)
    with open(os.path.join(div_dir, "profiles_table_shannon.txt"), "w") as f:
        f.write(f"{h}\n")
    return h
