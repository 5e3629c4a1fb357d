"""Top-driver e2e (stLFR preprocessing -> sort -> binning CLI wiring)."""

import gzip
import os

import numpy as np
import pytest

from pangaea_tpu.io.fastq import iter_fastq_records
from pangaea_tpu.io.sim import simulate_linked_reads


def make_stlfr_pair_files(tmp_path, n_barcodes=40, pairs_per_bc=12):
    """stLFR-format R1/R2 derived from the simulator's genomes."""
    inter = str(tmp_path / "tmp_inter.fq")
    res = simulate_linked_reads(out_interleaved=inter, n_species=2,
                                genome_len=12_000, n_barcodes=n_barcodes,
                                pairs_per_barcode=pairs_per_bc, seed=9)
    r1, r2 = str(tmp_path / "s_1.fq.gz"), str(tmp_path / "s_2.fq.gz")
    bc_num = {bc: f"{i+1}_{i+2}_{i+3}"
              for i, bc in enumerate(sorted(res.barcode_species))}
    with gzip.open(r1, "wt") as f1, gzip.open(r2, "wt") as f2:
        recs = list(iter_fastq_records(inter))
        for j in range(0, len(recs), 2):
            a, b = recs[j], recs[j + 1]
            name = a.header.split("\t")[0]
            bc = a.header.split("BX:Z:")[1].split("-")[0]
            nb = bc_num[bc]
            f1.write(f"@{name}#{nb}/1\n{a.seq}\n+\n{a.qual}\n")
            f2.write(f"@{name}#{nb}/2\n{b.seq}\n+\n{b.qual}\n")
    os.remove(inter)
    return r1, r2, res


def test_driver_stlfr_end_to_end(tmp_path):
    from pangaea_tpu.pipeline import driver
    r1, r2, res = make_stlfr_pair_files(tmp_path)
    out = str(tmp_path / "out")
    # steps 1 only keeps it quick; the heavy steps are covered elsewhere
    driver.main(["-s", "stlfr", "-1", r1, "-2", r2, "-o", out,
                 "-c", "2", "-t", "2", "-st", "1", "--skip-external"])
    sorted_fq = os.path.join(out, "0_preprocess_reads",
                             "interleaved_link_reads.sorted.fastq")
    assert os.path.isfile(sorted_fq)
    recs = list(iter_fastq_records(sorted_fq))
    assert len(recs) == 40 * 12 * 2
    assert all("BX:Z:" in r.header for r in recs)
    # stlfr numeric barcodes carried through with -1 library suffix
    assert recs[0].header.split("BX:Z:")[1].count("_") == 2
    # features extracted
    assert os.path.exists(os.path.join(out, "1.features",
                                       "feature_finished"))


def test_cli_step1_only(tmp_path):
    from pangaea_tpu.pipeline import cli
    reads = str(tmp_path / "r.fq.gz")
    simulate_linked_reads(out_interleaved=reads, n_species=2,
                          genome_len=10_000, n_barcodes=30,
                          pairs_per_barcode=10, seed=13)
    out = str(tmp_path / "out")
    cli.main(["-i", reads, "-o", out, "-c", "2", "-st", "1"])
    assert os.path.exists(os.path.join(out, "1.features",
                                       "feature_finished"))
    assert os.path.exists(os.path.join(out, "metrics.json"))
    assert os.path.exists(os.path.join(out, "log"))
