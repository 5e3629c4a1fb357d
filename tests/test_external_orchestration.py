"""External-tool orchestration contracts: exact command lines via a
recording ToolRunner (the tools themselves are not installed in CI)."""

import json
import os

import numpy as np
import pytest

from pangaea_tpu.asm.tools import ToolRunner


class FakeRunner(ToolRunner):
    """Pretends every tool exists; records commands; fabricates outputs."""

    def __init__(self, effects=None):
        super().__init__()
        self.commands = []
        self.effects = effects or {}

    def available(self, tool):
        return True

    def require(self, tool):
        pass

    def run(self, command, log_name=None, shell_cmd=None, cwd=None):
        display = shell_cmd or " ".join(command)
        self.commands.append(display)
        for key, fn in self.effects.items():
            if key in display:
                fn(display, cwd)


def test_run_metaspades_command(tmp_path):
    import argparse
    from pangaea_tpu.pipeline.driver import run_metaspades
    args = argparse.Namespace(reads1="R1.fq", reads2="R2.fq",
                              output=str(tmp_path), threads=16)
    out_dir = os.path.join(str(tmp_path), "1_metaspades_out")

    def make_contigs(cmd, cwd):
        os.makedirs(out_dir, exist_ok=True)
        open(os.path.join(out_dir, "contigs.fasta"), "w").write(">c\nACGT\n")

    runner = FakeRunner({"metaspades.py": make_contigs})
    contigs = run_metaspades(args, runner)
    assert runner.commands == [
        f"metaspades.py -1 R1.fq -2 R2.fq -t 16 -o {out_dir}"]
    assert os.path.isfile(contigs)
    # resume: second call skips
    runner2 = FakeRunner()
    run_metaspades(args, runner2)
    assert runner2.commands == []


def test_run_athena_config_and_commands(tmp_path):
    import argparse
    from pangaea_tpu.pipeline.driver import run_athena
    args = argparse.Namespace(output=str(tmp_path), threads=8)
    contigs = str(tmp_path / "contigs.fasta")
    open(contigs, "w").write(">c\nACGT\n")
    fq = str(tmp_path / "reads.fq")
    open(fq, "w").write("")
    runner = FakeRunner()
    run_athena(args, fq, contigs, runner)
    out_dir = os.path.join(str(tmp_path), "2_athena_out")
    cfg = json.load(open(os.path.join(out_dir, "config.json")))
    # exact reference config shape (src/run_pangaea:280-288)
    assert cfg["ctgfasta_path"] == os.path.realpath(contigs)
    assert cfg["reads_ctg_bam_path"] == "align-reads.contigs.bam"
    assert cfg["input_fqs"] == os.path.realpath(fq)
    assert cfg["cluster_settings"] == {"cluster_type": "multiprocessing",
                                       "processes": 8}
    cmds = runner.commands
    assert cmds[0] == f"bwa index {os.path.realpath(contigs)}"
    assert "bwa mem -t 8 -C" in cmds[1] and "samtools sort" in cmds[1]
    assert cmds[2].startswith("samtools index")
    assert cmds[3] == "athena-meta --force_reads --config config.json"


def test_bin_assembly_external_commands(tmp_path):
    from pangaea_tpu.asm.bin_assembly import (assemble_cluster_bins,
                                              map_reads_to_contigs)
    cluster_dir = str(tmp_path / "3.clustering")
    os.makedirs(cluster_dir)
    for i in range(3):
        open(os.path.join(cluster_dir, f"cluster_bin{i}.fq"), "w").write(
            "@r\nACGT\n+\nIIII\n")

    def megahit_effect(cmd, cwd):
        outdir = cmd.split("-o ")[1].split()[0]
        os.makedirs(outdir, exist_ok=True)
        with open(os.path.join(outdir, "final.contigs.fa"), "w") as f:
            f.write(f">tig {outdir}\nACGTACGT\n")

    runner = FakeRunner({"megahit": megahit_effect})
    contigs = assemble_cluster_bins(cluster_dir, 16, runner)
    megahit_cmds = sorted(c for c in runner.commands if "megahit" in c)
    assert len(megahit_cmds) == 3
    assert megahit_cmds[0].startswith("megahit --12 ")
    assert "-t 16" in megahit_cmds[0]
    # concatenated + parse_header renamed
    from pangaea_tpu.asm.fasta import iter_fasta
    names = [n for n, _ in iter_fasta(contigs)]
    assert names == ["contig_1", "contig_2", "contig_3"]

    assembly_dir = str(tmp_path / "4.assembly")

    def bwa_effect(cmd, cwd):
        if "samtools sort" in cmd and "-n" not in cmd:
            open(os.path.join(assembly_dir, "contigs.megahit.bam"),
                 "w").close()

    def jgi_effect(cmd, cwd):
        open(os.path.join(assembly_dir, "contigs.megahit.depth"),
             "w").close()

    def sort_n_effect(cmd, cwd):
        open(os.path.join(assembly_dir,
                          "contigs.megahit.name_sorted.bam"), "w").close()

    runner = FakeRunner({"bwa mem": bwa_effect, "jgi": jgi_effect,
                         "samtools sort -n": sort_n_effect})
    map_reads_to_contigs(cluster_dir, assembly_dir, 16, "inter.fq", "",
                         runner)
    cmds = runner.commands
    assert cmds[0] == f"bwa index {contigs}"
    assert "bwa mem -p -t 16" in cmds[1]  # interleaved => -p
    assert cmds[2].startswith("jgi_summarize_bam_contig_depths")
    assert "samtools sort -n" in cmds[3]


def test_low_assembly_spades_command(tmp_path):
    from pangaea_tpu.asm.final import low_assembly
    assembly_dir = str(tmp_path)
    fq = os.path.join(assembly_dir, "contigs.megahit_cut10.low_abd.fq")
    open(fq, "w").write("")

    def spades_effect(cmd, cwd):
        outdir = cmd.split("-o ")[1].split()[0]
        os.makedirs(outdir, exist_ok=True)
        open(os.path.join(outdir, "contigs.fasta"), "w").write(">a\nAC\n")

    runner = FakeRunner({"metaspades.py": spades_effect})
    low_assembly(assembly_dir, "seeds.fa", 10, 32, "spades", runner)
    assert runner.commands[0] == (
        f"metaspades.py --12 {fq} --only-assembler -m 5000 -t 32 "
        f"--untrusted-contigs seeds.fa -o {fq[:-3]}.spades")


def test_merge_olc_flye_command(tmp_path):
    from pangaea_tpu.asm.fasta import write_fasta
    from pangaea_tpu.asm.merge_olc import merge_olc
    seeds = str(tmp_path / "seeds.fa")
    local = str(tmp_path / "local.fa")
    write_fasta(seeds, [("s1", "A" * 1500), ("s2", "C" * 500)])
    write_fasta(local, [("l1", "G" * 1200)])
    outdir = str(tmp_path / "olc")

    def bwa_effect(cmd, cwd):
        if "samtools sort" in cmd:
            # empty BAM: no contained contigs
            from pangaea_tpu.io.bam import BamWriter
            with BamWriter(os.path.join(outdir, "align-inputs.bam"),
                           ["s1"], [1500]):
                pass

    def flye_effect(cmd, cwd):
        d = cmd.split("--out-dir ")[1].split()[0]
        os.makedirs(d, exist_ok=True)
        open(os.path.join(d, "assembly.fasta"), "w").write(">f\nACGT\n")

    runner = FakeRunner({"bwa mem": bwa_effect, "flye --meta": flye_effect})
    merge_olc(seeds, local, outdir, runner=runner)
    flye_cmd = [c for c in runner.commands if c.startswith("flye")][0]
    assert "--meta --subassemblies" in flye_cmd
    assert "--min-overlap 1000" in flye_cmd
    # seed copies: >=1kb seeds appear 6x in the flye input
    from pangaea_tpu.asm.fasta import iter_fasta
    merged = os.path.join(outdir, "flye-input-contigs.fa")
    seqs = [s for _, s in iter_fasta(merged)]
    assert seqs.count("A" * 1500) == 6  # merge_olc.py:79-83
    assert seqs.count("C" * 500) == 0   # below 1 kb
    assert seqs.count("G" * 1200) == 1  # local, not contained

from pangaea_tpu.asm.fasta import write_fasta


def _merge_root(tmp_path, layout="reference"):
    """Fake run root with the artifacts final_merge.sh:19-41 expects."""
    r = tmp_path / "run"
    if layout == "reference":
        pang = r / "pangaea_out"
        athena = r / "athena_out"
        sp, hy = r / "metaspades_out", r / "hybridspades_out"
        mp_fa = r / "metaplatanus_out" / "_result" / "out_final.fa"
    else:  # this repo's driver layout
        pang = r
        athena = r / "2_athena_out"
        sp, hy = r / "1_metaspades_out", r / "3_hybridspades_out"
        mp_fa = r / "3_metaplatanus_out" / "out_final.fa"
    cl, asmd = pang / "3.clustering", pang / "4.assembly"
    olc = athena / "results" / "olc"
    for d in (cl, asmd, olc, sp, hy, mp_fa.parent,
              asmd / "cut10.spades"):
        d.mkdir(parents=True, exist_ok=True)
    write_fasta(str(cl / "contigs.megahit.fa"), [("bin1", "A" * 300)])
    write_fasta(str(asmd / "cut10.spades" / "contigs.fasta"),
                [("sub1", "C" * 300)])
    write_fasta(str(olc / "flye-input-contigs.fa"), [("loc1", "G" * 300)])
    write_fasta(str(olc / "athena.asm.fa"), [("ath1", "T" * 300)])
    write_fasta(str(sp / "contigs.fasta"), [("seedS", "AC" * 700)])
    write_fasta(str(hy / "contigs.fasta"), [("seedH", "AG" * 700)])
    write_fasta(str(mp_fa), [("seedM", "AT" * 700)])
    return r


@pytest.mark.parametrize("layout", ["reference", "driver"])
def test_final_merge_standalone(tmp_path, layout):
    """Standalone merge re-entry == final_merge.sh:38-106: pool rebuild,
    per-type seed selection, olc_<type>/quickmerge_<type> layout, exact
    quickmerge argv, resume-on-existence."""
    from pangaea_tpu.asm.fasta import iter_fasta
    from pangaea_tpu.pipeline.merge import MergeLayout, final_merge
    root = _merge_root(tmp_path, layout)
    lay = MergeLayout(str(root))
    lay.validate()
    # seed table matches final_merge.sh:37-39
    assert lay.seeds["metaspades"].endswith("contigs.fasta")
    assert lay.seeds["hybridspades"].endswith("contigs.fasta")
    assert lay.seeds["metaplatanus"].endswith("out_final.fa")
    asmd = lay.assembly_dir

    class QMRunner(FakeRunner):
        def available(self, tool):
            return tool == "merge_wrapper.py"

    def qm_effect(cmd, cwd):
        write_fasta(os.path.join(cwd, "merged_out.fasta"),
                    [("m1", "ACGT" * 100)])

    runner = QMRunner({"merge_wrapper.py": qm_effect})
    out = final_merge(str(root), "hybridspades", runner=runner)
    # quickmerge argv: relpath of the olc result + realpath athena, run
    # from quickmerge_<type> (final_merge.sh:93-96)
    qm_dir = os.path.join(asmd, "quickmerge_hybridspades")
    olc_final = os.path.join(asmd, "olc_hybridspades", "final.asm.fa")
    assert runner.commands == [
        "merge_wrapper.py "
        + os.path.relpath(olc_final, qm_dir) + " "
        + os.path.realpath(lay.athena)]
    assert os.path.isfile(olc_final)
    assert out == os.path.join(qm_dir, "merged_out.fasta")
    # pool rebuilt from reassemblies + binned + athena local (:51)
    pool_seqs = [s for _, s in iter_fasta(os.path.join(
        asmd, "contigs.low_abd.binning.local.fa"))]
    assert pool_seqs == ["C" * 300, "A" * 300, "G" * 300]
    # renamed contig_<n> (parse_header, :52)
    names = [n for n, _ in iter_fasta(os.path.join(
        asmd, "contigs.low_abd.binning.local.fa"))]
    assert names == ["contig_1", "contig_2", "contig_3"]
    # the HYBRIDSPADES seed (not metaspades) fed the olc merge
    olc_seqs = [s for _, s in iter_fasta(olc_final)]
    assert "AG" * 700 in olc_seqs and "AC" * 700 not in olc_seqs
    # merged_out was renamed contig_<n> (:97-98)
    assert [n for n, _ in iter_fasta(out)] == ["contig_1"]
    # resume: both stages skip on existing outputs (:76,:88)
    runner2 = QMRunner({"merge_wrapper.py": qm_effect})
    final_merge(str(root), "hybridspades", runner=runner2)
    assert runner2.commands == []


def test_final_merge_rejects_unknown_type(tmp_path):
    from pangaea_tpu.pipeline.merge import final_merge
    root = _merge_root(tmp_path)
    with pytest.raises(ValueError, match="operams"):
        final_merge(str(root), "operams")
    # missing artifact aborts like final_merge.sh:26-33
    os.remove(os.path.join(str(root), "athena_out", "results", "olc",
                           "athena.asm.fa"))
    with pytest.raises(FileNotFoundError, match="does not exist"):
        final_merge(str(root), "metaspades")
