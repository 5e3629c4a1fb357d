"""Hybrid-mode preprocessing e2e without bwa (builtin TPU mapper path)."""

import argparse
import os

import numpy as np

from pangaea_tpu.asm.tools import ToolRunner
from pangaea_tpu.io.fastq import iter_fastq_records
from pangaea_tpu.pipeline.driver import preprocess_reads


def rand_seq(n, rng):
    return "".join("ACGT"[b] for b in rng.randint(0, 4, n))


def make_hybrid_data(tmp_path):
    rng = np.random.RandomState(0)
    genomes = [rand_seq(12_000, rng) for _ in range(2)]
    long_fq = str(tmp_path / "long.fq")
    longs = []
    with open(long_fq, "w") as f:
        for gi, g in enumerate(genomes):
            for i in range(3):
                start = i * 4000
                seq = g[start:start + 4000]
                name = f"long_{gi}_{i}"
                longs.append((name, gi, start))
                f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    r1, r2 = str(tmp_path / "s1.fq"), str(tmp_path / "s2.fq")
    truth = {}
    with open(r1, "w") as f1, open(r2, "w") as f2:
        for name, gi, start in longs:
            g = genomes[gi]
            for p in range(20):
                pos = start + (p * 190) % 3600
                frag = g[pos:pos + 400]
                sname = f"short_{name}_{p}"
                truth[sname] = name
                f1.write(f"@{sname}\n{frag[:150]}\n+\n{'I' * 150}\n")
                rc = frag[-150:].translate(
                    str.maketrans("ACGT", "TGCA"))[::-1]
                f2.write(f"@{sname}\n{rc}\n+\n{'I' * 150}\n")
    return long_fq, r1, r2, truth


def test_hybrid_preprocess_builtin_mapper(tmp_path):
    long_fq, r1, r2, truth = make_hybrid_data(tmp_path)
    args = argparse.Namespace(
        short_type="short", reads1=r1, reads2=r2, longreads=long_fq,
        index="", whitelist="", output=str(tmp_path / "out"), threads=4)
    reads_dir = str(tmp_path / "out" / "0_preprocess_reads")
    sorted_fq = preprocess_reads(args, reads_dir, ToolRunner())
    assert os.path.isfile(sorted_fq)
    recs = list(iter_fastq_records(sorted_fq))
    assert len(recs) == len(truth) * 2
    # virtual barcodes: most shorts get the long read they came from
    # (fragments near a window edge may legitimately match the adjacent
    # window's long read too; uniform tie-break then picks either)
    good = total = 0
    for rec in recs[::2]:
        name = rec.header.split()[0].split("\t")[0]
        if "BX:Z:" in rec.header:
            bc = rec.header.split("BX:Z:")[1].split("-")[0]
            total += 1
            if truth.get(name) == bc:
                good += 1
    assert total > len(truth) * 0.9, f"only {total} barcoded"
    assert good / total > 0.8, f"barcode accuracy {good}/{total}"
    # barcode-sorted: tags are non-decreasing, unbarcoded last
    tags = []
    for rec in recs[::2]:
        tags.append(rec.header.split("BX:Z:")[1]
                    if "BX:Z:" in rec.header else "~~~")
    assert tags == sorted(tags)


def test_glibc_rand_matches_libc(tmp_path):
    """utils.GlibcRand reproduces the C library rand() stream bit-exactly
    (the draw source of add_barcode.cpp:72,105)."""
    import shutil
    import subprocess

    from pangaea_tpu.utils import GlibcRand

    import pytest
    if not shutil.which("gcc"):
        pytest.skip("no C compiler")
    # The oracle is the host C library: only glibc implements the TYPE_3
    # stream GlibcRand replicates (musl etc. differ by design).
    import ctypes
    import ctypes.util
    libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6")
    if not hasattr(libc, "gnu_get_libc_version"):
        pytest.skip("host libc is not glibc")
    src = tmp_path / "randref.c"
    src.write_text(
        "#include <stdio.h>\n#include <stdlib.h>\n"
        "int main(int c, char**v){srand((unsigned)strtoul(v[1],0,10));"
        "for(int i=0;i<1000;i++)printf(\"%d\\n\",rand());return 0;}\n")
    exe = str(tmp_path / "randref")
    subprocess.run(["gcc", "-O2", str(src), "-o", exe], check=True)
    # includes seeds >= 2^31 (negative initial int32 word), which exercise
    # the C-truncating-division branch of the Schrage seeding step
    for seed in (2023, 1, 0, 123456789, 2147483649, 2250599295, 4294967295):
        want = [int(x) for x in subprocess.run(
            [exe, str(seed)], capture_output=True, text=True,
            check=True).stdout.split()]
        g = GlibcRand(seed)
        got = [g.rand() for _ in range(1000)]
        assert got == want, f"seed {seed}"
