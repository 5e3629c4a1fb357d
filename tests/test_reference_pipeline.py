"""End-to-end parity vs the ACTUAL reference pipeline (steps 1-3).

Runs /root/reference/src/pangaea.py verbatim (its binaries compiled from
its own cpptools; jellyfish replaced by a precomputed exact dump that its
resume logic consumes — src/feature.py:72-104) and this repo's pipeline
on identical simulated input, then asserts BASELINE.md's correctness bar:
byte-identical feature CSVs at the default k=15 and cluster-assignment
agreement. The full >=1M-read run lives in tools/ref_pipeline_compare.py
(report committed as REFCOMPARE.md); this test is the same comparison at
CI scale.
"""

import gzip
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.refstack import BIN, build_ref_tools, write_jellyfish_dump  # noqa: E402
from tools.ref_pipeline_compare import (ari, load_clusters_tsv,  # noqa: E402
                                        make_ref_home, run_ours,
                                        run_reference)

torch = pytest.importorskip("torch")

if not build_ref_tools(["count_kmer", "count_tnf", "extract_reads"]):
    pytest.skip("reference tools unavailable", allow_module_level=True)

K, CLUSTERS = 15, 3


@pytest.fixture(scope="module")
def runs(tmp_path_factory):
    from pangaea_tpu.io.sim import simulate_linked_reads
    base = str(tmp_path_factory.mktemp("refpipe"))
    fq = os.path.join(base, "reads.fq.gz")
    dump = os.path.join(base, "table.dump")
    # error-injected + heterogeneous quality (VERDICT r2 item 4): the
    # interleaved flow counts unmasked, so low-qual bases exercise only
    # realism here; substitution errors perturb both feature tables
    res = simulate_linked_reads(out_interleaved=fq, n_species=3,
                                genome_len=60_000, n_barcodes=200,
                                pairs_per_barcode=12, seed=5,
                                error_rate=0.005, low_qual_rate=0.15)
    write_jellyfish_dump(fq, dump, k=K)
    home = make_ref_home(base, BIN)
    stubs = os.path.join(base, "stubs")
    ref_out = os.path.join(base, "ref_out")
    ours_out = os.path.join(base, "ours_out")
    os.makedirs(ref_out, exist_ok=True)
    run_reference(home, stubs, fq, ref_out, dump, K, CLUSTERS,
                  threads=os.cpu_count())
    run_ours(fq, ours_out, K, CLUSTERS)
    return ref_out, ours_out, res


def _gz(path):
    with gzip.open(path, "rb") as f:
        return f.read()


def test_feature_csvs_byte_equal_at_default_k(runs):
    ref_out, ours_out, _ = runs
    stem = f"abundance.k{K}.v400.w10.m2000.gz"
    assert _gz(os.path.join(ref_out, "1.features", stem)) == \
        _gz(os.path.join(ours_out, "1.features", stem))
    assert _gz(os.path.join(ref_out, "1.features", "tnf.m2000.gz")) == \
        _gz(os.path.join(ours_out, "1.features", "tnf.m2000.gz"))


def test_cluster_assignment_agreement(runs):
    ref_out, ours_out, res = runs
    ref_map = load_clusters_tsv(os.path.join(ref_out, "3.clustering",
                                             "clusters.tsv"))
    our_map = load_clusters_tsv(os.path.join(ours_out, "3.clustering",
                                             "clusters.tsv"))
    assert set(ref_map) == set(our_map)
    truth = {f"{bc}-1": sp for bc, sp in res.barcode_species.items()}
    # both pipelines must recover the simulated structure and agree with
    # each other (stochastic stages differ by RNG stream, DESIGN.md §9,
    # so the bar is assignment agreement, not byte equality)
    assert ari(ref_map, our_map) > 0.95
    assert ari(ref_map, truth) > 0.95
    assert ari(our_map, truth) > 0.95


def test_per_bin_fastqs_match(runs):
    """extract_reads output: same reads land in matching bins up to
    cluster relabeling (reference binary vs io/extract_reads.py)."""
    ref_out, ours_out, _ = runs
    def bins(out):
        d = os.path.join(out, "3.clustering")
        got = {}
        for name in os.listdir(d):
            if name.startswith("cluster_bin") and name.endswith(".fq"):
                with open(os.path.join(d, name)) as f:
                    lines = f.read().splitlines()
                # quality lines may start with '@' too: take record heads
                got[name] = frozenset(lines[i].split()[0]
                                      for i in range(0, len(lines), 4))
        return got
    rb, ob = bins(ref_out), bins(ours_out)
    assert len(rb) == len(ob) and rb, (len(rb), len(ob))
    # match bins by content identity regardless of cluster ids
    assert sorted(rb.values(), key=sorted) == sorted(ob.values(),
                                                     key=sorted)


@pytest.fixture(scope="module")
def runs_paired(tmp_path_factory):
    """The PAIRED -1/-2 flow at CI scale: quality-masked jellyfish dump
    (src/feature.py:76-86), error-injected reads — the reference runs
    count_kmer -1/-2 against the masked dump; ours runs the weighted
    masked sort-join / masked table path."""
    from pangaea_tpu.io.sim import simulate_linked_reads
    base = str(tmp_path_factory.mktemp("refpipe_paired"))
    r1 = os.path.join(base, "r1.fq.gz")
    r2 = os.path.join(base, "r2.fq.gz")
    dump = os.path.join(base, "table.dump")
    res = simulate_linked_reads(out_r1=r1, out_r2=r2, n_species=3,
                                genome_len=60_000, n_barcodes=200,
                                pairs_per_barcode=12, seed=6,
                                error_rate=0.005, low_qual_rate=0.15)
    write_jellyfish_dump([r1, r2], dump, k=K, min_qual_char="?")
    home = make_ref_home(base, BIN)
    stubs = os.path.join(base, "stubs")
    ref_out = os.path.join(base, "ref_out")
    ours_out = os.path.join(base, "ours_out")
    os.makedirs(ref_out, exist_ok=True)
    run_reference(home, stubs, (r1, r2), ref_out, dump, K, CLUSTERS,
                  threads=os.cpu_count())
    run_ours((r1, r2), ours_out, K, CLUSTERS)
    return ref_out, ours_out, res


def test_paired_masked_feature_csvs_byte_equal(runs_paired):
    ref_out, ours_out, _ = runs_paired
    stem = f"abundance.k{K}.v400.w10.m2000.gz"
    assert _gz(os.path.join(ref_out, "1.features", stem)) == \
        _gz(os.path.join(ours_out, "1.features", stem))
    assert _gz(os.path.join(ref_out, "1.features", "tnf.m2000.gz")) == \
        _gz(os.path.join(ours_out, "1.features", "tnf.m2000.gz"))


def test_paired_masked_cluster_agreement(runs_paired):
    ref_out, ours_out, res = runs_paired
    ref_map = load_clusters_tsv(os.path.join(ref_out, "3.clustering",
                                             "clusters.tsv"))
    our_map = load_clusters_tsv(os.path.join(ours_out, "3.clustering",
                                             "clusters.tsv"))
    assert set(ref_map) == set(our_map)
    truth = {f"{bc}-1": sp for bc, sp in res.barcode_species.items()}
    assert ari(ref_map, our_map) > 0.95
    assert ari(ref_map, truth) > 0.95
    assert ari(our_map, truth) > 0.95
