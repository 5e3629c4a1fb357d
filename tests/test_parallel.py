"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4):
sharded feature extraction, training, and clustering must produce the
same results as single-device execution."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pangaea_tpu.config import FeatureConfig, ModelConfig
from pangaea_tpu.kernels.features import count_kmers_global, make_global_table
from pangaea_tpu.model import VAE, VAETrainer, init_vae
from pangaea_tpu.model.dataset import batch_index_matrix
from pangaea_tpu.parallel import (data_mesh, sharded_lloyd,
                                  sharded_train_block)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return data_mesh(8)


def test_sharded_global_count_matches_single(mesh):
    rng = np.random.RandomState(0)
    k = 7
    codes = rng.randint(0, 4, (64, 64)).astype(np.uint8)
    lengths = np.full(64, 64, np.int32)
    cont = np.zeros(64, np.uint8)
    single = count_kmers_global(make_global_table(k), jnp.asarray(codes),
                                jnp.asarray(lengths), jnp.asarray(cont),
                                k=k, overlap=k - 1)
    codes_s = jax.device_put(jnp.asarray(codes),
                             NamedSharding(mesh, P("data", None)))
    lengths_s = jax.device_put(jnp.asarray(lengths),
                               NamedSharding(mesh, P("data")))
    cont_s = jax.device_put(jnp.asarray(cont),
                            NamedSharding(mesh, P("data")))
    table0 = jax.device_put(make_global_table(k),
                            NamedSharding(mesh, P()))
    sharded = count_kmers_global(table0, codes_s, lengths_s, cont_s,
                                 k=k, overlap=k - 1)
    np.testing.assert_array_equal(np.asarray(single), np.asarray(sharded))


@pytest.mark.parametrize("route", ["all_gather", "all_to_all"])
def test_sharded_table_counter_matches_single(mesh, route):
    from pangaea_tpu.parallel import make_sharded_kmer_counter
    rng = np.random.RandomState(3)
    k = 7
    codes = rng.randint(0, 4, (64, 64)).astype(np.uint8)
    lengths = np.full(64, 64, np.int32)
    cont = np.zeros(64, np.uint8)
    single = count_kmers_global(make_global_table(k), jnp.asarray(codes),
                                jnp.asarray(lengths), jnp.asarray(cont),
                                k=k, overlap=k - 1)
    init_table, step, unshard, (mat, row) = make_sharded_kmer_counter(
        mesh, k, k - 1, route=route)
    table = init_table()
    args = (jax.device_put(jnp.asarray(codes), mat),
            jax.device_put(jnp.asarray(lengths), row),
            jax.device_put(jnp.asarray(cont), row))
    table, ov = step(table, *args)
    table, ov2 = step(table, *args)  # accumulate twice
    assert int(np.asarray(ov).sum()) == 0
    assert int(np.asarray(ov2).sum()) == 0
    np.testing.assert_array_equal(unshard(table),
                                  2 * np.asarray(single))


def test_sharded_counter_overflow_detected(mesh):
    """Pathologically skewed keys (all-identical reads) must be flagged,
    never silently dropped."""
    from pangaea_tpu.parallel import make_sharded_kmer_counter
    k = 7
    codes = np.zeros((64, 64), np.uint8)  # poly-A: one canonical k-mer
    lengths = np.full(64, 64, np.int32)
    cont = np.zeros(64, np.uint8)
    init_table, step, unshard, (mat, row) = make_sharded_kmer_counter(
        mesh, k, k - 1, route="all_to_all", capacity_factor=0.01)
    table = init_table()
    table, ov = step(table, jax.device_put(jnp.asarray(codes), mat),
                     jax.device_put(jnp.asarray(lengths), row),
                     jax.device_put(jnp.asarray(cont), row))
    assert int(np.asarray(ov).sum()) > 0


def test_sharded_train_step_matches_replicated(mesh):
    rng = np.random.RandomState(1)
    model = VAE(abd_dim=40, tnf_dim=16, hidden_sizes=(32, 32), latent_dim=8,
                dropout=0.0)
    cfg = ModelConfig(batch_size=32)
    trainer = VAETrainer(model, cfg)
    params, bn = init_vae(jax.random.PRNGKey(0), model)
    opt = trainer.tx.init(params)
    abd = jnp.asarray(rng.rand(128, 40).astype(np.float32))
    tnf = jnp.asarray(rng.rand(128, 16).astype(np.float32))
    idx, mask = batch_index_matrix(np.arange(128), 32)
    key = jax.random.PRNGKey(3)

    p1, o1, b1, _, s1 = trainer._train_block(
        params, opt, bn, key, abd, tnf, jnp.asarray(idx), jnp.asarray(mask))

    params2, bn2 = init_vae(jax.random.PRNGKey(0), model)
    opt2 = trainer.tx.init(params2)
    step = sharded_train_block(trainer, mesh)
    repl = NamedSharding(mesh, P())
    p2, o2, b2, _, s2 = step(
        jax.device_put(params2, repl), jax.device_put(opt2, repl),
        jax.device_put(bn2, repl), jax.device_put(key, repl),
        jax.device_put(abd, repl), jax.device_put(tnf, repl),
        jax.device_put(jnp.asarray(idx),
                       NamedSharding(mesh, P(None, "data"))),
        jax.device_put(jnp.asarray(mask),
                       NamedSharding(mesh, P(None, "data", None))))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1["out"]["w"]),
                               np.asarray(p2["out"]["w"]), rtol=2e-3,
                               atol=2e-5)


def test_sharded_lloyd_matches_single(mesh):
    from pangaea_tpu.cluster.kmeans import kmeans_lloyd
    rng = np.random.RandomState(2)
    centers = rng.randn(4, 8).astype(np.float32) * 4
    lab = rng.randint(0, 4, 256)
    X = (centers[lab] + rng.randn(256, 8) * 0.2).astype(np.float32)
    init = X[[0, 50, 100, 200]]
    C1, l1, in1, _ = kmeans_lloyd(X, init)
    lloyd = sharded_lloyd(mesh)
    tol = np.float32(1e-4 * X.var(axis=0).mean())
    C2, l2, in2, _ = lloyd(
        jax.device_put(jnp.asarray(X), NamedSharding(mesh, P("data", None))),
        jax.device_put(jnp.ones(256, jnp.float32),
                       NamedSharding(mesh, P("data"))),
        jax.device_put(jnp.asarray(init), NamedSharding(mesh, P())),
        jnp.asarray(tol))
    np.testing.assert_allclose(float(in1), float(in2), rtol=1e-3)
    from sklearn.metrics import adjusted_rand_score
    assert adjusted_rand_score(l1, np.asarray(l2)) == 1.0


@pytest.mark.parametrize("impl", ["scatter", "segsum", "sortjoin"])
def test_sharded_feature_extractor_matches_single(mesh, tmp_path, impl):
    from pangaea_tpu.config import FeatureConfig
    from pangaea_tpu.features import FeatureExtractor
    from pangaea_tpu.io.sim import simulate_linked_reads
    from pangaea_tpu.parallel import ShardedFeatureExtractor
    reads = str(tmp_path / "r.fq.gz")
    simulate_linked_reads(out_interleaved=reads, n_species=2,
                          genome_len=8_000, n_barcodes=40,
                          pairs_per_barcode=12, seed=17)
    cfg = FeatureConfig(kmer=9, reads_per_batch=512)
    single = FeatureExtractor(cfg, str(tmp_path / "s"))
    n1, a1, t1 = single.extract_features(interleaved=reads)
    sharded = ShardedFeatureExtractor(
        FeatureConfig(kmer=9, reads_per_batch=512, hist_impl=impl),
        str(tmp_path / "m"), mesh)
    n2, a2, t2 = sharded.extract_features(interleaved=reads)
    assert n1.tolist() == n2.tolist()
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(t1, t2)


def test_graft_entry_and_dryrun():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (256, 32)
    g.dryrun_multichip(8)


def test_sharded_sortjoin_matches_single(mesh):
    """Distributed sort-join (hash-routed buckets + local sort-join) ==
    single-device sortjoin_bins, including sentinels and bin capping."""
    import jax
    import jax.numpy as jnp
    from pangaea_tpu.kernels.features import kmer_key_sentinel, sortjoin_bins
    from pangaea_tpu.parallel import make_sharded_sortjoin

    k, window, vec = 8, 3, 9
    rng = np.random.RandomState(0)
    n = 8 * 4096
    # duplicates across shards force cross-device count merges
    keys = rng.randint(0, 2000, n).astype(np.int32)
    keys[rng.rand(n) < 0.15] = kmer_key_sentinel(k)
    bins_fn, row = make_sharded_sortjoin(mesh, k, window, vec)
    keys_d = jax.device_put(jnp.asarray(keys), row)
    got, overflow = bins_fn(keys_d)
    assert int(np.asarray(overflow).sum()) == 0
    want = sortjoin_bins(jnp.asarray(keys), k=k, window=window,
                         vector_size=vec)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_sortjoin_hot_key(mesh):
    """A single hot key (Zipfian multiplicity) routes as one compressed
    (key, count) pair per source, so it neither overflows nor miscounts."""
    import jax
    import jax.numpy as jnp
    from pangaea_tpu.parallel import make_sharded_sortjoin

    n = 8 * 1024
    keys = np.full(n, 7, np.int32)  # count 8192 -> bin 8192//3 = 2730 >= 9
    bins_fn, row = make_sharded_sortjoin(mesh, 8, 3, 9,
                                         capacity_factor=1.0)
    got, overflow = bins_fn(jax.device_put(jnp.asarray(keys), row))
    assert int(np.asarray(overflow).sum()) == 0
    assert (np.asarray(got) == -1).all()  # bin >= vector_size -> dropped
    # same hot key, window wide enough to keep the bin in range
    bins_fn2, _ = make_sharded_sortjoin(mesh, 8, 1024, 9,
                                        capacity_factor=1.0)
    got2, ov2 = bins_fn2(jax.device_put(jnp.asarray(keys), row))
    assert int(np.asarray(ov2).sum()) == 0
    assert (np.asarray(got2) == n // 1024).all()

def test_sharded_sortjoin_overflow_detected(mesh):
    """Adversarial hash collisions (distinct keys all mapping to one
    shard: the multiplier is odd so dest == key mod n_dev for pow2
    meshes) report overflow instead of silently dropping updates."""
    import jax
    import jax.numpy as jnp
    from pangaea_tpu.parallel import make_sharded_sortjoin

    n = 8 * 1024
    keys = (8 * np.arange(n)).astype(np.int32) % (4 ** 8)
    bins_fn, row = make_sharded_sortjoin(mesh, 8, 3, 9,
                                         capacity_factor=1.0)
    got, overflow = bins_fn(jax.device_put(jnp.asarray(keys), row))
    assert int(np.asarray(overflow).sum()) > 0


def test_sharded_sortjoin_pair_matches_single(mesh):
    """Distributed split-word sort-join (k > 15) == single-device
    sortjoin_bins_pair, duplicates crossing shards."""
    import jax
    import jax.numpy as jnp
    from pangaea_tpu.kernels.features import (kmer_key_sentinel_pair,
                                              sortjoin_bins_pair)
    from pangaea_tpu.parallel import make_sharded_sortjoin_pair

    k, window, vec = 21, 3, 9
    rng = np.random.RandomState(1)
    n = 8 * 4096
    hi = rng.randint(0, 40, n).astype(np.uint32)
    lo = rng.randint(0, 50, n).astype(np.uint32)
    shi, slo = kmer_key_sentinel_pair(k)
    inv = rng.rand(n) < 0.15
    hi[inv], lo[inv] = shi, slo
    bins_fn, row = make_sharded_sortjoin_pair(mesh, k, window, vec)
    got, overflow = bins_fn(jax.device_put(jnp.asarray(hi), row),
                            jax.device_put(jnp.asarray(lo), row))
    assert int(np.asarray(overflow).sum()) == 0
    want = sortjoin_bins_pair(jnp.asarray(hi), jnp.asarray(lo), k=k,
                              window=window, vector_size=vec)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_feature_extractor_k21_matches_single(mesh, tmp_path):
    """End-to-end sharded extractor at k=21 (split-word routed sort-join)
    == single-device split-word path."""
    from pangaea_tpu.config import FeatureConfig
    from pangaea_tpu.features import FeatureExtractor
    from pangaea_tpu.io.sim import simulate_linked_reads
    from pangaea_tpu.parallel import ShardedFeatureExtractor
    reads = str(tmp_path / "r.fq.gz")
    simulate_linked_reads(out_interleaved=reads, n_species=2,
                          genome_len=8_000, n_barcodes=40,
                          pairs_per_barcode=12, seed=23)
    single = FeatureExtractor(FeatureConfig(kmer=21, reads_per_batch=512),
                              str(tmp_path / "s"))
    n1, a1, t1 = single.extract_features(interleaved=reads)
    sharded = ShardedFeatureExtractor(
        FeatureConfig(kmer=21, reads_per_batch=512),
        str(tmp_path / "m"), mesh)
    n2, a2, t2 = sharded.extract_features(interleaved=reads)
    assert n1.tolist() == n2.tolist()
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(t1, t2)


def test_sharded_overflow_cap_scales_with_mesh(tmp_path, monkeypatch):
    """Regression: the mid-stream overflow check must use the MESH-scaled
    window cap — datasets in (cap, n_dev*cap] are exactly the routed
    sort-join's workload and must not restart on the table path."""
    from pangaea_tpu.features import FeatureExtractor
    from pangaea_tpu.io.sim import simulate_linked_reads
    from pangaea_tpu.parallel import ShardedFeatureExtractor, data_mesh

    fq = str(tmp_path / "sim.fq.gz")
    simulate_linked_reads(out_interleaved=fq, n_species=2, genome_len=8_000,
                          n_barcodes=24, pairs_per_barcode=12, read_len=40,
                          seed=7)
    mesh = data_mesh(8)
    # total windows (~32k) land between cap and 8*cap
    # 64-row batches keep the number of collective dispatches low: on a
    # 2-core host XLA-CPU aborts the whole process if any of the 8
    # virtual-device threads is starved >40 s at a collective rendezvous
    # (rendezvous.cc termination timeout) — an environment livelock all
    # virtual-mesh collective tests share under heavy co-load
    cfg = FeatureConfig(kmer=9, tnf_kmer=4, min_length=100,
                        max_read_len=64, reads_per_batch=64,
                        hist_impl="sortjoin", min_qual_char=None,
                        sortjoin_max_windows=5_000)
    fe = ShardedFeatureExtractor(cfg, str(tmp_path / "sharded"), mesh)
    calls = []
    orig = ShardedFeatureExtractor.group_features

    def spy(self, *a, **k):
        calls.append("table_path")
        return orig(self, *a, **k)

    monkeypatch.setattr(ShardedFeatureExtractor, "group_features", spy)
    n1, a1, t1 = fe.extract_features(interleaved=fq)
    assert calls == [], "restarted on the table path below the mesh cap"
    cfg2 = FeatureConfig(kmer=9, tnf_kmer=4, min_length=100,
                         max_read_len=64, reads_per_batch=32,
                         hist_impl="scatter", min_qual_char=None)
    fe2 = FeatureExtractor(cfg2, str(tmp_path / "sc"))
    n2, a2, t2 = fe2.extract_features(interleaved=fq)
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(t1, t2)


def test_sharded_weighted_sortjoin_matches_single(mesh):
    """Routed WEIGHTED join (masked-global: local weight sums ride where
    run lengths did) == single-device weighted kernel, including
    zero-weight runs (keys absent from the masked multiset -> -1)."""
    from pangaea_tpu.kernels.features import (kmer_key_sentinel,
                                              sortjoin_bins_weighted)
    from pangaea_tpu.parallel.dist import make_sharded_sortjoin

    k, window, vec = 8, 3, 9
    rng = np.random.RandomState(5)
    n = 8 * 4096
    keys = rng.randint(0, 1500, n).astype(np.int32)
    keys[rng.rand(n) < 0.15] = kmer_key_sentinel(k)
    wts = (rng.rand(n) < 0.6).astype(np.int32)
    # force some all-zero-weight keys (masked everywhere -> count 0)
    wts[keys < 100] = 0
    bins_fn, row = make_sharded_sortjoin(mesh, k, window, vec,
                                         weighted=True)
    got, overflow = bins_fn(jax.device_put(jnp.asarray(keys), row),
                            jax.device_put(jnp.asarray(wts), row))
    assert int(np.asarray(overflow).sum()) == 0
    want = sortjoin_bins_weighted(jnp.asarray(keys), jnp.asarray(wts),
                                  k=k, window=window, vector_size=vec)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_fused_uploads_match_single(mesh, tmp_path):
    """pack_transfers='on' over the mesh: fused stacked uploads place
    each plane row-sharded (_put_stacked), and per-batch slices inherit
    the shardings the per-batch path used — results bit-identical to
    the single-device extractor."""
    from pangaea_tpu.config import FeatureConfig
    from pangaea_tpu.features import FeatureExtractor
    from pangaea_tpu.io.sim import simulate_linked_reads
    from pangaea_tpu.parallel import ShardedFeatureExtractor
    reads = str(tmp_path / "r.fq.gz")
    simulate_linked_reads(out_interleaved=reads, n_species=2,
                          genome_len=8_000, n_barcodes=40,
                          pairs_per_barcode=12, seed=17)
    cfg1 = FeatureConfig(kmer=9, reads_per_batch=512)
    single = FeatureExtractor(cfg1, str(tmp_path / "s"))
    n1, a1, t1 = single.extract_features(interleaved=reads)
    cfg2 = FeatureConfig(kmer=9, reads_per_batch=512,
                         hist_impl="sortjoin", pack_transfers="on")
    sharded = ShardedFeatureExtractor(cfg2, str(tmp_path / "m"), mesh)
    n2, a2, t2 = sharded.extract_features(interleaved=reads)
    assert n1.tolist() == n2.tolist()
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(t1, t2)


@pytest.mark.parametrize("kmer", [9, 21])
def test_sharded_masked_paired_extractor_matches_single(mesh, tmp_path,
                                                        kmer):
    """End-to-end: the sharded extractor on MASKED PAIRED input (weighted
    routed join + sharded lowq planes) == the single-device extractor,
    bit for bit, on error-injected heterogeneous-quality reads — both
    the single-word (k<=15) and split-word (k>15) kernels."""
    from pangaea_tpu.config import FeatureConfig
    from pangaea_tpu.features import FeatureExtractor
    from pangaea_tpu.io.sim import simulate_linked_reads
    from pangaea_tpu.parallel import ShardedFeatureExtractor
    r1 = str(tmp_path / "r1.fq.gz")
    r2 = str(tmp_path / "r2.fq.gz")
    simulate_linked_reads(out_r1=r1, out_r2=r2, n_species=2,
                          genome_len=8_000, n_barcodes=40,
                          pairs_per_barcode=12, error_rate=0.005,
                          low_qual_rate=0.15, seed=19)
    cfg1 = FeatureConfig(kmer=kmer, reads_per_batch=512,
                         hist_impl="sortjoin", min_qual_char="?")
    single = FeatureExtractor(cfg1, str(tmp_path / "s"))
    n1, a1, t1 = single.extract_features(reads1=r1, reads2=r2)
    cfg2 = FeatureConfig(kmer=kmer, reads_per_batch=512,
                         hist_impl="sortjoin", min_qual_char="?")
    sharded = ShardedFeatureExtractor(cfg2, str(tmp_path / "m"), mesh)
    n2, a2, t2 = sharded.extract_features(reads1=r1, reads2=r2)
    assert n1.tolist() == n2.tolist()
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(t1, t2)


def test_sharded_beyond_mesh_cap_spills(tmp_path, monkeypatch):
    """Past even the MESH-scaled window cap the sharded extractor spills
    keys to host RAM and joins one key-value range at a time, each range
    through the mesh-routed kernel — zero stream re-reads, no table-path
    restart, equal to the scatter oracle (VERDICT r2 item 5)."""
    from pangaea_tpu.features import FeatureExtractor
    from pangaea_tpu.io.sim import simulate_linked_reads
    from pangaea_tpu.parallel import ShardedFeatureExtractor, data_mesh

    fq = str(tmp_path / "sim.fq.gz")
    simulate_linked_reads(out_interleaved=fq, n_species=2, genome_len=8_000,
                          n_barcodes=24, pairs_per_barcode=12, read_len=40,
                          seed=7)
    mesh = data_mesh(8)
    # ~32k windows >> 8 * 500: upfront estimate triggers host spill
    cfg = FeatureConfig(kmer=9, tnf_kmer=4, min_length=100,
                        max_read_len=64, reads_per_batch=64,
                        hist_impl="sortjoin", min_qual_char=None,
                        sortjoin_max_windows=500)
    fe = ShardedFeatureExtractor(cfg, str(tmp_path / "sharded"), mesh)
    stream_reads = []
    table_calls = []
    orig_ev = ShardedFeatureExtractor._sortjoin_events
    monkeypatch.setattr(
        ShardedFeatureExtractor, "_sortjoin_events",
        lambda self, *a: (stream_reads.append(1), orig_ev(self, *a))[1])
    monkeypatch.setattr(
        ShardedFeatureExtractor, "group_features",
        lambda self, *a, **k: table_calls.append(1))
    ranges = []
    orig_bins = ShardedFeatureExtractor._sortjoin_bins
    monkeypatch.setattr(
        ShardedFeatureExtractor, "_sortjoin_bins",
        lambda self, keys: (ranges.append(keys.shape[0]),
                            orig_bins(self, keys))[1])
    n1, a1, t1 = fe.extract_features(interleaved=fq)
    assert stream_reads == [1], "stream must be read exactly once"
    assert table_calls == [], "must not restart on the table path"
    assert len(ranges) > 1, "expected a multi-range chunked join"
    # every range padded within the mesh-scaled cap's padded shape and
    # n_dev-divisible (placed with P('data'))
    assert all(r % 8 == 0 for r in ranges)
    cfg2 = FeatureConfig(kmer=9, tnf_kmer=4, min_length=100,
                         max_read_len=64, reads_per_batch=32,
                         hist_impl="scatter", min_qual_char=None)
    fe2 = FeatureExtractor(cfg2, str(tmp_path / "sc"))
    n2, a2, t2 = fe2.extract_features(interleaved=fq)
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(t1, t2)


def test_sharded_unit_chunk_matches_single(mesh):
    """The fused multi-epoch train chunk under mesh shardings ==
    single-device chunk (same early-stop transitions, val losses, and
    parameters to sharded-matmul tolerance)."""
    from pangaea_tpu.parallel import sharded_unit_chunk

    rng = np.random.RandomState(4)
    model = VAE(abd_dim=40, tnf_dim=16, hidden_sizes=(32, 32), latent_dim=8,
                dropout=0.0)
    cfg = ModelConfig(batch_size=32, patience=2)
    n, bsz, C, U, vnb = 128, 32, 4, 2, 2
    abd = jnp.asarray(rng.rand(n, 40).astype(np.float32))
    tnf = jnp.asarray(rng.rand(n, 16).astype(np.float32))
    uidx = rng.randint(0, n, (C, U, bsz)).astype(np.int32)
    ucnt = np.full((C, U), bsz, np.int32)
    ucnt[-1, -1] = 17  # a partial batch
    ulive = np.array([True, True, True, False])
    vidx = rng.randint(0, n, (C, vnb, bsz)).astype(np.int32)
    vcnt = np.array([bsz, 11], np.int32)

    def run_single():
        trainer = VAETrainer(model, cfg)
        key = jax.random.PRNGKey(5)  # per-run: the chunk donates it
        params, bn = init_vae(jax.random.PRNGKey(0), model)
        opt = trainer.tx.init(params)
        bz = jax.tree_util.tree_map(jnp.zeros_like, params)
        bb = jax.tree_util.tree_map(jnp.zeros_like, bn)
        es = (jnp.float32(-np.inf), jnp.int32(0), jnp.bool_(False))
        return trainer._unit_chunk(
            params, opt, bn, key, bz, bb, es, abd, tnf,
            jnp.asarray(uidx), jnp.asarray(ucnt), jnp.asarray(ulive),
            jnp.asarray(vidx), jnp.asarray(vcnt))

    def run_sharded():
        trainer = VAETrainer(model, cfg)
        key = jax.random.PRNGKey(5)
        params, bn = init_vae(jax.random.PRNGKey(0), model)
        opt = trainer.tx.init(params)
        repl = NamedSharding(mesh, P())
        idx3 = NamedSharding(mesh, P(None, None, "data"))
        chunk = sharded_unit_chunk(trainer, mesh)
        bz = jax.tree_util.tree_map(jnp.zeros_like, params)
        bb = jax.tree_util.tree_map(jnp.zeros_like, bn)
        es = (jnp.float32(-np.inf), jnp.int32(0), jnp.bool_(False))
        return chunk(
            jax.device_put(params, repl), jax.device_put(opt, repl),
            jax.device_put(bn, repl), jax.device_put(key, repl),
            jax.device_put(bz, repl), jax.device_put(bb, repl),
            jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), es),
            jax.device_put(abd, repl), jax.device_put(tnf, repl),
            jax.device_put(jnp.asarray(uidx), idx3),
            jax.device_put(jnp.asarray(ucnt), repl),
            jax.device_put(jnp.asarray(ulive), repl),
            jax.device_put(jnp.asarray(vidx), idx3),
            jax.device_put(jnp.asarray(vcnt), repl))

    out1 = run_single()
    out2 = run_sharded()
    rows1, rows2 = np.asarray(out1[7]), np.asarray(out2[7])
    # (C, 8) stacked rows: [val, stats4, improved, stop, ran]
    val1, imp1, stop1, ran1 = (rows1[:, 0], rows1[:, 5] != 0,
                               rows1[:, 6] != 0, rows1[:, 7] != 0)
    val2, imp2, stop2, ran2 = (rows2[:, 0], rows2[:, 5] != 0,
                               rows2[:, 6] != 0, rows2[:, 7] != 0)
    np.testing.assert_array_equal(ran1, ran2)
    np.testing.assert_array_equal(imp1, imp2)
    np.testing.assert_array_equal(stop1, stop2)
    np.testing.assert_allclose(val1[ran1], val2[ran2], rtol=2e-4, atol=1e-5)
    p1, p2 = out1[0], out2[0]
    np.testing.assert_allclose(np.asarray(p1["out"]["w"]),
                               np.asarray(p2["out"]["w"]), rtol=2e-3,
                               atol=2e-5)
    es1, es2 = out1[6], out2[6]
    assert int(es1[1]) == int(es2[1])     # patience counter
    assert bool(es1[2]) == bool(es2[2])   # stopped flag
