"""Cluster layer tests: point reduction, Lloyd vs sklearn, RPH end-to-end.

Quality bar from the reference's captured baseline: ARI ~0.997 / NMI
~0.992 on 5400-pt simulated gaussian mixtures
(third_parties/rph_kmeans/examples/performance_test/log.txt:31-33).
"""

import numpy as np
import pytest
from sklearn.cluster import KMeans
from sklearn.metrics import adjusted_rand_score

import jax.numpy as jnp

from pangaea_tpu.cluster import (RPHKMeans, RPPointReducer, cal_bic,
                                 clustering_rph_kmeans, kmeans_lloyd,
                                 select_k_with_bic)
from pangaea_tpu.cluster.k_selection import kneedle
from pangaea_tpu.cluster.reduce import _reduce_step


def blobs(n=2000, k=5, d=8, spread=0.3, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d) * 4
    lab = rng.randint(0, k, n)
    X = centers[lab] + rng.randn(n, d) * spread
    return X.astype(np.float32), lab


def oracle_reduce(X, w, proj, b):
    """Reference bucketing semantics (point_reducer_py.py:94-102 +
    update_x_and_weight): dict keyed by int32-truncated projections."""
    keys = (X @ proj + b).astype(np.int32)
    buckets = {}
    for i in range(X.shape[0]):
        buckets.setdefault(keys[i].tobytes(), []).append(i)
    xs, ws = [], []
    for idx in buckets.values():
        wt = w[idx]
        ws.append(wt.sum())
        xs.append((X[idx] * wt[:, None]).sum(0) / wt.sum())
    return np.array(xs), np.array(ws)


def test_reduce_step_matches_dict_bucketing():
    rng = np.random.RandomState(1)
    X = rng.randn(64, 4).astype(np.float32)
    w = rng.rand(64).astype(np.float32) + 0.5
    proj = rng.randn(4, 5).astype(np.float32) * 2
    b = rng.rand(5).astype(np.float32)
    nx, nw, act, cnt = _reduce_step(jnp.asarray(X), jnp.asarray(w),
                                    jnp.ones(64, bool), jnp.asarray(proj),
                                    jnp.asarray(b), n=64)
    ox, ow = oracle_reduce(X, w, proj, b)
    cnt = int(cnt)
    assert cnt == len(ow)
    got = sorted(zip(np.asarray(nw)[:cnt].tolist(),
                     np.asarray(nx)[:cnt].sum(1).tolist()))
    want = sorted(zip(ow.tolist(), ox.sum(1).tolist()))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_point_reducer_conserves_mass():
    X, _ = blobs(n=3000, k=4)
    red = RPPointReducer(max_point=200, rng=np.random.RandomState(0))
    skel, w, labels, n_iter = red.fit_transform(X)
    assert len(skel) <= max(200 * 2, 512)  # may overshoot one merge round
    assert n_iter >= 1
    np.testing.assert_allclose(w.sum(), 3000, rtol=1e-5)
    # weighted centroid conserved
    np.testing.assert_allclose((skel * w[:, None]).sum(0), X.sum(0),
                               rtol=1e-3)
    assert labels.shape == (3000,)
    assert labels.max() < len(skel)


def test_point_reducer_skips_when_small():
    X, _ = blobs(n=100, k=2)
    red = RPPointReducer(max_point=2000, rng=np.random.RandomState(0))
    skel, w, labels, n_iter = red.fit_transform(X)
    assert n_iter == 0 and len(skel) == 100
    np.testing.assert_allclose(skel, X)


def test_lloyd_matches_sklearn_from_same_init():
    X, _ = blobs(n=1500, k=4, seed=3)
    init = X[[10, 500, 900, 1300]]
    C, labels, inertia, _ = kmeans_lloyd(X, init)
    sk = KMeans(4, init=init, n_init=1, max_iter=300).fit(X)
    assert adjusted_rand_score(sk.labels_, labels) > 0.999
    np.testing.assert_allclose(inertia, sk.inertia_, rtol=1e-3)


def test_lloyd_weighted():
    X, _ = blobs(n=800, k=3, seed=5)
    w = np.random.RandomState(0).rand(800).astype(np.float32) + 0.1
    init = X[[0, 300, 600]]
    C, labels, inertia, _ = kmeans_lloyd(X, init, sample_weight=w)
    sk = KMeans(3, init=init, n_init=1).fit(X, sample_weight=w)
    assert adjusted_rand_score(sk.labels_, labels) > 0.99
    np.testing.assert_allclose(inertia, sk.inertia_, rtol=1e-3)


def test_lloyd_relocates_empty_clusters():
    X, _ = blobs(n=500, k=2, seed=7)
    # all-identical far-away inits: clusters collapse; relocation must
    # still produce k distinct non-empty clusters
    init = np.full((4, X.shape[1]), 100.0, np.float32)
    init += np.arange(4)[:, None] * 1e-3
    C, labels, inertia, _ = kmeans_lloyd(X, init)
    assert len(np.unique(labels)) == 4
    assert np.isfinite(inertia)


def test_rph_kmeans_quality():
    X, lab = blobs(n=5400, k=6, d=2, spread=0.25, seed=11)
    pred = clustering_rph_kmeans(X, 6, n_init=5, random_state=0)
    assert adjusted_rand_score(lab, pred) > 0.97


def test_rph_kmeans_inertia_close_to_sklearn():
    X, lab = blobs(n=4000, k=5, seed=13)
    clt = RPHKMeans(n_clusters=5, n_init=3, random_state=0)
    clt.fit(X)
    sk = KMeans(5, n_init=10, random_state=0).fit(X)
    assert clt.inertia_ <= sk.inertia_ * 1.05
    assert clt.reduced_X_.shape[0] <= 2000 * 2
    assert clt.init_centers_.shape == (5, X.shape[1])


def test_rph_raises_on_tiny_skeleton():
    # huge w => projections ~0 => every point lands in one bucket =>
    # skeleton of size 1 < n_clusters (rph_kmeans_.py:118-119)
    X = np.random.RandomState(0).randn(50, 3).astype(np.float32)
    clt = RPHKMeans(n_clusters=5, w=1e9, max_point=10, random_state=0)
    with pytest.raises(RuntimeError):
        clt.fit(X)


def test_kneedle_finds_knee():
    x = np.arange(1, 21, dtype=float)
    y = np.minimum(x, 5.0)  # sharp knee at 5
    assert kneedle(x, y, S=1.0) == 5.0


def test_select_k_with_bic():
    X, lab = blobs(n=1200, k=4, d=4, spread=1.0, seed=17)
    k, bic_lists, k_range = select_k_with_bic(
        X, kmax=10, kmin=2, ske_repeat=3, k_repeat=2,
        point_reducer_kwargs={"max_point": 300}, random_state=0)
    assert k_range == list(range(2, 11))
    assert len(bic_lists) == 3 and len(bic_lists[0]) == 9
    assert 3 <= k <= 6


def test_cal_bic_prefers_true_k():
    X, lab = blobs(n=600, k=3, d=4, spread=0.2, seed=19)
    scores = {}
    for k in (2, 3, 8):
        sk = KMeans(k, n_init=10, random_state=0).fit(X)
        scores[k] = cal_bic(X, sk.labels_, sk.cluster_centers_)
    assert scores[3] > scores[2]
    assert scores[3] > scores[8]


def test_device_min_elems_config_routing(monkeypatch):
    """ClusterConfig.device_min_elems drives the host-vs-device routing;
    PANGAEA_CLUSTER_DEVICE_MIN_ELEMS is a call-time override only
    (VERDICT r4 item 8: the knob must live in the typed config)."""
    import contextlib
    from pangaea_tpu.config import ClusterConfig
    from pangaea_tpu.cluster.rph import (_cluster_device,
                                         resolve_device_min_elems)
    monkeypatch.delenv("PANGAEA_CLUSTER_DEVICE_MIN_ELEMS", raising=False)
    assert resolve_device_min_elems(None) == ClusterConfig.device_min_elems
    assert resolve_device_min_elems(123) == 123
    # env var overrides the configured value, read per call (reloadable)
    monkeypatch.setenv("PANGAEA_CLUSTER_DEVICE_MIN_ELEMS", "77")
    assert resolve_device_min_elems(123) == 77
    monkeypatch.delenv("PANGAEA_CLUSTER_DEVICE_MIN_ELEMS")
    X = np.zeros((10, 10), np.float32)
    # big threshold -> host CPU context; tiny threshold -> device
    assert not isinstance(_cluster_device(X, 1_000_000),
                          contextlib.nullcontext().__class__)
    assert isinstance(_cluster_device(X, 10),
                      contextlib.nullcontext().__class__)
    # the CLI threads the knob into the typed config
    from pangaea_tpu.pipeline.cli import build_parser, config_from_args
    args = build_parser().parse_args(
        ["-i", "x.fq", "-o", "out", "--cluster_device_min_elems", "42"])
    assert config_from_args(args).cluster.device_min_elems == 42
