"""RPH-KMeans: skeleton-initialized k-means, best of n_init runs.

Behavior contract (reference rph_kmeans_.py:116-162 + src/clustering.py:14-19):

- each run: point-reduce X to <= max_point skeleton points; weighted
  KMeans on the skeleton gives init centers; full (unweighted) KMeans
  from those centers; keep the run with the lowest full-data inertia.
- Pangaea invokes RPHKMeans(n_init=20, n_clusters=k).fit_predict(latent)
  (src/clustering.py:17).
- raises if the skeleton ends up smaller than n_clusters
  (rph_kmeans_.py:118-119).

Division of labor (TPU-native): point reduction and the full-data Lloyd
run in XLA (cluster/reduce.py, cluster/kmeans.py — the hot loops); the
skeleton KMeans (<= 2000 weighted points) stays on sklearn exactly like
the reference's L4 layer, preserving k-means++ init quality.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np
from sklearn.cluster import KMeans

from pangaea_tpu.cluster.kmeans import kmeans_lloyd
from pangaea_tpu.cluster.reduce import RPPointReducer

log = logging.getLogger(__name__)

# Below ClusterConfig.device_min_elems matrix elements, the whole fit
# (reduce + Lloyd x n_init) runs on the host CPU backend: each init
# costs several dispatch+sync round trips of sub-millisecond math, and
# on a tunneled TPU the round trips alone were ~10 s for a 3000x32
# latent that CPU clusters in <1 s (the reference's own rph_kmeans:
# 0.25 s on 5400x2, BASELINE.md). The accelerator pays off when the
# Lloyd matmuls carry real volume — ~250k+ barcodes at latent 32.
# The production knob lives in the typed config (config.py,
# ClusterConfig.device_min_elems); the env var is a call-time debug
# override only, read per call so it is reloadable in-process.
from pangaea_tpu.config import ClusterConfig as _ClusterDefaults

_DEVICE_MIN_ELEMS_DEFAULT = _ClusterDefaults.device_min_elems


def resolve_device_min_elems(configured: Optional[int] = None) -> int:
    """Effective device-routing threshold: env override > config >
    dataclass default."""
    import os
    env = os.environ.get("PANGAEA_CLUSTER_DEVICE_MIN_ELEMS")
    if env is not None:
        return int(env)
    if configured is not None:
        return configured
    return _DEVICE_MIN_ELEMS_DEFAULT


def _cluster_device(X: np.ndarray, device_min_elems: Optional[int] = None):
    import contextlib
    import jax
    if X.size >= resolve_device_min_elems(device_min_elems):
        return contextlib.nullcontext()
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return contextlib.nullcontext()
    return jax.default_device(cpu)


class RPHKMeans:
    def __init__(self, n_clusters: int = 8, n_init: int = 1,
                 w: Optional[float] = None, max_point: int = 2000,
                 proj_num: int = 5, max_iter: int = 1000,
                 sample_dist_num: int = 1000,
                 bkt_improve: Optional[str] = None,
                 radius_divide: Optional[float] = None,
                 bkt_size_keepr: float = 1.0,
                 center_dist_keepr: float = 1.0,
                 skeleton_n_init: int = 10,
                 final_max_iter: int = 300, final_tol: float = 1e-4,
                 random_state: Optional[int] = None, verbose: int = 0,
                 device_min_elems: Optional[int] = None):
        self.n_clusters = n_clusters
        self.device_min_elems = device_min_elems
        self.n_init = n_init
        self.w = w
        self.max_point = max_point
        self.proj_num = proj_num
        self.max_iter = max_iter
        self.sample_dist_num = sample_dist_num
        self.bkt_improve = bkt_improve
        self.radius_divide = radius_divide
        self.bkt_size_keepr = bkt_size_keepr
        self.center_dist_keepr = center_dist_keepr
        self.skeleton_n_init = skeleton_n_init
        self.final_max_iter = final_max_iter
        self.final_tol = final_tol
        self.rng = np.random.RandomState(random_state)
        self.verbose = verbose

        self.cluster_centers_: Optional[np.ndarray] = None
        self.labels_: Optional[np.ndarray] = None
        self.inertia_: float = np.inf
        self.n_iter_: int = 0
        self.reduced_X_: Optional[np.ndarray] = None
        self.reduced_X_weight_: Optional[np.ndarray] = None
        self.init_centers_: Optional[np.ndarray] = None
        self.rp_iter_: int = 0

    def init_centers(self, X: np.ndarray):
        reducer = RPPointReducer(self.w, self.max_point, self.proj_num,
                                 self.max_iter, self.sample_dist_num,
                                 bkt_improve=self.bkt_improve,
                                 radius_divide=self.radius_divide,
                                 bkt_size_keepr=self.bkt_size_keepr,
                                 center_dist_keepr=self.center_dist_keepr,
                                 rng=self.rng)
        reduced_X, weight, labels, rp_iter = reducer.fit_transform(X)
        if len(reduced_X) < self.n_clusters:
            raise RuntimeError(
                "Number of reduced points is too small, please try smaller "
                "w or larger proj_num")
        skel = KMeans(n_clusters=self.n_clusters, n_init=self.skeleton_n_init,
                      random_state=self.rng.randint(2**31 - 1))
        skel.fit_predict(reduced_X, sample_weight=weight)
        return skel.cluster_centers_, reduced_X, weight, rp_iter

    def fit(self, X: np.ndarray) -> "RPHKMeans":
        X = np.ascontiguousarray(X, dtype=np.float32)
        self.inertia_ = np.inf
        with _cluster_device(X, self.device_min_elems):
            for i in range(self.n_init):
                init_c, red_x, red_w, rp_iter = self.init_centers(X)
                C, labels, inertia, n_iter = kmeans_lloyd(
                    X, init_c, max_iter=self.final_max_iter,
                    tol=self.final_tol)
                if self.verbose:
                    log.info("rph init %d/%d: inertia %.6g (%d iters)",
                             i + 1, self.n_init, inertia, n_iter)
                if inertia < self.inertia_:
                    self.inertia_ = inertia
                    self.cluster_centers_ = C
                    self.labels_ = labels
                    self.n_iter_ = n_iter
                    self.init_centers_ = init_c
                    self.reduced_X_ = red_x
                    self.reduced_X_weight_ = red_w
                    self.rp_iter_ = rp_iter
        return self

    def fit_predict(self, X: np.ndarray) -> np.ndarray:
        self.fit(X)
        return self.labels_

    def predict(self, X: np.ndarray) -> np.ndarray:
        from pangaea_tpu.cluster.reduce import _nearest_labels
        import jax.numpy as jnp
        return np.asarray(_nearest_labels(
            jnp.asarray(X, jnp.float32),
            jnp.asarray(self.cluster_centers_, jnp.float32)))


def clustering_rph_kmeans(embedding: np.ndarray, k: int,
                          n_init: int = 20,
                          random_state: Optional[int] = None,
                          device_min_elems: Optional[int] = None
                          ) -> np.ndarray:
    """src/clustering.py:14-19: RPHKMeans(n_init=20).fit_predict."""
    clt = RPHKMeans(n_init=n_init, n_clusters=k, random_state=random_state,
                    verbose=0, device_min_elems=device_min_elems)
    return clt.fit_predict(embedding)
