"""BIC-based k selection over RPH skeletons.

Behavior contract (reference third_parties/rph_kmeans/rph_kmeans/
k_selection.py):

- BIC of a weighted clustering (k_selection.py:36-84): spherical-gaussian
  log-likelihood with pooled variance ``inertia / ((n - k) * d)``, minus
  ``0.5 * k*(d+1) * log(n)``; higher is better.
- select_k_with_bic (k_selection.py:127-176): ske_repeat skeletons; per
  skeleton, mean BIC of k_repeat KMeans runs for each k in [kmin, kmax];
  knee of each skeleton's k-BIC curve via Kneedle (concave/increasing,
  sensitivity S falling back 3 -> 2 -> 1); optimal k = round(mean of
  per-skeleton knees).
- the reference parallelizes skeletons with multiprocessing
  (k_selection.py:158-163); here skeleton reduction runs in XLA and the
  loop stays sequential on the host (device is already saturated).

The ``kneed`` package is not vendored; :func:`kneedle` is a self-contained
implementation of the Kneedle detection for the concave/increasing case
(Satopaa et al. 2011), the only case the reference exercises.

Note: Pangaea's pipeline never calls this (it uses metaphlan diversity or
a user k — src/clustering.py:93-103); it is part of the rph_kmeans public
API surface, reproduced for completeness.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
from sklearn.cluster import KMeans

from pangaea_tpu.cluster.reduce import RPPointReducer


def cal_inertia(X: np.ndarray, y: np.ndarray, centers: np.ndarray,
                weight: np.ndarray) -> float:
    inertia = 0.0
    for i in range(centers.shape[0]):
        idx = np.where(y == i)
        inertia += (np.square(X[idx] - centers[i]).sum(axis=1)
                    * weight[idx]).sum()
    return float(inertia)


def cal_log_likelihood(X: np.ndarray, y: np.ndarray, centers: np.ndarray,
                       weight: np.ndarray, eps: float = 1e-100) -> float:
    n, d = X.shape
    k = centers.shape[0]
    denom = max((n - k) * d, 1)  # guard skeletons collapsed to ~k points
    variance = max(eps, cal_inertia(X, y, centers, weight) / denom)
    total_weight = weight.sum()
    ll = 0.0
    for i in range(k):
        gsz = weight[y == i].sum()
        if gsz <= 0:
            continue
        ll += gsz * np.log(gsz)
        ll -= gsz * np.log(total_weight)
        ll -= 0.5 * gsz * d * np.log(2.0 * np.pi * variance)
        ll -= 0.5 * d * (gsz - 1)
    return float(ll)


def cal_bic(X: np.ndarray, y: np.ndarray, centers: np.ndarray,
            weight: Optional[np.ndarray] = None) -> float:
    if weight is None:
        weight = np.ones(X.shape[0], dtype=X.dtype)
    para_num = centers.shape[0] * (X.shape[1] + 1)
    return (cal_log_likelihood(X, y, centers, weight)
            - 0.5 * para_num * np.log(X.shape[0]))


def kneedle(x: Sequence[float], y: Sequence[float], S: float = 1.0
            ) -> Optional[float]:
    """Knee of a concave increasing curve; None if no knee found."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if len(x) < 3:
        return None
    xr = x.max() - x.min()
    yr = y.max() - y.min()
    if xr == 0 or yr == 0:
        return None
    xn = (x - x.min()) / xr
    yn = (y - y.min()) / yr
    yd = yn - xn
    lmx = [i for i in range(1, len(yd) - 1)
           if yd[i] >= yd[i - 1] and yd[i] > yd[i + 1]]
    if not lmx:
        return None
    thresh_drop = S * np.mean(np.diff(xn))
    for li, i in enumerate(lmx):
        t = yd[i] - thresh_drop
        nxt = lmx[li + 1] if li + 1 < len(lmx) else len(yd)
        for j in range(i + 1, nxt):
            if yd[j] < t:
                return float(x[i])
    return None


def skeleton_bic_curve(X: np.ndarray, k_range: Sequence[int],
                       k_repeat: int, reducer_kwargs: dict,
                       rng: np.random.RandomState) -> List[float]:
    reducer = RPPointReducer(rng=rng, **reducer_kwargs)
    skel, weight, _, _ = reducer.fit_transform(X)
    bic_list = []
    for k in k_range:
        if k >= len(skel):  # infeasible: fewer skeleton points than k
            bic_list.append(-np.inf)
            continue
        vals = []
        for _ in range(k_repeat):
            clt = KMeans(n_clusters=k, n_init=10,
                         random_state=rng.randint(2**31 - 1))
            y = clt.fit_predict(skel, sample_weight=weight)
            vals.append(cal_bic(skel, y, clt.cluster_centers_, weight))
        bic_list.append(float(np.mean(vals)))
    return bic_list


def select_k_with_bic(X: np.ndarray, kmax: int, kmin: int = 2,
                      ske_repeat: int = 30, k_repeat: int = 5,
                      kneedle_s: float = 3.0,
                      point_reducer_kwargs: Optional[dict] = None,
                      random_state: Optional[int] = None
                      ) -> Tuple[int, List[List[float]], List[int]]:
    """Returns (optimal_k, bic_lists, k_range) — k_selection.py:127-176."""
    rng = np.random.RandomState(random_state)
    k_range = list(range(kmin, kmax + 1))
    kwargs = point_reducer_kwargs or {}
    bic_lists = [skeleton_bic_curve(X, k_range, k_repeat, kwargs, rng)
                 for _ in range(ske_repeat)]
    s_range = (([] if int(kneedle_s) == kneedle_s else [kneedle_s])
               + list(range(int(kneedle_s), 0, -1)))
    k_list = []
    for bic_list in bic_lists:
        predict_k = None
        for s in s_range:
            predict_k = kneedle(k_range, bic_list, S=s)
            if predict_k is not None:
                break
        if predict_k is None:
            # degenerate curve: fall back to the best-BIC k
            predict_k = k_range[int(np.argmax(bic_list))]
        k_list.append(predict_k)
    return int(round(float(np.mean(k_list)))), bic_lists, k_range
