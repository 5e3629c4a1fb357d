"""Random-projection point reduction ("skeleton" construction) in XLA.

Behavior contract (reference third_parties/rph_kmeans/rph_kmeans/
point_reducer_base.py + point_reducer_py.py + the Cython twins):

- w: half the median distance of 1000 random point pairs
  (point_reducer_base.py:43-53) unless user-set.
- per iteration (point_reducer_py.py:47-88): draw proj_num=5 vectors
  ~ N(0, 1/w) and offsets b ~ U(0,1); bucket key = int32(X @ P + b)
  (truncation toward zero, point_reducer_base.py:62); points sharing all 5
  keys merge into their weighted mean, accumulating weight; singleton
  buckets ("orphans") pass through unchanged; repeat until the group count
  is <= max_point (2000) or max_iter.
- bucket-improvement modes (radius / min_bkt_size / min_center_dist,
  point_reducer_py.py:105-149) are NOT implemented: Pangaea never enables
  them (src/clustering.py:17 passes neither) — documented non-goal.

TPU-native design: the reference buckets via a Python dict keyed by the
byte-string of each projection row (point_reducer_py.py:94-102; the Cython
version hashes the same bytes). Here a jitted step does
``jnp.unique(rows, axis=0)`` (a sort under the hood) + weighted
segment-sum — the whole iteration is two matmuls, a sort, and two
scatter-adds. The host loop only compacts rows and checks the stop
condition; arrays are padded to power-of-two sizes so XLA compiles
O(log N) step shapes, reused across the n_init=20 runs.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n",))
def _reduce_step(x: jax.Array, weight: jax.Array, active: jax.Array,
                 proj: jax.Array, b: jax.Array, *, n: int):
    """One bucketing+merge pass over padded arrays.

    Args:
      x: (G, D) f32 current points (garbage on inactive rows).
      weight: (G,) f32 merge weights.
      active: (G,) bool validity.
      proj: (D, P) f32 projection vectors; b: (P,) offsets.

    Returns (new_x, new_weight, new_active, count): merged groups occupy
    the first ``count`` slots in bucket-key sort order.
    """
    G = x.shape[0]
    keys = (x @ proj + b).astype(jnp.int32)  # trunc-toward-zero, as .astype
    # Bucket identity = the tuple of P int32 keys. TPU sorts compile
    # slowly and roughly linearly in operand count, so instead of a
    # 5-key row sort the tuple is folded into TWO independent 32-bit
    # hashes and grouped by a (h1, h2) 2-key sort — a pair collision
    # (~2^-64 per pair) would merge two unrelated buckets, which only
    # perturbs the skeleton approximation the reducer feeds.
    def mix(v: jax.Array, seed: int) -> jax.Array:
        v = v * jnp.uint32(0x9E3779B9) ^ jnp.uint32(seed)
        v = (v ^ (v >> 16)) * jnp.uint32(0x85EBCA6B)
        v = (v ^ (v >> 13)) * jnp.uint32(0xC2B2AE35)
        return v ^ (v >> 16)

    h1 = jnp.zeros((G,), jnp.uint32)
    h2 = jnp.zeros((G,), jnp.uint32)
    for c in range(keys.shape[1]):
        kc = keys[:, c].astype(jnp.uint32)
        h1 = h1 * jnp.uint32(16777619) ^ mix(kc, 0x2545F491 + c)
        h2 = h2 * jnp.uint32(0x01000193) ^ mix(kc, 0x7FEB352D ^ (c << 8))
    # inactive rows: per-row sentinel hashes so they never merge with each
    # other (a coincidental match with an active bucket is harmless: their
    # weight is 0, so they contribute nothing to the merged mean).
    row_ids = jnp.arange(G, dtype=jnp.int32)
    urow = row_ids.astype(jnp.uint32)
    h1 = jnp.where(active, h1, urow)
    h2 = jnp.where(active, h2, ~urow)
    sh1, sh2, sidx = jax.lax.sort((h1, h2, row_ids), num_keys=2)
    diff = (sh1[1:] != sh1[:-1]) | (sh2[1:] != sh2[:-1])
    newflag = jnp.concatenate([jnp.ones((1,), bool), diff])
    seg_sorted = jnp.cumsum(newflag.astype(jnp.int32)) - 1
    inv = jnp.zeros((G,), jnp.int32).at[sidx].set(seg_sorted)
    w_active = jnp.where(active, weight, 0.0)
    bucket_w = jax.ops.segment_sum(w_active, inv, num_segments=n)
    bucket_x = jax.ops.segment_sum(x * w_active[:, None], inv, num_segments=n)
    new_active = bucket_w > 0
    denom = jnp.where(new_active, bucket_w, 1.0)
    new_x = bucket_x / denom[:, None]
    count = jnp.sum(new_active.astype(jnp.int32))
    # compact live buckets to the front with a permutation scatter (an
    # argsort would work too but costs ~18s of extra TPU compile time)
    act_i32 = new_active.astype(jnp.int32)
    act_pos = jnp.cumsum(act_i32) - 1
    inact_pos = count + jnp.cumsum(1 - act_i32) - 1
    dst = jnp.where(new_active, act_pos, inact_pos)
    out_x = jnp.zeros_like(new_x).at[dst].set(new_x)
    out_w = jnp.zeros_like(bucket_w).at[dst].set(bucket_w)
    out_active = row_ids < count
    return out_x, out_w, out_active, count


def _pow2_pad(n: int, floor: int = 256) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


class RPPointReducer:
    """fit_transform(X) -> (reduced_X, weights, labels, n_iter).

    Bucket-improvement modes (point_reducer_py.py:105-149) — ``radius``,
    ``min_bkt_size``, ``min_center_dist`` — are part of the rph_kmeans
    public API though Pangaea never enables them (src/clustering.py:17);
    they need per-bucket member lists, so when one is requested the
    reduction runs on the numpy path instead of the XLA segment-sum path.
    """

    def __init__(self, w: Optional[float] = None, max_point: int = 2000,
                 proj_num: int = 5, max_iter: int = 1000,
                 sample_dist_num: int = 1000,
                 bkt_improve: Optional[str] = None,
                 radius_divide: Optional[float] = None,
                 bkt_size_keepr: float = 1.0,
                 center_dist_keepr: float = 1.0,
                 rng: Optional[np.random.RandomState] = None):
        self.w = w
        self.max_point = max_point
        self.proj_num = proj_num
        self.max_iter = max_iter
        self.sample_dist_num = sample_dist_num
        self.bkt_improve = bkt_improve
        self.radius2 = radius_divide ** 2 if radius_divide else None
        self.bkt_size_keepr = bkt_size_keepr
        self.center_dist_keepr = center_dist_keepr
        self.rng = rng or np.random.RandomState()

    def get_w(self, X: np.ndarray) -> float:
        """Half median pairwise distance of sampled pairs
        (point_reducer_base.py:43-53)."""
        if self.w is not None:
            return float(self.w)
        n = X.shape[0]
        i = self.rng.choice(n, self.sample_dist_num)
        j = self.rng.choice(n, self.sample_dist_num)
        d = np.linalg.norm(X[i] - X[j], axis=1)
        return float(np.median(d) * 0.5)

    def fit_transform(self, X: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
        X = np.ascontiguousarray(X, dtype=np.float32)
        n, dim = X.shape
        w = self.get_w(X)
        if self.max_point >= n:
            return (X, np.ones(n, X.dtype), np.arange(n, dtype=np.uint32), 0)
        if self.bkt_improve is not None:
            return self._fit_transform_numpy(X, w)

        size = _pow2_pad(n)
        x = jnp.zeros((size, dim), jnp.float32).at[:n].set(X)
        weight = jnp.zeros((size,), jnp.float32).at[:n].set(1.0)
        active = jnp.zeros((size,), bool).at[:n].set(True)
        count = n
        it = 0
        while it < self.max_iter and count > self.max_point:
            proj = jnp.asarray(
                self.rng.normal(0.0, 1.0 / w, size=(dim, self.proj_num)),
                dtype=jnp.float32)
            b = jnp.asarray(self.rng.uniform(0, 1, size=(self.proj_num,)),
                            dtype=jnp.float32)
            x, weight, active, cnt = _reduce_step(x, weight, active, proj, b,
                                                  n=size)
            new_count = int(cnt)
            it += 1
            # shrink padding once the live region is much smaller
            new_size = _pow2_pad(new_count)
            if new_size < size:
                x = x[:new_size]
                weight = weight[:new_size]
                active = active[:new_size]
                size = new_size
            # the loop always draws a fresh projection next round, so a
            # no-merge round needs no special case
            count = new_count
        reduced_x = np.asarray(x)[:count]
        weights = np.asarray(weight)[:count]
        # final labels: nearest reduced point (equivalent partition; the
        # reference tracks exact merge lineage, but every original point's
        # group center is its nearest skeleton point by construction of the
        # iterated weighted means — and downstream only uses the skeleton
        # and weights, never the labels, for Pangaea's path).
        labels = _nearest_labels(jnp.asarray(X), jnp.asarray(reduced_x))
        return reduced_x, weights, np.asarray(labels).astype(np.uint32), it


    # ---- numpy path (bucket-improvement modes) --------------------------

    def _fit_transform_numpy(self, X: np.ndarray, w: float):
        """Dict-bucketing reduction with bucket improvement
        (point_reducer_py.py:47-149 contract)."""
        n, dim = X.shape
        reduced = X
        weight = np.ones(n, np.float64)
        it = 0
        while it < self.max_iter and len(reduced) > self.max_point:
            proj = self.rng.normal(0.0, 1.0 / w,
                                   (dim, self.proj_num)).astype(np.float32)
            b = self.rng.uniform(0, 1, self.proj_num).astype(np.float32)
            keys = (reduced @ proj + b).astype(np.int32)
            buckets = {}
            for i in range(len(reduced)):
                buckets.setdefault(keys[i].tobytes(), []).append(i)
            groups = [v for v in buckets.values() if len(v) > 1]
            orphans = [v[0] for v in buckets.values() if len(v) == 1]
            if self.bkt_improve == "radius" and self.radius2 is not None:
                groups, orphans = self._radius_improve(groups, orphans,
                                                       reduced)
            elif (self.bkt_improve == "min_bkt_size"
                  and self.bkt_size_keepr < 1.0):
                groups, orphans = self._keepr_improve(
                    groups, orphans, [len(g) for g in groups],
                    self.bkt_size_keepr)
            elif (self.bkt_improve == "min_center_dist"
                  and self.center_dist_keepr < 1.0):
                meds = []
                for g in groups:
                    c = reduced[g].mean(axis=0)
                    meds.append(float(np.median(
                        np.square(reduced[g] - c).sum(axis=1))))
                groups, orphans = self._keepr_improve(
                    groups, orphans, meds, self.center_dist_keepr)
            new_x, new_w = [], []
            for g in groups:
                wt = weight[g]
                tot = wt.sum()
                new_x.append((reduced[g] * wt[:, None]).sum(axis=0) / tot)
                new_w.append(tot)
            for o in orphans:
                new_x.append(reduced[o])
                new_w.append(weight[o])
            reduced = np.asarray(new_x, dtype=np.float32)
            weight = np.asarray(new_w, dtype=np.float64)
            it += 1
        labels = np.asarray(_nearest_labels(
            jnp.asarray(X), jnp.asarray(reduced))).astype(np.uint32)
        return reduced, weight.astype(np.float32), labels, it

    @staticmethod
    def _keepr_improve(groups, orphans, scores, keepr):
        """min_bkt_size / min_center_dist: keep the keepr fraction with the
        smallest score, orphan the rest (point_reducer_py.py:131-149)."""
        order = np.argsort(scores)
        keep_num = int(len(groups) * keepr)
        kept = [groups[i] for i in order[:keep_num]]
        for i in order[keep_num:]:
            orphans.extend(groups[i])
        return kept, orphans

    def _radius_improve(self, groups, orphans, X):
        """Greedy radius sub-clustering per bucket
        (point_reducer_py.py:105-129)."""
        new_groups = []
        for bkt in groups:
            pts = X[bkt]
            centers = [0]
            sub = [[0]]
            for i in range(1, len(bkt)):
                d2 = np.square(pts[centers] - pts[i]).sum(axis=1)
                c = int(np.argmin(d2))
                if d2[c] < self.radius2:
                    sub[c].append(i)
                else:
                    centers.append(i)
                    sub.append([i])
            for g in sub:
                if len(g) == 1:
                    orphans.append(bkt[g[0]])
                else:
                    new_groups.append([bkt[r] for r in g])
        return new_groups, orphans


@jax.jit
def _nearest_labels(X: jax.Array, C: jax.Array) -> jax.Array:
    d = (jnp.sum(X * X, 1, keepdims=True) - 2.0 * X @ C.T
         + jnp.sum(C * C, 1)[None, :])
    return jnp.argmin(d, axis=1).astype(jnp.int32)
