"""Weighted Lloyd k-means in JAX — the "final KMeans" hot loop.

Behavior contract (reference rph_kmeans_.py:151-162 + sklearn semantics the
reference relies on): KMeans(init=<skeleton centers>, n_init=1) with
sklearn defaults max_iter=300, tol=1e-4 where the effective tolerance is
``tol * mean(var(X, axis=0))`` and convergence is
``sum(center_shift^2) <= tol_eff``; empty clusters are re-seeded from the
points farthest from their assigned centers; inertia is the
(weight-)summed squared distance to the assigned center.

TPU-native design: the assignment step is one (N, k) distance matrix
(rank-2 matmul on the MXU via -2 X C^T); the update step is two
segment-sums. The whole Lloyd loop is a lax.while_loop inside one jit, so
a full fit is a single device dispatch. For multi-chip, X shards over the
('data',) mesh axis and the segment sums become psum-reduced partials —
the same code under shard_map (see parallel/).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _dist2(X: jax.Array, C: jax.Array) -> jax.Array:
    """Squared euclidean distances (N, k); clamped at 0 for fp safety."""
    d = (jnp.sum(X * X, 1, keepdims=True) - 2.0 * X @ C.T
         + jnp.sum(C * C, 1)[None, :])
    return jnp.maximum(d, 0.0)


@functools.partial(jax.jit, static_argnames=("max_iter",))
def _lloyd(X: jax.Array, W: jax.Array, C0: jax.Array, tol_eff: jax.Array,
           *, max_iter: int):
    n, dim = X.shape
    k = C0.shape[0]

    def relocate_empty(C, counts):
        """sklearn-style: empty clusters take the farthest points.

        'Farthest' ranks by distance to the nearest NON-EMPTY center:
        an empty cluster's degenerate mean (sums/1 = the origin) must
        not enter the min, or points near the origin would be
        systematically excluded from relocation."""
        empty = counts == 0
        d = _dist2(X, C) + jnp.where(empty, jnp.inf, 0.0)[None, :]
        mind = jnp.min(d, axis=1)
        # rank empty clusters; e-th empty cluster gets e-th farthest point
        order = jnp.argsort(-mind)  # farthest first
        erank = jnp.cumsum(empty.astype(jnp.int32)) - 1
        far_pts = X[order[jnp.clip(erank, 0, n - 1)]]
        return jnp.where(empty[:, None], far_pts, C)

    def body(state):
        C, _, it = state
        d = _dist2(X, C)
        assign = jnp.argmin(d, axis=1).astype(jnp.int32)
        counts = jax.ops.segment_sum(W, assign, num_segments=k)
        sums = jax.ops.segment_sum(X * W[:, None], assign, num_segments=k)
        newC = sums / jnp.where(counts > 0, counts, 1.0)[:, None]
        newC = relocate_empty(newC, counts)
        shift = jnp.sum(jnp.square(newC - C))
        return newC, shift, it + 1

    def cond(state):
        _, shift, it = state
        return (shift > tol_eff) & (it < max_iter)

    C, _, n_iter = jax.lax.while_loop(
        cond, body, (C0.astype(jnp.float32), jnp.float32(jnp.inf),
                     jnp.int32(0)))
    d = _dist2(X, C)
    assign = jnp.argmin(d, axis=1).astype(jnp.int32)
    inertia = jnp.sum(jnp.min(d, axis=1) * W)
    return C, assign, inertia, n_iter


def kmeans_lloyd(X: np.ndarray, init_centers: np.ndarray,
                 sample_weight: Optional[np.ndarray] = None,
                 max_iter: int = 300, tol: float = 1e-4
                 ) -> Tuple[np.ndarray, np.ndarray, float, int]:
    """Fit from given centers. Returns (centers, labels, inertia, n_iter)."""
    X = np.ascontiguousarray(X, dtype=np.float32)
    W = (np.ones(X.shape[0], np.float32) if sample_weight is None
         else np.asarray(sample_weight, np.float32))
    tol_eff = np.float32(tol * np.mean(np.var(X, axis=0)))
    C, assign, inertia, n_iter = _lloyd(
        jnp.asarray(X), jnp.asarray(W), jnp.asarray(init_centers),
        jnp.asarray(tol_eff), max_iter=max_iter)
    return (np.asarray(C), np.asarray(assign), float(inertia), int(n_iter))


def kmeans_inertia(X: np.ndarray, C: np.ndarray,
                   sample_weight: Optional[np.ndarray] = None) -> float:
    X = jnp.asarray(X, jnp.float32)
    d = _dist2(X, jnp.asarray(C, jnp.float32))
    mind = jnp.min(d, axis=1)
    if sample_weight is not None:
        mind = mind * jnp.asarray(sample_weight, jnp.float32)
    return float(jnp.sum(mind))
