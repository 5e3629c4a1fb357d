"""Generic Pallas segmented histogram: (bins, seg_ids) -> (groups, n_bins).

The abundance-feature analog of kernels/pallas_tnf.py: the global-table
gather (4 GiB HBM lookups) stays in XLA where gathers are native, and the
scatter stage — the expensive part — becomes a VMEM-accumulated
compare-expand over the (tiny) bin space, exploiting barcode-sorted
seg_ids exactly like the TNF kernel. Replaces the flat scatter of
kernels/features.abundance_histogram when selected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 8


def _hist_kernel(seg0_ref, bins_ref, segs_ref, out_ref, *, c_pad: int,
                 gspan: int):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    bins = bins_ref[:]  # (ROW_BLOCK, W), invalid already = c_pad-1
    R = bins.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c_pad), 2)
    onehot = (bins[:, :, None] == cols).astype(jnp.int32)
    row_hist = jnp.sum(onehot, axis=1)  # (R, c_pad)
    segs = segs_ref[:]
    g0 = seg0_ref[0]
    for r in range(R):
        g = segs[r] - g0

        @pl.when((segs[r] >= 0) & (g >= 0) & (g < gspan))
        def _():
            out_ref[g, :] += row_hist[r, :]


@functools.partial(jax.jit, static_argnames=("n_bins", "gspan", "interpret"))
def segmented_histogram_pallas(bins: jax.Array, valid: jax.Array,
                               seg_ids: jax.Array, seg0: jax.Array, *,
                               n_bins: int, gspan: int = 2048,
                               interpret: bool = False) -> jax.Array:
    """bins: (R, W) int32 in [0, n_bins); valid: (R, W) bool.

    Returns (gspan, c_pad) int32 counts for groups [seg0, seg0+gspan);
    real columns are the first n_bins.
    """
    R, W = bins.shape
    assert R % ROW_BLOCK == 0
    c_pad = -(-(n_bins + 1) // 128) * 128  # +1 trash column for invalid
    routed = jnp.where(valid & (bins >= 0) & (bins < n_bins),
                       bins, c_pad - 1).astype(jnp.int32)
    grid = (R // ROW_BLOCK,)
    return pl.pallas_call(
        functools.partial(_hist_kernel, c_pad=c_pad, gspan=gspan),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROW_BLOCK, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gspan, c_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gspan, c_pad), jnp.int32),
        interpret=interpret,
    )(jnp.asarray(seg0, jnp.int32).reshape(1), routed,
      seg_ids.astype(jnp.int32))
