"""Pallas TPU kernels for long 1-D prefix scans (cummax / cummin / cumsum).

The sort-join boundary fills (features.py `run_start`/`run_end`, the
weighted variants' count cumsum) scan tens of millions of int32s. XLA
lowers `lax.cummax`/`cumsum` on TPU to ~log2(N) full-array shifted
passes — measured ~20 ms per scan at the 34.6M headline shape
(tools/ab_sortjoin_phases.py: the two fills cost 47 ms, ~15% of the
sort-join phase). A scan is bandwidth-bound work: one read + one write
of the array. This kernel does exactly that — a sequential grid over
(R, 128) VMEM blocks, a two-level in-block scan (log2(128) lane shifts,
then log2(R) sublane shifts on the broadcast row totals), and a scalar
carry in SMEM threaded across grid steps (TPU grid iterations execute
in order, so scratch persists between steps).

Order convention: the 1-D array is reshaped row-major to (G*R, 128), so
linear element order is lanes-fastest — each block scans its rows left
to right, rows top to bottom, matching the flat order exactly.

Used on the TPU backend only (`scan_impl()` resolves the branch per
lowering platform); every other backend falls back to
`lax.associative_scan`-based XLA ops, and `tests/test_scan_kernel.py`
pins the kernel itself bit-equal to numpy under the Pallas interpreter. Reference contract: these scans implement
the run-boundary fill of count_kmer.cpp:55-108's per-barcode histogram
join (see kernels/features.py §sort-join) — the semantics live there;
this module is pure TPU plumbing.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_ROWS = 256                      # (256, 128) int32 block = 128 KiB VMEM
_BLOCK = _ROWS * _LANES

_IDENT = {"max": jnp.iinfo(jnp.int32).min,
          "min": jnp.iinfo(jnp.int32).max,
          "sum": 0}
_OPS = {"max": jnp.maximum, "min": jnp.minimum, "sum": jnp.add}


def scan_impl() -> str:
    """'auto' resolves per LOWERING platform via jax.lax.platform_dependent
    — the Pallas branch on TPU, XLA cumulative ops everywhere else. This
    must not consult jax.default_backend(): with the TPU plugin
    registered, a computation jitted over a virtual CPU mesh (the
    multichip dryrun, mixed-backend tests) still reports 'tpu' as the
    default backend. PANGAEA_SCAN_IMPL=xla|pallas forces a branch for
    A/Bs — set it BEFORE the first use in a process: the env var is read
    at trace time and the jit cache does not key on it, so flipping it
    after the first compile silently keeps the compiled branch (use a
    fresh process per A/B arm)."""
    return os.environ.get("PANGAEA_SCAN_IMPL", "auto")


def _shift_down(m: jax.Array, d: int, axis: int, ident) -> jax.Array:
    """Shift toward higher indices by d along axis, filling with ident
    (static shapes only — concatenate + slice, no wraparound masking)."""
    pad_shape = list(m.shape)
    pad_shape[axis] = d
    fill = jnp.full(pad_shape, ident, m.dtype)
    keep = jax.lax.slice_in_dim(m, 0, m.shape[axis] - d, axis=axis)
    return jax.lax.concatenate([fill, keep], dimension=axis)


def _scan_kernel(x_ref, o_ref, carry_ref, *, op_name: str):
    op = _OPS[op_name]
    ident = _IDENT[op_name]
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        carry_ref[0] = jnp.int32(ident)

    m = x_ref[:]
    # intra-row inclusive scan across the 128 lanes
    d = 1
    while d < _LANES:
        m = op(m, _shift_down(m, d, 1, ident))
        d *= 2
    # cross-row scan on the row totals (lane 127), broadcast over lanes
    tot = jnp.broadcast_to(m[:, _LANES - 1:_LANES], (_ROWS, _LANES))
    d = 1
    while d < _ROWS:
        tot = op(tot, _shift_down(tot, d, 0, ident))
        d *= 2
    # exclusive row prefix: shift totals down one row
    m = op(m, _shift_down(tot, 1, 0, ident))
    # block carry from the previous grid step
    m = op(m, carry_ref[0])
    o_ref[:] = m
    carry_ref[0] = m[_ROWS - 1, _LANES - 1]


@functools.partial(jax.jit, static_argnames=("op_name", "interpret"))
def _scan1d_pallas(x: jax.Array, op_name: str,
                   interpret: bool = False) -> jax.Array:
    n = x.shape[0]
    npad = -(-n // _BLOCK) * _BLOCK
    xp = x if npad == n else jnp.concatenate(
        [x, jnp.full(npad - n, _IDENT[op_name], jnp.int32)])
    g = npad // _BLOCK
    mat = xp.reshape(g * _ROWS, _LANES)
    # inside shard_map(check_vma=True) the out aval must state which mesh
    # axes it varies over — same as the input's
    vma = getattr(jax.typeof(mat), "vma", None)
    out_shape = jax.ShapeDtypeStruct((g * _ROWS, _LANES), jnp.int32,
                                     **({"vma": vma} if vma else {}))
    out = pl.pallas_call(
        functools.partial(_scan_kernel, op_name=op_name),
        grid=(g,),
        in_specs=[pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(mat)
    return out.reshape(npad)[:n]


def _scan1d(x: jax.Array, op_name: str, reverse: bool = False) -> jax.Array:
    """Inclusive 1-D int32 scan; the Pallas kernel on TPU lowerings, XLA
    cumulative ops everywhere else (resolved per platform at lowering
    time, so one traced program serves mixed CPU-mesh/TPU processes).
    Reverse scans flip in/out around a forward Pallas scan (two extra
    bandwidth passes, still far below XLA's log-shift cost)."""
    def _xla(v):
        fn = {"max": jax.lax.cummax, "min": jax.lax.cummin,
              "sum": jax.lax.cumsum}[op_name]
        return fn(v, reverse=reverse)

    def _pallas(v):
        if reverse:
            return jnp.flip(_scan1d_pallas(jnp.flip(v), op_name))
        return _scan1d_pallas(v, op_name)

    impl = scan_impl()
    if impl == "xla":
        return _xla(x)
    if impl == "pallas":
        return _pallas(x)
    return jax.lax.platform_dependent(x, tpu=_pallas, default=_xla)


def cummax(x: jax.Array) -> jax.Array:
    return _scan1d(x, "max")


def cummin_reverse(x: jax.Array) -> jax.Array:
    return _scan1d(x, "min", reverse=True)


def cumsum(x: jax.Array) -> jax.Array:
    return _scan1d(x, "sum")
