"""Fast small-table lookup on TPU.

XLA lowers a gather from a few-hundred-entry table at ~8-23 ns/element on
TPU (measured: 3M-element gather from a 528-entry int32 table = 18-23 ms)
— it emits the general scatter/gather path. Mosaic, however, lowers
``jnp.take_along_axis`` along the 128-lane axis to the VPU's in-register
shuffle, so a lookup from a table of k·128 entries decomposes into k
within-vreg gathers + selects: measured ~3 ms for the same 3M elements
(7x). This module packages that as a drop-in ``table_lookup(table, idx)``.

The reference analog: ROM lookups are single-cycle in the RTL
(huffman_encode.ml:55-97 code ROMs); this is the TPU form of giving the
encoder its ROMs back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 512  # sublane rows of the (BLK, 128) index tile per grid step


def _kernel(tab_ref, idx_ref, out_ref, *, k: int):
    idx = idx_ref[:]
    lo = idx & 127
    hi = idx >> 7
    acc = jnp.zeros_like(idx)
    for r in range(k):
        row = jnp.broadcast_to(tab_ref[r:r + 1, :], idx.shape)
        g = jnp.take_along_axis(row, lo, axis=1)
        acc = jnp.where(hi == r, g, acc)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lookup_pallas(tab128, idx_flat, *, interpret: bool = False):
    k = tab128.shape[0]
    n = idx_flat.shape[0]
    n_p = -(-n // 128) * 128
    if n_p != n:
        idx_flat = jnp.pad(idx_flat, (0, n_p - n))
    idx2 = idx_flat.reshape(-1, 128)
    rows = idx2.shape[0]
    blk = min(_BLK, rows)
    grid = (-(-rows // blk),)
    rows_p = grid[0] * blk
    if rows_p != rows:
        idx2 = jnp.pad(idx2, ((0, rows_p - rows), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, k=k),
        grid=grid,
        in_specs=[pl.BlockSpec((k, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((blk, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(idx2.shape, jnp.int32),
        interpret=interpret,
    )(tab128, idx2)
    return out.reshape(-1)[:n]


def table_lookup(table, idx, *, use_pallas: bool | None = None):
    """``table[idx]`` for an int32 table of ≤1024 entries and any-shape
    int32 indices, via the Mosaic in-register lane gather on TPU (the XLA
    gather elsewhere). Indices must be in-range (clip upstream)."""
    n = int(np.prod(idx.shape)) if idx.shape else 1
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and table.shape[0] <= 1024 and n >= 1 << 14)
    if not use_pallas:
        return table[idx]
    k = -(-table.shape[0] // 128)
    tab128 = jnp.pad(table, (0, k * 128 - table.shape[0])).reshape(k, 128)
    out = _lookup_pallas(tab128, idx.reshape(-1).astype(jnp.int32))
    return out.reshape(idx.shape)
