"""Sparse coefficient transfer: bitmask + packed nonzero values.

Quantized JPEG coefficients are mostly zero (typically 6–12 nonzeros of 64
at mid qualities), but the host↔device link moves them densely in the
mixed pipelines: the encoder downloads the quantized coefficients for host
entropy coding, and the mixed decoder uploads entropy-decoded coefficients
for the device datapath. Packing them as a per-block 64-bit occupancy
bitmask plus the nonzero values in order shrinks those transfers ~4–6x —
the operative win whenever the interconnect, not compute, bounds the
pipeline (BENCH_NOTES.md).

Wire format (both directions, block-major zigzag order):
- ``mask``:   (n_blocks, 8) uint8 — packbits of (n_blocks, 64) nonzero
              flags, MSB-first (numpy/jnp ``packbits`` default).
- ``values``: (cap,) int16 — the nonzero coefficients in flat scan order,
              zero-padded past ``nnz``, saturated to the 12-bit
              accelerator coefficient width [-2048, 2047]. Valid streams
              always fit; hostile streams whose DC predictors overflow
              saturate here with the same sign the datapath's dequant
              clamp would apply (quant ≥ 1 ⇒ identical post-clamp
              output), so sparse and dense transfers stay bit-identical.
- ``nnz``:    int32 scalar; ``nnz > cap`` signals overflow (values were
              dropped — caller must fall back to a dense transfer).

Device-side pack/unpack are single cumsum+scatter/gather graphs; host-side
equivalents are vectorized numpy. Round-trips are exact within the 12-bit
coefficient width (all values any conforming pipeline produces).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# device side
# --------------------------------------------------------------------------

def pack_device(qc: jax.Array, cap: int):
    """(N, 64) int coefficients → (mask (N,8) uint8, values (cap,) int16,
    nnz int32). Traceable; ``cap`` is static. On overflow (nnz > cap) the
    excess values are dropped — check nnz before trusting values."""
    flat = qc.reshape(-1)
    nz = flat != 0
    nnz = jnp.sum(nz, dtype=jnp.int32)
    pos = jnp.cumsum(nz, dtype=jnp.int32) - 1
    pos = jnp.where(nz, pos, cap)  # out-of-range → dropped by the scatter
    sat = jnp.clip(flat, -2048, 2047)  # 12-bit accelerator width
    values = jnp.zeros((cap,), jnp.int16).at[pos].set(
        sat.astype(jnp.int16), mode="drop")
    mask = jnp.packbits(nz.reshape(qc.shape[0], 64), axis=1)
    return mask, values, nnz


def unpack_device(mask: jax.Array, values: jax.Array,
                  n_blocks: int) -> jax.Array:
    """Inverse of pack_device: → (n_blocks, 64) int32 coefficients."""
    nz = jnp.unpackbits(mask, axis=1, count=64).reshape(-1).astype(bool)
    pos = jnp.cumsum(nz, dtype=jnp.int32) - 1
    vals = values.astype(jnp.int32)[jnp.clip(pos, 0, values.shape[0] - 1)]
    flat = jnp.where(nz, vals, 0)
    return flat.reshape(n_blocks, 64)


# --------------------------------------------------------------------------
# host side (numpy mirrors)
# --------------------------------------------------------------------------

def pack_host(qc: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """(N, 64) int coefficients → (mask, values, nnz) with cap = nnz."""
    flat = qc.reshape(-1)
    nz = flat != 0
    values = np.clip(flat[nz], -2048, 2047).astype(np.int16)
    mask = np.packbits(nz.reshape(qc.shape[0], 64), axis=1)
    return mask, values, int(values.size)


def unpack_host(mask: np.ndarray, values: np.ndarray, nnz: int,
                n_blocks: int) -> np.ndarray:
    """Inverse of pack_*: → (n_blocks, 64) int32 coefficients."""
    nz = np.unpackbits(mask, axis=1, count=64).reshape(-1).astype(bool)
    out = np.zeros(n_blocks * 64, dtype=np.int32)
    out[nz] = values[:nnz]
    return out.reshape(n_blocks, 64)
