"""Pallas TPU kernel for the parallel bitstream packer.

Same contract and bit-identical output as tpu_encode's XLA gather packer
(_pack_gather + _stuff_gather), but the whole per-byte cover search,
symbol-window extraction and 0xFF00 stuffing run inside one Mosaic kernel
per lane chunk with every operand pinned in VMEM:

- the compacted symbol arrays (values + bit start/end offsets, one row
  per restart segment — the device analog of the RTL bit packer's 32-bit
  insert_at_bottom buffer, bitstream_writer.ml:21-27, plus the stuffing
  and flush the RTL lacks, bitstream_writer.ml:29),
- the per-byte first-cover index via an in-VMEM row-wise binary search
  over the monotone symbol end offsets (no scatters, no HBM round trips
  between stages),
- the stuffing expansion as a second binary search over the monotone
  destination positions.

The XLA formulation round-trips every (S, M)-shaped intermediate through
HBM across ~15 fused ops; here one kernel invocation per lane chunk
touches HBM exactly twice (operand load, result store).

Symbol construction and zero-slot compaction stay in XLA (one cumsum +
one unique-index scatter, already cheap); this kernel replaces the
byte-grid stages, which dominate the 0.6 s/frame measured in round 1
(BENCH_NOTES.md "device bitstream packer").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tpu_encode import OVERLAP, _compact_symbols

_BIG = 1 << 30  # "invalid" sentinel (plain int: kernels close over it)


def _searchsorted_right(sorted_rows, queries, steps: int):
    """Row-wise searchsorted(side='right'): sorted_rows (C, K) per-lane
    sorted, queries (C, M) → (C, M) count of row values ≤ query.
    take_along_axis gathers only — the Mosaic-native form."""
    K = sorted_rows.shape[1]
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = jnp.full(queries.shape, K, jnp.int32)
    for _ in range(steps):
        mid = (lo + hi) >> 1
        amid = jnp.take_along_axis(sorted_rows, jnp.clip(mid, 0, K - 1),
                                   axis=1)
        go_right = (amid <= queries) & (mid < hi)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, jnp.minimum(hi, mid))
    return lo


def _extract_byte_i32(hi, lo, s):
    """Low byte of (hi·2^32 + lo) >> s for -8 ≤ s ≤ 63, on int32 raw bits
    (logical shifts only — Mosaic has no unsigned vectors)."""
    shr = jax.lax.shift_right_logical
    shl = jax.lax.shift_left
    s_ge32 = shr(hi, jnp.clip(s - 32, 0, 31)) & 0xFF
    lo_part = shr(lo, jnp.clip(s, 0, 31))
    hi_part = jnp.where(s == 0, 0, shl(hi, jnp.clip(32 - s, 0, 31)))
    s_lt32 = (lo_part | hi_part) & 0xFF
    s_neg = shl(lo, jnp.clip(-s, 0, 8)) & 0xFF
    return jnp.where(s >= 32, s_ge32, jnp.where(s >= 0, s_lt32, s_neg))


def _prefix_sum_lanes(x, width: int):
    """Inclusive prefix sum along the lane (last) axis via log-step
    shifted adds (pltpu.roll); `width` is the static lane count."""
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    sh = 1
    while sh < width:
        x = x + jnp.where(cols >= sh, pltpu.roll(x, sh, axis=1), 0)
        sh <<= 1
    return x


def _kernel(c_hi_ref, c_lo_ref, c_end_ref, c_off_ref, rlen_ref,
            out_ref, lens_ref, *, m_raw: int, k_steps: int):
    """One lane chunk: compacted symbols → stuffed wire bytes + lengths.

    c_end rows are _BIG past each lane's symbol count (set by the caller),
    so the binary search needs no separate validity operand.

    Every operand/grid row shares ONE padded width W: Mosaic's per-lane
    gather only lowers when the index array matches the operand shape
    exactly (take_along_axis with indices (CH, M) into rows (CH, K)
    fails its gather-shape rule for M != K on real chips), so symbol
    rows, the byte grid and the stuffed-output grid are all W wide and
    masked by m_raw / raw_len instead of being separately sized."""
    c_hi = c_hi_ref[:]
    c_lo = c_lo_ref[:]
    c_end = c_end_ref[:]
    c_off = c_off_ref[:]
    raw_len = rlen_ref[:]                      # (CHUNK, 1)
    CHUNK = c_hi.shape[0]
    W = c_hi.shape[1]

    # ---- pack: every output byte gathers its ≤ OVERLAP cover symbols ----
    byte_pos = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, W), 1)
    byte_bits = byte_pos * 8
    a = _searchsorted_right(c_end, byte_bits, k_steps)
    acc = jnp.zeros((CHUNK, W), jnp.int32)
    for t in range(OVERLAP):
        idx = jnp.clip(a + t, 0, W - 1)
        hi = jnp.take_along_axis(c_hi, idx, axis=1)
        lo = jnp.take_along_axis(c_lo, idx, axis=1)
        end = jnp.take_along_axis(c_end, idx, axis=1)
        off = jnp.take_along_axis(c_off, idx, axis=1)
        valid = (end < _BIG) & (off < byte_bits + 8) & (end > byte_bits)
        s = jnp.clip(end - byte_bits - 8, -8, 63)
        acc = acc + jnp.where(valid, _extract_byte_i32(hi, lo, s), 0)
    raw_valid = (byte_pos < raw_len) & (byte_pos < m_raw)
    raw = jnp.where(raw_valid, acc, 0)

    # ---- stuffing: monotone dest positions, inverted by binary search ---
    is_ff = (raw == 0xFF) & raw_valid
    ff_before = _prefix_sum_lanes(is_ff.astype(jnp.int32), W) \
        - is_ff.astype(jnp.int32)
    dest = jnp.where(raw_valid, byte_pos + ff_before, _BIG)
    # src = last source byte with dest ≤ o; exact hit = data byte,
    # miss = the stuffed 0x00 that follows an 0xFF
    src = _searchsorted_right(dest, byte_pos, k_steps) - 1
    src_c = jnp.clip(src, 0, W - 1)
    exact = jnp.take_along_axis(dest, src_c, axis=1) == byte_pos
    out_ref[:] = jnp.where(exact & (src >= 0),
                           jnp.take_along_axis(raw, src_c, axis=1), 0)
    n_ff = jnp.sum(jnp.where(is_ff, 1, 0), axis=1, keepdims=True)
    lens_ref[:] = raw_len + n_ff


@functools.partial(
    jax.jit,
    static_argnames=("m_raw", "m_out", "lane_chunk", "interpret"))
def pack_stuff_pallas(c_hi, c_lo, c_end, c_off, n_compact, raw_bytes_len,
                      *, m_raw: int, m_out: int, lane_chunk: int = 256,
                      interpret: bool = False):
    """Compacted symbols (tpu_encode._compact_symbols layout) → stuffed
    wire bytes. Returns (out (S, m_out) uint8, out_lens (S,), overflow).

    Bit-identical to _pack_gather + _stuff_gather."""
    S, K = c_end.shape
    overflow = jnp.any(raw_bytes_len > m_raw)
    # invalidate slots past each lane's symbol count for the search
    slot = jnp.arange(K)[None, :]
    c_end = jnp.where(slot < n_compact[:, None], c_end, _BIG)
    c_off = jnp.where(slot < n_compact[:, None], c_off, _BIG)

    # int32 raw bits for the kernel (logical-shift domain)
    b = jax.lax.bitcast_convert_type
    c_hi = b(c_hi.astype(jnp.uint32), jnp.int32)
    c_lo = b(c_lo.astype(jnp.uint32), jnp.int32)

    CH = min(lane_chunk, max(8, 1 << (S - 1).bit_length()))
    Sp = -(-S // CH) * CH
    # one shared width: symbol rows, byte grid and stuffed grid (see
    # _kernel docstring — Mosaic gathers need index/operand shape match)
    W = -(-max(K, m_raw, m_out) // 128) * 128

    def padk(x, fill=0):
        return jnp.pad(x, ((0, Sp - S), (0, W - K)), constant_values=fill)

    c_hi = padk(c_hi)
    c_lo = padk(c_lo)
    c_end = padk(c_end, fill=1 << 30)
    c_off = padk(c_off, fill=1 << 30)
    rlen = jnp.pad(raw_bytes_len.astype(jnp.int32), (0, Sp - S))[:, None]

    kern = functools.partial(
        _kernel, m_raw=m_raw, k_steps=max(W.bit_length(), 1))
    row = lambda i: (i, 0)  # noqa: E731
    out, lens = pl.pallas_call(
        kern,
        grid=(Sp // CH,),
        in_specs=[
            pl.BlockSpec((CH, W), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, W), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, W), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, W), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, 1), row, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((CH, W), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, 1), row, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Sp, W), jnp.int32),
            jax.ShapeDtypeStruct((Sp, 1), jnp.int32),
        ),
        interpret=interpret,
    )(c_hi, c_lo, c_end, c_off, rlen)
    out_lens = lens[:S, 0]
    overflow = overflow | jnp.any(out_lens > m_out)
    return (out[:S, :m_out].astype(jnp.uint8), out_lens, overflow)


def encode_segments_pallas(qcoefs, comp_idx, prev_same_comp, dc_bits,
                           dc_len, ac_bits, ac_len, *,
                           blocks_per_segment: int, max_seg_bytes: int,
                           valid=None, lane_chunk: int = 256,
                           interpret: bool | None = None):
    """Drop-in alternative to tpu_encode.encode_segments_device with the
    byte-grid pack + stuffing in the Pallas kernel. Same contract:
    returns (bytes (S, M) uint8, seg_byte_lens (S,), overflow)."""
    from .tpu_encode import SLOTS_PER_BLOCK, _symbol_parts

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B = blocks_per_segment
    S = qcoefs.shape[0] // B
    sym_hi, sym_lo, sym_len = _symbol_parts(
        qcoefs, comp_idx, prev_same_comp, dc_bits, dc_len, ac_bits, ac_len,
        B)
    if valid is not None:
        sym_len = jnp.where(valid[:, None], sym_len, 0)
    sym_hi = sym_hi.reshape(S, B * SLOTS_PER_BLOCK)
    sym_lo = sym_lo.reshape(S, B * SLOTS_PER_BLOCK)
    sym_len = sym_len.reshape(S, B * SLOTS_PER_BLOCK)
    c_hi, c_lo, c_end, c_off, n_compact, raw_bytes_len = _compact_symbols(
        sym_hi, sym_lo, sym_len)
    m_out = max_seg_bytes + max_seg_bytes // 4 + 8
    return pack_stuff_pallas(
        c_hi, c_lo, c_end, c_off, n_compact, raw_bytes_len,
        m_raw=max_seg_bytes, m_out=m_out, lane_chunk=lane_chunk,
        interpret=interpret)
