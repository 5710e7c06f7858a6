"""Pallas TPU kernel for the parallel bitstream packer.

Same contract and bit-identical output as tpu_encode's XLA gather packer
(_pack_gather + _stuff_gather): compacted symbols in, stuffed wire bytes
out. The kernel is the device transliteration of the RTL bit packer's
insert-at-bottom shift register (bitstream_writer.ml:21-27) — a per-lane
bit-accumulator FSM stepping one symbol at a time — vectorized over one
restart segment per lane, with every operand pinned in VMEM:

- one `lax.while_loop` over symbol slots; each step shifts the lane's
  next symbol into a 64-bit (int32 pair) accumulator and emits up to
  four complete bytes,
- byte emission is a branch-free one-hot write at the lane's output
  cursor (no scatters), and 0xFF00 stuffing is a cursor skip — the
  stuffed 0x00 is simply the untouched zero-initialized slot
  (the stuffing+flush the RTL lacks, bitstream_writer.ml:29),
- early exit when every lane has consumed its symbols.

Per-lane dynamic indexing never appears: Mosaic's `tpu.dynamic_gather`
only reaches within a single 128-lane vreg ("multiple source vregs along
gather dimension" is unimplemented on current chips), so the kernel uses
only the op vocabulary the VPU actually has — compares, selects,
reductions and dynamic-amount shifts (the same vocabulary that makes
pallas_decode.py's one-hot decode kernel the fastest entropy tier).

The XLA formulation round-trips every (S, M)-shaped intermediate through
HBM across ~15 fused ops and pays O(M·OVERLAP) gathers; here one kernel
invocation per lane chunk touches HBM exactly twice (operand load,
result store).

Symbol construction and zero-slot compaction stay in XLA (one cumsum +
one unique-index scatter, already cheap); this kernel replaces the
byte-grid stages, which dominate the 0.6 s/frame measured in round 1
(BENCH_NOTES.md "device bitstream packer").

Lanes are restart segments (many-short-segments regime, like the decode
kernel); long-segment/few-lane streams stay on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tpu_encode import OVERLAP, _compact_symbols  # noqa: F401 (OVERLAP re-export)

_BIG = 1 << 30  # "invalid" sentinel (plain int: kernels close over it)


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


def _kernel(c_hi_ref, c_lo_ref, c_len_ref, ncomp_ref, out_ref, lens_ref,
            *, max_syms: int):
    """One lane chunk: compacted symbols → stuffed wire bytes + lengths.

    State per lane: (acc_hi, acc_lo) pending-bit accumulator, nbits
    pending-bit count, pos output byte cursor. A symbol slot can be up to
    59 bits (≤3 folded ZRL codes + a 16-bit code + 11 magnitude bits,
    right-aligned in (hi, lo)), so each step shifts it in as two ≤32-bit
    pieces with a 4-byte emit drain after each — the accumulator never
    holds more than 39 bits and always leaves a step holding < 8.
    """
    c_hi = c_hi_ref[:]                          # (CHUNK, K) int32 raw bits
    c_lo = c_lo_ref[:]
    c_len = c_len_ref[:]                        # (CHUNK, K) bit lengths
    n_compact = ncomp_ref[:]                    # (CHUNK, 1)
    CHUNK = c_lo.shape[0]
    K = c_lo.shape[1]
    W = out_ref.shape[1]

    shr = jax.lax.shift_right_logical
    shl = jax.lax.shift_left
    kcols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, K), 1)
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, W), 1)

    def shift_in(acc_hi, acc_lo, nbits, val, ln):
        """acc = (acc << ln) | val for 0 ≤ ln ≤ 32, val masked to ln
        bits here (bits of the slot words at/above the symbol length are
        garbage — the XLA packer's windowed extraction never reads them)."""
        lnc = jnp.clip(ln, 0, 31)
        val = jnp.where(ln == 32, val, val & (shl(1, lnc) - 1))
        new_hi = jnp.where(
            ln == 32, acc_lo,
            shl(acc_hi, lnc) | jnp.where(
                ln == 0, 0, shr(acc_lo, jnp.clip(32 - ln, 0, 31))))
        new_lo = jnp.where(ln == 32, val, shl(acc_lo, lnc) | val)
        keep = ln == 0
        return (jnp.where(keep, acc_hi, new_hi),
                jnp.where(keep, acc_lo, new_lo), nbits + ln)

    def drain(acc_hi, acc_lo, nbits, pos, out):
        """Emit all complete bytes (≤ 4: nbits ≤ 39 on entry)."""
        for _ in range(4):
            can = nbits >= 8
            byte = _extract_byte_i32(acc_hi, acc_lo, nbits - 8)
            byte = jnp.where(can, byte, -1)
            out = jnp.where((out_cols == pos) & can, byte, out)
            # 0xFF00 stuffing: skip the (pre-zeroed) next slot
            pos = pos + jnp.where(can, 1 + (byte == 0xFF), 0)
            nbits = nbits - jnp.where(can, 8, 0)
        return nbits, pos, out

    def body(state):
        k, acc_hi, acc_lo, nbits, pos, out = state
        active = k < n_compact
        sel = kcols == k
        sym_hi = jnp.sum(jnp.where(sel, c_hi, 0), axis=1, keepdims=True)
        sym_lo = jnp.sum(jnp.where(sel, c_lo, 0), axis=1, keepdims=True)
        ln = jnp.sum(jnp.where(sel, c_len, 0), axis=1, keepdims=True)
        ln = jnp.where(active, ln, 0)
        # high piece: bits 32..ln (nonzero only for folded-ZRL slots)
        acc_hi, acc_lo, nbits = shift_in(acc_hi, acc_lo, nbits, sym_hi,
                                         jnp.maximum(ln - 32, 0))
        nbits, pos, out = drain(acc_hi, acc_lo, nbits, pos, out)
        # low piece: min(ln, 32) bits
        acc_hi, acc_lo, nbits = shift_in(acc_hi, acc_lo, nbits, sym_lo,
                                         jnp.minimum(ln, 32))
        nbits, pos, out = drain(acc_hi, acc_lo, nbits, pos, out)
        return (k + 1, acc_hi, acc_lo, nbits, pos, out)

    def cond(state):
        k = state[0]
        return jnp.any(k < n_compact) & (k < max_syms)

    zc = jnp.zeros((CHUNK, 1), jnp.int32)
    init = (jnp.zeros((), jnp.int32), zc, zc, zc, zc,
            jnp.zeros((CHUNK, W), jnp.int32))
    final = jax.lax.while_loop(cond, body, init)
    out_ref[:] = final[5]
    lens_ref[:] = final[4]


@functools.partial(
    jax.jit,
    static_argnames=("m_raw", "m_out", "lane_chunk", "interpret"))
def pack_stuff_pallas(c_hi, c_lo, c_end, c_off, n_compact, raw_bytes_len,
                      *, m_raw: int, m_out: int, lane_chunk: int = 512,
                      interpret: bool = False):
    """Compacted symbols (tpu_encode._compact_symbols layout) → stuffed
    wire bytes. Returns (out (S, m_out) uint8, out_lens (S,), overflow).

    Bit-identical to _pack_gather + _stuff_gather. The pad slot appended
    by _compact_symbols byte-aligns every lane, so the kernel's bit
    accumulator always drains completely."""
    S, K = c_end.shape
    overflow = jnp.any(raw_bytes_len > m_raw)
    c_len = jnp.where(jnp.arange(K)[None, :] < n_compact[:, None],
                      c_end - c_off, 0).astype(jnp.int32)

    # int32 raw bits for the kernel (logical-shift domain)
    b = jax.lax.bitcast_convert_type
    c_hi = b(c_hi.astype(jnp.uint32), jnp.int32)
    c_lo = b(c_lo.astype(jnp.uint32), jnp.int32)

    CH = min(lane_chunk, max(8, 1 << (S - 1).bit_length()))
    Sp = -(-S // CH) * CH
    Kp = -(-K // 128) * 128
    W = -(-m_out // 128) * 128

    def padk(x):
        return jnp.pad(x, ((0, Sp - S), (0, Kp - K)))

    c_hi = padk(c_hi)
    c_lo = padk(c_lo)
    c_len = padk(c_len)
    ncomp = jnp.pad(n_compact.astype(jnp.int32), (0, Sp - S))[:, None]

    kern = functools.partial(_kernel, max_syms=K)
    row = lambda i: (i, 0)  # noqa: E731
    out, lens = pl.pallas_call(
        kern,
        grid=(Sp // CH,),
        in_specs=[
            pl.BlockSpec((CH, Kp), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, Kp), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, Kp), row, memory_space=pltpu.VMEM),
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
    )(c_hi, c_lo, c_len, ncomp)
    out_lens = lens[:S, 0]
    overflow = overflow | jnp.any(out_lens > m_out)
    return (out[:S, :m_out].astype(jnp.uint8), out_lens, overflow)


def encode_segments_pallas(qcoefs, comp_idx, prev_same_comp, dc_bits,
                           dc_len, ac_bits, ac_len, *,
                           blocks_per_segment: int, max_seg_bytes: int,
                           valid=None, lane_chunk: int = 512,
                           interpret: bool | None = None):
    """Drop-in alternative to tpu_encode.encode_segments_device with the
    byte pack + stuffing in the Pallas kernel. Same contract:
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
