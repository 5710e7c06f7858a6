"""Pallas TPU kernel for the parallel bitstream packer.

Same contract and bit-identical output as tpu_encode's XLA gather packer
(_pack_gather + _stuff_gather): compacted symbols in, stuffed wire bytes
out. The kernel is the device transliteration of the RTL bit packer's
insert-at-bottom shift register (bitstream_writer.ml:21-27) — a per-lane
bit-accumulator FSM stepping one symbol at a time — vectorized over one
restart segment per lane, with every operand pinned in VMEM:

- one `lax.while_loop` over symbol slots; symbols are stored
  SUBLANE-MAJOR (K, CHUNK) so each step's operands are one dynamic
  sublane slice — O(1), where a lane-major layout would need a one-hot
  reduction over all K columns per step,
- each step shifts the lane's next symbol into a 64-bit (int32 pair)
  accumulator; complete bytes drain through an inner while_loop that
  runs only while some lane holds ≥ 8 pending bits (typically 0–1
  (W, CHUNK) passes per symbol),
- byte emission is a branch-free one-hot write at the lane's output
  cursor (no scatters), and 0xFF00 stuffing is a cursor skip — the
  stuffed 0x00 is simply the untouched zero-initialized slot
  (the stuffing+flush the RTL lacks, bitstream_writer.ml:29),
- early exit when every lane has consumed its symbols.

Per-lane dynamic indexing along the LANE axis never appears: Mosaic's
`tpu.dynamic_gather` only reaches within a single 128-lane vreg
("multiple source vregs along gather dimension" is unimplemented on
current chips). Dynamic indexing along the SUBLANE axis (the per-step
symbol slice) is a supported sublane shift; everything else is the op
vocabulary the VPU actually has — compares, selects, reductions and
dynamic-amount shifts (the same vocabulary that makes pallas_decode.py's
one-hot decode kernel the fastest entropy tier).

The XLA formulation round-trips every (S, M)-shaped intermediate through
HBM across ~15 fused ops and pays O(M·OVERLAP) gathers; here one kernel
invocation per lane chunk touches HBM exactly twice (operand load,
result store).

Symbol construction stays in XLA; zero-slot compaction — which the XLA
gather packer needs for its OVERLAP bound, and which measured as the
dominant ~110 ms/frame XLA stage on a real chip — is skipped entirely:
a zero-length slot is a no-op of the FSM, and walking ~2.5x more (empty)
slots costs far less in-kernel than compacting them out in XLA.

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

from .tpu_encode import OVERLAP  # noqa: F401 (re-export)

_BIG = 1 << 30  # "invalid" sentinel (plain int: kernels close over it)

# conservative VMEM budget for one lane chunk (see pallas_decode)
_VMEM_BUDGET = 8 << 20


def max_lane_chunk(blocks_per_segment: int, max_seg_bytes: int) -> int:
    """Largest power-of-two lane chunk whose kernel state fits VMEM, or 0
    when even 8 lanes don't fit. Per lane the kernel keeps the compacted
    symbol arrays (hi, lo, len over B·65+1 slots) and the stuffed output
    byte grid (~3 copies across carry + selects)."""
    from .tpu_encode import SLOTS_PER_BLOCK

    K = blocks_per_segment * SLOTS_PER_BLOCK + 1
    Kp = -(-K // 8) * 8
    m_out = max_seg_bytes + max_seg_bytes // 4 + 8
    W = -(-m_out // 8) * 8
    per_lane = 4 * (3 * Kp + 3 * W)
    ch = _VMEM_BUDGET // per_lane
    if ch < 8:
        return 0
    return min(512, 1 << (int(ch).bit_length() - 1))


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

    Layout is SUBLANE-MAJOR: symbols live as (K, CHUNK) so step k's
    operands are one dynamic sublane slice (O(1)), not a one-hot
    reduction over K columns; per-lane state (accumulator, bit count,
    output cursor) is (1, CHUNK) row vectors; the output grid is
    (W, CHUNK), transposed back by the caller.

    State per lane: (acc_hi, acc_lo) pending-bit accumulator, nbits
    pending-bit count, pos output byte cursor. A symbol slot can be up to
    59 bits (≤3 folded ZRL codes + a 16-bit code + 11 magnitude bits,
    right-aligned in (hi, lo)), so each step shifts it in as two ≤32-bit
    pieces, draining complete bytes after each so the accumulator never
    exceeds 39 bits and every step exits holding < 8:

    - the high piece (bits 32..len) is nonzero only for folded-ZRL
      slots, so its shift+drain hides behind a lax.cond on the whole
      chunk (taken on a tiny fraction of steps);
    - the drain is an inner while_loop emitting one byte per pass only
      while some lane still holds ≥ 8 bits — typically 0–1 (W, CHUNK)
      passes per symbol instead of a fixed 8.
    """
    n_compact = ncomp_ref[:]                    # (1, CHUNK)
    CHUNK = n_compact.shape[1]
    W = out_ref.shape[0]

    shr = jax.lax.shift_right_logical
    shl = jax.lax.shift_left
    out_rows = jax.lax.broadcasted_iota(jnp.int32, (W, CHUNK), 0)

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
        """Emit complete bytes while any lane holds ≥ 8 pending bits
        (≤ 4 passes: nbits ≤ 39 on entry)."""
        def emit_cond(st):
            nbits = st[0]
            return jnp.any(nbits >= 8)

        def emit(st):
            nbits, pos, out = st
            can = nbits >= 8
            byte = _extract_byte_i32(acc_hi, acc_lo, nbits - 8)
            out = jnp.where((out_rows == pos) & can, byte, out)
            # 0xFF00 stuffing: skip the (pre-zeroed) next slot
            pos = pos + jnp.where(can, 1 + (byte == 0xFF), 0)
            nbits = nbits - jnp.where(can, 8, 0)
            return nbits, pos, out

        return jax.lax.while_loop(emit_cond, emit, (nbits, pos, out))

    def body(state):
        k, acc_hi, acc_lo, nbits, pos, out = state
        sym_hi = c_hi_ref[pl.ds(k, 1), :]       # (1, CHUNK)
        sym_lo = c_lo_ref[pl.ds(k, 1), :]
        ln = c_len_ref[pl.ds(k, 1), :]
        ln = jnp.where(k < n_compact, ln, 0)
        ln_hi = jnp.maximum(ln - 32, 0)

        # high piece: bits 32..ln (nonzero only for folded-ZRL slots)
        def with_hi(st):
            acc_hi, acc_lo, nbits, pos, out = st
            acc_hi, acc_lo, nbits = shift_in(acc_hi, acc_lo, nbits,
                                             sym_hi, ln_hi)
            nbits, pos, out = drain(acc_hi, acc_lo, nbits, pos, out)
            return acc_hi, acc_lo, nbits, pos, out

        acc_hi, acc_lo, nbits, pos, out = jax.lax.cond(
            jnp.any(ln_hi > 0), with_hi, lambda st: st,
            (acc_hi, acc_lo, nbits, pos, out))

        # low piece: min(ln, 32) bits
        acc_hi, acc_lo, nbits = shift_in(acc_hi, acc_lo, nbits, sym_lo,
                                         jnp.minimum(ln, 32))
        nbits, pos, out = drain(acc_hi, acc_lo, nbits, pos, out)
        return (k + 1, acc_hi, acc_lo, nbits, pos, out)

    def cond(state):
        k = state[0]
        return jnp.any(k < n_compact) & (k < max_syms)

    zr = jnp.zeros((1, CHUNK), jnp.int32)
    init = (jnp.zeros((), jnp.int32), zr, zr, zr, zr,
            jnp.zeros((W, CHUNK), jnp.int32))
    final = jax.lax.while_loop(cond, body, init)
    out_ref[:] = final[5]
    lens_ref[:] = final[4]


@functools.partial(
    jax.jit,
    static_argnames=("m_raw", "m_out", "lane_chunk", "interpret"))
def pack_stuff_pallas(c_hi, c_lo, c_len, raw_bytes_len,
                      *, m_raw: int, m_out: int, lane_chunk: int = 512,
                      interpret: bool = False):
    """Symbol slots → stuffed wire bytes. Returns (out (S, m_out) uint8,
    out_lens (S,), overflow).

    Bit-identical to _pack_gather + _stuff_gather. Unlike the XLA packer
    the kernel does NOT need compacted slots: a zero-length slot is a
    no-op of the FSM (measured: skipping _compact_symbols removes the
    dominant ~110 ms XLA stage for ~2.5x more — cheap — kernel steps).
    The caller appends the byte-align pad slot so every lane's bit
    accumulator drains completely."""
    S, K = c_len.shape
    overflow = jnp.any(raw_bytes_len > m_raw)
    c_len = c_len.astype(jnp.int32)

    # int32 raw bits for the kernel (logical-shift domain)
    b = jax.lax.bitcast_convert_type
    c_hi = b(c_hi.astype(jnp.uint32), jnp.int32)
    c_lo = b(c_lo.astype(jnp.uint32), jnp.int32)

    CH = min(lane_chunk, max(128, 1 << (S - 1).bit_length()))
    Sp = -(-S // CH) * CH
    Kp = -(-K // 8) * 8        # symbols on the sublane axis: pad to 8
    W = -(-m_out // 8) * 8

    def padt(x):
        """Pad lanes and transpose to the kernel's (K, S) layout."""
        return jnp.pad(x, ((0, Sp - S), (0, Kp - K))).T

    c_hi = padt(c_hi)
    c_lo = padt(c_lo)
    c_len = padt(c_len)
    # every real lane walks all K slots (zero-length slots are no-ops);
    # mesh/chunk padding lanes exit immediately
    ncomp = jnp.pad(jnp.full((S,), K, jnp.int32), (0, Sp - S))[None, :]

    kern = functools.partial(_kernel, max_syms=K)
    col = lambda i: (0, i)  # noqa: E731
    out, lens = pl.pallas_call(
        kern,
        grid=(Sp // CH,),
        in_specs=[
            pl.BlockSpec((Kp, CH), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, CH), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, CH), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH), col, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((W, CH), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH), col, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((W, Sp), jnp.int32),
            jax.ShapeDtypeStruct((1, Sp), jnp.int32),
        ),
        interpret=interpret,
    )(c_hi, c_lo, c_len, ncomp)
    out_lens = lens[0, :S]
    overflow = overflow | jnp.any(out_lens > m_out)
    return (out.T[:S, :m_out].astype(jnp.uint8), out_lens, overflow)


def encode_segments_pallas(qcoefs, comp_idx, prev_same_comp, dc_bits,
                           dc_len, ac_bits, ac_len, *,
                           blocks_per_segment: int, max_seg_bytes: int,
                           valid=None, lane_chunk: int = 512,
                           interpret: bool | None = None):
    """Drop-in alternative to tpu_encode.encode_segments_device with the
    byte pack + stuffing in the Pallas kernel. Same contract:
    returns (bytes (S, M) uint8, seg_byte_lens (S,), overflow).

    No slot compaction: the FSM kernel skips zero-length slots for free,
    so only the byte-align pad slot (flush with 1-bits, the
    bitstream_writer.ml flush_with_1s semantics) is appended here."""
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
    total_bits = jnp.sum(sym_len, axis=1)
    pad_len = (-total_bits) & 7
    pad_bits = ((1 << pad_len) - 1).astype(jnp.uint32)
    c_hi = jnp.concatenate([sym_hi, jnp.zeros((S, 1), jnp.uint32)], axis=1)
    c_lo = jnp.concatenate([sym_lo, pad_bits[:, None]], axis=1)
    c_len = jnp.concatenate([sym_len, pad_len[:, None]], axis=1)
    raw_bytes_len = (total_bits + pad_len) >> 3
    m_out = max_seg_bytes + max_seg_bytes // 4 + 8
    return pack_stuff_pallas(
        c_hi, c_lo, c_len, raw_bytes_len,
        m_raw=max_seg_bytes, m_out=m_out, lane_chunk=lane_chunk,
        interpret=interpret)
