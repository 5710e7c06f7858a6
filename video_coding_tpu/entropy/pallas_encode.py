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
    when even 8 lanes don't fit. Fused kernel (B ≤ FUSED_MAX_BLOCKS):
    the (B·64,) coefficient column + ~3 copies of the output grid; split
    kernel: the three (B·65+1,) symbol-slot arrays + output grid."""
    from .tpu_encode import SLOTS_PER_BLOCK

    B = blocks_per_segment
    m_out = max_seg_bytes + max_seg_bytes // 4 + 8
    W4 = -(-m_out // 32) * 8   # word-packed output rows
    if B <= FUSED_MAX_BLOCKS:
        per_lane = 4 * (B * 64 + B + 3 * W4)
    else:
        K = B * SLOTS_PER_BLOCK + 1
        Kp = -(-K // 8) * 8
        per_lane = 4 * (3 * Kp + 3 * W4)
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


def _shift_in64(acc_hi, acc_lo, nbits, val, ln):
    """acc = (acc << ln) | val for 0 ≤ ln ≤ 32 per lane, val masked to ln
    bits here (bits of the operand at/above the symbol length may be
    garbage)."""
    shr = jax.lax.shift_right_logical
    shl = jax.lax.shift_left
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


def _drain64(acc_hi, acc_lo, nbits, pos, out, out_rows, passes: int = 4):
    """Emit complete bytes at each lane's output cursor until no lane
    holds ≥ 8 pending bits; 0xFF00 stuffing is a cursor skip (the
    stuffed 0x00 is the untouched zero-initialized slot).

    The output grid is WORD-PACKED — (W/4, CHUNK) int32, 4 bytes per
    row — so each emit's one-hot write touches a quarter of the rows a
    byte grid would (each byte slot is written at most once, so the
    or-insert composes exactly); `pos` stays a byte cursor.

    The drain is a FIXED ``passes``-deep unroll, not a while_loop: the
    caller bounds its worst-case pending bits (7 carried + the pieces
    it shifted in since the last drain) and pending < 8·passes + 8
    guarantees a full drain; the unrolled form trades a few predicated
    vector ops for the per-pass scalar reduce + branch a while_loop
    pays."""
    def emit(st):
        nbits, pos, out = st
        can = nbits >= 8
        byte = _extract_byte_i32(acc_hi, acc_lo, nbits - 8)
        ins = jax.lax.shift_left(byte, (pos & 3) * 8)
        out = jnp.where((out_rows == (pos >> 2)) & can, out | ins, out)
        pos = pos + jnp.where(can, 1 + (byte == 0xFF), 0)
        nbits = nbits - jnp.where(can, 8, 0)
        return nbits, pos, out

    st = (nbits, pos, out)
    for _ in range(passes):
        st = emit(st)
    return st


def _unpack_words(out, S: int, m_out: int):
    """(W4, Sp) word-packed kernel output → (S, m_out) uint8 bytes, pure
    elementwise + reshape (no gathers)."""
    shifts = jnp.arange(4, dtype=jnp.int32) * 8
    b = ((out.T[:S, :, None] >> shifts[None, None, :]) & 0xFF)
    return b.reshape(S, -1)[:, :m_out].astype(jnp.uint8)


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
    W4 = out_ref.shape[0]                       # word-packed rows
    out_rows = jax.lax.broadcasted_iota(jnp.int32, (W4, CHUNK), 0)
    shift_in = _shift_in64

    def drain(acc_hi, acc_lo, nbits, pos, out):
        return _drain64(acc_hi, acc_lo, nbits, pos, out, out_rows)

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
            jnp.zeros((W4, CHUNK), jnp.int32))
    final = jax.lax.while_loop(cond, body, init)
    out_ref[:] = final[5]
    lens_ref[:] = final[4]


@functools.partial(
    jax.jit,
    static_argnames=("m_raw", "m_out", "lane_chunk", "interpret",
                     "raw_words"))
def pack_stuff_pallas(c_hi, c_lo, c_len, raw_bytes_len,
                      *, m_raw: int, m_out: int, lane_chunk: int = 512,
                      interpret: bool = False, raw_words: bool = False):
    """Symbol slots → stuffed wire bytes. Returns (out (S, m_out) uint8,
    out_lens (S,), overflow); with raw_words=True ``out`` is instead the
    kernel's word-packed grid (S, ceil(m_out/4)+1) int32 for
    assemble_stream_device_packed — no byte unpack.

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
    W4 = -(-m_out // 32) * 8   # word-packed output rows (x8 sublanes)

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
            pl.BlockSpec((W4, CH), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH), col, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((W4, Sp), jnp.int32),
            jax.ShapeDtypeStruct((1, Sp), jnp.int32),
        ),
        interpret=interpret,
    )(c_hi, c_lo, c_len, ncomp)
    out_lens = lens[0, :S]
    overflow = overflow | jnp.any(out_lens > m_out)
    if raw_words:
        return out.T[:S, :(m_out + 3) // 4 + 1], out_lens, overflow
    return (_unpack_words(out, S, m_out), out_lens, overflow)


# fused-FSM kernel unrolls one prologue/epilogue per block at compile
# time — cap the unroll (restart intervals this large route to the
# split path; the VMEM gate usually bites first anyway)
FUSED_MAX_BLOCKS = 32


def _fsm_kernel(coefs_ref, valid_ref, dctab_ref, actab_ref, out_ref,
                lens_ref, *, comp_sched: tuple, unroll: int):
    """One lane chunk: quantized zigzag coefficients → stuffed wire
    bytes + lengths, the ENTIRE entropy encoder in one kernel.

    This is the full RTL encoder chain (Run_length_encode →
    Huffman_encode → Bitstream_writer, encoder_datapath.ml:129-187) as a
    vectorized FSM — run-length state, DC predictors, Huffman lookups,
    bit accumulator and stuffing cursor all live in registers, one
    restart segment per lane:

    - the block schedule is static per session, so each block's
      component — and therefore its Huffman table rows and its ZRL/EOB
      codewords — are compile-time constants (the analog of the RTL's
      elaboration-time table ROMs, huffman_encode.ml:55-97);
    - per-lane (run, size) lookups are one-hot reductions over the
      block's static 176-entry AC table column;
    - runs emit ZRL eagerly at run==16 — safe because positions past
      the block's last nonzero are masked off, so every counted run is
      followed by a real codeword;
    - symbols are ≤ 27 bits (code ≤ 16 + magnitude ≤ 11), so one ZRL +
      one codeword fit the 64-bit accumulator per step with a single
      adaptive drain.

    coefs_ref (B·64, CHUNK) int32; valid_ref (B, CHUNK); dctab/actab
    (C·12, 1)/(C·176, 1) packed (code<<5 | len) columns.
    """
    B = len(comp_sched)
    CHUNK = out_ref.shape[1]
    W4 = out_ref.shape[0]                       # word-packed rows
    shr = jax.lax.shift_right_logical
    shl = jax.lax.shift_left
    out_rows = jax.lax.broadcasted_iota(jnp.int32, (W4, CHUNK), 0)
    shift_in = _shift_in64

    # drain pass counts are sized per site to the worst pending bits on
    # entry (7 carried + what the site shifts in), so each exits < 8:
    # DC 7+27=34 → 4 passes; AC 7+16+26=49 → 6; EOB 7+16=23 → 2;
    # flush ≤ 8 → 1 (VERDICT r3 item 4: passes=6 was worst-case-sized
    # everywhere)
    def drain(acc_hi, acc_lo, nbits, pos, out, passes=6):
        return _drain64(acc_hi, acc_lo, nbits, pos, out, out_rows,
                        passes=passes)

    def bitlen(v):
        """Size category of v ≥ 0 (≤ 2047)."""
        r = jnp.zeros_like(v)
        for t in range(11):
            r = r + (v >= (1 << t)).astype(jnp.int32)
        return r

    def iabs(v):
        # explicit form: keep to the op vocabulary Mosaic lowers
        return jnp.where(v < 0, 0 - v, v)

    def lookup_col(tabcol, idx, n):
        """tabcol (n, 1) int32, idx (1, CHUNK) → tabcol[idx] (1, CHUNK)
        as a one-hot reduction (no per-lane gathers on TPU)."""
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, CHUNK), 0)
        return jnp.sum(jnp.where(rows == idx, tabcol, 0), axis=0,
                       keepdims=True)

    def mag_bits(v, size):
        return jnp.where(v >= 0, v, v - 1) & (shl(1, size) - 1)

    zr = jnp.zeros((1, CHUNK), jnp.int32)
    acc_hi, acc_lo, nbits, pos = zr, zr, zr, zr
    out = jnp.zeros((W4, CHUNK), jnp.int32)
    C = dctab_ref.shape[0] // 12
    dcpred = jnp.zeros((C, CHUNK), jnp.int32)
    crows = jax.lax.broadcasted_iota(jnp.int32, (C, CHUNK), 0)

    for b in range(B):
        comp = int(comp_sched[b])
        base = b * 64
        vb = valid_ref[b:b + 1, :] != 0
        dcrow = dctab_ref[comp * 12:(comp + 1) * 12, :]
        acrow = actab_ref[comp * 176:(comp + 1) * 176, :]
        zpk = acrow[15 * 11:15 * 11 + 1, :]          # ZRL (run 15, size 0)
        epk = acrow[0:1, :]                          # EOB (run 0, size 0)

        # --- DC: differential vs per-component predictor ----------------
        coef0 = coefs_ref[base:base + 1, :]
        prev = dcpred[comp:comp + 1, :]
        diff = jnp.where(vb, coef0 - prev, 0)
        dcpred = jnp.where((crows == comp) & vb, coef0, dcpred)
        dsize = bitlen(jnp.abs(diff))
        dpk = lookup_col(dcrow, dsize, 12)
        dval = shl(shr(dpk, 5), dsize) | mag_bits(diff, dsize)
        acc_hi, acc_lo, nbits = shift_in(
            acc_hi, acc_lo, nbits, dval,
            jnp.where(vb, (dpk & 31) + dsize, 0))
        nbits, pos, out = drain(acc_hi, acc_lo, nbits, pos, out, passes=4)

        # --- AC positions 1..63 -----------------------------------------
        blk = coefs_ref[base + 1:base + 64, :]       # (63, CHUNK)
        jrows = jax.lax.broadcasted_iota(jnp.int32, (63, CHUNK), 0) + 1
        last_nz = jnp.max(jnp.where(blk != 0, jrows, 0), axis=0,
                          keepdims=True)

        def jbody(j, st, base=base, vb=vb, last_nz=last_nz, zpk=zpk,
                  acrow=acrow):
            acc_hi, acc_lo, nbits, pos, out, run = st
            coef = coefs_ref[pl.ds(base + j, 1), :]
            active = vb & (j <= last_nz)
            nz = active & (coef != 0)
            run = run + (active & (coef == 0)).astype(jnp.int32)
            zfire = run == 16
            acc_hi, acc_lo, nbits = shift_in(
                acc_hi, acc_lo, nbits, shr(zpk, 5),
                jnp.where(zfire, zpk & 31, 0))
            run = jnp.where(zfire, 0, run)
            asize = bitlen(jnp.abs(coef))
            apk = lookup_col(acrow, run * 11 + asize, 176)
            aval = shl(shr(apk, 5), asize) | mag_bits(coef, asize)
            acc_hi, acc_lo, nbits = shift_in(
                acc_hi, acc_lo, nbits, aval,
                jnp.where(nz, (apk & 31) + asize, 0))
            run = jnp.where(nz, 0, run)
            nbits, pos, out = drain(acc_hi, acc_lo, nbits, pos, out)
            return (acc_hi, acc_lo, nbits, pos, out, run)

        # Adaptive trip count: AC positions past the chunk's deepest
        # last-nonzero are no-ops for every lane, so the loop stops at
        # max(last_nz) instead of always walking 63 positions — with
        # length-sorted lanes (the engine's load balancing) chunks hold
        # similar-depth blocks and typical q75 content EOBs well before
        # 63. Bit-exact: skipped steps were inactive for all lanes.
        # (Mosaic's scan lowering accepts only unroll=1 or the full trip
        # count (63) — anything else raises NotImplementedError at
        # lowering time; this zeroed round 2's bench. unroll=1 via
        # while_loop keeps that contract.)
        if unroll == 63:  # full-unroll experiment path (compile-heavy)
            st = (acc_hi, acc_lo, nbits, pos, out, zr)
            st = jax.lax.fori_loop(1, 64, jbody, st, unroll=63)
            acc_hi, acc_lo, nbits, pos, out, _run = st
        else:
            maxj = jnp.max(jnp.where(vb, last_nz, 0))

            def wcond(state, maxj=maxj):
                return state[0] <= maxj

            def wbody(state, jbody=jbody):
                j = state[0]
                rest = jbody(j, state[1:])
                return (j + 1, *rest)

            st = jax.lax.while_loop(
                wcond, wbody,
                (jnp.ones((), jnp.int32), acc_hi, acc_lo, nbits, pos,
                 out, zr))
            _j, acc_hi, acc_lo, nbits, pos, out, _run = st

        # --- EOB when the block doesn't reach position 63 ----------------
        need_eob = vb & (last_nz < 63)
        acc_hi, acc_lo, nbits = shift_in(
            acc_hi, acc_lo, nbits, shr(epk, 5),
            jnp.where(need_eob, epk & 31, 0))
        nbits, pos, out = drain(acc_hi, acc_lo, nbits, pos, out, passes=2)

    # --- flush to byte boundary with 1-bits (flush_with_1s) --------------
    pad = (-nbits) & 7
    acc_hi, acc_lo, nbits = shift_in(acc_hi, acc_lo, nbits,
                                     shl(1, pad) - 1, pad)
    nbits, pos, out = drain(acc_hi, acc_lo, nbits, pos, out, passes=1)
    out_ref[:] = out
    lens_ref[:] = pos


@functools.partial(
    jax.jit,
    static_argnames=("comp_sched", "m_out", "lane_chunk", "unroll",
                     "interpret", "raw_words"))
def encode_segments_fused(qc_seg, valid_seg, dctab, actab, *,
                          comp_sched: tuple, m_out: int,
                          lane_chunk: int = 512, unroll: int = 1,
                          interpret: bool = False,
                          raw_words: bool = False):
    """Fused per-segment entropy encode: (S, B·64) int32 coefficients →
    (out (S, m_out) uint8, out_lens (S,), overflow). The whole RLE +
    Huffman + pack + stuff chain runs in _fsm_kernel."""
    S = qc_seg.shape[0]
    B = len(comp_sched)
    CH = min(lane_chunk, max(128, 1 << (S - 1).bit_length()))
    Sp = -(-S // CH) * CH
    W4 = -(-m_out // 32) * 8   # word-packed output rows
    Bv = -(-B // 8) * 8   # sublane-align the per-block valid rows

    coefs = jnp.pad(qc_seg.astype(jnp.int32), ((0, Sp - S), (0, 0))).T
    valid = jnp.pad(valid_seg.astype(jnp.int32),
                    ((0, Sp - S), (0, Bv - B))).T
    kern = functools.partial(_fsm_kernel, comp_sched=comp_sched,
                             unroll=unroll)
    col = lambda i: (0, i)  # noqa: E731
    rep = lambda i: (0, 0)  # noqa: E731
    out, lens = pl.pallas_call(
        kern,
        grid=(Sp // CH,),
        in_specs=[
            pl.BlockSpec((B * 64, CH), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bv, CH), col, memory_space=pltpu.VMEM),
            pl.BlockSpec(dctab.shape, rep, memory_space=pltpu.VMEM),
            pl.BlockSpec(actab.shape, rep, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((W4, CH), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH), col, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((W4, Sp), jnp.int32),
            jax.ShapeDtypeStruct((1, Sp), jnp.int32),
        ),
        interpret=interpret,
    )(coefs, valid, dctab, actab)
    out_lens = lens[0, :S]
    overflow = jnp.any(out_lens > m_out)
    if raw_words:
        return out.T[:S, :(m_out + 3) // 4 + 1], out_lens, overflow
    return (_unpack_words(out, S, m_out), out_lens, overflow)


def encode_segments_pallas(qcoefs, comp_idx, prev_same_comp, dc_bits,
                           dc_len, ac_bits, ac_len, *,
                           blocks_per_segment: int, max_seg_bytes: int,
                           valid=None, lane_chunk: int = 512,
                           interpret: bool | None = None,
                           comp_sched_static: tuple | None = None,
                           raw_words: bool = False):
    """Drop-in alternative to tpu_encode.encode_segments_device with the
    entropy coding in a Pallas kernel. Same contract: returns
    (bytes (S, M) uint8, seg_byte_lens (S,), overflow).

    Two forms, both bit-identical to the host coders:

    - **fused** (default whenever the block schedule is concrete and the
      segment is ≤ FUSED_MAX_BLOCKS blocks): the whole RLE + Huffman +
      pack + stuff chain in _fsm_kernel — no XLA symbol construction at
      all (which measured 18.6 ms/frame of the old 25.4 ms total);
    - **split** (fallback, also used when tracing without a concrete
      schedule): XLA _symbol_parts feeding the pack_stuff_pallas packer.
      No slot compaction either way: zero-length slots are FSM no-ops;
      the split path appends the byte-align pad slot (flush with
      1-bits, the bitstream_writer.ml flush_with_1s semantics) here."""
    from .tpu_encode import SLOTS_PER_BLOCK, _symbol_parts

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B = blocks_per_segment
    S = qcoefs.shape[0] // B

    sched = comp_sched_static
    if sched is None and B <= FUSED_MAX_BLOCKS:
        try:
            sched = tuple(int(x) for x in np.asarray(comp_idx[:B]))
        except (jax.errors.TracerArrayConversionError, TypeError):
            sched = None  # traced schedule → split path
    if sched is not None and B > FUSED_MAX_BLOCKS:
        sched = None
    if sched is not None:
        dctab = ((dc_bits.astype(jnp.int32) << 5)
                 | dc_len.astype(jnp.int32)).reshape(-1, 1)
        actab = ((ac_bits.astype(jnp.int32) << 5)
                 | ac_len.astype(jnp.int32)).reshape(-1, 1)
        valid_seg = (jnp.ones((S, B), jnp.int32) if valid is None
                     else valid.reshape(S, B).astype(jnp.int32))
        m_out = max_seg_bytes + max_seg_bytes // 4 + 8
        return encode_segments_fused(
            qcoefs.reshape(S, B * 64), valid_seg, dctab, actab,
            comp_sched=sched, m_out=m_out, lane_chunk=lane_chunk,
            interpret=interpret, raw_words=raw_words)

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
        interpret=interpret, raw_words=raw_words)
