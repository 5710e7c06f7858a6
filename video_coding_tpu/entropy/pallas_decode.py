"""Pallas TPU kernel for the segment-per-lane vectorized Huffman decode.

Same contract and bit-identical output as tpu_decode's XLA while_loop
decoders, but the whole symbol loop runs inside one Mosaic kernel per
lane chunk with every operand pinned in VMEM:

- the precomputed 32-bit peek windows (the device analog of the RTL
  bitstream reader's 40-bit shift window, bitstream_reader.ml:36-57),
- the canonical-range codeword tables (the 16 parallel length matchers
  of codeword_decoder.ml:31-76 as branch-free vector compares),
- the per-lane cursor/FSM state (codeblock_decoder.ml:143-244), and
- the coefficient output block.

`gather_impl='onehot'` (default) expresses every per-lane dynamic index
as a branch-free one-hot compare+select+reduce — the form the VPU
actually executes; it is the only form Mosaic lowers on current TPUs
(`'native'` take/take_along_axis gathers fail Mosaic's gather-shape
rule on real chips and are kept for interpret-mode and future backends).

The XLA formulation round-trips ~15 MB of carry state through HBM every
while_loop iteration; here an iteration touches only VMEM. Per-lane
dynamic indexing appears in three places (peek-window gather, value-table
lookup, coefficient scatter); each has a Mosaic-native form and a
branch-free one-hot form (`gather_impl`) because Mosaic's supported
gather/scatter surface varies by shape and backend generation.

Lanes are restart segments (pack_segments layout); the kernel targets the
many-short-segments regime (restart_interval=1 → thousands of ~20-byte
lanes). Long-segment/few-lane streams stay on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PEEK_BITS = 16

# conservative VMEM budget for one lane chunk's resident state +
# temporaries (real chips have ≥16 MiB; headroom for Mosaic's spills)
_VMEM_BUDGET = 8 << 20


def max_lane_chunk(L: int, blocks_per_segment: int) -> int:
    """Largest power-of-two lane chunk whose kernel state fits VMEM, or 0
    when even 8 lanes don't fit. Per lane the kernel keeps the int32 peek
    windows (~2 copies with one-hot temporaries) and the (B·64,) int32
    coefficient carry (~3 copies across the while_loop state + selects)."""
    LW = max(L - 3, 1)
    LWp = -(-LW // 128) * 128
    per_lane = 4 * (2 * LWp + 3 * blocks_per_segment * 64)
    ch = _VMEM_BUDGET // per_lane
    if ch < 8:
        return 0
    return min(512, 1 << (int(ch).bit_length() - 1))


def _onehot_row_gather(table, idx):
    """table (R,) or (T, V) flattened per-lane lookup without gather:
    returns table[idx] for idx (N, 1) int32, via a one-hot reduction."""
    flat = table.reshape(1, -1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], flat.shape[1]),
                                    1)
    return jnp.sum(jnp.where(cols == idx, flat, 0), axis=1, keepdims=True)


def _kernel(words_ref, segblk_ref, sched_ref, lo_ref, hi_ref, off_ref,
            values_ref, out_ref, *, blocks: int, n_components: int,
            max_iters: int, syms_per_iter: int, gather_impl: str):
    CHUNK = words_ref.shape[0]
    LW = words_ref.shape[1]
    B = blocks
    C = n_components
    V = values_ref.shape[1]
    W64 = B * 64

    words = words_ref[:]                       # (CHUNK, LW) int32 bits
    seg_blocks = segblk_ref[:]                 # (CHUNK, 1) int32
    lo = lo_ref[:]                             # (T, 16)
    hi = hi_ref[:]
    off = off_ref[:]
    values = values_ref[:]                     # (T, V)
    sched = sched_ref[:]                       # (1, B)
    lens16 = jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1) + 1
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, W64), 1)
    sched_cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, B), 1)
    T = lo.shape[0]

    def peek(bitpos):
        # words carry the raw big-endian window bits in int32; all shifts
        # are explicit logical shifts (Mosaic has no unsigned reductions)
        byte = jnp.clip(bitpos >> 3, 0, LW - 1)
        sh = bitpos & 7
        if gather_impl == "native":
            w32 = jnp.take_along_axis(words, byte, axis=1)
        else:
            wcols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, LW), 1)
            w32 = jnp.sum(jnp.where(wcols == byte, words, 0), axis=1,
                          keepdims=True)
        return jax.lax.shift_right_logical(w32, 16 - sh) & 0xFFFF

    def table_rows(t):
        """Select per-lane rows of the (T, 16) range tables: T is tiny, so
        a T-way where-accumulate beats any gather."""
        lo_s = jnp.zeros((CHUNK, 16), jnp.int32)
        hi_s = jnp.zeros((CHUNK, 16), jnp.int32)
        off_s = jnp.zeros((CHUNK, 16), jnp.int32)
        for tt in range(T):
            m = t == tt
            lo_s = jnp.where(m, lo[tt][None, :], lo_s)
            hi_s = jnp.where(m, hi[tt][None, :], hi_s)
            off_s = jnp.where(m, off[tt][None, :], off_s)
        return lo_s, hi_s, off_s

    def lookup(t, w16):
        lo_t, hi_t, off_t = table_rows(t)
        valid = (w16 >= lo_t) & (w16 < hi_t)
        code_len = jnp.sum(jnp.where(valid, lens16, 0), axis=1,
                           keepdims=True)
        lo_sel = jnp.sum(jnp.where(valid, lo_t, 0), axis=1, keepdims=True)
        off_sel = jnp.sum(jnp.where(valid, off_t, 0), axis=1, keepdims=True)
        shift = 16 - jnp.maximum(code_len, 1)
        # offsets arrive pre-rebased into the flat values array
        flat_idx = jnp.clip(off_sel + ((w16 - lo_sel) >> shift), 0, V - 1)
        if gather_impl == "native":
            data = jnp.take(values.reshape(-1), flat_idx.reshape(-1),
                            axis=0).reshape(CHUNK, 1)
        else:
            data = _onehot_row_gather(values, flat_idx)
        return code_len, jnp.where(code_len > 0, data, 0)

    def magnitude(cat, code):
        # decoder.ml:73-79 sign extension
        neg = (code & (1 << jnp.maximum(cat - 1, 0))) == 0
        val = jnp.where(neg & (cat > 0), code - (1 << cat) + 1, code)
        return jnp.where(cat == 0, 0, val)

    def step_once(bitpos, blk, cof, in_ac_c, dc_pred, coefs):
        # in_ac is carried as int32 (Mosaic can't round-trip i1 vectors
        # through the while_loop state) and materialized as a mask here
        in_ac = in_ac_c != 0
        active = blk < seg_blocks
        # comp = sched[blk]: one-hot over the (1, B) schedule row
        comp = jnp.sum(
            jnp.where(sched_cols == jnp.clip(blk, 0, B - 1), sched, 0),
            axis=1, keepdims=True)
        w16 = peek(bitpos)
        code_len, data = lookup(comp + in_ac_c * C, w16)
        run = jnp.where(in_ac, (data >> 4) & 0xF, 0)
        cat = jnp.where(in_ac, data & 0xF, data)
        magpos = bitpos + code_len
        wmag = peek(magpos)
        mag_code = jnp.where(
            cat > 0, wmag >> (PEEK_BITS - jnp.maximum(cat, 1)), 0)
        val = magnitude(cat, mag_code)
        new_bitpos = magpos + cat

        # --- DC phase: dc_pred (CHUNK, C) one-hot update -------------
        comp_cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, C), 1)
        is_comp = comp_cols == comp
        new_dc = jnp.where(is_comp & (~in_ac & active), dc_pred + val,
                           dc_pred)
        dc_val = jnp.sum(jnp.where(is_comp, new_dc, 0), axis=1,
                         keepdims=True)

        # --- AC phase ------------------------------------------------
        is_eob = in_ac & (run == 0) & (cat == 0)
        new_cof_ac = cof + run
        write_ac = in_ac & ~is_eob & active & (new_cof_ac < 64)
        write_dc = ~in_ac & active
        do_write = write_dc | write_ac
        write_cof = jnp.where(write_dc, 0, jnp.clip(new_cof_ac, 0, 63))
        write_val = jnp.where(write_dc, dc_val, val)
        w = jnp.clip(blk, 0, B - 1) * 64 + write_cof
        coefs = jnp.where((out_cols == w) & do_write, write_val, coefs)

        cof_after = jnp.where(in_ac,
                              jnp.where(is_eob, 64, new_cof_ac + 1),
                              1)
        block_done = in_ac & (is_eob | (cof_after >= 64))
        new_blk = jnp.where(block_done & active, blk + 1, blk)
        new_in_ac = jnp.where(block_done, 0,
                              jnp.where(~in_ac, 1, in_ac_c))
        new_cof = jnp.where(block_done, 0, cof_after)
        bitpos = jnp.where(active, new_bitpos, bitpos)
        return (bitpos, new_blk, new_cof, new_in_ac, new_dc, coefs)

    def body(state):
        it, *rest = state
        for _ in range(syms_per_iter):
            rest = step_once(*rest)
        return (it + 1, *rest)

    def cond(state):
        it, _bitpos, blk, _cof, _in_ac, _dc, _coefs = state
        return jnp.any(blk < seg_blocks) & (it < max_iters)

    zc = jnp.zeros((CHUNK, 1), jnp.int32)
    init = (
        jnp.zeros((), jnp.int32),
        zc,                                    # bitpos
        zc,                                    # blk
        zc,                                    # cof
        zc,                                    # in_ac (0/1 int32)
        jnp.zeros((CHUNK, C), jnp.int32),      # dc_pred
        jnp.zeros((CHUNK, W64), jnp.int32),    # coefs
    )
    final = jax.lax.while_loop(cond, body, init)
    out_ref[:] = final[6]


@functools.partial(
    jax.jit,
    static_argnames=("blocks_per_segment", "n_components", "lane_chunk",
                     "gather_impl", "syms_per_iter", "interpret"))
def decode_segments_pallas(segbytes: jax.Array, seg_blocks: jax.Array,
                           comp_sched: jax.Array, lo: jax.Array,
                           hi: jax.Array, offset: jax.Array,
                           values: jax.Array, *, blocks_per_segment: int,
                           n_components: int, lane_chunk: int = 512,
                           gather_impl: str = "onehot",
                           syms_per_iter: int = 2,
                           interpret: bool = False) -> jax.Array:
    """Decode all segments in parallel in a Pallas TPU kernel.

    Arguments and result match tpu_decode.decode_segments_device_range:
    segbytes (S, L) uint8 destuffed zero-padded segments (≥4 guard
    bytes), seg_blocks (S,) int32, comp_sched (blocks_per_segment,)
    int32, range tables from tpu_decode.range_tables. Returns
    (S, blocks_per_segment, 64) int32 zigzag coefficients with DC
    prediction resolved per segment.
    """
    S, L = segbytes.shape
    B = blocks_per_segment
    # precomputed big-endian 32-bit windows (one load per peek), carried
    # as int32 raw bits — the kernel uses logical shifts only
    segu = segbytes.astype(jnp.uint32)
    words = jax.lax.bitcast_convert_type(
        (segu[:, :-3] << 24) | (segu[:, 1:-2] << 16)
        | (segu[:, 2:-1] << 8) | segu[:, 3:], jnp.int32)
    LW = L - 3
    # pad lanes to a chunk multiple and the window dim to the lane tile
    CH = min(lane_chunk, max(8, 1 << (S - 1).bit_length()))
    Sp = -(-S // CH) * CH
    LWp = -(-LW // 128) * 128
    words = jnp.pad(words, ((0, Sp - S), (0, LWp - LW)))
    segb = jnp.pad(seg_blocks.astype(jnp.int32), (0, Sp - S))[:, None]
    sched = comp_sched.astype(jnp.int32)[None, :]

    grid = (Sp // CH,)
    values = values.reshape(1, -1)  # flat compact layout (range_tables)
    kern = functools.partial(
        _kernel, blocks=B, n_components=n_components,
        max_iters=(B * 65 + 64) // syms_per_iter + 2,
        syms_per_iter=syms_per_iter, gather_impl=gather_impl)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CH, LWp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(lo.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(hi.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(offset.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(values.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CH, B * 64), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Sp, B * 64), jnp.int32),
        interpret=interpret,
    )(words, segb, sched, lo.astype(jnp.int32), hi.astype(jnp.int32),
      offset.astype(jnp.int32), values.astype(jnp.int32))
    return out[:S].reshape(S, B, 64)


# ---------------------------------------------------------------------------
# Lanes-major ("transposed") kernel
#
# The kernel above keeps segments on the *sublane* axis and every one-hot
# domain (peek window bytes, value table, coefficient block) on the
# *lane* axis — so each per-symbol one-hot reduce is a cross-lane
# reduction, which Mosaic lowers as a log2(128)-step shuffle tree per
# vreg. The variant below transposes the layout: segments ride the
# 128-lane axis and every one-hot domain rides sublanes, where a reduce
# is (vregs-1) adds + 3 sublane rolls — near element-wise cost. Three
# further shrinks of the per-symbol element count:
#   * peeks read a 32-bit window at 16-bit stride (exactly the RTL
#     reader's refill granule, bitstream_reader.ml:36-57): the window
#     index is bitpos>>4 and the in-window shift bitpos&15, so one
#     half-width reduce replaces the byte-granularity window gather;
#   * the flat values table is packed 4 entries per int32 (entries are
#     (run<<4)|size bytes), quartering the lookup reduce;
#   * small tables (component schedule, canonical range rows) arrive
#     pre-transposed so per-lane selection is a lane-broadcast of
#     (rows, 1) columns, never a relayout.
# Bit-identical output to the sublane-major kernel and the XLA loops.
# ---------------------------------------------------------------------------


def max_lanes_t(L: int, blocks_per_segment: int) -> int:
    """Lane count (multiple of 128) for the lanes-major kernel whose
    per-grid-step state fits the VMEM budget, or 0 if even 128 lanes
    don't fit. Per lane: the stride-16 windows (~NW int32) and ~4 copies
    of the (B*64,) int32 coefficient carry across the while state."""
    NW = max((L - 2) // 2, 1)
    NWp = -(-NW // 8) * 8
    per_lane = 4 * (NWp + 2 * blocks_per_segment * 64)
    lanes = _VMEM_BUDGET // per_lane
    if lanes < 128:
        return 0
    return min(1024, (lanes // 128) * 128)


def _kernel_t(words_ref, segblk_ref, sched_ref, lo_ref, hi_ref, off_ref,
              values_ref, bp0_ref, dc0_ref, out_ref, *, blocks: int,
              n_components: int, n_tables: int, max_iters: int,
              syms_per_iter: int):
    _symbol_loop_t(words_ref[:], segblk_ref[:], sched_ref[:],
                   lo_ref[:], hi_ref[:], off_ref[:], values_ref[:],
                   bp0_ref[:], dc0_ref[:], out_ref, blocks=blocks,
                   n_components=n_components, n_tables=n_tables,
                   max_iters=max_iters, syms_per_iter=syms_per_iter)


def _symbol_loop_t(words, seg_blocks, sched, lo_v, hi_v, off_v, values,
                   bp0, dc0, out_ref, *, blocks: int, n_components: int,
                   n_tables: int, max_iters: int, syms_per_iter: int):
    """Shared lanes-major symbol loop: operands as VALUES so both the
    VMEM-input kernel (_kernel_t) and the DMA-gather kernel
    (_kernel_t_dma) drive it."""
    NW = words.shape[0]
    LANES = words.shape[1]
    B = blocks
    Bp = sched.shape[0]
    C = n_components
    T = n_tables
    V4 = values.shape[0]
    W64 = B * 64
    nw_rows = jax.lax.broadcasted_iota(jnp.int32, (NW, LANES), 0)
    b_rows = jax.lax.broadcasted_iota(jnp.int32, (Bp, LANES), 0)
    v_rows = jax.lax.broadcasted_iota(jnp.int32, (V4, LANES), 0)
    out_rows = jax.lax.broadcasted_iota(jnp.int32, (W64 // 2, LANES), 0)
    c_rows = jax.lax.broadcasted_iota(jnp.int32, (C, LANES), 0)
    lens16 = jax.lax.broadcasted_iota(jnp.int32, (16, LANES), 0) + 1

    def peek(bitpos):
        # 32-bit window at 16-bit stride: in-window shift is bitpos&15,
        # so the peek is a half-width one-hot reduce + logical shifts
        wp = jnp.clip(bitpos >> 4, 0, NW - 1)
        w32 = jnp.sum(jnp.where(nw_rows == wp, words, 0), axis=0,
                      keepdims=True)
        sh = bitpos & 15
        return jax.lax.shift_right_logical(w32, 16 - sh) & 0xFFFF

    def table_rows(t):
        lo_s = jnp.zeros((16, LANES), jnp.int32)
        hi_s = jnp.zeros((16, LANES), jnp.int32)
        off_s = jnp.zeros((16, LANES), jnp.int32)
        for tt in range(T):
            m = t == tt
            lo_s = jnp.where(m, lo_v[:, tt:tt + 1], lo_s)
            hi_s = jnp.where(m, hi_v[:, tt:tt + 1], hi_s)
            off_s = jnp.where(m, off_v[:, tt:tt + 1], off_s)
        return lo_s, hi_s, off_s

    def lookup(t, w16):
        lo_t, hi_t, off_t = table_rows(t)
        valid = (w16 >= lo_t) & (w16 < hi_t)
        code_len = jnp.sum(jnp.where(valid, lens16, 0), axis=0,
                           keepdims=True)
        lo_sel = jnp.sum(jnp.where(valid, lo_t, 0), axis=0, keepdims=True)
        off_sel = jnp.sum(jnp.where(valid, off_t, 0), axis=0,
                          keepdims=True)
        shift = 16 - jnp.maximum(code_len, 1)
        flat_idx = jnp.clip(off_sel + ((w16 - lo_sel) >> shift), 0,
                            V4 * 4 - 1)
        word = jnp.sum(jnp.where(v_rows == flat_idx >> 2, values, 0),
                       axis=0, keepdims=True)
        data = jax.lax.shift_right_logical(
            word, (flat_idx & 3) * 8) & 0xFF
        return code_len, jnp.where(code_len > 0, data, 0)

    def magnitude(cat, code):
        # decoder.ml:73-79 sign extension
        neg = (code & (1 << jnp.maximum(cat - 1, 0))) == 0
        val = jnp.where(neg & (cat > 0), code - (1 << cat) + 1, code)
        return jnp.where(cat == 0, 0, val)

    def step_once(bitpos, blk, cof, in_ac_c, dc_pred, coefs):
        in_ac = in_ac_c != 0
        active = blk < seg_blocks
        comp = jnp.sum(
            jnp.where(b_rows == jnp.clip(blk, 0, B - 1), sched, 0),
            axis=0, keepdims=True)
        w16 = peek(bitpos)
        code_len, data = lookup(comp + in_ac_c * C, w16)
        run = jnp.where(in_ac, (data >> 4) & 0xF, 0)
        cat = jnp.where(in_ac, data & 0xF, data)
        magpos = bitpos + code_len
        wmag = peek(magpos)
        mag_code = jnp.where(
            cat > 0, wmag >> (PEEK_BITS - jnp.maximum(cat, 1)), 0)
        val = magnitude(cat, mag_code)
        new_bitpos = magpos + cat

        # --- DC phase: dc_pred (C, LANES) one-hot update -------------
        is_comp = c_rows == comp
        new_dc = jnp.where(is_comp & (~in_ac & active), dc_pred + val,
                           dc_pred)
        dc_val = jnp.sum(jnp.where(is_comp, new_dc, 0), axis=0,
                         keepdims=True)

        # --- AC phase ------------------------------------------------
        is_eob = in_ac & (run == 0) & (cat == 0)
        new_cof_ac = cof + run
        write_ac = in_ac & ~is_eob & active & (new_cof_ac < 64)
        write_dc = ~in_ac & active
        do_write = write_dc | write_ac
        write_cof = jnp.where(write_dc, 0, jnp.clip(new_cof_ac, 0, 63))
        write_val = jnp.where(write_dc, dc_val, val)
        w = jnp.clip(blk, 0, B - 1) * 64 + write_cof
        # int16-packed carry: two coefficients per int32 row (baseline
        # values are 12-bit-clamped), halving the biggest per-symbol
        # one-hot; each half-slot is written at most once so or-insert
        # composes exactly. Values are saturated to int16 first so an
        # out-of-spec foreign stream whose DC predictor drifts past
        # ±32767 degrades deterministically instead of wrapping
        # (ADVICE r4; valid streams never reach the clamp)
        write_val = jnp.clip(write_val, -32768, 32767)
        ins = jax.lax.shift_left(write_val & 0xFFFF, (w & 1) * 16)
        coefs = jnp.where((out_rows == (w >> 1)) & do_write, coefs | ins,
                          coefs)

        cof_after = jnp.where(in_ac,
                              jnp.where(is_eob, 64, new_cof_ac + 1),
                              1)
        block_done = in_ac & (is_eob | (cof_after >= 64))
        new_blk = jnp.where(block_done & active, blk + 1, blk)
        new_in_ac = jnp.where(block_done, 0,
                              jnp.where(~in_ac, 1, in_ac_c))
        new_cof = jnp.where(block_done, 0, cof_after)
        bitpos = jnp.where(active, new_bitpos, bitpos)
        return (bitpos, new_blk, new_cof, new_in_ac, new_dc, coefs)

    def body(state):
        it, *rest = state
        for _ in range(syms_per_iter):
            rest = step_once(*rest)
        return (it + 1, *rest)

    def cond(state):
        it, _bitpos, blk, _cof, _in_ac, _dc, _coefs = state
        return jnp.any(blk < seg_blocks) & (it < max_iters)

    zl = jnp.zeros((1, LANES), jnp.int32)
    init = (
        jnp.zeros((), jnp.int32),
        bp0,                                   # bitpos (per-lane init)
        zl,                                    # blk
        zl,                                    # cof
        zl,                                    # in_ac (0/1 int32)
        dc0,                                   # dc_pred (per-lane init)
        jnp.zeros((W64 // 2, LANES), jnp.int32),  # int16-packed coefs
    )
    final = jax.lax.while_loop(cond, body, init)
    out_ref[:] = final[6]


@functools.partial(
    jax.jit,
    static_argnames=("blocks_per_segment", "n_components", "lanes",
                     "syms_per_iter", "interpret"))
def decode_segments_pallas_t(segbytes: jax.Array, seg_blocks: jax.Array,
                             comp_sched: jax.Array, lo: jax.Array,
                             hi: jax.Array, offset: jax.Array,
                             values: jax.Array, *,
                             blocks_per_segment: int, n_components: int,
                             lanes: int = 512, syms_per_iter: int = 2,
                             init_bitpos: jax.Array | None = None,
                             init_dc: jax.Array | None = None,
                             interpret: bool = False) -> jax.Array:
    """Lanes-major variant of decode_segments_pallas: same arguments and
    bit-identical result, with segments on the TPU lane axis so the
    per-symbol one-hot reductions run across sublanes.

    init_bitpos (S,) / init_dc (S, n_components) optionally start each
    lane at a bit offset into its window with non-zero DC predictors —
    the hooks the indexed foreign-stream decode uses to run virtual
    segments of one restart-free scan in parallel (entropy/scan.py
    index_scan).

    int16 coefficient contract: the carry packs two coefficients per
    int32 row; decoded values are saturated to [-32768, 32767] in-kernel,
    so out-of-spec foreign streams whose DC predictors drift past int16
    degrade deterministically (valid baseline streams stay within the
    12-bit clamp and are bit-exact — ops/datapath.py COEF_MIN/MAX)."""
    S, L = segbytes.shape
    B = blocks_per_segment
    # stride-16 32-bit windows: window w covers bits [16w, 16w+32) of the
    # segment (pack_segments guarantees ≥4 guard bytes)
    NW = max((L - 2) // 2, 1)
    if L % 4 == 0:
        # stride-1 form (see flat_word_rows: the stride-2 byte slices
        # cost ~5 ms/frame in lane-decimation relayouts on chip)
        shl = jax.lax.shift_left
        shr = jax.lax.shift_right_logical
        sp = jnp.pad(segbytes, ((0, 0), (0, 4)))
        le = jax.lax.bitcast_convert_type(
            sp.reshape(S, -1, 4), jnp.int32)
        be = (shl(le, 24) | (shl(le, 8) & 0x00FF0000)
              | (shr(le, 8) & 0x0000FF00) | (shr(le, 24) & 0xFF))
        K = L // 4
        w_even = be[:, :K]
        w_odd = shl(be[:, :K], 16) | shr(be[:, 1:K + 1], 16)
        words = jnp.stack([w_even, w_odd], axis=2).reshape(
            S, 2 * K)[:, :NW].T
    else:
        segu = segbytes.astype(jnp.uint32)
        s0 = segu[:, 0:2 * NW - 1:2]
        s1 = segu[:, 1:2 * NW:2]
        s2 = segu[:, 2:2 * NW + 1:2]
        s3 = segu[:, 3:2 * NW + 2:2]
        words = jax.lax.bitcast_convert_type(
            (s0 << 24) | (s1 << 16) | (s2 << 8) | s3, jnp.int32).T
    return _run_kernel_t(words, S, seg_blocks, comp_sched, lo, hi, offset,
                         values, blocks_per_segment=B,
                         n_components=n_components, lanes=lanes,
                         syms_per_iter=syms_per_iter,
                         init_bitpos=init_bitpos, init_dc=init_dc,
                         interpret=interpret)


def decode_flat_pallas_t(flat: jax.Array, starts: jax.Array,
                         lens: jax.Array, seg_blocks: jax.Array,
                         comp_sched: jax.Array, lo: jax.Array,
                         hi: jax.Array, offset: jax.Array,
                         values: jax.Array, *, L: int,
                         blocks_per_segment: int, n_components: int,
                         lanes: int = 512, syms_per_iter: int = 2,
                         init_bitpos: jax.Array | None = None,
                         init_dc: jax.Array | None = None,
                         interpret: bool = False) -> jax.Array:
    """Lanes-major kernel fed straight from the flat destuffed buffer —
    the lane materialization itself is word-granular: the dense buffer is
    converted once to stride-16 32-bit windows (vector ops, no gather),
    and each lane gathers 16-byte ROWS of four windows from an 8-byte-
    aligned base. An XLA gather costs ~8-11 ns per gathered ELEMENT
    regardless of its width, so rows of 4 int32 are ~8x cheaper than the
    per-byte (S, L) lane gather they replace. The ≤7 bytes of alignment
    slack ride the kernel's per-lane initial bit cursor (the same hook
    the indexed foreign-stream decode uses); bytes past each segment's
    end are masked to zero at word granularity to keep the reader's
    zero-past-EOF semantics (bitstream_reader.ml).

    ``L`` is the static lane-length bucket (≥ lens.max() + 4 as for
    decode_segments_pallas_t); the wrapper widens it internally by the
    8-byte slack. ``flat`` must be zero-padded to a multiple of 8 with
    ≥ 8 spare bytes. Shares decode_segments_pallas_t's int16 coefficient
    contract (in-kernel saturation; see its docstring)."""
    S = starts.shape[0]
    B = blocks_per_segment
    wl, bp0 = flat_word_rows(flat, starts, lens, L)
    if init_bitpos is not None:
        bp0 = bp0 + init_bitpos.astype(jnp.int32)
    return _run_kernel_t(wl.T, S, seg_blocks, comp_sched, lo, hi, offset,
                         values, blocks_per_segment=B,
                         n_components=n_components, lanes=lanes,
                         syms_per_iter=syms_per_iter, init_bitpos=bp0,
                         init_dc=init_dc, interpret=interpret)


def _kernel_t_dma(row0_ref, segblk_ref, sched_ref, lo_ref, hi_ref,
                  off_ref, values_ref, bp0_ref, lens_ref, dc0_ref,
                  wrows_ref, out_ref, scratch_ref, sems, *, blocks: int,
                  n_components: int, n_tables: int, max_iters: int,
                  syms_per_iter: int, nwr: int, nw: int, lanes: int,
                  n_sems: int):
    """DMA-gather variant of _kernel_t: the per-lane byte windows are
    fetched from the HBM-resident dense word-row array by the kernel's
    own DMAs (one sliced copy per lane, issued asynchronously in waves)
    instead of an XLA gather — measured ~27-30 ms of device time per
    1080p frame for EITHER XLA gather granularity (BENCH_NOTES round 4),
    vs microseconds-per-lane DMA issue cost here.

    wrows: flat (MR·8,) int32 — dense stride-16 windows of the whole
    buffer; a "row" is 8 consecutive words (16 stream bytes, the DMA
    granule). row0 (scalar-prefetched): each lane's first row; the
    ≤15-byte row-alignment slack is already folded into bp0 and lens by
    the caller. scratch: (LANES, nwr·8) VMEM landing pad (one sublane
    row per lane — 1-D src/dst slices keep Mosaic happy; a 3-D scratch
    reshape fails infer-vector-layout); the lane-major landing rows
    transpose in-register to the words-major (NW, LANES) layout the
    symbol loop wants."""
    i = pl.program_id(0)
    base = i * lanes

    def issue(lane, _):
        pltpu.make_async_copy(
            wrows_ref.at[pl.ds(row0_ref[base + lane] * 8, nwr * 8)],
            scratch_ref.at[lane],
            sems.at[lane % n_sems]).start()
        return 0

    jax.lax.fori_loop(0, lanes, issue, 0)

    def wait(lane, _):
        pltpu.make_async_copy(
            wrows_ref.at[pl.ds(row0_ref[base + lane] * 8, nwr * 8)],
            scratch_ref.at[lane],
            sems.at[lane % n_sems]).wait()
        return 0

    jax.lax.fori_loop(0, lanes, wait, 0)

    lane_rows = scratch_ref[:][:, :nw]
    words = lane_rows.T  # (NW, LANES)
    # zero-past-EOF at word granularity: word j covers lane-local bytes
    # [2j, 2j+4); keep the top t = clip(len_eff - 2j, 0, 4) bytes
    lens_eff = lens_ref[:]                      # (1, LANES), slack folded
    j2 = 2 * jax.lax.broadcasted_iota(jnp.int32, (nw, lanes), 0)
    t = jnp.clip(lens_eff - j2, 0, 4)
    mask = jnp.where(t > 0,
                     jax.lax.shift_left(jnp.int32(-1), (4 - t) * 8), 0)
    words = words & mask
    _symbol_loop_t(words, segblk_ref[:], sched_ref[:], lo_ref[:],
                   hi_ref[:], off_ref[:], values_ref[:], bp0_ref[:],
                   dc0_ref[:], out_ref, blocks=blocks,
                   n_components=n_components, n_tables=n_tables,
                   max_iters=max_iters, syms_per_iter=syms_per_iter)


def decode_flat_pallas_dma(flat: jax.Array, starts: jax.Array,
                           lens: jax.Array, seg_blocks: jax.Array,
                           comp_sched: jax.Array, lo: jax.Array,
                           hi: jax.Array, offset: jax.Array,
                           values: jax.Array, *, L: int,
                           blocks_per_segment: int, n_components: int,
                           lanes: int = 512, syms_per_iter: int = 2,
                           init_bitpos: jax.Array | None = None,
                           init_dc: jax.Array | None = None,
                           interpret: bool = False) -> jax.Array:
    """Lanes-major decode fed by in-kernel DMA gathers from the flat
    destuffed buffer (see _kernel_t_dma). Same result contract as
    decode_segments_pallas_t / decode_flat_pallas_t. ``flat`` must be
    zero-padded to a power-of-two length ≥ len+8 (the engine's flat
    buffers are)."""
    S = starts.shape[0]
    B = blocks_per_segment
    T = lo.shape[0]
    # 16-byte row granule: slack ≤ 15 bytes rides the bit cursor
    NW = max((L + 16 + 8 - 2) // 2, 1)
    NWR = -(-NW // 8) + 1
    M = flat.shape[0]
    f = jnp.concatenate([flat, jnp.zeros(16, flat.dtype)]).astype(jnp.uint32)
    M2 = M // 2
    w = ((f[0:2 * M2:2] << 24) | (f[1:2 * M2:2] << 16)
         | (f[2:2 * M2 + 2:2] << 8) | f[3:2 * M2 + 3:2])
    wrows = jax.lax.bitcast_convert_type(w, jnp.int32)
    wrows = jnp.pad(wrows, (0, NWR * 8))  # row0+NWR always in range
    slack = starts & 15
    row0 = starts >> 4
    bp0 = 8 * slack.astype(jnp.int32)
    if init_bitpos is not None:
        bp0 = bp0 + init_bitpos.astype(jnp.int32)
    lens_eff = lens.astype(jnp.int32) + slack.astype(jnp.int32)
    if init_dc is None:
        init_dc = jnp.zeros((S, n_components), jnp.int32)

    LANES = min(lanes, max(128, -(-S // 128) * 128))
    Sp = -(-S // LANES) * LANES
    pad = Sp - S
    row0 = jnp.pad(row0.astype(jnp.int32), (0, pad))
    segb = jnp.pad(seg_blocks.astype(jnp.int32), (0, pad))[None, :]
    bp0 = jnp.pad(bp0, (0, pad))[None, :]
    lens_p = jnp.pad(lens_eff, (0, pad))[None, :]
    dc0 = jnp.pad(init_dc.astype(jnp.int32), ((0, pad), (0, 0))).T
    Bp = -(-B // 8) * 8
    sched = jnp.pad(comp_sched.astype(jnp.int32), (0, Bp - B))[:, None]
    vals = values.astype(jnp.int32).reshape(-1, 4)
    packed = (vals[:, 0] | (vals[:, 1] << 8) | (vals[:, 2] << 16)
              | (vals[:, 3] << 24))
    V4 = packed.shape[0]
    V4p = -(-V4 // 8) * 8
    packed = jnp.pad(packed, (0, V4p - V4))[:, None]
    lo_t = lo.astype(jnp.int32).T
    hi_t = hi.astype(jnp.int32).T
    off_t = offset.astype(jnp.int32).T

    N_SEMS = 16
    kern = functools.partial(
        _kernel_t_dma, blocks=B, n_components=n_components, n_tables=T,
        max_iters=(B * 65 + 64) // syms_per_iter + 2,
        syms_per_iter=syms_per_iter, nwr=NWR, nw=NW, lanes=LANES,
        n_sems=N_SEMS)
    # index maps receive (grid_idx, *scalar_prefetch_refs)
    col = lambda i, _r0: (0, i)  # noqa: E731
    rep = lambda i, _r0: (0, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Sp // LANES,),
        in_specs=[
            pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, 1), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((16, T), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((16, T), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((16, T), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((V4p, 1), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_components, LANES), col,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # wrows stays in HBM
        ],
        out_specs=pl.BlockSpec((B * 32, LANES), col,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((LANES, NWR * 8), jnp.int32),
            pltpu.SemaphoreType.DMA((N_SEMS,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * 32, Sp), jnp.int32),
        interpret=interpret,
    )(row0, segb, sched, lo_t, hi_t, off_t, packed, bp0, lens_p, dc0,
      wrows)
    lo16 = (out << 16) >> 16
    hi16 = out >> 16
    full = jnp.stack([lo16, hi16], axis=1).reshape(B * 64, Sp)
    return full[:, :S].T.reshape(S, B, 64)


def flat_word_rows(flat: jax.Array, starts: jax.Array, lens: jax.Array,
                   L: int, granule: int = 8
                   ) -> tuple[jax.Array, jax.Array]:
    """Traceable lane materialization for decode_flat_pallas_t: (S, NW)
    int32 stride-16 windows gathered as ``granule``-byte rows from
    granule-aligned bases, plus the (S,) initial bit cursor covering the
    alignment slack. The XLA row gather costs ~100 ns per gathered ROW
    on the tunneled v5e regardless of width; the measured cost is also
    granule-INSENSITIVE (5.3-5.5 ms across 8..64-byte rows at 1080p), so
    the default stays 8 — the smallest slack keeps the kernel's peek
    window row count (NW) minimal, which the one-hot peeks pay for
    directly. granule ∈ {8, 16, 32, 64}."""
    S = starts.shape[0]
    R = granule // 2                 # stride-16 words per row
    NW = max((L + granule + 8 - 2) // 2, 1)
    NWr = -(-NW // R) + 1
    M = flat.shape[0]
    # dense big-endian stride-16 windows WITHOUT strided byte slices:
    # four stride-2 uint8 slices measured 5.25 ms/frame on chip (lane-
    # decimation relayouts); a width-changing bitcast to int32 words +
    # byteswap + one 16-bit shift-combine is stride-1 throughout
    # (~0.3 ms). Window 2k is bswap(w32[k]); window 2k+1 straddles
    # w32[k], w32[k+1].
    shl = jax.lax.shift_left
    shr = jax.lax.shift_right_logical
    fp = jnp.concatenate([flat, jnp.zeros(8, flat.dtype)])
    le = jax.lax.bitcast_convert_type(fp.reshape(-1, 4), jnp.int32)
    be = (shl(le, 24) | (shl(le, 8) & 0x00FF0000)
          | (shr(le, 8) & 0x0000FF00) | (shr(le, 24) & 0xFF))
    K = M // 4
    w_even = be[:K]
    w_odd = shl(be[:K], 16) | shr(be[1:K + 1], 16)
    rows = jnp.stack([w_even, w_odd], axis=1).reshape(-1, R)
    slack = starts % granule
    a_rows = starts // granule
    ridx = jnp.clip(a_rows[:, None] + jnp.arange(NWr, dtype=starts.dtype),
                    0, rows.shape[0] - 1)
    wl = jnp.take(rows, ridx, axis=0).reshape(S, NWr * R)[:, :NW]
    # zero-past-EOF at word granularity: word j covers lane-local bytes
    # [2j, 2j+4); keep the top t = clip(slack+len - 2j, 0, 4) bytes
    lens_eff = lens + slack
    j2 = 2 * jnp.arange(NW, dtype=jnp.int32)[None, :]
    t = jnp.clip(lens_eff[:, None] - j2, 0, 4).astype(jnp.uint32)
    umask = jnp.where(
        t > 0,
        jnp.uint32(0xFFFFFFFF) << ((jnp.uint32(4) - t) * 8),
        jnp.uint32(0))
    wl = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(wl, jnp.uint32) & umask, jnp.int32)
    return wl, 8 * slack.astype(jnp.int32)


def _run_kernel_t(words: jax.Array, S: int, seg_blocks: jax.Array,
                  comp_sched: jax.Array, lo: jax.Array, hi: jax.Array,
                  offset: jax.Array, values: jax.Array, *,
                  blocks_per_segment: int, n_components: int, lanes: int,
                  syms_per_iter: int, init_bitpos, init_dc,
                  interpret: bool) -> jax.Array:
    """Pad + grid + pallas_call tail shared by the (S, L) byte-lane and
    flat word-row entries. ``words`` is (NW, S) int32."""
    NW = words.shape[0]
    B = blocks_per_segment
    T = lo.shape[0]
    LANES = min(lanes, max(128, -(-S // 128) * 128))
    Sp = -(-S // LANES) * LANES
    NWp = -(-NW // 8) * 8
    words = jnp.pad(words, ((0, NWp - NW), (0, Sp - S)))
    segb = jnp.pad(seg_blocks.astype(jnp.int32), (0, Sp - S))[None, :]
    if init_bitpos is None:
        init_bitpos = jnp.zeros(S, jnp.int32)
    if init_dc is None:
        init_dc = jnp.zeros((S, n_components), jnp.int32)
    bp0 = jnp.pad(init_bitpos.astype(jnp.int32), (0, Sp - S))[None, :]
    dc0 = jnp.pad(init_dc.astype(jnp.int32), ((0, Sp - S), (0, 0))).T
    Bp = -(-B // 8) * 8
    sched = jnp.pad(comp_sched.astype(jnp.int32), (0, Bp - B))[:, None]
    # pack the flat values (uint8 entries) 4 per int32, little-endian
    vals = values.astype(jnp.int32).reshape(-1, 4)
    packed = (vals[:, 0] | (vals[:, 1] << 8) | (vals[:, 2] << 16)
              | (vals[:, 3] << 24))
    V4 = packed.shape[0]
    V4p = -(-V4 // 8) * 8
    packed = jnp.pad(packed, (0, V4p - V4))[:, None]
    lo_t = lo.astype(jnp.int32).T
    hi_t = hi.astype(jnp.int32).T
    off_t = offset.astype(jnp.int32).T

    grid = (Sp // LANES,)
    kern = functools.partial(
        _kernel_t, blocks=B, n_components=n_components, n_tables=T,
        max_iters=(B * 65 + 64) // syms_per_iter + 2,
        syms_per_iter=syms_per_iter)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((NWp, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, T), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, T), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, T), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V4p, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_components, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B * 32, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * 32, Sp), jnp.int32),
        interpret=interpret,
    )(words, segb, sched, lo_t, hi_t, off_t, packed, bp0, dc0)
    # unpack the int16 pairs (sign-extending arithmetic shifts)
    lo16 = (out << 16) >> 16
    hi16 = out >> 16
    full = jnp.stack([lo16, hi16], axis=1).reshape(B * 64, Sp)
    return full[:, :S].T.reshape(S, B, 64)


# ---------------------------------------------------------------------------
# Block-synchronized lanes-major kernel (long segments / streamed output)
#
# The lanes-major kernel above carries the whole (B·64, LANES) coefficient
# block in the while-loop state — impossible for long segments (ri=row ⇒
# B≈720 ⇒ 23 MB of carry). This variant processes ONE block index at a
# time across all lanes (the schedule is identical per lane, so the
# component, table rows and ZRL/EOB context of the current block are
# scalars), with three consequences:
#   * the coefficient carry shrinks to one (64, LANES) block buffer;
#   * finished blocks stream to the output ref through a (WIN·64, LANES)
#     window slab — the out BlockSpec walks block windows on a second
#     grid axis while per-lane cursor state (bitpos, dc_pred) persists in
#     VMEM scratch across window steps (TPU grids run sequentially);
#   * the per-symbol scatter one-hot is 64 rows instead of B·64.
# The price is block-granularity synchronization: every lane waits for
# the chunk's slowest lane each block. Length-sorted lane packing (the
# engine's load balancing) keeps that small.
#
# This is the streamed long-segment decode VERDICT r2 item 5 calls for —
# the analog of the RTL reader's refill-as-you-go window + per-block
# start/done handshake (bitstream_reader.ml:36-57,
# scan_controller.ml:331-433): only the byte windows stay whole-segment
# resident (~L/2 int32 per lane), coefficients never do.
# ---------------------------------------------------------------------------

BS_LANES = 128
BS_WIN = 16  # blocks per output window


def max_win_bs(L: int) -> int:
    """Window size (blocks) for the block-synchronized kernel, or 0 when
    even the byte windows don't fit VMEM at BS_LANES lanes."""
    NW = max((L - 2) // 2, 1)
    NWp = -(-NW // 8) * 8
    words_bytes = 4 * NWp * BS_LANES
    win_bytes = 4 * BS_WIN * 64 * BS_LANES * 2
    if words_bytes + win_bytes > _VMEM_BUDGET:
        return 0
    return BS_WIN


def _kernel_bs(words_ref, segblk_ref, lo_ref, hi_ref, off_ref, values_ref,
               out_ref, bitpos_ref, dc_ref, *, blocks: int, win: int,
               n_components: int, n_tables: int, comp_sched: tuple,
               syms_per_iter: int):
    NW = words_ref.shape[0]
    LANES = words_ref.shape[1]
    C = n_components
    V4 = values_ref.shape[0]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        bitpos_ref[:] = jnp.zeros((1, LANES), jnp.int32)
        dc_ref[:] = jnp.zeros((C, LANES), jnp.int32)

    words = words_ref[:]
    seg_blocks = segblk_ref[:]
    values = values_ref[:]
    nw_rows = jax.lax.broadcasted_iota(jnp.int32, (NW, LANES), 0)
    v_rows = jax.lax.broadcasted_iota(jnp.int32, (V4, LANES), 0)
    buf_rows = jax.lax.broadcasted_iota(jnp.int32, (64, LANES), 0)
    c_rows = jax.lax.broadcasted_iota(jnp.int32, (C, LANES), 0)
    lens16 = jax.lax.broadcasted_iota(jnp.int32, (16, LANES), 0) + 1

    def peek(bitpos):
        wp = jnp.clip(bitpos >> 4, 0, NW - 1)
        w32 = jnp.sum(jnp.where(nw_rows == wp, words, 0), axis=0,
                      keepdims=True)
        sh = bitpos & 15
        return jax.lax.shift_right_logical(w32, 16 - sh) & 0xFFFF

    def lookup2(t_dc, t_ac, in_ac, w16):
        """Range decode against the two static table rows of this block's
        component (DC vs AC selected per lane by phase)."""
        lo_t = jnp.where(in_ac, lo_ref[:, t_ac:t_ac + 1],
                         lo_ref[:, t_dc:t_dc + 1])
        hi_t = jnp.where(in_ac, hi_ref[:, t_ac:t_ac + 1],
                         hi_ref[:, t_dc:t_dc + 1])
        off_t = jnp.where(in_ac, off_ref[:, t_ac:t_ac + 1],
                          off_ref[:, t_dc:t_dc + 1])
        valid = (w16 >= lo_t) & (w16 < hi_t)
        code_len = jnp.sum(jnp.where(valid, lens16, 0), axis=0,
                           keepdims=True)
        lo_sel = jnp.sum(jnp.where(valid, lo_t, 0), axis=0, keepdims=True)
        off_sel = jnp.sum(jnp.where(valid, off_t, 0), axis=0,
                          keepdims=True)
        shift = 16 - jnp.maximum(code_len, 1)
        flat_idx = jnp.clip(off_sel + ((w16 - lo_sel) >> shift), 0,
                            V4 * 4 - 1)
        word = jnp.sum(jnp.where(v_rows == flat_idx >> 2, values, 0),
                       axis=0, keepdims=True)
        data = jax.lax.shift_right_logical(
            word, (flat_idx & 3) * 8) & 0xFF
        return code_len, jnp.where(code_len > 0, data, 0)

    def magnitude(cat, code):
        neg = (code & (1 << jnp.maximum(cat - 1, 0))) == 0
        val = jnp.where(neg & (cat > 0), code - (1 << cat) + 1, code)
        return jnp.where(cat == 0, 0, val)

    bitpos = bitpos_ref[:]
    dc_pred = dc_ref[:]

    for bw in range(win):
        blk = j * win + bw
        # the schedule is periodic with the MCU and win is a multiple of
        # the MCU length, so the block's component is a compile-time
        # scalar even though the window index j is a grid value
        comp = int(comp_sched[bw % len(comp_sched)])
        t_dc, t_ac = comp, comp + C

        def step_once(bitpos, cof, in_ac_c, done_c, dc_pred, buf,
                      t_dc=t_dc, t_ac=t_ac, comp=comp, blk=blk):
            in_ac = in_ac_c != 0
            live = (done_c == 0) & (blk < seg_blocks)
            w16 = peek(bitpos)
            code_len, data = lookup2(t_dc, t_ac, in_ac, w16)
            run = jnp.where(in_ac, (data >> 4) & 0xF, 0)
            cat = jnp.where(in_ac, data & 0xF, data)
            magpos = bitpos + code_len
            wmag = peek(magpos)
            mag_code = jnp.where(
                cat > 0, wmag >> (PEEK_BITS - jnp.maximum(cat, 1)), 0)
            val = magnitude(cat, mag_code)
            new_bitpos = magpos + cat

            # DC phase
            is_comp = c_rows == comp
            new_dc = jnp.where(is_comp & (~in_ac & live), dc_pred + val,
                               dc_pred)
            dc_val = jnp.sum(jnp.where(is_comp, new_dc, 0), axis=0,
                             keepdims=True)

            # AC phase
            is_eob = in_ac & (run == 0) & (cat == 0)
            new_cof_ac = cof + run
            write_ac = in_ac & ~is_eob & live & (new_cof_ac < 64)
            write_dc = ~in_ac & live
            do_write = write_dc | write_ac
            write_cof = jnp.where(write_dc, 0,
                                  jnp.clip(new_cof_ac, 0, 63))
            write_val = jnp.where(write_dc, dc_val, val)
            buf = jnp.where((buf_rows == write_cof) & do_write,
                            write_val, buf)

            cof_after = jnp.where(in_ac,
                                  jnp.where(is_eob, 64, new_cof_ac + 1),
                                  1)
            block_done = in_ac & (is_eob | (cof_after >= 64))
            new_done = jnp.where(block_done & live, 1, done_c)
            new_in_ac = jnp.where(block_done, 0,
                                  jnp.where(~in_ac, 1, in_ac_c))
            new_cof = jnp.where(block_done, 0, cof_after)
            bitpos = jnp.where(live, new_bitpos, bitpos)
            return (bitpos, new_cof, new_in_ac, new_done, new_dc, buf)

        def body(state, step_once=step_once):
            it, *rest = state
            for _ in range(syms_per_iter):
                rest = step_once(*rest)
            return (it + 1, *rest)

        def cond(state, blk=blk):
            it, _bitpos, _cof, _in_ac, done, _dc, _buf = state
            live = (done == 0) & (blk < seg_blocks)
            return jnp.any(live) & (it < (66 + 64) // syms_per_iter + 2)

        zl = jnp.zeros((1, LANES), jnp.int32)
        init = (jnp.zeros((), jnp.int32), bitpos, zl, zl, zl, dc_pred,
                jnp.zeros((64, LANES), jnp.int32))
        final = jax.lax.while_loop(cond, body, init)
        bitpos, dc_pred = final[1], final[5]
        out_ref[bw * 64:(bw + 1) * 64, :] = final[6]

    bitpos_ref[:] = bitpos
    dc_ref[:] = dc_pred


@functools.partial(
    jax.jit,
    static_argnames=("blocks_per_segment", "n_components", "comp_sched_t",
                     "win", "syms_per_iter", "interpret"))
def decode_segments_pallas_bs(segbytes: jax.Array, seg_blocks: jax.Array,
                              lo: jax.Array, hi: jax.Array,
                              offset: jax.Array, values: jax.Array, *,
                              blocks_per_segment: int, n_components: int,
                              comp_sched_t: tuple, win: int = BS_WIN,
                              syms_per_iter: int = 2,
                              interpret: bool = False) -> jax.Array:
    """Block-synchronized streamed decode for long segments. Same result
    contract as decode_segments_pallas_t; the component schedule must be
    static (a tuple) because each block's tables are baked per step.
    ``win`` is a hint — the effective window is the smallest multiple of
    the schedule's MCU period ≥ win (so each in-window block's component
    is compile-time static regardless of the window index)."""
    S, L = segbytes.shape
    B = blocks_per_segment
    T = lo.shape[0]
    assert len(comp_sched_t) == B
    period = next(p for p in range(1, B + 1)
                  if B % p == 0
                  and comp_sched_t == comp_sched_t[:p] * (B // p))
    win = min(-(-win // period) * period, B)
    comp_sched_t = comp_sched_t[:period] * (win // period)
    NW = max((L - 2) // 2, 1)
    segu = segbytes.astype(jnp.uint32)
    s0 = segu[:, 0:2 * NW - 1:2]
    s1 = segu[:, 1:2 * NW:2]
    s2 = segu[:, 2:2 * NW + 1:2]
    s3 = segu[:, 3:2 * NW + 2:2]
    words = jax.lax.bitcast_convert_type(
        (s0 << 24) | (s1 << 16) | (s2 << 8) | s3, jnp.int32).T
    LANES = BS_LANES
    Sp = -(-S // LANES) * LANES
    NWp = -(-NW // 8) * 8
    words = jnp.pad(words, ((0, NWp - NW), (0, Sp - S)))
    segb = jnp.pad(seg_blocks.astype(jnp.int32), (0, Sp - S))[None, :]
    Bp = -(-B // win) * win
    vals = values.astype(jnp.int32).reshape(-1, 4)
    packed = (vals[:, 0] | (vals[:, 1] << 8) | (vals[:, 2] << 16)
              | (vals[:, 3] << 24))
    V4 = packed.shape[0]
    V4p = -(-V4 // 8) * 8
    packed = jnp.pad(packed, (0, V4p - V4))[:, None]

    grid = (Sp // LANES, Bp // win)
    kern = functools.partial(
        _kernel_bs, blocks=B, win=win, n_components=n_components,
        n_tables=T, comp_sched=comp_sched_t, syms_per_iter=syms_per_iter)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((NWp, LANES), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, T), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, T), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, T), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V4p, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((win * 64, LANES), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp * 64, Sp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, LANES), jnp.int32),
                        pltpu.VMEM((n_components, LANES), jnp.int32)],
        interpret=interpret,
    )(words, segb, lo.astype(jnp.int32).T, hi.astype(jnp.int32).T,
      offset.astype(jnp.int32).T, packed)
    return out[:B * 64, :S].T.reshape(S, B, 64)


def decode_scan_pallas(segments: list[bytes], comp_idx: np.ndarray,
                       blocks_per_segment: int, tables,
                       gather_impl: str = "onehot",
                       layout: str = "sublanes",
                       interpret: bool | None = None) -> np.ndarray:
    """Drop-in alternative to tpu_decode.decode_scan_tpu running the
    Huffman loop in the Pallas kernel (layout: 'sublanes' = original
    kernel, 'lanes' = lanes-major transposed kernel, 'bs' =
    block-synchronized streamed kernel). Returns (n_blocks, 64) int32."""
    from .tpu_decode import pack_segments, range_tables

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_blocks = len(comp_idx)
    segbytes, _lens = pack_segments(segments)
    S = len(segments)
    seg_blocks = np.full(S, blocks_per_segment, dtype=np.int32)
    if n_blocks % blocks_per_segment:
        seg_blocks[-1] = n_blocks % blocks_per_segment
    comp_sched = np.asarray(comp_idx[:blocks_per_segment], dtype=np.int32)
    lo, hi, off, values = range_tables(tables)
    n_components = lo.shape[0] // 2
    args = (jnp.asarray(segbytes), jnp.asarray(seg_blocks),
            jnp.asarray(comp_sched), jnp.asarray(lo), jnp.asarray(hi),
            jnp.asarray(off), jnp.asarray(values))
    if layout == "lanes":
        out = decode_segments_pallas_t(
            *args, blocks_per_segment=blocks_per_segment,
            n_components=n_components, interpret=interpret)
    elif layout == "bs":
        out = decode_segments_pallas_bs(
            args[0], args[1], *args[3:],
            blocks_per_segment=blocks_per_segment,
            n_components=n_components,
            comp_sched_t=tuple(int(x) for x in comp_sched),
            win=min(BS_WIN, blocks_per_segment), interpret=interpret)
    else:
        out = decode_segments_pallas(
            *args, blocks_per_segment=blocks_per_segment,
            n_components=n_components, gather_impl=gather_impl,
            interpret=interpret)
    return np.asarray(out).reshape(S * blocks_per_segment, 64)[:n_blocks]
