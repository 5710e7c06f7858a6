"""TPU-side vectorized Huffman decoder: one restart segment per lane.

The TPU-native re-formulation of the reference's entropy hardware:
- the 16 parallel length-hypothesis matchers of Codeword_decoder
  (jpeg/hardcaml/src/codeword_decoder.ml:31-76) become a flat 2^16 LUT
  gather (peek 16 bits → (length, data) in one load);
- the per-block FSM of Codeblock_decoder (codeblock_decoder.ml:143-244)
  becomes a lax.while_loop whose state is vectorized over hundreds/
  thousands of segments — every iteration decodes one codeword+magnitude
  in every active lane.

Entropy coding is bit-serial *within* a segment; restart intervals (which
this framework's encoder always emits) supply the parallel axis. With a
one-MCU-row (or one-MCU) restart interval, a 1080p frame yields 68 (or
8160) independent lanes — and batched frames multiply that.

Bit-exact with the host decoders (entropy/scan.py, native/entropy.cpp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .tables import DecoderTables

PEEK_BITS = 16


def expand_luts(tables: DecoderTables) -> tuple[np.ndarray, np.ndarray]:
    """Per-component flat LUTs widened to 2^16 entries: index = the next
    16 bits of the stream; entry = (code_length << 16) | data."""
    def expand(maxbits, lut, off):
        comps = []
        for c in range(len(maxbits)):
            part = lut[off[c]:off[c + 1]]
            reps = 1 << (PEEK_BITS - int(maxbits[c]))
            comps.append(np.repeat(part, reps))
        return np.stack(comps)

    dc = expand(tables.dc_maxbits, tables.dc_lut, tables.dc_off)
    ac = expand(tables.ac_maxbits, tables.ac_lut, tables.ac_off)
    return dc.astype(np.int32), ac.astype(np.int32)


def range_tables(tables: DecoderTables
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Canonical-range decode tables — the TPU analog of the reference's
    16 parallel length-hypothesis matchers (codeword_decoder.ml:31-76),
    but as branch-free vector compares instead of a 2^16 LUT gather.

    Canonical Huffman codes of each length occupy one contiguous range of
    the 16-bit peek window, and the ranges are disjoint across lengths, so
    a peeked window matches exactly one (or zero) length. Returns, with
    row t = component c's DC table (t=c) or AC table (t=C+c):
      lo, hi:  (T, 16) int32 — window-domain range [lo, hi) of length l+1
               (empty ranges have lo=hi=0)
      offset:  (T, 16) int32 — position of length l+1's first code's data
               in the flat values array (pre-rebased per table, so a
               matched window needs no table-row term)
      values:  (V,) int32 flat — every table's decoded data in canonical
               order, concatenated compactly (DC: size category; AC:
               (run<<4)|size), zero-padded to a 128 multiple. A standard
               DC/AC table pair is 12+162 entries, so the flat array is
               ~3x smaller than per-table 256-entry rows — which sizes
               the one-hot reduction in the Pallas kernel's hot loop.
    """
    luts = list(tables.dc_luts) + list(tables.ac_luts)
    T = len(luts)
    lo = np.zeros((T, 16), np.int32)
    hi = np.zeros((T, 16), np.int32)
    offset = np.zeros((T, 16), np.int32)
    flat: list[int] = []
    for t, lut in enumerate(luts):
        mb = lut.max_bits
        for l in range(1, 17):
            idxs = np.flatnonzero(lut.lengths == l)
            if idxs.size == 0:
                continue
            codes = np.unique(idxs >> (mb - l))
            lo[t, l - 1] = codes[0] << (16 - l)
            hi[t, l - 1] = int(codes[-1] + 1) << (16 - l)
            offset[t, l - 1] = len(flat)
            for c in codes:
                flat.append(int(lut.data[int(c) << (mb - l)]))
    V = max(128, -(-len(flat) // 128) * 128)
    values = np.zeros(V, np.int32)
    values[:len(flat)] = flat
    return lo, hi, offset, values


def pack_segments(segments: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Pad segments into an (S, L) uint8 matrix (+4 guard bytes) and
    return it with per-segment byte lengths."""
    lens = np.array([len(s) for s in segments], dtype=np.int32)
    L = int(lens.max()) + 4
    out = np.zeros((len(segments), L), dtype=np.uint8)
    for i, s in enumerate(segments):
        out[i, :len(s)] = np.frombuffer(s, dtype=np.uint8)
    return out, lens


def _decode_loop(segbytes, seg_blocks, comp_sched, blocks_per_segment,
                 n_components, codeword_lookup):
    """Shared vectorized Huffman decode loop; ``codeword_lookup(t, w16)``
    (t = comp + C·in_ac) supplies the codeword decode strategy."""
    S, L = segbytes.shape
    B = blocks_per_segment
    C = n_components
    lane = jnp.arange(S)
    # precomputed 32-bit big-endian windows: one gather per peek instead
    # of three byte gathers (pack_segments provides ≥4 guard bytes)
    segu = segbytes.astype(jnp.uint32)
    words = ((segu[:, :-3] << 24) | (segu[:, 1:-2] << 16)
             | (segu[:, 2:-1] << 8) | segu[:, 3:])
    LW = L - 3

    def peek(bitpos):
        byte = jnp.clip(bitpos >> 3, 0, LW - 1)
        sh = (bitpos & 7).astype(jnp.uint32)
        w32 = jnp.take_along_axis(words, byte[:, None], axis=1)[:, 0]
        return ((w32 >> (16 - sh)) & 0xFFFF).astype(jnp.int32)

    def magnitude(cat, code):
        # decoder.ml:73-79 sign extension
        neg = (code & (1 << jnp.maximum(cat - 1, 0))) == 0
        val = jnp.where(neg & (cat > 0), code - (1 << cat) + 1, code)
        return jnp.where(cat == 0, 0, val)

    def step_once(bitpos, blk, cof, in_ac, dc_pred, coefs):
        active = blk < seg_blocks
        comp = comp_sched[jnp.clip(blk, 0, B - 1)]
        w16 = peek(bitpos)
        code_len, data = codeword_lookup(comp + jnp.where(in_ac, C, 0), w16)
        run = jnp.where(in_ac, (data >> 4) & 0xF, 0)
        cat = jnp.where(in_ac, data & 0xF, data)
        # magnitude bits follow the codeword
        magpos = bitpos + code_len
        wmag = peek(magpos)
        mag_code = jnp.where(cat > 0, wmag >> (PEEK_BITS - jnp.maximum(cat, 1)),
                             0)
        val = magnitude(cat, mag_code)
        new_bitpos = magpos + cat

        # --- DC phase ---
        new_dc = dc_pred.at[lane, comp].add(jnp.where(~in_ac & active,
                                                      val, 0))
        dc_val = new_dc[lane, comp]

        # --- AC phase ---
        is_eob = in_ac & (run == 0) & (cat == 0)
        new_cof_ac = cof + run
        write_ac = in_ac & ~is_eob & active & (new_cof_ac < 64)
        write_dc = ~in_ac & active
        # single fused coefficient scatter: DC and AC writes are mutually
        # exclusive per lane, so select the index/value and write once
        do_write = write_dc | write_ac
        write_blk = jnp.where(do_write, blk, B)
        write_cof = jnp.where(write_dc, 0, jnp.clip(new_cof_ac, 0, 63))
        write_val = jnp.where(write_dc, dc_val, val)
        coefs = coefs.at[lane, write_blk, write_cof].set(
            write_val, mode="drop")

        cof_after = jnp.where(in_ac,
                              jnp.where(is_eob, 64, new_cof_ac + 1),
                              1)
        block_done = in_ac & (is_eob | (cof_after >= 64))
        new_blk = jnp.where(block_done & active, blk + 1, blk)
        new_in_ac = jnp.where(block_done, False,
                              jnp.where(~in_ac, True, in_ac))
        new_cof = jnp.where(block_done, 0, cof_after)
        # reset DC predictors never happens inside a segment
        bitpos = jnp.where(active, new_bitpos, bitpos)
        return (bitpos, new_blk, new_cof, new_in_ac, new_dc, coefs)

    # several codewords per loop trip: at small lane counts the loop is
    # bound by per-iteration dispatch, not element throughput
    SYMS_PER_ITER = 4

    def body(state):
        it, *rest = state
        for _ in range(SYMS_PER_ITER):
            rest = step_once(*rest)
        return (it + 1, *rest)

    # every sub-step consumes one codeword; a block holds ≤ 64 codewords,
    # so this bound is only hit by corrupt streams (graceful stop, like the
    # RTL error strobes — codeblock_decoder.ml:19-26)
    max_iters = (B * 65 + 64) // SYMS_PER_ITER + 2

    def cond(state):
        it, _bitpos, blk, _cof, _in_ac, _dc, _coefs = state
        return jnp.any(blk < seg_blocks) & (it < max_iters)

    # derive the init carry from the inputs so its varying-mesh-axes type
    # matches the body outputs when this runs inside shard_map
    zero_lane = seg_blocks * 0
    init = (
        jnp.zeros((), jnp.int32),           # iteration counter
        zero_lane,                          # bitpos
        zero_lane,                          # block index in segment
        zero_lane,                          # coef index
        zero_lane < 0,                      # in AC phase (all False)
        jnp.zeros((1, C), jnp.int32) + zero_lane[:, None],  # dc predictors
        (jnp.zeros((1, B + 1, 64), jnp.int32)
         + zero_lane[:, None, None]),       # coefs (+1 slot absorbs drops)
    )
    final = jax.lax.while_loop(cond, body, init)
    return final[6][:, :B, :]


@functools.partial(jax.jit, static_argnames=("blocks_per_segment",))
def decode_segments_device(segbytes: jax.Array, seg_blocks: jax.Array,
                           comp_sched: jax.Array, dc_lut: jax.Array,
                           ac_lut: jax.Array, *,
                           blocks_per_segment: int) -> jax.Array:
    """Decode all segments in parallel on device (flat-LUT codewords).

    segbytes:   (S, L) uint8 destuffed segment bytes (zero padded).
    seg_blocks: (S,) int32 blocks in each segment (last may be short).
    comp_sched: (blocks_per_segment,) int32 scan-component index of each
                block position within a segment.
    dc_lut/ac_lut: (C, 65536) int32 expanded LUTs.
    Returns (S, blocks_per_segment, 64) int32 zigzag coefficients with DC
    prediction resolved per segment.
    """
    C = dc_lut.shape[0]
    # one fused table: rows [0,C) = DC, rows [C,2C) = AC → a single gather
    # per iteration instead of two
    luts = jnp.concatenate([dc_lut, ac_lut], axis=0)

    def lookup(t, w16):
        entry = luts[t, w16]
        return entry >> 16, entry & 0xFFFF

    return _decode_loop(segbytes, seg_blocks, comp_sched,
                        blocks_per_segment, C, lookup)


@functools.partial(jax.jit, static_argnames=("blocks_per_segment",))
def decode_segments_device_range(segbytes: jax.Array, seg_blocks: jax.Array,
                                 comp_sched: jax.Array, lo: jax.Array,
                                 hi: jax.Array, offset: jax.Array,
                                 values: jax.Array, *,
                                 blocks_per_segment: int) -> jax.Array:
    """Decode all segments in parallel on device, resolving codewords by
    canonical-range compares (range_tables) instead of a 2^16 LUT gather:
    16 branch-free window-range tests (pure VPU) + one gather into the
    ~1 KB per-table values array. Same contract and bit-identical output
    as decode_segments_device on valid streams; the memory-friendly
    formulation for TPUs, where the flat LUT's 1.5 MB random gather per
    symbol is the bottleneck."""
    C = lo.shape[0] // 2
    lens16 = jnp.arange(1, 17, dtype=jnp.int32)

    def lookup(t, w16):
        lo_t, hi_t, off_t = lo[t], hi[t], offset[t]       # (S,16) each
        w = w16[:, None]
        valid = (w >= lo_t) & (w < hi_t)                  # one-hot over l
        code_len = jnp.sum(jnp.where(valid, lens16, 0), axis=1)
        lo_sel = jnp.sum(jnp.where(valid, lo_t, 0), axis=1)
        off_sel = jnp.sum(jnp.where(valid, off_t, 0), axis=1)
        shift = 16 - jnp.maximum(code_len, 1)
        idx = off_sel + ((w16 - lo_sel) >> shift)   # pre-rebased offsets
        data = values[jnp.clip(idx, 0, values.shape[0] - 1)]
        return code_len, jnp.where(code_len > 0, data, 0)

    return _decode_loop(segbytes, seg_blocks, comp_sched,
                        blocks_per_segment, C, lookup)


def decode_scan_tpu(segments: list[bytes], comp_idx: np.ndarray,
                    blocks_per_segment: int, tables: DecoderTables,
                    mode: str = "lut") -> np.ndarray:
    """Drop-in alternative to entropy.scan.decode_scan running the Huffman
    loop on device ('lut' or 'range' codeword strategy). Returns
    (n_blocks, 64) int32 coefficients."""
    n_blocks = len(comp_idx)
    segbytes, _lens = pack_segments(segments)
    S = len(segments)
    seg_blocks = np.full(S, blocks_per_segment, dtype=np.int32)
    if n_blocks % blocks_per_segment:
        seg_blocks[-1] = n_blocks % blocks_per_segment
    comp_sched = np.asarray(comp_idx[:blocks_per_segment], dtype=np.int32)
    if mode == "range":
        lo, hi, off, values = range_tables(tables)
        out = decode_segments_device_range(
            jnp.asarray(segbytes), jnp.asarray(seg_blocks),
            jnp.asarray(comp_sched), jnp.asarray(lo), jnp.asarray(hi),
            jnp.asarray(off), jnp.asarray(values),
            blocks_per_segment=blocks_per_segment)
    else:
        dc_lut, ac_lut = expand_luts(tables)
        out = decode_segments_device(
            jnp.asarray(segbytes), jnp.asarray(seg_blocks),
            jnp.asarray(comp_sched), jnp.asarray(dc_lut),
            jnp.asarray(ac_lut),
            blocks_per_segment=blocks_per_segment)
    return np.asarray(out).reshape(S * blocks_per_segment, 64)[:n_blocks]
