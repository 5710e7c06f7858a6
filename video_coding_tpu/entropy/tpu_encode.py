"""TPU-side parallel entropy encoder: RLE + Huffman + bitstream packing as
scans and scatters.

The TPU-native re-formulation of the reference's serial encoder chain
(Run_length_encode → Huffman_encode → Bitstream_writer,
jpeg/hardcaml/src/encoder_datapath.ml:129-187):

1. symbol construction is data-parallel per block: zero-runs come from a
   cumulative-max over coefficient positions (no sequential FSM); the ≤3
   ZRL codes a block can ever need (total zeros ≤ 63) fold into the slot
   of the following nonzero coefficient, giving a fixed 65-slot layout
   (DC + 63 positions + EOB) with ≤59-bit composite symbols held in
   uint32 (hi, lo) pairs;
2. bit offsets come from an exclusive scan over per-symbol bit lengths
   within each restart segment;
3. packing is a scatter-add of disjoint 9-byte windows;
4. 0xFF00 stuffing is another scan (+1 output position per 0xFF) and
   scatter.

Bit-identical to the host writers (entropy/scan.py, native/entropy.cpp)
segment by segment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .tables import EncoderTables

# symbol slots per block: 1 DC + 63 positions (ZRLs folded in) + 1 EOB
SLOTS_PER_BLOCK = 65


def device_encoder_tables(tables: EncoderTables):
    """Reshape packed encoder tables for device lookup.

    Validates the device packer's structural assumptions (they hold for
    every standard table, incl. all Annex-K defaults): composite symbols
    (≤3 ZRL + code + ≤10 magnitude bits) must fit the 59-bit uint32 pair,
    and every code must be ≥2 bits so at most OVERLAP symbols share an
    output byte. Custom tables violating this must use the host coder."""
    c = len(tables.dc_bits) // 12
    dc_bits = tables.dc_bits.reshape(c, 12).astype(np.int32)
    dc_len = tables.dc_len.reshape(c, 12).astype(np.int32)
    ac_bits = tables.ac_bits.reshape(c, 16, 11).astype(np.int32)
    ac_len = tables.ac_len.reshape(c, 16, 11).astype(np.int32)
    lens = np.concatenate([dc_len.ravel(), ac_len.ravel()])
    if lens[lens > 0].min(initial=2) < 2:
        raise ValueError("device entropy encoder requires codes ≥ 2 bits; "
                         "use the host coder for this table")
    worst = 3 * int(ac_len[:, 15, 0].max(initial=0)) \
        + int(ac_len.max(initial=0)) + 10
    if worst > 59:
        raise ValueError("device entropy encoder composite symbol would "
                         "exceed 59 bits; use the host coder")
    return dc_bits, dc_len, ac_bits, ac_len


def _size_category(v):
    """Bit-length of |v| (encoder.ml:143) for |v| ≤ 2047."""
    mag = jnp.abs(v)
    return jnp.sum(mag[..., None] >= (1 << np.arange(12))[..., :],
                   axis=-1).astype(jnp.int32)


def _magnitude_bits(size, v):
    mask = (1 << size) - 1
    return jnp.where(v >= 0, v & mask, (v - 1) & mask)


def _prepend(hi, lo, length, code, code_len, enable):
    """Prepend ``code`` (≤16 bits) in front of the (hi,lo,length) symbol:
    new value = code·2^length + value. uint32 pieces, exact."""
    code = code.astype(jnp.uint32)
    # contribution of code << length to (hi, lo)
    sh = length
    lo_add = jnp.where(sh < 32,
                       jnp.where(sh == 0, code, code << jnp.minimum(sh, 31)),
                       jnp.uint32(0))
    hi_add = jnp.where(
        sh < 32,
        jnp.where(sh == 0, jnp.uint32(0),
                  code >> jnp.clip(32 - sh, 1, 31)),
        code << jnp.clip(sh - 32, 0, 31))
    new_hi = jnp.where(enable, hi + hi_add, hi)
    new_lo = jnp.where(enable, lo + lo_add, lo)
    # disjoint bit ranges → additions never carry between lo and hi
    new_len = jnp.where(enable, length + code_len, length)
    return new_hi, new_lo, new_len


def _extract_byte(hi, lo, s):
    """Low byte of (hi·2^32 + lo) >> s for -8 ≤ s ≤ 63 (uint32 math).

    Inputs are recast to uint32 defensively: if dtype promotion anywhere
    upstream produced int32, ``>>`` would sign-extend and corrupt bytes."""
    hi = hi.astype(jnp.uint32)
    lo = lo.astype(jnp.uint32)
    s_ge32 = (hi >> jnp.clip(s - 32, 0, 31).astype(jnp.uint32)) & 0xFF
    lo_part = lo >> jnp.clip(s, 0, 31).astype(jnp.uint32)
    hi_part = jnp.where(
        s == 0, jnp.uint32(0),
        hi << jnp.clip(32 - s, 0, 31).astype(jnp.uint32))
    s_lt32 = (lo_part | hi_part) & 0xFF
    s_neg = (lo << jnp.clip(-s, 0, 8).astype(jnp.uint32)) & 0xFF
    return jnp.where(s >= 32, s_ge32, jnp.where(s >= 0, s_lt32, s_neg))


# max symbols that can overlap one output byte: composite symbols are
# ≥ 2 bits (shortest canonical code is 2 bits), so ≤ ceil(8/2)+1 = 5
OVERLAP = 6


def _batched_searchsorted(a, v, side: str):
    """Row-wise searchsorted: a (S, K) sorted rows, v (S, M) or (M,)
    queries → (S, M) insertion indices.

    Hand-rolled binary search (fori_loop of take_along_axis gathers)
    instead of vmap(jnp.searchsorted) — identical results, much simpler
    lowering."""
    S, K = a.shape
    if v.ndim == 1:
        v = jnp.broadcast_to(v[None, :], (S, v.shape[0]))
    lo = jnp.zeros(v.shape, jnp.int32)
    hi = jnp.full(v.shape, K, jnp.int32)
    steps = max(K.bit_length(), 1)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) >> 1
        amid = jnp.take_along_axis(a, jnp.clip(mid, 0, K - 1), axis=1)
        go_right = (amid <= v) if side == "right" else (amid < v)
        go_right = go_right & (mid < hi)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, jnp.minimum(hi, mid))
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def _compact_symbols(sym_hi, sym_lo, sym_len):
    """Append the flush pad slot and compact away zero-length slots so
    consecutive symbols are ≥2 bits (except the final pad) and OVERLAP
    bounds the per-byte cover count.

    Compaction is scatter+cumsum (a slot's destination is its rank) —
    unique indices, O(K) per segment. Returns (c_hi, c_lo, c_end, c_off,
    n_compact, raw_bytes_len): compacted symbol values, their bit
    end/start offsets (garbage past n_compact), symbol counts, and the
    padded byte length per segment."""
    S = sym_hi.shape[0]
    ends = jnp.cumsum(sym_len, axis=1)
    offs = ends - sym_len
    total_bits = ends[:, -1]
    pad_len = (-total_bits) & 7
    pad_bits = ((1 << pad_len) - 1).astype(jnp.uint32)
    sym_hi = jnp.concatenate(
        [sym_hi, jnp.zeros((S, 1), jnp.uint32)], axis=1)
    sym_lo = jnp.concatenate([sym_lo, pad_bits[:, None]], axis=1)
    sym_len = jnp.concatenate([sym_len, pad_len[:, None]], axis=1)
    offs = jnp.concatenate([offs, total_bits[:, None]], axis=1)
    ends = jnp.concatenate([ends, (total_bits + pad_len)[:, None]], axis=1)
    raw_bytes_len = (total_bits + pad_len) >> 3

    nz = sym_len > 0
    rank = jnp.cumsum(nz, axis=1)          # 1-based rank among non-empty
    n_compact = rank[:, -1]
    K = sym_len.shape[1]
    r_idx = jnp.arange(K)
    lane_col = jnp.arange(S)[:, None]

    # flat 1-D scatter/gathers: the 2-D forms lower to TPU's slow general
    # scatter/gather (~150 ms per 1080p frame); flat unique-index forms
    # are ~100x faster. Empty slots all land in each lane's spill column
    # K (colliding .set, value never read — sliced off below).
    flat_dst = (lane_col * (K + 1)
                + jnp.where(nz, rank - 1, K)).reshape(-1)
    comp_src = (jnp.zeros(S * (K + 1), jnp.int32)
                .at[flat_dst].set(jnp.broadcast_to(r_idx[None, :],
                                                   (S, K)).reshape(-1))
                .reshape(S, K + 1)[:, :K])
    flat_src = (lane_col * K + comp_src).reshape(-1)

    def compact(values):
        return values.reshape(-1)[flat_src].reshape(S, K)

    return (compact(sym_hi), compact(sym_lo), compact(ends), compact(offs),
            n_compact, raw_bytes_len)


def _pack_gather(sym_hi, sym_lo, sym_len, M):
    """Pack ordered variable-length symbols into bytes without scatters.

    Slot bit-offsets are monotone within a segment, so every output byte
    can *gather* the ≤ OVERLAP symbols that cover it via a rank count
    (scatter+cumsum over the byte grid) — TPU-friendly (gathers
    vectorize; scatters with colliding indices serialize). Returns
    (raw_bytes (S, M) uint8, raw_byte_lens, overflow)."""
    S = sym_hi.shape[0]
    c_hi, c_lo, c_end, c_off, n_compact, raw_bytes_len = _compact_symbols(
        sym_hi, sym_lo, sym_len)
    K = c_end.shape[1]
    r_idx = jnp.arange(K)
    lane_col = jnp.arange(S)[:, None]
    overflow = jnp.any(raw_bytes_len > M)
    c_valid_slot = r_idx[None, :] < n_compact[:, None]

    # a[b] = number of compact symbols ending at or before bit 8b — the
    # index of the first symbol that can cover byte b. Count by scattering
    # each symbol's end byte and prefix-summing over the byte grid.
    byte_bits = jnp.arange(M) * 8
    end_byte = (c_end + 7) >> 3
    end_marks = jnp.zeros((S, M), jnp.int32).at[
        lane_col, jnp.where(c_valid_slot, end_byte, M)].add(1, mode="drop")
    a = jnp.cumsum(end_marks, axis=1)      # (S, M) inclusive → ends ≤ 8b

    acc = jnp.zeros((S, M), jnp.uint32)
    lane = jnp.arange(S)[:, None]
    for t in range(OVERLAP):
        idx = jnp.clip(a + t, 0, K - 1)
        hi = c_hi[lane, idx]
        lo = c_lo[lane, idx]
        end = c_end[lane, idx]
        off = c_off[lane, idx]
        valid = ((a + t) < n_compact[:, None]) \
            & (off < byte_bits[None, :] + 8) \
            & (end > byte_bits[None, :])
        s = jnp.clip(end - byte_bits[None, :] - 8, -8, 63)
        val = _extract_byte(hi, lo, s)
        acc = acc + jnp.where(valid, val, 0)
    raw = acc.astype(jnp.uint8)
    return raw, raw_bytes_len, overflow


def _stuff_gather(raw, raw_bytes_len, M_out):
    """0xFF→0xFF00 stuffing as a gather: output position o maps back to
    its source byte via a rank count (scatter+cumsum) over the monotone
    dest positions."""
    S, M = raw.shape
    byte_pos = jnp.arange(M)
    valid = byte_pos[None, :] < raw_bytes_len[:, None]
    is_ff = (raw == 0xFF) & valid
    ff_before = jnp.cumsum(is_ff, axis=1) - is_ff.astype(jnp.int32)
    dest = jnp.where(valid, byte_pos[None, :] + ff_before, 1 << 30)
    out_lens = raw_bytes_len + jnp.sum(is_ff, axis=1)
    overflow = jnp.any(out_lens > M_out)
    # src[o] = count of source bytes with dest < o (dest values are unique
    # and monotone per row, out-of-range ones drop)
    lane_col = jnp.arange(S)[:, None]
    marks = jnp.zeros((S, M_out), jnp.int32).at[
        lane_col, dest].add(1, mode="drop")
    src = jnp.cumsum(marks, axis=1) - marks        # exclusive cumsum
    src_c = jnp.clip(src, 0, M - 1)
    out_pos = jnp.arange(M_out)
    exact = jnp.take_along_axis(dest, src_c, axis=1) == out_pos[None, :]
    out = jnp.where(exact,
                    jnp.take_along_axis(raw, src_c, axis=1),
                    0).astype(jnp.uint8)
    return out, out_lens, overflow


def _symbol_parts(qcoefs, comp_idx, prev_same_comp, dc_bits, dc_len,
                  ac_bits, ac_len, blocks_per_segment: int):
    """Per-block composite symbols, data parallel (no sequential FSM).

    Returns (sym_hi, sym_lo, sym_len) each (N, SLOTS_PER_BLOCK): the
    bit-packed codeword+magnitude value of every symbol slot and its bit
    length (0 for empty slots)."""
    N = qcoefs.shape[0]
    B = blocks_per_segment
    S = N // B
    q = qcoefs.astype(jnp.int32)

    # DC differential per scan component within each segment
    dcs = q[:, 0].reshape(S, B)
    has_prev = prev_same_comp >= 0
    prev = jnp.where(has_prev[None, :],
                     dcs[:, jnp.clip(prev_same_comp, 0, B - 1)], 0)
    diff = (dcs - prev).reshape(N)
    dsize = _size_category(diff)
    c = comp_idx
    # all table lookups below go through FLAT 1-D gathers: multi-dim
    # advanced indexing lowers to a slow general gather on TPU (~70 ms
    # per 1080p frame measured), while a flat index into a 1-D table is
    # ~0.05 ms for the same element count. code and length are packed
    # into ONE int32 entry (code ≤ 16 bits, length ≤ 5 bits) so each
    # lookup is one gather, not two — the per-element gathers are the
    # stage's dominant cost on TPU.
    dc_flat = (dc_bits.reshape(-1) << 5) | dc_len.reshape(-1)
    ac_flat = (ac_bits.reshape(-1) << 5) | ac_len.reshape(-1)
    dc_packed = dc_flat[c * 12 + dsize]
    dc_code = dc_packed >> 5
    dc_clen = dc_packed & 31
    dc_lo = (((dc_code << dsize) | _magnitude_bits(dsize, diff))
             .astype(jnp.uint32))
    dc_hi = jnp.zeros_like(dc_lo)
    dc_slen = dc_clen + dsize

    # AC positions 1..63: zero runs via cumulative max of last-nonzero idx
    pos = jnp.arange(64)
    nzmask = q != 0
    anchor = jnp.where(nzmask | (pos == 0), pos, 0)  # DC anchors the run
    last_nz_before = jax.lax.cummax(anchor, axis=1)
    prev_nz = jnp.concatenate(
        [jnp.zeros((N, 1), jnp.int32), last_nz_before[:, :-1]], axis=1)
    run = pos - prev_nz - 1
    last_nz = jnp.max(anchor, axis=1)

    ac = q[:, 1:]                      # (N, 63)
    ac_nz = nzmask[:, 1:]
    ac_run = run[:, 1:]
    asize = _size_category(ac)
    final_run = ac_run & 15
    zrl_count = ac_run >> 4
    ac_idx = (c[:, None] * 16 + final_run) * 11 + asize
    # the (N, 63) table lookup is the symbol stage's dominant cost through
    # XLA's general gather (18.5 of 18.5 ms at 1080p); the Mosaic
    # in-register lane gather is ~6x faster (ops/lookup.py)
    from ..ops.lookup import table_lookup

    ac_packed = table_lookup(jnp.asarray(ac_flat), ac_idx)
    code = ac_packed >> 5
    clen = ac_packed & 31
    base_lo = ((code << asize) | _magnitude_bits(asize, ac)).astype(jnp.uint32)
    base_hi = jnp.zeros_like(base_lo)
    base_len = jnp.where(ac_nz, clen + asize, 0)

    # fold the ≤3 ZRLs in front of their following code
    zrl_packed = ac_flat[c * 176 + 15 * 11][:, None]
    zrl_bits = zrl_packed >> 5
    zrl_len = zrl_packed & 31
    hi, lo, ln = base_hi, base_lo, base_len
    for k in (1, 2, 3):
        enable = ac_nz & (zrl_count >= k)
        hi, lo, ln = _prepend(hi, lo, ln, zrl_bits, zrl_len, enable)

    eob_packed = ac_flat[c * 176]
    eob_bits = eob_packed >> 5
    eob_len = eob_packed & 31
    need_eob = last_nz < 63
    eob_lo = jnp.where(need_eob, eob_bits, 0).astype(jnp.uint32)

    sym_hi = jnp.concatenate(
        [dc_hi[:, None], hi, jnp.zeros((N, 1), jnp.uint32)], axis=1)
    sym_lo = jnp.concatenate([dc_lo[:, None], lo, eob_lo[:, None]], axis=1)
    sym_len = jnp.concatenate(
        [dc_slen[:, None], ln, jnp.where(need_eob, eob_len, 0)[:, None]],
        axis=1)
    return sym_hi, sym_lo, sym_len


@functools.partial(jax.jit,
                   static_argnames=("blocks_per_segment", "max_seg_bytes"))
def encode_segments_device(qcoefs, comp_idx, prev_same_comp, dc_bits,
                           dc_len, ac_bits, ac_len, *,
                           blocks_per_segment: int, max_seg_bytes: int,
                           valid=None):
    """Encode all restart segments in parallel on device.

    qcoefs: (N, 64) int32 zigzag quantized coefficients, N divisible by
    blocks_per_segment. valid: optional (N,) bool — blocks marked False
    (geometry padding in a short tail segment, or whole padding segments
    appended for mesh divisibility) contribute no symbols, so the packed
    bytes match a host encode of only the valid blocks exactly.
    Returns (bytes (S, M) uint8 stuffed+padded, seg_byte_lens (S,),
    overflow flag — when True the caller must fall back to a larger
    buffer or the host coder)."""
    N = qcoefs.shape[0]
    B = blocks_per_segment
    S = N // B
    sym_hi, sym_lo, sym_len = _symbol_parts(
        qcoefs, comp_idx, prev_same_comp, dc_bits, dc_len, ac_bits, ac_len,
        B)
    if valid is not None:
        sym_len = jnp.where(valid[:, None], sym_len, 0)

    # ---- gather-only pack + stuffing -------------------------------------
    sym_hi = sym_hi.reshape(S, B * SLOTS_PER_BLOCK)
    sym_lo = sym_lo.reshape(S, B * SLOTS_PER_BLOCK)
    sym_len = sym_len.reshape(S, B * SLOTS_PER_BLOCK)
    # raw buffer sized for the pre-stuffing bytes; the stuffed output gets
    # 25% headroom — overflow is reported, not silently truncated
    M_raw = max_seg_bytes
    raw, raw_bytes_len, ovf1 = _pack_gather(sym_hi, sym_lo, sym_len, M_raw)
    M_out = M_raw + M_raw // 4 + 8
    out, out_lens, ovf2 = _stuff_gather(raw, raw_bytes_len, M_out)
    return out, out_lens, ovf1 | ovf2


@functools.partial(jax.jit, static_argnames=("blocks_per_segment",))
def segment_coded_bits(qcoefs, comp_idx, prev_same_comp, dc_bits, dc_len,
                       ac_bits, ac_len, *, blocks_per_segment: int,
                       valid=None):
    """Exact coded size of every restart segment in bits, pre byte-padding
    and pre 0xFF00 stuffing — the true rate for the parallel-encode offset
    exchange (the proxy-free replacement SURVEY.md §7.6 calls for).

    Bit-identical to 8·len(destuffed segment) − flush padding of the host
    coders. Returns (S,) int32."""
    B = blocks_per_segment
    S = qcoefs.shape[0] // B
    _hi, _lo, sym_len = _symbol_parts(
        qcoefs, comp_idx, prev_same_comp, dc_bits, dc_len, ac_bits, ac_len,
        B)
    if valid is not None:
        sym_len = jnp.where(valid[:, None], sym_len, 0)
    return jnp.sum(sym_len.reshape(S, B * SLOTS_PER_BLOCK), axis=1)


def stream_scatter(out, lens, offsets, gidx, n_segments: int, cap: int):
    """Scatter packed segments + their RSTn markers into a flat wire
    buffer — the device-side replacement for host segment joins (the TPU
    analog of the reference's FIFO chain between entropy stages,
    bytestream_decoder.ml:257-289).

    out (S_local, M) uint8 packed segment bytes; lens (S_local,) their
    lengths; offsets (S_local,) each segment's first-byte wire position;
    gidx (S_local,) global segment indices (marker index = (g-1) & 7;
    g ≥ n_segments rows are mesh padding and emit nothing). Returns a
    (cap,) int32 byte buffer — disjoint scatters, so sharded callers can
    psum partial buffers across the mesh."""
    S_local, M = out.shape
    pos = jnp.arange(M)
    seg_real = gidx < n_segments
    bvalid = (pos[None, :] < lens[:, None]) & seg_real[:, None]
    dst = jnp.where(bvalid, offsets[:, None] + pos[None, :], cap)
    buf = jnp.zeros((cap,), jnp.int32).at[dst.reshape(-1)].add(
        out.astype(jnp.int32).reshape(-1), mode="drop")
    mvalid = (gidx > 0) & seg_real
    buf = buf.at[jnp.where(mvalid, offsets - 2, cap)].add(0xFF, mode="drop")
    buf = buf.at[jnp.where(mvalid, offsets - 1, cap)].add(
        0xD0 + ((gidx - 1) & 7), mode="drop")
    return buf


@functools.partial(jax.jit, static_argnames=("cap",))
def assemble_stream_device(out, lens, *, cap: int):
    """Single-device wire assembly: segments joined with RSTn markers.
    Returns ((cap,) uint8 buffer, total wire bytes).

    The scatter is WORD-PACKED: each segment's zero-padded bytes are
    re-aligned to its wire word offset (4-way select on offset&3, pure
    elementwise) and scattered as int32 words — 4x fewer scattered
    elements than the byte form (TPU scatter cost is per element:
    measured 19.8 ms → ~5 ms per 1080p ri=1 frame). Adjacent segments
    sharing a boundary word write disjoint byte lanes, so the adds
    compose exactly; bytes past each segment's length are zero by
    construction (the packers' output grids are zero-initialized).

    (A per-output-byte gather formulation was measured slower still —
    32 ms — the rank-count cumsum over the whole wire buffer lowers
    poorly.)"""
    S, M = out.shape
    gidx = jnp.arange(S)
    offsets = jnp.cumsum(lens) - lens + 2 * gidx
    total = offsets[-1] + lens[-1]

    # markers first: 2 bytes before each segment (tiny scatter)
    capw = cap // 4 + 2
    mpos = jnp.where(gidx > 0, offsets - 2, cap)
    marks = jnp.stack([jnp.full((S,), 0xFF, jnp.int32),
                       0xD0 + ((gidx - 1) & 7)], axis=1)
    mdst = mpos[:, None] + jnp.arange(2)[None, :]
    mword = jnp.minimum(mdst >> 2, capw - 1)
    mval = marks << ((mdst & 3) * 8)
    bufw = jnp.zeros((capw,), jnp.int32).at[
        jnp.where(mpos[:, None] < cap, mword, capw).reshape(-1)].add(
        mval.reshape(-1), mode="drop")

    # re-align segment bytes to wire words: byte j lands in aligned word
    # (j+sh)>>2 at lane (j+sh)&3, sh = offset&3
    T = (M + 3) // 4 + 1
    b = out.astype(jnp.int32)
    sh = (offsets & 3).astype(jnp.int32)
    bp = jnp.pad(b, ((0, 0), (3, 4 * T - M)))  # 3 front slots for sh>0
    aligned = jnp.zeros((S, T), jnp.int32)
    for v in range(4):
        # with sh==v, aligned word t = sum_k bp[:, 3-v+4t+k] << 8k
        w = sum(bp[:, 3 - v + k: 3 - v + k + 4 * T: 4] << (8 * k)
                for k in range(4))
        aligned = jnp.where(sh[:, None] == v, w, aligned)
    wdst = (offsets >> 2)[:, None] + jnp.arange(T)[None, :]
    valid = (jnp.arange(T)[None, :] * 4
             < lens[:, None] + sh[:, None])
    bufw = bufw.at[jnp.where(valid, wdst, capw).reshape(-1)].add(
        aligned.reshape(-1), mode="drop")

    # unpack words back to the byte stream — elementwise + reshape (a
    # bufw[byte_idx>>2] gather here would itself cost ~20 ms at 1080p)
    shifts = jnp.arange(4, dtype=jnp.int32) * 8
    buf = ((bufw[:, None] >> shifts[None, :]) & 0xFF).reshape(-1)[:cap]
    return buf.astype(jnp.uint8), total


def pack_byte_words(out_bytes):
    """(S, M) uint8 segment bytes → (S, ceil(M/4)) int32 little-endian
    words, pure elementwise + reshape — adapts the XLA packer's byte
    output to assemble_stream_device_packed."""
    S, M = out_bytes.shape
    Mp = -(-M // 4) * 4
    b = jnp.pad(out_bytes.astype(jnp.int32), ((0, 0), (0, Mp - M)))
    b = b.reshape(S, Mp // 4, 4)
    return (b[:, :, 0] | (b[:, :, 1] << 8) | (b[:, :, 2] << 16)
            | (b[:, :, 3] << 24))


@functools.partial(jax.jit, static_argnames=("cap",))
def assemble_stream_device_packed(out_w, lens, *, cap: int):
    """assemble_stream_device fed the packers' WORD-PACKED output
    directly — (S, W4) int32, 4 little-endian bytes per word — skipping
    the byte unpack + byte re-pack round trip entirely. Re-alignment to
    each segment's wire word offset is one shift-combine of adjacent
    source words (pure elementwise); the scatter and RSTn markers are
    identical to the byte form. Returns ((cap,) uint8, total)."""
    S, W4 = out_w.shape
    gidx = jnp.arange(S)
    offsets = jnp.cumsum(lens) - lens + 2 * gidx
    total = offsets[-1] + lens[-1]

    capw = cap // 4 + 2
    mpos = jnp.where(gidx > 0, offsets - 2, cap)
    marks = jnp.stack([jnp.full((S,), 0xFF, jnp.int32),
                       0xD0 + ((gidx - 1) & 7)], axis=1)
    mdst = mpos[:, None] + jnp.arange(2)[None, :]
    mword = jnp.minimum(mdst >> 2, capw - 1)
    mval = marks << ((mdst & 3) * 8)
    bufw = jnp.zeros((capw,), jnp.int32).at[
        jnp.where(mpos[:, None] < cap, mword, capw).reshape(-1)].add(
        mval.reshape(-1), mode="drop")

    # aligned wire word u of a segment with in-word shift sh = offset&3:
    # (src[u] << 8·sh) | (src[u-1] >>> 8·(4-sh)); bytes past the
    # segment's length are zero in the packers' grids, so adjacent
    # segments' adds compose exactly
    T = W4 + 1
    sh8 = ((offsets & 3) * 8).astype(jnp.int32)[:, None]
    srcp = jnp.pad(out_w, ((0, 0), (1, 1)))        # src[-1] = src[W4] = 0
    lo = jax.lax.shift_left(srcp[:, 1:], sh8)
    hi = jax.lax.shift_right_logical(srcp[:, :-1],
                                     jnp.clip(32 - sh8, 0, 31))
    aligned = jnp.where(sh8 == 0, srcp[:, 1:], lo | hi)

    # scatter 32-byte ROWS, not words: TPU scatter cost is per indexed
    # unit (~4.7 ms/frame for the S·T word form), so regroup each
    # segment's aligned words onto the wire's 8-word row grid (one more
    # static 8-way shift-select) and scatter (S, R8) rows — ~6-8x fewer
    # indexed units for the same bytes. Rows overlapping between
    # neighboring segments add-compose exactly (zeros outside each
    # segment's bytes).
    woff = offsets >> 2
    k = woff & 7                       # word position inside its row
    row0 = woff >> 3
    R8 = (T + 7) // 8 + 1
    ap = jnp.pad(aligned, ((0, 0), (7, R8 * 8 - T - 7 + 7)))
    roww = jnp.zeros((S, R8 * 8), jnp.int32)
    for kk in range(8):
        roww = jnp.where((k == kk)[:, None],
                         ap[:, 7 - kk: 7 - kk + R8 * 8], roww)
    rows3 = roww.reshape(S, R8, 8)
    capw8 = cap // 32 + 3
    rowdst = row0[:, None] + jnp.arange(R8)[None, :]
    nwords = ((lens + (offsets & 3) + 3) >> 2) + 1   # aligned words used
    vrow = jnp.arange(R8)[None, :] * 8 < (k[:, None] + nwords[:, None])
    buf8 = jnp.zeros((capw8, 8), jnp.int32).at[
        jnp.where(vrow, rowdst, capw8).reshape(-1)].add(
        rows3.reshape(-1, 8), mode="drop")
    bufw = bufw.at[:].add(buf8.reshape(-1)[:capw])

    shifts = jnp.arange(4, dtype=jnp.int32) * 8
    buf = ((bufw[:, None] >> shifts[None, :]) & 0xFF).reshape(-1)[:cap]
    return buf.astype(jnp.uint8), total


def encode_scan_tpu(qcoefs: np.ndarray, comp_idx: np.ndarray,
                    blocks_per_segment: int,
                    tables: EncoderTables) -> list[bytes]:
    """Drop-in alternative to entropy.scan.encode_scan with the packing
    running on device. Returns stuffed per-segment byte buffers."""
    n_blocks = len(comp_idx)
    B = blocks_per_segment
    n_segments = (n_blocks + B - 1) // B
    pad_blocks = n_segments * B - n_blocks
    q = np.ascontiguousarray(qcoefs, dtype=np.int32)
    ci = np.ascontiguousarray(comp_idx, dtype=np.int32)
    if pad_blocks:
        q = np.concatenate([q, np.zeros((pad_blocks, 64), np.int32)])
        ci = np.concatenate([ci, np.zeros(pad_blocks, np.int32)])
    dc_bits, dc_len, ac_bits, ac_len = device_encoder_tables(tables)
    # previous same-component in-segment index (static MCU schedule)
    sched = ci[:B]
    prev_same = np.full(B, -1, dtype=np.int32)
    last_seen: dict[int, int] = {}
    for i, c in enumerate(sched):
        prev_same[i] = last_seen.get(int(c), -1)
        last_seen[int(c)] = i
    valid = (np.arange(n_segments * B) < n_blocks) if pad_blocks else None
    # typical segments are far below the theoretical worst case; start
    # with a lean buffer and escalate on the (reported) overflow
    # fallback size covers the absolute worst case: ≤208 raw bytes/block,
    # ≤2x after stuffing — 512 B/block raw buffer → 640 B/block stuffed
    for max_seg_bytes in (B * 24 + 64, B * 128 + 64, B * 512 + 64):
        out, lens, overflow = encode_segments_device(
            jnp.asarray(q), jnp.asarray(ci), jnp.asarray(prev_same),
            jnp.asarray(dc_bits), jnp.asarray(dc_len), jnp.asarray(ac_bits),
            jnp.asarray(ac_len),
            blocks_per_segment=B, max_seg_bytes=max_seg_bytes,
            valid=None if valid is None else jnp.asarray(valid))
        if not bool(overflow):
            break
    else:
        raise ValueError("device entropy encode overflow")
    out = np.asarray(out)
    lens = np.asarray(lens)
    return [out[s, :lens[s]].tobytes() for s in range(n_segments)]
