"""TPU-side parallel entropy encoder: RLE + Huffman + bitstream packing as
scans and scatters.

The TPU-native re-formulation of the reference's serial encoder chain
(Run_length_encode → Huffman_encode → Bitstream_writer,
jpeg/hardcaml/src/encoder_datapath.ml:129-187):

1. symbol construction is data-parallel per block: zero-runs come from a
   cumulative-max over coefficient positions (no sequential FSM), ZRL
   splitting gets 3 static slots per position, EOB one slot per block;
2. bit offsets come from an exclusive scan over per-symbol bit lengths
   within each restart segment;
3. packing is a scatter-add of disjoint 5-byte windows;
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

# symbol slots per block: 1 DC + 63 positions x (3 ZRL + 1 code) + 1 EOB
SLOTS_PER_BLOCK = 1 + 63 * 4 + 1


def device_encoder_tables(tables: EncoderTables):
    """Reshape packed encoder tables for device lookup."""
    c = len(tables.dc_bits) // 12
    dc_bits = tables.dc_bits.reshape(c, 12).astype(np.int32)
    dc_len = tables.dc_len.reshape(c, 12).astype(np.int32)
    ac_bits = tables.ac_bits.reshape(c, 16, 11).astype(np.int32)
    ac_len = tables.ac_len.reshape(c, 16, 11).astype(np.int32)
    return dc_bits, dc_len, ac_bits, ac_len


def _size_category(v):
    """Bit-length of |v| (encoder.ml:143) for |v| ≤ 2047."""
    mag = jnp.abs(v)
    # bit length via comparisons (exact for the 12-bit coefficient range)
    return jnp.sum(mag[..., None] >= (1 << np.arange(12))[..., :],
                   axis=-1).astype(jnp.int32)


def _magnitude_bits(size, v):
    mask = (1 << size) - 1
    return jnp.where(v >= 0, v & mask, (v - 1) & mask)


@functools.partial(jax.jit,
                   static_argnames=("blocks_per_segment", "max_seg_bytes"))
def encode_segments_device(qcoefs, comp_idx, prev_same_comp, dc_bits,
                           dc_len, ac_bits, ac_len, *,
                           blocks_per_segment: int, max_seg_bytes: int):
    """Encode all restart segments in parallel on device.

    qcoefs: (N, 64) int32 zigzag quantized coefficients, N divisible by
    blocks_per_segment (pad with all-zero blocks and slice lengths on the
    host if needed — but the engine always passes exact multiples except
    the final short segment, handled by the caller).
    Returns (bytes (S, M) uint8 stuffed+padded, seg_byte_lens (S,)).
    """
    N = qcoefs.shape[0]
    B = blocks_per_segment
    S = N // B
    q = qcoefs.astype(jnp.int32)

    # ---- per-block symbols (data parallel) -------------------------------
    # DC differential per *scan component* within each segment:
    # prev_same_comp[i] = in-segment index of the previous block with the
    # same component (or -1), a static property of the MCU schedule.
    dcs = q[:, 0].reshape(S, B)
    has_prev = prev_same_comp >= 0
    prev = jnp.where(has_prev[None, :],
                     dcs[:, jnp.clip(prev_same_comp, 0, B - 1)], 0)
    diff = (dcs - prev).reshape(N)
    dsize = _size_category(diff)
    c = comp_idx
    dc_code = dc_bits[c, dsize]
    dc_clen = dc_len[c, dsize]
    dc_sym_bits = (dc_code << dsize) | _magnitude_bits(dsize, diff)
    dc_sym_len = dc_clen + dsize

    # AC positions 1..63: zero runs via cumulative max of last-nonzero idx
    pos = jnp.arange(64)
    nzmask = q != 0
    anchor = jnp.where(nzmask | (pos == 0), pos, 0)  # DC anchors the run
    last_nz_before = jax.lax.cummax(anchor, axis=1)  # inclusive
    prev_nz = jnp.concatenate(
        [jnp.zeros((N, 1), jnp.int32), last_nz_before[:, :-1]], axis=1)
    run = pos - prev_nz - 1  # zeros between previous nonzero and here
    last_nz = jnp.max(anchor, axis=1)  # 0 when no AC coefficients

    ac = q[:, 1:]                      # (N, 63)
    ac_nz = nzmask[:, 1:]
    ac_run = run[:, 1:]
    asize = _size_category(ac)
    final_run = ac_run & 15
    zrl_count = ac_run >> 4
    code = ac_bits[c[:, None], final_run, asize]
    clen = ac_len[c[:, None], final_run, asize]
    ac_sym_bits = (code << asize) | _magnitude_bits(asize, ac)
    ac_sym_len = jnp.where(ac_nz, clen + asize, 0)

    zrl_bits = ac_bits[c, 15, 0]
    zrl_len = ac_len[c, 15, 0]
    eob_bits = ac_bits[c, 0, 0]
    eob_len = ac_len[c, 0, 0]

    # slot layout per block: [dc, (zrl,zrl,zrl,code) x63, eob]
    k = jnp.arange(3)
    zrl_slot_len = jnp.where(ac_nz[..., None] & (k < zrl_count[..., None]),
                             zrl_len[:, None, None], 0)       # (N,63,3)
    zrl_slot_bits = jnp.broadcast_to(zrl_bits[:, None, None],
                                     zrl_slot_len.shape)
    pos_bits = jnp.concatenate(
        [zrl_slot_bits, ac_sym_bits[..., None]], axis=2)      # (N,63,4)
    pos_len = jnp.concatenate(
        [zrl_slot_len, ac_sym_len[..., None]], axis=2)
    need_eob = last_nz < 63
    sym_bits = jnp.concatenate([
        dc_sym_bits[:, None], pos_bits.reshape(N, 63 * 4),
        jnp.where(need_eob, eob_bits, 0)[:, None]], axis=1)
    sym_len = jnp.concatenate([
        dc_sym_len[:, None], pos_len.reshape(N, 63 * 4),
        jnp.where(need_eob, eob_len, 0)[:, None]], axis=1)

    # ---- bit offsets: exclusive scan per segment -------------------------
    sym_bits = sym_bits.reshape(S, B * SLOTS_PER_BLOCK)
    sym_len = sym_len.reshape(S, B * SLOTS_PER_BLOCK)
    ends = jnp.cumsum(sym_len, axis=1)
    offs = ends - sym_len
    total_bits = ends[:, -1]
    # 1-fill padding to a byte boundary (flush_with_1s)
    pad_len = (-total_bits) & 7
    pad_bits = (1 << pad_len) - 1
    sym_bits = jnp.concatenate([sym_bits, pad_bits[:, None]], axis=1)
    sym_len = jnp.concatenate([sym_len, pad_len[:, None]], axis=1)
    offs = jnp.concatenate([offs, total_bits[:, None]], axis=1)
    raw_bytes_len = (total_bits + pad_len) >> 3

    # ---- scatter 5-byte windows ------------------------------------------
    M = max_seg_bytes
    shift = offs & 7
    b0 = offs >> 3
    acc = jnp.zeros((S, M + 8), jnp.int32)
    seg_ids = jnp.broadcast_to(jnp.arange(S)[:, None], b0.shape)
    for kk in range(5):
        ek = 8 + 8 * kk - shift - sym_len
        left = ((sym_bits & 0xFF) << jnp.clip(ek, 0, 8)) & 0xFF
        right = (sym_bits >> jnp.clip(-ek, 0, 31)) & 0xFF
        val = jnp.where(sym_len > 0, jnp.where(ek >= 0, left, right), 0)
        idx = jnp.where(sym_len > 0, b0 + kk, M + 7)
        acc = acc.at[seg_ids, idx].add(val, mode="drop")
    raw = acc[:, :M].astype(jnp.uint8)

    # ---- stuffing: 0xFF → 0xFF 0x00 --------------------------------------
    byte_pos = jnp.arange(M)
    valid = byte_pos[None, :] < raw_bytes_len[:, None]
    is_ff = (raw == 0xFF) & valid
    ff_before = jnp.cumsum(is_ff, axis=1) - is_ff.astype(jnp.int32)
    dest = byte_pos[None, :] + ff_before
    out = jnp.zeros((S, M), jnp.uint8)
    dest = jnp.where(valid, dest, M)
    byte_seg_ids = jnp.broadcast_to(jnp.arange(S)[:, None], (S, M))
    out = out.at[byte_seg_ids, dest].set(raw, mode="drop")
    out_lens = raw_bytes_len + jnp.sum(is_ff, axis=1)
    return out, out_lens


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
        # pad with all-zero blocks of component 0; they only append
        # symbols after the real data in the final segment, which we trim
        # by re-encoding that segment exactly on the host
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
    max_seg_bytes = B * 64 * 4 + 64
    out, lens = encode_segments_device(
        jnp.asarray(q), jnp.asarray(ci), jnp.asarray(prev_same),
        jnp.asarray(dc_bits), jnp.asarray(dc_len), jnp.asarray(ac_bits),
        jnp.asarray(ac_len),
        blocks_per_segment=B, max_seg_bytes=max_seg_bytes)
    out = np.asarray(out)
    lens = np.asarray(lens)
    segments = [out[s, :lens[s]].tobytes() for s in range(n_segments)]
    if pad_blocks:
        # the final short segment must not contain the padding blocks —
        # host-encode it exactly (it is small)
        from .scan import encode_scan
        first = (n_segments - 1) * B
        tail = encode_scan(qcoefs[first:], comp_idx[first:],
                           n_blocks - first, tables)
        segments[-1] = tail[0]
    return segments
