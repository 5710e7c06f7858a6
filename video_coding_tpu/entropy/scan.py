"""Scan-level entropy decode/encode over restart segments.

High-level API used by the runtime engine:
- ``decode_scan``: list of destuffed segment buffers → (n_blocks, 64) int32
  zigzag coefficients with DC prediction resolved (segments processed in
  parallel by the native engine).
- ``encode_scan``: (n_blocks, 64) int32 zigzag quantized coefficients →
  list of stuffed, 1-padded segment byte buffers (parallel per segment).
- ``destuff_segments``: raw entropy-coded bytes → destuffed segment list.

Each has a native C++ fast path and a pure-Python fallback with identical
semantics (the fallback is also the executable spec for tests).
"""

from __future__ import annotations

import os

import numpy as np

from ..common.bitstream import BitReader, BitWriter
from ..model.decoder import mag
from ..model.encoder import magnitude_bits, size_category
from . import native
from .tables import DecoderTables, EncoderTables


def native_available() -> bool:
    return native.available()


def _default_threads() -> int:
    return min(os.cpu_count() or 1, 16)


# --------------------------------------------------------------------------
# destuffing
# --------------------------------------------------------------------------

def destuff_segments(data: bytes, use_native: bool | None = None) -> list[bytes]:
    """0xFF00→0xFF, split at RSTn, stop at any other marker."""
    return destuff_segments_with_markers(data, use_native)[0]


def destuff_segments_with_markers(
        data: bytes, use_native: bool | None = None
        ) -> tuple[list[bytes], list[int]]:
    """Destuffed segments plus the RSTn modulo-8 index terminating each
    (len = len(segments) - 1), from one pass over the bytes — the indices
    feed restart resynchronization (decode_scan_resync)."""
    lib = native.load() if use_native in (None, True) else None
    if lib is not None:
        arr = np.frombuffer(data, dtype=np.uint8)
        out = np.empty(len(data) + 1, dtype=np.uint8)
        max_segs = len(data) // 2 + 2
        seg_ends = np.zeros(max_segs, dtype=np.int64)
        seg_marks = np.zeros(max_segs, dtype=np.int64)
        n = lib.vct_destuff_segments_m(arr, len(arr), out, seg_ends,
                                       seg_marks, max_segs)
        if n > 0:
            ends = seg_ends[:n]
            starts = np.concatenate([[0], ends[:-1]])
            return ([out[s:e].tobytes() for s, e in zip(starts, ends)],
                    [int(m) for m in seg_marks[:n - 1]])
    # python fallback (the model's walk is the single shared spec)
    from ..model.decoder import extract_entropy_segments_with_markers
    return extract_entropy_segments_with_markers(BitReader(data))


def destuff_flat(data: bytes, use_native: bool | None = None
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Destuffed scan as ONE flat uint8 buffer plus per-segment byte
    lengths — no per-segment Python bytes objects. The zero-copy input
    for the device decode paths: the (S, L) lane matrix is built on
    device by a gather from this buffer (runtime/engine.py), so only
    ~len(data) bytes cross the host->device link instead of the padded
    matrix."""
    lib = native.load() if use_native in (None, True) else None
    if lib is not None:
        arr = np.frombuffer(data, dtype=np.uint8)
        out = np.empty(len(data) + 8, dtype=np.uint8)
        max_segs = len(data) // 2 + 2
        seg_ends = np.zeros(max_segs, dtype=np.int64)
        seg_marks = np.zeros(max_segs, dtype=np.int64)
        n = lib.vct_destuff_segments_m(arr, len(arr), out, seg_ends,
                                       seg_marks, max_segs)
        if n > 0:
            ends = seg_ends[:n]
            starts = np.concatenate([[0], ends[:-1]])
            return out[:int(ends[-1])], (ends - starts).astype(np.int64)
    segments = destuff_segments(data, use_native)
    flat = np.frombuffer(b"".join(segments), dtype=np.uint8)
    return flat, np.array([len(s) for s in segments], dtype=np.int64)


def pack_lanes_sorted(flat: np.ndarray, lens64: np.ndarray,
                      order: np.ndarray, L: int) -> np.ndarray:
    """(S, L) zero-padded uint8 lane matrix from the flat destuffed
    buffer, rows permuted by ``order`` (the load-balancing length sort) —
    the HOST-side replacement for the device lane gather. An XLA per-lane
    row gather costs ~0.6 us per lane on the target chip (~4.5 ms/frame
    at 1080p ri=1, BENCH_NOTES round 5) while this is a strided memcpy
    (C++, ~0.1 ms) and the padded upload rides a ~650 MB/s link. ``L``
    must be >= lens64.max() + 4 (guard bytes for the 32-bit peek
    windows, the device analog of zero-past-EOF —
    bitstream_reader.ml:36-57)."""
    S = len(lens64)
    starts = np.zeros(S, np.int64)
    np.cumsum(lens64[:-1], out=starts[1:])
    out = np.zeros((S, L), np.uint8)
    lib = native.load()
    if lib is not None and hasattr(lib, "vct_pack_lanes"):
        lib.vct_pack_lanes(
            np.ascontiguousarray(flat, dtype=np.uint8), starts,
            np.ascontiguousarray(lens64, dtype=np.int64),
            np.ascontiguousarray(order, dtype=np.int32), S, L, out)
        return out
    # vectorized numpy fallback (one fancy-index read)
    cols = np.arange(L, dtype=np.int64)[None, :]
    st = starts[order][:, None]
    ln = lens64[order].astype(np.int64)[:, None]
    idx = np.clip(st + cols, 0, len(flat) - 1)
    np.copyto(out, np.where(cols < ln, flat[idx], 0))
    return out


def index_scan(flat: np.ndarray, comp_idx: np.ndarray, stride: int,
               tables: DecoderTables
               ) -> tuple[np.ndarray, np.ndarray] | None:
    """Index ONE destuffed entropy segment for parallel decode: walk the
    symbol stream (no coefficient writes) recording, at every
    ``stride``-block boundary, the absolute bit position and the running
    DC predictors. The records turn a foreign restart-free stream into
    ceil(n_blocks/stride) independent virtual segments, each decodable
    bit-exactly on its own device lane — the deterministic alternative
    to speculative intra-segment decode (VERDICT r2 item 9).

    Returns (bit_offsets (R,) int64, dc_preds (R, 8) int32). Uses the
    native symbol walk when the engine is available, else a pure-Python
    mirror (same semantics, ~100x slower — it keeps the indexed parallel
    decode working on .so-less installs; VERDICT r3 item 8)."""
    lib = native.load()
    if lib is None or not hasattr(lib, "vct_index_scan"):
        return _index_scan_py(flat, comp_idx, stride, tables)
    n_blocks = len(comp_idx)
    comp_idx = np.ascontiguousarray(comp_idx, dtype=np.int32)
    flat = np.ascontiguousarray(flat, dtype=np.uint8)
    R = (n_blocks + stride - 1) // stride
    bit_offsets = np.zeros(R, dtype=np.int64)
    dc_preds = np.zeros((R, 8), dtype=np.int32)
    rc = lib.vct_index_scan(
        flat, len(flat), comp_idx, n_blocks, len(tables.dc_maxbits),
        tables.dc_maxbits, tables.dc_lut, tables.dc_off,
        tables.ac_maxbits, tables.ac_lut, tables.ac_off,
        stride, bit_offsets, dc_preds.reshape(-1))
    if rc != 0:
        raise ValueError(f"index scan failed at block {-rc - 1}")
    return bit_offsets, dc_preds


def _index_scan_py(flat: np.ndarray, comp_idx: np.ndarray, stride: int,
                   tables: DecoderTables) -> tuple[np.ndarray, np.ndarray]:
    """Pure-Python mirror of the native vct_index_scan symbol walk
    (native/entropy.cpp vct_index_scan): a rolling 64-bit window reader,
    DC magnitudes decoded only for the running predictors, AC symbols
    length-skipped. Bit-for-bit identical records to the native walk."""
    data = flat.tobytes()
    dlen = len(data)
    n_blocks = len(comp_idx)
    R = (n_blocks + stride - 1) // stride
    bit_offsets = np.zeros(R, dtype=np.int64)
    dc_preds = np.zeros((R, 8), dtype=np.int32)
    C = len(tables.dc_maxbits)
    dc_luts = [(t.max_bits, t.lengths, t.data) for t in tables.dc_luts]
    ac_luts = [(t.max_bits, t.lengths, t.data) for t in tables.ac_luts]

    window = 0
    wbits = 0
    bytepos = 0

    def refill(n):
        nonlocal window, wbits, bytepos
        while wbits < n:
            b = data[bytepos] if bytepos < dlen else 0
            bytepos += 1
            window = ((window << 8) | b) & 0xFFFFFFFFFFFFFFFF
            wbits += 8

    dc_pred = [0] * 8
    rec = 0
    for blk in range(n_blocks):
        if blk % stride == 0:
            bit_offsets[rec] = bytepos * 8 - wbits
            dc_preds[rec, :] = dc_pred
            rec += 1
        c = int(comp_idx[blk])
        if c < 0 or c >= C:
            raise ValueError(f"index scan failed at block {blk}")
        mb, lengths, lut_data = dc_luts[c]
        refill(mb)
        idx = (window >> (wbits - mb)) & ((1 << mb) - 1) if mb else 0
        ln = int(lengths[idx])
        if ln == 0:
            raise ValueError(f"index scan failed at block {blk}")
        wbits -= ln
        cat = int(lut_data[idx])
        if cat > 15:
            raise ValueError(f"index scan failed at block {blk}")
        if cat:
            refill(cat)
            bits = (window >> (wbits - cat)) & ((1 << cat) - 1)
            wbits -= cat
            dc_pred[c] += bits if bits >= (1 << (cat - 1)) \
                else bits - (1 << cat) + 1
        amb, alengths, adata = ac_luts[c]
        cof = 1
        while cof < 64:
            refill(amb)
            idx = (window >> (wbits - amb)) & ((1 << amb) - 1)
            ln = int(alengths[idx])
            if ln == 0:
                raise ValueError(f"index scan failed at block {blk}")
            wbits -= ln
            e = int(adata[idx])
            run, size = (e >> 4) & 0xF, e & 0xF
            if size:
                refill(size)
                wbits -= size
            elif run == 0:
                break  # EOB
            cof += run + 1
            if cof > 64:
                raise ValueError(f"index scan failed at block {blk}")
    return bit_offsets, dc_preds


def destuff_and_decode_scan(data: bytes, comp_idx: np.ndarray,
                            blocks_per_segment: int, tables: DecoderTables,
                            n_threads: int | None = None) -> np.ndarray:
    """Fused native destuff + Huffman decode of a raw (stuffed) entropy
    stream: the destuffed bytes stay in one contiguous C++ buffer and feed
    vct_decode_blocks directly — no per-segment Python bytes objects, no
    re-join (~10 ms/frame saved at 8160 segments on 1080p). Semantics are
    identical to destuff_segments + decode_scan."""
    lib = native.load()
    n_blocks = len(comp_idx)
    comp_idx = np.ascontiguousarray(comp_idx, dtype=np.int32)
    if lib is None:
        return decode_scan(destuff_segments(data, use_native=False),
                           comp_idx, blocks_per_segment, tables,
                           use_native=False, n_threads=n_threads)
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size == 0:
        arr = np.zeros(1, dtype=np.uint8)
    out = np.empty(len(data) + 1, dtype=np.uint8)
    max_segs = len(data) // 2 + 2
    seg_ends = np.zeros(max_segs, dtype=np.int64)
    n = int(lib.vct_destuff_segments(arr, len(data), out, seg_ends,
                                     max_segs))
    if n <= 0:
        raise ValueError("destuff failed on entropy stream")
    expected = (n_blocks + blocks_per_segment - 1) // blocks_per_segment
    if n != expected:
        raise ValueError(
            f"expected {expected} restart segments for {n_blocks} blocks "
            f"(interval {blocks_per_segment}), got {n}")
    offsets = np.zeros(n + 1, dtype=np.int64)
    offsets[1:] = seg_ends[:n]
    coefs = np.zeros((n_blocks, 64), dtype=np.int32)
    nt = n_threads if n_threads is not None else _default_threads()
    rc = lib.vct_decode_blocks(
        out, offsets, n, comp_idx, n_blocks, blocks_per_segment,
        len(tables.dc_maxbits),
        tables.dc_maxbits, tables.dc_lut, tables.dc_off,
        tables.ac_maxbits, tables.ac_lut, tables.ac_off,
        coefs.reshape(-1), nt)
    if rc != 0:
        raise ValueError(f"entropy decode failed at block {-rc - 1}")
    return coefs


def encode_scan_stream(qcoefs: np.ndarray, comp_idx: np.ndarray,
                       blocks_per_segment: int, tables: EncoderTables,
                       n_threads: int | None = None) -> bytes:
    """Entropy-encode a whole scan straight to its on-the-wire entropy
    body — stuffed segment bytes joined with RSTn markers — staying in
    C++ buffers end to end (no per-segment Python bytes objects).

    Accepts int16 coefficients directly (the device download format; the
    quantized range is ±2047) so no host-side widening pass is needed.
    The 12-bit magnitude range is enforced inside the encode loop."""
    n_blocks = len(comp_idx)
    n_segments = (n_blocks + blocks_per_segment - 1) // blocks_per_segment
    lib = native.load()
    if lib is None:
        segments = encode_scan(qcoefs, comp_idx, blocks_per_segment,
                               tables, use_native=False,
                               n_threads=n_threads)
        out = bytearray()
        for i, seg in enumerate(segments):
            if i > 0:
                out += bytes((0xFF, 0xD0 + ((i - 1) & 7)))
            out += seg
        return bytes(out)
    if (isinstance(qcoefs, np.ndarray) and qcoefs.dtype == np.int16
            and qcoefs.flags.c_contiguous):
        q = qcoefs
        encode_fn = lib.vct_encode_blocks_i16
    else:
        q = np.ascontiguousarray(qcoefs, dtype=np.int32)
        encode_fn = lib.vct_encode_blocks
    comp_idx = np.ascontiguousarray(comp_idx, dtype=np.int32)
    nt = n_threads if n_threads is not None else _default_threads()
    # lean buffer first; the absolute worst case (≤209 raw bytes/block,
    # ≤2x after stuffing) on demand
    for per_block in (260, 64 * 8):
        seg_stride = blocks_per_segment * per_block + 256
        out = np.empty(n_segments * seg_stride, dtype=np.uint8)
        seg_lens = np.zeros(n_segments, dtype=np.int64)
        rc = encode_fn(
            q.reshape(-1), comp_idx, n_blocks, blocks_per_segment,
            n_segments, len(tables.dc_bits) // 12,
            tables.dc_bits, tables.dc_len, tables.ac_bits, tables.ac_len,
            out, seg_stride, seg_lens, nt)
        if rc == 0:
            break
    else:
        # worst-case buffers can't overflow, so a surviving error carries
        # one of the engine's distinct causes (entropy.cpp VCT_E*)
        if rc == -2:
            raise ValueError("comp_idx entry outside the packed table "
                             "range [0, n_components)")
        if rc == -1000000000:
            raise ValueError("native entropy engine supports at most 8 "
                             "scan components")
        raise ValueError("quantized coefficients exceed the 12-bit "
                         "baseline-JPEG range")
    total = int(seg_lens.sum()) + 2 * (n_segments - 1)
    dst = np.empty(max(total, 1), dtype=np.uint8)
    n = lib.vct_assemble_stream(out, seg_stride, seg_lens, n_segments, dst)
    return dst[:n].tobytes()


def rst_marker_indices(data: bytes) -> list[int]:
    """The RSTn modulo-8 indices of a raw (stuffed) entropy-coded
    stream, in order."""
    return destuff_segments_with_markers(data)[1]


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------

class SegmentDecodeError(ValueError):
    """Malformed entropy data; ``block`` is the failing global block."""

    def __init__(self, block: int):
        super().__init__(f"entropy decode failed at block {block}")
        self.block = block


def _decode_segment_py(segment: bytes, comp_idx: np.ndarray, first: int,
                       count: int, tables: DecoderTables,
                       coefs: np.ndarray) -> None:
    """Decode ``count`` blocks of one restart segment into
    ``coefs[first:first+count]``. Raises SegmentDecodeError naming the
    failing (global) block index on malformed data."""
    _decode_blocks_from_bits(BitReader(segment), comp_idx, first, count,
                             tables, coefs)


def _decode_blocks_from_bits(bits: BitReader, comp_idx: np.ndarray,
                             first: int, count: int, tables: DecoderTables,
                             coefs: np.ndarray,
                             bit_limit: int | None = None) -> None:
    dc_preds = [0] * len(tables.dc_luts)
    for i in range(first, first + count):
        try:
            _decode_one_block(bits, comp_idx, i, tables, coefs, dc_preds)
        except SegmentDecodeError:
            raise
        except ValueError:
            # reader exhausted (cursor past end): decode error at block i
            raise SegmentDecodeError(i) from None
        # consuming past the segment's real bits means the block decoded
        # zero-fill garbage (truncated data) — an error, checked after
        # each block to match the native engine and the golden model
        if bit_limit is not None and bits.bit_pos > bit_limit:
            raise SegmentDecodeError(i)


def _decode_one_block(bits, comp_idx, i, tables, coefs, dc_preds):
    c = int(comp_idx[i])
    dc_tab = tables.dc_luts[c]
    ac_tab = tables.ac_luts[c]
    row = coefs[i]
    length, data = dc_tab.lookup(bits.show(dc_tab.max_bits))
    if length == 0:
        raise SegmentDecodeError(i)
    bits.advance(length)
    dc_preds[c] += mag(data, bits.get(data) if data else 0)
    row[0] = dc_preds[c]
    cof = 1
    while cof < 64:
        length, data = ac_tab.lookup(bits.show(ac_tab.max_bits))
        if length == 0:
            raise SegmentDecodeError(i)
        bits.advance(length)
        run, size = (data >> 4) & 0xF, data & 0xF
        val = mag(size, bits.get(size) if size else 0)
        if val == 0 and run == 0:
            break
        cof += run
        if cof >= 64:
            raise SegmentDecodeError(i)
        row[cof] = val
        cof += 1


def _native_decode(lib, segments, comp_idx, n_blocks, blocks_per_segment,
                   tables, coefs, n_threads, seg_status=None):
    """Shared native-call plumbing for strict and resync decode paths."""
    data = np.frombuffer(b"".join(segments), dtype=np.uint8)
    if data.size == 0:
        data = np.zeros(1, dtype=np.uint8)
    offsets = np.zeros(len(segments) + 1, dtype=np.int64)
    offsets[1:] = np.cumsum([len(s) for s in segments])
    nt = n_threads if n_threads is not None else _default_threads()
    if seg_status is None:
        return lib.vct_decode_blocks(
            data, offsets, len(segments),
            comp_idx, n_blocks, blocks_per_segment,
            len(tables.dc_maxbits),
            tables.dc_maxbits, tables.dc_lut, tables.dc_off,
            tables.ac_maxbits, tables.ac_lut, tables.ac_off,
            coefs.reshape(-1), nt)
    return lib.vct_decode_blocks_resync(
        data, offsets, len(segments),
        comp_idx, n_blocks, blocks_per_segment,
        len(tables.dc_maxbits),
        tables.dc_maxbits, tables.dc_lut, tables.dc_off,
        tables.ac_maxbits, tables.ac_lut, tables.ac_off,
        coefs.reshape(-1), seg_status, nt)


def decode_scan(segments: list[bytes], comp_idx: np.ndarray,
                blocks_per_segment: int, tables: DecoderTables,
                use_native: bool | None = None,
                n_threads: int | None = None) -> np.ndarray:
    """Huffman-decode a whole scan. Returns (n_blocks, 64) int32 zigzag
    coefficients with DC predictors resolved per segment."""
    n_blocks = len(comp_idx)
    expected = (n_blocks + blocks_per_segment - 1) // blocks_per_segment
    if len(segments) != expected:
        raise ValueError(
            f"expected {expected} restart segments for {n_blocks} blocks "
            f"(interval {blocks_per_segment}), got {len(segments)}")
    comp_idx = np.ascontiguousarray(comp_idx, dtype=np.int32)
    coefs = np.zeros((n_blocks, 64), dtype=np.int32)
    lib = native.load() if use_native in (None, True) else None
    if lib is not None:
        rc = _native_decode(lib, segments, comp_idx, n_blocks,
                            blocks_per_segment, tables, coefs, n_threads)
        if rc != 0:
            raise ValueError(f"entropy decode failed at block {-rc - 1}")
        return coefs
    # python fallback
    for s, segment in enumerate(segments):
        first = s * blocks_per_segment
        count = min(blocks_per_segment, n_blocks - first)
        _decode_segment_py(segment, comp_idx, first, count, tables, coefs)
    return coefs


def _decode_run_py(segment: bytes, comp_idx: np.ndarray, slot0: int,
                   n_slots: int, blocks_per_segment: int, n_blocks: int,
                   tables: DecoderTables, coefs: np.ndarray) -> list[int]:
    """Decode a multi-slot run: RST markers were lost, so ``segment``
    carries several slots' payloads back to back (each 1-padded to a byte
    boundary). DC predictors reset and bits re-align at every slot
    boundary. Returns the damaged slot indices (error → conceal to the end
    of the run, since the bit position is unreliable past it)."""
    B = blocks_per_segment
    bits = BitReader(segment)
    for t in range(n_slots):
        slot = slot0 + t
        first = slot * B
        count = min(B, n_blocks - first)
        if count <= 0:
            break
        if t:
            bits.align_to_byte()
        try:
            _decode_blocks_from_bits(bits, comp_idx, first, count, tables,
                                     coefs, bit_limit=8 * len(segment))
        except SegmentDecodeError as e:
            run_end = min((slot0 + n_slots) * B, n_blocks)
            coefs[e.block:run_end] = 0
            return [s for s in range(slot, slot0 + n_slots)
                    if s * B < n_blocks]
    return []


def decode_scan_resync(segments: list[bytes], comp_idx: np.ndarray,
                       blocks_per_segment: int, tables: DecoderTables,
                       use_native: bool | None = None,
                       n_threads: int | None = None,
                       marker_indices: list[int] | None = None
                       ) -> tuple[np.ndarray, list[int]]:
    """Error-concealing scan decode using restart-marker resynchronization
    (the standard recovery mechanism the reference leaves TODO —
    jpeg/README.md:36).

    A decode error inside a segment conceals it from the failing block
    onward (all-zero coefficients → mid-gray after reconstruction); the
    valid prefix is kept and decode resumes cleanly at the next RSTn
    because segments are independent. With ``marker_indices`` (the RSTn
    modulo-8 terminator indices, from ``rst_marker_indices``), segments
    are re-aligned by index first, so *marker* damage is survivable too: a
    destroyed RSTn merges two received segments, which are detected by the
    index jump and decoded back-to-back — full recovery instead of
    shifting (and garbling) every later segment. Truncated streams conceal
    the missing segments; extras are ignored.

    Returns ``(coefs, damaged)`` — the (n_blocks, 64) int32 coefficient
    tensor and the sorted list of damaged segment indices. Bit-identical
    between the native and Python paths, and with the golden model's
    ``decode_entropy(resync=True)``."""
    from ..model.decoder import plan_segment_alignment

    B = blocks_per_segment
    n_blocks = len(comp_idx)
    expected = (n_blocks + B - 1) // B
    comp_idx = np.ascontiguousarray(comp_idx, dtype=np.int32)
    coefs = np.zeros((n_blocks, 64), dtype=np.int32)
    if marker_indices is not None and len(marker_indices) == len(segments) - 1:
        items, uncovered = plan_segment_alignment(
            marker_indices, len(segments), expected)
    else:
        n_avail = min(len(segments), expected)
        items = [(s, 1, s) for s in range(n_avail)]
        uncovered = list(range(n_avail, expected))
    damaged = set(uncovered)
    # contiguous single-slot stretches go to the native bulk decoder;
    # multi-slot runs (marker loss) take the python path — rare by
    # construction
    groups: list[tuple[int, list[int]]] = []
    runs = []
    for slot0, n_slots, j in items:
        if n_slots == 1:
            if groups and groups[-1][0] + len(groups[-1][1]) == slot0:
                groups[-1][1].append(j)
            else:
                groups.append((slot0, [j]))
        else:
            runs.append((slot0, n_slots, j))
    lib = native.load() if use_native in (None, True) else None
    for slot0, js in groups:
        first = slot0 * B
        count_blocks = min(len(js) * B, n_blocks - first)
        if count_blocks <= 0:
            continue
        segs = [segments[j] for j in js]
        if lib is not None:
            seg_status = np.zeros(len(js), dtype=np.int64)
            rc = _native_decode(lib, segs, comp_idx[first:], count_blocks,
                                B, tables, coefs[first:], n_threads,
                                seg_status=seg_status)
            if rc < 0:
                raise ValueError("entropy decode failed")
            damaged.update(slot0 + int(s)
                           for s in np.nonzero(seg_status)[0])
            continue
        for t, segment in enumerate(segs):
            sfirst = (slot0 + t) * B
            count = min(B, n_blocks - sfirst)
            if count <= 0:
                break
            try:
                _decode_blocks_from_bits(
                    BitReader(segment), comp_idx, sfirst, count, tables,
                    coefs, bit_limit=8 * len(segment))
            except SegmentDecodeError as e:
                coefs[e.block:sfirst + count] = 0  # partial failing block
                damaged.add(slot0 + t)
    for slot0, n_slots, j in runs:
        damaged.update(_decode_run_py(segments[j], comp_idx, slot0,
                                      n_slots, B, n_blocks, tables, coefs))
    return coefs, sorted(damaged)


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------

def encode_scan(qcoefs: np.ndarray, comp_idx: np.ndarray,
                blocks_per_segment: int, tables: EncoderTables,
                use_native: bool | None = None,
                n_threads: int | None = None) -> list[bytes]:
    """Entropy-encode a whole scan. Returns one stuffed, 1-bit-padded byte
    buffer per restart segment (caller joins with RSTn markers)."""
    n_blocks = len(comp_idx)
    qcoefs = np.ascontiguousarray(qcoefs, dtype=np.int32)
    if np.abs(qcoefs).max(initial=0) > 2047:
        # the Huffman magnitude range is 11 bits (DC diff ≤ cat 11, AC ≤
        # cat 10); larger values would index past the code tables
        raise ValueError("quantized coefficients exceed the 12-bit "
                         "baseline-JPEG range")
    comp_idx = np.ascontiguousarray(comp_idx, dtype=np.int32)
    n_segments = (n_blocks + blocks_per_segment - 1) // blocks_per_segment
    lib = native.load() if use_native in (None, True) else None
    if lib is not None:
        # typical streams fit the lean buffer; escalate to the absolute
        # worst case (≤209 raw bytes/block, ≤2x after stuffing) on demand
        for per_block in (260, 64 * 8):
            seg_stride = blocks_per_segment * per_block + 256
            out = np.empty(n_segments * seg_stride, dtype=np.uint8)
            seg_lens = np.zeros(n_segments, dtype=np.int64)
            rc = lib.vct_encode_blocks(
                qcoefs.reshape(-1), comp_idx, n_blocks, blocks_per_segment,
                n_segments, len(tables.dc_bits) // 12,
                tables.dc_bits, tables.dc_len, tables.ac_bits, tables.ac_len,
                out, seg_stride, seg_lens,
                n_threads if n_threads is not None else _default_threads())
            if rc == 0:
                return [out[s * seg_stride:s * seg_stride + seg_lens[s]]
                        .tobytes() for s in range(n_segments)]
        if rc == -2:
            raise ValueError("comp_idx entry outside the packed table "
                             "range [0, n_components)")
        if rc == -1000000000:
            raise ValueError("native entropy engine supports at most 8 "
                             "scan components")
        raise ValueError(f"entropy encode failed (native error {rc})")
    # python fallback
    ncomp = len(tables.dc_bits) // 12
    result = []
    for s in range(n_segments):
        first = s * blocks_per_segment
        count = min(blocks_per_segment, n_blocks - first)
        w = BitWriter()
        dc_pred = [0] * ncomp
        for b in range(first, first + count):
            c = int(comp_idx[b])
            q = qcoefs[b]
            dc = int(q[0])
            diff = dc - dc_pred[c]
            dc_pred[c] = dc
            size = size_category(diff)
            w.put_bits(int(tables.dc_bits[c * 12 + size]),
                       int(tables.dc_len[c * 12 + size]), stuffing=True)
            w.put_bits(magnitude_bits(size, diff), size, stuffing=True)
            nz = np.nonzero(q[1:])[0]
            if len(nz) == 0:
                w.put_bits(int(tables.ac_bits[c * 176]),
                           int(tables.ac_len[c * 176]), stuffing=True)
                continue
            last_nz = int(nz[-1]) + 1
            run = 0
            for pos in range(1, last_nz + 1):
                v = int(q[pos])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    w.put_bits(int(tables.ac_bits[c * 176 + 15 * 11]),
                               int(tables.ac_len[c * 176 + 15 * 11]),
                               stuffing=True)
                    run -= 16
                sz = size_category(v)
                idx = c * 176 + run * 11 + sz
                w.put_bits(int(tables.ac_bits[idx]), int(tables.ac_len[idx]),
                           stuffing=True)
                w.put_bits(magnitude_bits(sz, v), sz, stuffing=True)
                run = 0
            if last_nz < 63:
                w.put_bits(int(tables.ac_bits[c * 176]),
                           int(tables.ac_len[c * 176]), stuffing=True)
        w.flush_with_1s(stuffing=True)
        result.append(w.get_buffer())
    return result
