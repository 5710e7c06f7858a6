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
    lib = native.load() if use_native in (None, True) else None
    if lib is not None:
        arr = np.frombuffer(data, dtype=np.uint8)
        out = np.empty(len(data) + 1, dtype=np.uint8)
        max_segs = len(data) // 2 + 2
        seg_ends = np.zeros(max_segs, dtype=np.int64)
        n = lib.vct_destuff_segments(arr, len(arr), out, seg_ends, max_segs)
        if n > 0:
            ends = seg_ends[:n]
            starts = np.concatenate([[0], ends[:-1]])
            return [out[s:e].tobytes() for s, e in zip(starts, ends)]
    # python fallback (same as model/decoder.extract_entropy_segments core)
    from ..model.decoder import extract_entropy_segments
    bits = BitReader(data)
    return extract_entropy_segments(bits)


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------

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
        data = np.frombuffer(b"".join(segments), dtype=np.uint8)
        if data.size == 0:
            data = np.zeros(1, dtype=np.uint8)
        offsets = np.zeros(len(segments) + 1, dtype=np.int64)
        offsets[1:] = np.cumsum([len(s) for s in segments])
        rc = lib.vct_decode_blocks(
            data, offsets, len(segments),
            comp_idx, n_blocks, blocks_per_segment,
            len(tables.dc_maxbits),
            tables.dc_maxbits, tables.dc_lut, tables.dc_off,
            tables.ac_maxbits, tables.ac_lut, tables.ac_off,
            coefs.reshape(-1),
            n_threads if n_threads is not None else _default_threads())
        if rc != 0:
            raise ValueError(f"entropy decode failed at block {-rc - 1}")
        return coefs
    # python fallback
    seg = 0
    bits = BitReader(segments[0])
    dc_preds = [0] * len(tables.dc_luts)
    for i in range(n_blocks):
        if i > 0 and i % blocks_per_segment == 0:
            seg += 1
            bits = BitReader(segments[seg])
            dc_preds = [0] * len(tables.dc_luts)
        c = int(comp_idx[i])
        dc_tab = tables.dc_luts[c]
        ac_tab = tables.ac_luts[c]
        row = coefs[i]
        length, data = dc_tab.lookup(bits.show(dc_tab.max_bits))
        if length == 0:
            raise ValueError(f"entropy decode failed at block {i}")
        bits.advance(length)
        dc_preds[c] += mag(data, bits.get(data) if data else 0)
        row[0] = dc_preds[c]
        cof = 1
        while cof < 64:
            length, data = ac_tab.lookup(bits.show(ac_tab.max_bits))
            if length == 0:
                raise ValueError(f"entropy decode failed at block {i}")
            bits.advance(length)
            run, size = (data >> 4) & 0xF, data & 0xF
            val = mag(size, bits.get(size) if size else 0)
            if val == 0 and run == 0:
                break
            cof += run
            if cof >= 64:
                raise ValueError(f"entropy decode failed at block {i}")
            row[cof] = val
            cof += 1
    return coefs


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
        raise ValueError("entropy encode failed")
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
