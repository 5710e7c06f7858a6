"""Entropy-coding tier: Huffman/RLE engines over restart segments.

The reference's entropy hardware (Bytestream_decoder, Codeword_decoder,
Codeblock_decoder, Huffman_encode, Bitstream_writer —
jpeg/hardcaml/src) maps here to:
- a native C++ engine (native/entropy.cpp) threaded across
  restart-interval segments — the host-side hot path;
- pure-Python fallbacks with identical semantics (always available);
- table packing shared by both and by the TPU-side decoder.
"""

from .scan import decode_scan, encode_scan, destuff_segments, native_available

__all__ = ["decode_scan", "encode_scan", "destuff_segments",
           "native_available"]
