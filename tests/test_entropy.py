"""Entropy tier tests: native C++ engine vs pure-Python fallback vs model.

The analog of the reference's codeword/codeblock decoder testbenches
(test_codeblock_decoder.ml, test_huffman_encode.ml) — the native engine is
driven with model-extracted streams and compared against the golden model.
"""

import numpy as np
import pytest

from video_coding_tpu.common.bitstream import BitReader
from video_coding_tpu.entropy import (decode_scan, destuff_segments,
                                      encode_scan, native_available)
from video_coding_tpu.entropy.tables import (pack_decoder_tables,
                                             pack_encoder_tables)
from video_coding_tpu.model import decoder as mdec
from video_coding_tpu.model import encoder as menc
from video_coding_tpu.model.huffman import (AC_CHROMA, AC_LUMA, DC_CHROMA,
                                            DC_LUMA)


def test_native_library_builds():
    assert native_available(), "native entropy engine must build"


@pytest.fixture(scope="module")
def mouse_decoder(request):
    data = open("/root/reference/jpeg/test_data/Mouse480.jpg", "rb").read()
    bits = BitReader(data)
    header = mdec.Header.decode(bits)
    return mdec.Decoder(header, bits), data


def test_destuff_matches_model(mouse_decoder):
    dec, data = mouse_decoder
    bits = BitReader(data)
    mdec.Header.decode(bits)
    segs_model = mdec.extract_entropy_segments(bits)
    bits2 = BitReader(data)
    mdec.Header.decode(bits2)
    segs_native = destuff_segments(
        data[bits2.bit_pos >> 3:], use_native=True)
    assert segs_native == segs_model


def test_native_decode_matches_model(mouse_decoder):
    dec, _ = mouse_decoder
    golden = dec.decode_entropy()
    tables = pack_decoder_tables([c.dc_tab for c in dec.components],
                                 [c.ac_tab for c in dec.components])
    comp_idx = np.array([s[0] for s in dec.block_schedule()], dtype=np.int32)
    for use_native in (True, False):
        coefs = decode_scan(dec.entropy_segments, comp_idx,
                            dec.blocks_per_segment
                            if hasattr(dec, "blocks_per_segment")
                            else len(comp_idx),
                            tables, use_native=use_native)
        assert np.array_equal(coefs, golden)


def test_native_encode_matches_python_fallback():
    rng = np.random.default_rng(42)
    n = 96
    # realistic-ish sparse coefficients incl. long zero runs (ZRL paths)
    qcoefs = rng.integers(-40, 40, size=(n, 64)).astype(np.int32)
    qcoefs[:, 20:60] = 0
    qcoefs[5] = 0          # all-zero block → EOB immediately
    qcoefs[7, 63] = 3      # coefficient at position 63 → no trailing EOB
    qcoefs[9, 1:63] = 0    # 62-zero run then coef → multiple ZRLs
    qcoefs[9, 63] = -1
    comp_idx = np.tile(np.array([0, 0, 0, 0, 1, 2], dtype=np.int32), 16)
    tables = pack_encoder_tables([DC_LUMA, DC_CHROMA, DC_CHROMA],
                                 [AC_LUMA, AC_CHROMA, AC_CHROMA])
    for bps in (n, 6, 12):
        nat = encode_scan(qcoefs, comp_idx, bps, tables, use_native=True)
        py = encode_scan(qcoefs, comp_idx, bps, tables, use_native=False)
        assert nat == py, f"bps={bps}"


def test_encode_decode_roundtrip_through_entropy():
    """encode_scan output decodes back to the same coefficients."""
    rng = np.random.default_rng(7)
    n = 24
    qcoefs = rng.integers(-100, 100, size=(n, 64)).astype(np.int32)
    qcoefs[:, 32:] = 0
    comp_idx = np.zeros(n, dtype=np.int32)
    enc_tables = pack_encoder_tables([DC_LUMA], [AC_LUMA])
    from video_coding_tpu.model.huffman import Lut
    dec_tables = pack_decoder_tables(
        [Lut(DC_LUMA.dc_code_table(), ac=False)],
        [Lut(AC_LUMA.ac_code_table(), ac=True)])
    for bps in (n, 4):
        segments = encode_scan(qcoefs, comp_idx, bps, enc_tables)
        # encode_scan emits stuffed bytes (the on-the-wire format);
        # decode_scan consumes destuffed segments
        destuffed = [destuff_segments(s)[0] for s in segments]
        decoded = decode_scan(destuffed, comp_idx, bps, dec_tables)
        assert np.array_equal(decoded, qcoefs)


def test_multithreaded_segments_deterministic():
    rng = np.random.default_rng(3)
    n = 512
    qcoefs = rng.integers(-20, 20, size=(n, 64)).astype(np.int32)
    qcoefs[:, 16:] = 0
    comp_idx = np.zeros(n, dtype=np.int32)
    enc_tables = pack_encoder_tables([DC_LUMA], [AC_LUMA])
    a = encode_scan(qcoefs, comp_idx, 8, enc_tables, n_threads=1)
    b = encode_scan(qcoefs, comp_idx, 8, enc_tables, n_threads=8)
    assert a == b
    from video_coding_tpu.model.huffman import Lut
    dec_tables = pack_decoder_tables(
        [Lut(DC_LUMA.dc_code_table(), ac=False)],
        [Lut(AC_LUMA.ac_code_table(), ac=True)])
    destuffed = [destuff_segments(s)[0] for s in a]
    c1 = decode_scan(destuffed, comp_idx, 8, dec_tables, n_threads=1)
    c8 = decode_scan(destuffed, comp_idx, 8, dec_tables, n_threads=8)
    assert np.array_equal(c1, c8)
    assert np.array_equal(c1, qcoefs)


def test_decode_error_on_garbage():
    tables = pack_decoder_tables([], [])
    # no components → comp_idx out of range must raise, not crash
    from video_coding_tpu.model.huffman import Lut
    tables = pack_decoder_tables(
        [Lut(DC_LUMA.dc_code_table(), ac=False)],
        [Lut(AC_LUMA.ac_code_table(), ac=True)])
    bad_comp = np.array([5], dtype=np.int32)
    with pytest.raises(ValueError):
        decode_scan([b"\xff\xff\xff\xff"], bad_comp, 1, tables,
                    use_native=True)


def test_fused_destuff_and_decode_matches_two_step():
    """destuff_and_decode_scan (fused C++ buffer path) == destuff +
    decode_scan on a restart-segmented stream incl. stuffed bytes."""
    from video_coding_tpu.entropy.scan import destuff_and_decode_scan
    from video_coding_tpu.model.huffman import Lut

    rng = np.random.default_rng(11)
    n = 48
    qcoefs = rng.integers(-120, 120, size=(n, 64)).astype(np.int32)
    qcoefs[:, 24:] = 0
    comp_idx = np.zeros(n, dtype=np.int32)
    enc_tables = pack_encoder_tables([DC_LUMA], [AC_LUMA])
    dec_tables = pack_decoder_tables(
        [Lut(DC_LUMA.dc_code_table(), ac=False)],
        [Lut(AC_LUMA.ac_code_table(), ac=True)])
    for bps in (n, 8, 6):
        segments = encode_scan(qcoefs, comp_idx, bps, enc_tables)
        # raw on-the-wire bytes: segments joined with RSTn markers
        raw = bytearray(segments[0])
        for i, seg in enumerate(segments[1:]):
            raw += bytes((0xFF, 0xD0 + (i & 7)))
            raw += seg
        fused = destuff_and_decode_scan(bytes(raw), comp_idx, bps,
                                        dec_tables)
        destuffed = destuff_segments(bytes(raw))
        two_step = decode_scan(destuffed, comp_idx, bps, dec_tables)
        assert np.array_equal(fused, two_step)
        assert np.array_equal(fused, qcoefs)


def test_encode_scan_stream_matches_segments_join():
    """encode_scan_stream (fused C++ encode+RSTn assembly, int16 and
    int32 inputs) == encode_scan segments joined with RSTn markers."""
    from video_coding_tpu.entropy.scan import encode_scan_stream

    rng = np.random.default_rng(3)
    n = 60
    qcoefs = rng.integers(-200, 200, size=(n, 64)).astype(np.int32)
    qcoefs[:, 30:] = 0
    comp_idx = np.tile(np.array([0, 0, 1, 2], dtype=np.int32), 15)
    tables = pack_encoder_tables([DC_LUMA, DC_CHROMA, DC_CHROMA],
                                 [AC_LUMA, AC_CHROMA, AC_CHROMA])
    for bps in (n, 4, 8):
        segments = encode_scan(qcoefs, comp_idx, bps, tables)
        ref = bytearray(segments[0])
        for i, seg in enumerate(segments[1:]):
            ref += bytes((0xFF, 0xD0 + (i & 7)))
            ref += seg
        for q in (qcoefs, qcoefs.astype(np.int16)):
            got = encode_scan_stream(q, comp_idx, bps, tables)
            assert got == bytes(ref), (bps, q.dtype)


def test_encode_scan_stream_range_error():
    from video_coding_tpu.entropy.scan import encode_scan_stream

    qcoefs = np.zeros((4, 64), dtype=np.int32)
    qcoefs[1, 0] = 4096  # DC beyond the 12-bit baseline range
    comp_idx = np.zeros(4, dtype=np.int32)
    tables = pack_encoder_tables([DC_LUMA], [AC_LUMA])
    with pytest.raises(ValueError):
        encode_scan_stream(qcoefs, comp_idx, 4, tables)
