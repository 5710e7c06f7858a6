"""Expect-style golden snapshots (the reference's %expect test culture):
exact per-block pipeline state of a real stream, and four-component scans.
"""

import numpy as np

from video_coding_tpu.common.bitstream import BitReader
from video_coding_tpu.common.plane import Plane
from video_coding_tpu.model import decoder as mdec
from video_coding_tpu.model import encoder as menc
from video_coding_tpu.model.util import (coef_block_to_string,
                                         pixel_block_to_string)


def test_mouse_first_block_pipeline_golden(mouse_jpg):
    """Snapshot of the first decoded block of Mouse480.jpg — locks down
    every pipeline stage bit-for-bit (huffman, dequant, IDCT, recon)."""
    bits = BitReader(mouse_jpg)
    dec = mdec.Decoder(mdec.Header.decode(bits), bits)
    comp = next(dec.decode_blocks_seq())
    assert comp.component.identifier == 1
    assert comp.dc_pred == 20
    # zigzag coefficients of block 0 (hex, wrapped to 12 bits)
    assert coef_block_to_string(comp.coefs).splitlines()[0] == \
        "014 001 ffe fff 001 000 000 000"
    # reconstructed pixels of block 0
    recon_rows = pixel_block_to_string(comp.recon).splitlines()
    assert recon_rows[0] == "e0 de db d6 d1 cd ca c8"
    assert recon_rows[7] == "e6 e7 e7 e8 e9 ea eb eb"


def test_mouse_header_golden(mouse_jpg):
    bits = BitReader(mouse_jpg)
    h = mdec.Header.decode(bits)
    assert (h.frame.width, h.frame.height) == (480, 320)
    assert [c.identifier for c in h.frame.components] == [1, 2, 3]
    assert [(c.horizontal_sampling_factor, c.vertical_sampling_factor)
            for c in h.frame.components] == [(2, 2), (1, 1), (1, 1)]
    assert len(h.quant_tables) == 2
    assert len(h.huffman_tables) == 4
    assert h.scan.number_of_image_components == 3


def test_four_component_scan_roundtrip():
    """The reference hardware caps at 4 components (scan_controller.ml:16);
    the model/engine handle a CMYK-style 4-component interleaved scan."""
    from video_coding_tpu.model.encoder import (Encoder, Identified,
                                                Parameters,
                                                ScanComponentParams)
    from video_coding_tpu.model.huffman import (AC_CHROMA, AC_LUMA,
                                                DC_CHROMA, DC_LUMA)
    from video_coding_tpu.model import quant_tables

    rng = np.random.default_rng(0)
    qt = quant_tables.scale(quant_tables.LUMA, 80)
    params = Parameters(
        width=32, height=32,
        quant_tables=(Identified(0, qt),),
        dc_huffman_tables=(Identified(0, DC_LUMA), Identified(1, DC_CHROMA)),
        ac_huffman_tables=(Identified(0, AC_LUMA), Identified(1, AC_CHROMA)),
        scan_components=tuple(
            ScanComponentParams(0, i % 2, i % 2, i + 1, 1, 1)
            for i in range(4)),
    )
    enc = Encoder(params)
    planes = []
    for s in enc.scans:
        data = rng.integers(0, 256, (32, 32), dtype=np.uint8)
        s.plane.data[...] = data
        planes.append(data)
    enc.write_headers()
    enc.encode()
    enc.complete_and_write_eoi()
    stream = enc.writer.get_buffer()

    bits = BitReader(stream)
    dec = mdec.Decoder(mdec.Header.decode(bits), bits)
    dec.decode()
    outs = dec.get_planes()
    assert len(outs) == 4
    for src, out in zip(planes, outs):
        d = np.abs(src.astype(int) - out.data.astype(int))
        assert d.mean() < 20  # lossy but sane at q=80 on noise


def test_engine_decodes_foreign_single_segment_streams(mouse_jpg):
    """Foreign camera JPEG (no DRI) through every engine decode path."""
    from video_coding_tpu.runtime import engine

    bits = BitReader(mouse_jpg)
    header = mdec.Header.decode(bits)
    payload = mouse_jpg[bits.bit_pos >> 3:]
    ref = mdec.decode_a_frame(mouse_jpg)

    sess = engine.JpegDecoderSession(header)
    for method in ("decode", "decode_device"):
        out = getattr(sess, method)(payload)
        for p in "yuv":
            assert (getattr(out, p).data == getattr(ref, p).data).all(), method

    tpu_entropy = engine.JpegDecoderSession(header, entropy="tpu")
    out = tpu_entropy.decode(payload)
    for p in "yuv":
        assert (getattr(out, p).data == getattr(ref, p).data).all()


def test_mini_jpg_through_engine():
    data = open("/root/reference/jpeg/test_data/mini.jpg", "rb").read()
    from video_coding_tpu.runtime import engine

    ref = mdec.decode_a_frame(data)
    out = engine.decode_jpeg(data)
    for p in "yuv":
        assert (getattr(out, p).data == getattr(ref, p).data).all()


def test_truncated_header_raises_not_hangs():
    """A truncated JPEG header must raise promptly (the reference's
    marker-scan loop reads zero-fill forever)."""
    import pytest

    with pytest.raises(mdec.DecodeError):
        mdec.decode_a_frame(b"\xff\xd8\xff\xe0")
    with pytest.raises(mdec.DecodeError):
        mdec.decode_a_frame(b"\xff\xd8\xff\xc0\x00\x05\x08")


def test_width_17_mod_16_geometry():
    """Width/height ≡ 1 mod 16 used to under-size the chroma grid (the
    reference's 'known bug on the last block(s)', jpeg/README.md:22)."""
    from video_coding_tpu.common.frame import ChromaSubsampling, Frame
    from video_coding_tpu.runtime import engine

    rng = np.random.default_rng(3)
    for w, h in ((17, 16), (16, 17), (33, 33)):
        f = Frame.create(ChromaSubsampling.C420, w, h)
        f.y.data[...] = rng.integers(0, 256, f.y.data.shape, dtype=np.uint8)
        f.u.data[...] = 128
        f.v.data[...] = 128
        data = menc.encode_420(f, 85)
        assert engine.encode_jpeg(f, 85) == data
        dec = mdec.decode_a_frame(data)
        assert (dec.width, dec.height) == (w, h)
        eng = engine.decode_jpeg(data)
        for p in "yuv":
            assert (getattr(eng, p).data == getattr(dec, p).data).all()


def test_multi_table_dqt_dht_segments(mouse_jpg):
    """One DQT/DHT marker segment carrying several tables (T.81 B.2.4.x,
    common in ffmpeg output) must parse fully."""
    from video_coding_tpu.common.bitstream import BitWriter
    from video_coding_tpu.model import markers, quant_tables
    from video_coding_tpu.model.huffman import AC_LUMA, DC_LUMA

    w = BitWriter()
    # two quant tables in one segment
    qt0 = list(quant_tables.scale(quant_tables.LUMA, 75))
    qt1 = list(quant_tables.scale(quant_tables.CHROMA, 75))
    w.put_bits(2 + 2 * 65, 16, stuffing=False)
    for ident, qt in ((0, qt0), (1, qt1)):
        w.put_bits(0, 4, stuffing=False)
        w.put_bits(ident, 4, stuffing=False)
        for e in qt:
            w.put_bits(int(e), 8, stuffing=False)
    from video_coding_tpu.common.bitstream import BitReader as BR
    tables = markers.Dqt.decode_segment(BR(w.get_buffer()))
    assert len(tables) == 2
    assert tables[0].elements == [int(x) for x in qt0]
    assert tables[1].table_identifier == 1

    # two huffman tables in one segment
    w2 = BitWriter()
    payload_len = sum(1 + 16 + sum(s.lengths) for s in (DC_LUMA, AC_LUMA))
    w2.put_bits(2 + payload_len, 16, stuffing=False)
    for cls_id, spec in ((0, DC_LUMA), (1, AC_LUMA)):
        w2.put_bits(cls_id, 4, stuffing=False)
        w2.put_bits(0, 4, stuffing=False)
        for v in spec.lengths:
            w2.put_bits(v, 8, stuffing=False)
        for v in spec.values:
            w2.put_bits(v, 8, stuffing=False)
    huffs = markers.Dht.decode_segment(BR(w2.get_buffer()))
    assert len(huffs) == 2
    assert huffs[0].table_class == 0 and huffs[1].table_class == 1
    assert tuple(huffs[1].values) == AC_LUMA.values


def test_missing_restart_segments_raise():
    """Truncated restart streams must raise, not render black blocks."""
    import pytest
    from video_coding_tpu.entropy import decode_scan
    from video_coding_tpu.entropy.tables import pack_decoder_tables
    from video_coding_tpu.model.huffman import AC_LUMA, DC_LUMA, Lut

    tables = pack_decoder_tables(
        [Lut(DC_LUMA.dc_code_table(), ac=False)],
        [Lut(AC_LUMA.ac_code_table(), ac=True)])
    comp_idx = np.zeros(8, dtype=np.int32)
    for use_native in (True, False):
        with pytest.raises(ValueError):
            decode_scan([b"\x00" * 4] * 2, comp_idx, 2, tables,
                        use_native=use_native)


def test_16bit_dqt_stream_decodes():
    """DQT segments with 16-bit element precision (legal for 8-bit samples
    when values ≤ 255; we accept any) must decode identically."""
    from video_coding_tpu.common.bitstream import BitWriter
    from video_coding_tpu.common.frame import ChromaSubsampling, Frame
    from video_coding_tpu.model import markers

    rng = np.random.default_rng(4)
    f = Frame.create(ChromaSubsampling.C420, 32, 32)
    f.y.data[...] = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    f.u.data[...] = 128
    f.v.data[...] = 128
    stream = menc.encode_420(f, 75)
    ref = mdec.decode_a_frame(stream)

    # rewrite each 8-bit DQT as a 16-bit-precision segment, same values
    out = bytearray()
    i = 0
    while i < len(stream):
        if stream[i] == 0xFF and i + 1 < len(stream) and \
                stream[i + 1] == 0xDB:
            seg_len = (stream[i + 2] << 8) | stream[i + 3]
            bits = BitReader(stream[i + 2:i + 2 + seg_len])
            dqt = markers.Dqt.decode(bits)
            w = BitWriter()
            markers.Dqt(0, 16, dqt.table_identifier, dqt.elements).encode(w)
            out += b"\xff\xdb" + w.get_buffer()
            i += 2 + seg_len
        else:
            out.append(stream[i])
            i += 1
    wide = bytes(out)
    assert wide != stream
    got = mdec.decode_a_frame(wide)
    for p in "yuv":
        assert (getattr(got, p).data == getattr(ref, p).data).all()
