"""Non-interleaved (multi-scan) JPEG support.

The reference explicitly does not support non-interleaved scans
(jpeg/README.md:15-45); this framework encodes and decodes them. Streams
carry one single-component SOS per component, each rastering its own
ceil(xi/8) × ceil(yi/8) block grid (T.81 A.2.2), with per-scan restart
intervals. The quantized coefficients are identical to the interleaved
encode of the same frame, so decoded pixels must match exactly.
"""

import io

import numpy as np
import pytest

from video_coding_tpu.common.frame import ChromaSubsampling, Frame
from video_coding_tpu.common.plane import Plane
from video_coding_tpu.model import decoder as mdec
from video_coding_tpu.model import encoder as menc
from video_coding_tpu.runtime import engine


def frames_equal(a, b):
    return all(np.array_equal(getattr(a, p).data, getattr(b, p).data)
               for p in "yuv")


@pytest.mark.parametrize("sub,enc_fn", [
    (ChromaSubsampling.C420, menc.encode_420),
    (ChromaSubsampling.C422, menc.encode_422),
    (ChromaSubsampling.C444, menc.encode_444),
])
def test_noninterleaved_roundtrip_matches_interleaved(sub, enc_fn,
                                                      mini64_frames):
    f = mini64_frames[sub]
    ref = mdec.decode_a_frame(enc_fn(f, 75))
    noni = enc_fn(f, 75, interleaved=False)
    assert frames_equal(mdec.decode_a_frame(noni), ref)


def test_noninterleaved_with_restart_intervals(mini64_frames):
    f = mini64_frames[ChromaSubsampling.C420]
    ref = mdec.decode_a_frame(menc.encode_420(f, 75))
    for ri in (1, 3, 7):
        noni = menc.encode_420(f, 75, restart_interval=ri,
                               interleaved=False)
        assert frames_equal(mdec.decode_a_frame(noni), ref)


def test_noninterleaved_stream_structure(mini64_frames):
    """Three single-component SOS markers, one SOF, valid per PIL."""
    f = mini64_frames[ChromaSubsampling.C420]
    noni = menc.encode_420(f, 75, interleaved=False)
    assert noni.count(b"\xff\xda") == 3  # one SOS per component
    assert noni.count(b"\xff\xc0") == 1
    from PIL import Image

    ours = mdec.decode_a_frame(noni)
    inter = menc.encode_420(f, 75)
    pil_n = np.asarray(Image.open(io.BytesIO(noni)).convert("YCbCr"))
    pil_i = np.asarray(Image.open(io.BytesIO(inter)).convert("YCbCr"))
    # an independent decoder sees the same image in both stream shapes
    assert np.array_equal(pil_n, pil_i)
    assert ours.y.data.shape == (64, 64)


def test_noninterleaved_odd_geometry(mini64_frames):
    """52x44 4:2:0 — the ceil-grid non-interleaved chroma scans cover
    exactly the spec block counts and decode to the interleaved pixels."""
    f = mini64_frames[ChromaSubsampling.C420]
    small = Frame.of_planes(Plane(data=f.y.data[:44, :52].copy()),
                            Plane(data=f.y.data[:22, :26].copy()),
                            Plane(data=f.y.data[:22, :26].copy()))
    ref = mdec.decode_a_frame(menc.encode_420(small, 75))
    noni = menc.encode_420(small, 75, restart_interval=2,
                           interleaved=False)
    assert frames_equal(mdec.decode_a_frame(noni), ref)


def test_engine_decodes_noninterleaved(mini64_frames):
    f = mini64_frames[ChromaSubsampling.C420]
    noni = menc.encode_420(f, 75, restart_interval=2, interleaved=False)
    ref = mdec.decode_a_frame(noni)
    assert frames_equal(engine.decode_jpeg(noni, impl="jnp"), ref)


def test_noninterleaved_truncated_raises(mini64_frames):
    f = mini64_frames[ChromaSubsampling.C420]
    noni = menc.encode_420(f, 75, interleaved=False)
    with pytest.raises(mdec.DecodeError):
        mdec.decode_a_frame(noni[:len(noni) // 2])


def test_noninterleaved_resync_conceals_damage(mini64_frames):
    """Corrupt one restart segment inside the chroma scan of a
    non-interleaved stream: resync conceals it, everything else exact."""
    f = mini64_frames[ChromaSubsampling.C420]
    noni = menc.encode_420(f, 75, restart_interval=2, interleaved=False)
    ref = mdec.decode_a_frame(noni)
    # find the second SOS and corrupt bytes shortly after it
    second_sos = noni.index(b"\xff\xda", noni.index(b"\xff\xda") + 2)
    bad = bytearray(noni)
    bad[second_sos + 20:second_sos + 24] = b"\xff\x00" * 2
    bad = bytes(bad)
    with pytest.raises(mdec.DecodeError):
        mdec.decode_a_frame(bad)
    bits = __import__("video_coding_tpu.common.bitstream",
                      fromlist=["BitReader"]).BitReader(bad)
    header = mdec.Header.decode(bits)
    dec = mdec.MultiScanDecoder(header, bits)
    dec.decode(resync=True)
    got = dec.get_yuv_frame()
    # luma scan (scan 0) untouched
    assert np.array_equal(got.y.data, ref.y.data)
    assert all(s == 1 for s, _seg in dec.damaged_segments)
    # engine one-shot resync matches the model exactly
    eng = engine.decode_jpeg(bad, resync=True)
    for p in "yuv":
        assert np.array_equal(getattr(eng, p).data, getattr(got, p).data)


def test_noninterleaved_resync_missing_scan_fills_gray(mini64_frames):
    f = mini64_frames[ChromaSubsampling.C420]
    noni = menc.encode_420(f, 75, interleaved=False)
    # truncate just before the third SOS: V never arrives
    third_sos = noni.index(
        b"\xff\xda", noni.index(b"\xff\xda", noni.index(b"\xff\xda") + 2) + 2)
    bad = noni[:third_sos]
    from video_coding_tpu.common.bitstream import BitReader

    bits = BitReader(bad)
    header = mdec.Header.decode(bits)
    dec = mdec.MultiScanDecoder(header, bits)
    dec.decode(resync=True)
    got = dec.get_yuv_frame()
    ref = mdec.decode_a_frame(noni)
    assert np.array_equal(got.y.data, ref.y.data)
    assert np.array_equal(got.u.data, ref.u.data)
    assert (got.v.data == 128).all()
    assert dec.missing_components == [3]
