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
