"""On-device color/resampling kernel tests — lockstep vs the CPU tools."""

import numpy as np
import pytest

from video_coding_tpu.common.bitstream import BitReader
from video_coding_tpu.common.plane import Plane
from video_coding_tpu.model import decoder as mdec
from video_coding_tpu.model import encoder as menc
from video_coding_tpu.ops import color
from video_coding_tpu.tools import planar_444
from video_coding_tpu.tools.yuv import Yuv


@pytest.fixture
def rand_plane():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (12, 10), dtype=np.uint8)


def test_upsample_h2_matches_tools(rand_plane):
    got = np.asarray(color.upsample_h2(rand_plane))
    want = planar_444._supersample_h2(rand_plane)
    assert np.array_equal(got, want)


def test_upsample_hv2_matches_tools(rand_plane):
    got = np.asarray(color.upsample_hv2(rand_plane))
    want = planar_444._supersample_hv2(rand_plane)
    assert np.array_equal(got, want)


def test_downsample_matches_tools(rand_plane):
    big = np.asarray(color.upsample_hv2(rand_plane)).astype(np.uint8)
    got = np.asarray(color.downsample_hv2(big))
    want = planar_444._subsample_hv2(big)
    assert np.array_equal(got, want)
    got_h = np.asarray(color.downsample_h2(big))
    want_h = planar_444._subsample_h2(big)
    assert np.array_equal(got_h, want_h)


def test_yuv444_to_rgb_matches_play():
    from video_coding_tpu.tools.play import yuv444_to_rgb as cpu_rgb

    rng = np.random.default_rng(1)
    y = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    u = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    v = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    got = np.asarray(color.yuv444_to_rgb(y, u, v))
    want = cpu_rgb(Yuv(Plane(data=y), Plane(data=u), Plane(data=v)))
    # CPU path truncates via float->uint8 cast; device rounds — ±1
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_decode_device_rgb_end_to_end(mini64_frames):
    from video_coding_tpu.common.frame import ChromaSubsampling
    from video_coding_tpu.runtime import engine

    src = mini64_frames[ChromaSubsampling.C420]
    data = menc.encode_420(src, 80, restart_interval=2)
    bits = BitReader(data)
    sess = engine.JpegDecoderSession(mdec.Header.decode(bits))
    rgb = np.asarray(sess.decode_device_rgb(data[bits.bit_pos >> 3:]))
    assert rgb.shape == (64, 64, 3)
    # reference: model decode + CPU upsample + CPU color conversion
    ref_frame = mdec.decode_a_frame(data)
    yuv = Yuv(Plane(data=ref_frame.y.data), Plane(data=ref_frame.u.data),
              Plane(data=ref_frame.v.data))
    ref444 = planar_444.of_420(yuv)
    got_u = np.asarray(
        color.upsample_hv2(ref_frame.u.data))
    assert np.array_equal(got_u, ref444.u.data)  # resample bit-exact
    from video_coding_tpu.tools.play import yuv444_to_rgb as cpu_rgb
    want = cpu_rgb(ref444)
    assert np.abs(rgb.astype(int) - want.astype(int)).max() <= 1


def test_decode_device_rgb_440(mini64_frames):
    """4:4:0 streams (vertical-only chroma) go through the new
    upsample_v2 branch in _rgb_tail — regression for the round-5 review
    finding (the branch was missing and C440 RGB decode crashed)."""
    import numpy as np

    from video_coding_tpu.common.frame import ChromaSubsampling, Frame
    from video_coding_tpu.runtime import engine

    src444 = mini64_frames[ChromaSubsampling.C444]
    src = Frame(Plane(data=src444.y.data.copy()),
                Plane(data=src444.u.data[0::2].copy()),
                Plane(data=src444.v.data[0::2].copy()),
                ChromaSubsampling.C440)
    data = menc.encode_440(src, 80, restart_interval=2)
    bits = BitReader(data)
    sess = engine.JpegDecoderSession(mdec.Header.decode(bits))
    rgb = np.asarray(sess.decode_device_rgb(data[bits.bit_pos >> 3:]))
    assert rgb.shape == (64, 64, 3)
    # upsample_v2 row semantics: even rows replicate, odd rows average
    ref_frame = mdec.decode_a_frame(data)
    up = np.asarray(color.upsample_v2(ref_frame.u.data))
    assert np.array_equal(up[0::2], ref_frame.u.data)
    below = np.concatenate([ref_frame.u.data[1:],
                            ref_frame.u.data[-1:]], axis=0)
    avg = (ref_frame.u.data.astype(int) + below.astype(int) + 1) // 2
    assert np.array_equal(up[1::2], avg)


def test_decode_device_rgb_odd_size(mini64_frames):
    from video_coding_tpu.common.frame import ChromaSubsampling, Frame
    from video_coding_tpu.runtime import engine

    src64 = mini64_frames[ChromaSubsampling.C444]
    src = Frame.of_planes(Plane(data=src64.y.data[:44, :52].copy()),
                          Plane(data=src64.u.data[:22, :26].copy()),
                          Plane(data=src64.v.data[:22, :26].copy()))
    data = menc.encode_420(src, 80)
    bits = BitReader(data)
    sess = engine.JpegDecoderSession(mdec.Header.decode(bits))
    rgb = np.asarray(sess.decode_device_rgb(data[bits.bit_pos >> 3:]))
    assert rgb.shape == (44, 52, 3)
