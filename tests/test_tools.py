"""YUV tools tests — reproducing the reference's inline expect-test goldens
(planar_444.ml:269-379, packed_422.ml:70-117) and ocompare semantics."""

import numpy as np
import pytest

from video_coding_tpu.common.plane import Plane
from video_coding_tpu.tools import compare, packed_422, planar_444
from video_coding_tpu.tools.yuv import Yuv
from video_coding_tpu.tools.yuv_format import YuvFormat


def make_test_444() -> Yuv:
    """The reference expect tests' 4x4 ramp (planar_444.ml:290-297)."""
    f = Yuv.create_444(4, 4)
    for row in range(4):
        for col in range(4):
            f.y[col, row] = row + col * 10
            f.u[col, row] = 50 + row + col * 10
            f.v[col, row] = 100 + row + col * 10
    return f


def test_444_to_422_golden():
    f422 = planar_444.to_422(make_test_444())
    # golden from planar_444.ml expect block
    assert f422.u.data[:, 0].tolist() == [55, 56, 57, 58]
    assert f422.u.data[:, 1].tolist() == [75, 76, 77, 78]
    assert f422.v.data[:, 0].tolist() == [105, 106, 107, 108]


def test_422_to_444_golden():
    f444 = planar_444.of_422(planar_444.to_422(make_test_444()))
    assert f444.u.data[0].tolist() == [55, 65, 75, 75]
    assert f444.v.data[3].tolist() == [108, 118, 128, 128]


def test_444_to_420_golden():
    f420 = planar_444.to_420(make_test_444())
    assert f420.u.data.tolist() == [[56, 76], [58, 78]]
    assert f420.v.data.tolist() == [[106, 126], [108, 128]]


def test_420_to_444_golden():
    f444 = planar_444.of_420(planar_444.to_420(make_test_444()))
    assert f444.u.data.tolist() == [
        [56, 66, 76, 76],
        [57, 67, 77, 77],
        [58, 68, 78, 78],
        [58, 68, 78, 78],
    ]
    assert f444.v.data[0].tolist() == [106, 116, 126, 126]


def test_packed_roundtrip_all_formats():
    f = Yuv.create_422(4, 4)
    rng = np.random.default_rng(0)
    f.y.data[...] = rng.integers(0, 256, f.y.data.shape, dtype=np.uint8)
    f.u.data[...] = rng.integers(0, 256, f.u.data.shape, dtype=np.uint8)
    f.v.data[...] = rng.integers(0, 256, f.v.data.shape, dtype=np.uint8)
    for fmt in (packed_422.YUY2, packed_422.UYVY, packed_422.YVYU):
        packed = packed_422.of_planar(fmt, f)
        planar = packed_422.to_planar(fmt, packed)
        assert (planar.y.data == f.y.data).all()
        assert (planar.u.data == f.u.data).all()
        assert (planar.v.data == f.v.data).all()


def test_yuy2_byte_layout():
    f = Yuv.create_422(2, 1)
    f.y.data[...] = [[10, 20]]
    f.u.data[...] = [[30]]
    f.v.data[...] = [[40]]
    packed = packed_422.of_planar(packed_422.YUY2, f)
    assert packed.data[0].tolist() == [10, 30, 20, 40]  # Y0 U Y1 V
    packed2 = packed_422.of_planar(packed_422.UYVY, f)
    assert packed2.data[0].tolist() == [30, 10, 40, 20]  # U Y0 V Y1


def test_compare_metrics():
    a = Plane(data=np.array([[0, 10], [20, 30]], dtype=np.uint8))
    b = Plane(data=np.array([[1, 10], [18, 30]], dtype=np.uint8))
    assert compare.max_difference(a, b) == 2
    assert compare.total_difference(a, b) == 3
    assert compare.mean_difference(a, b) == 3 / 4
    assert compare.square_error(a, b) == 5
    assert compare.mean_square_error(a, b) == 5 / 4
    expected_psnr = 10 * np.log10(255.0 ** 2 / (5 / 4))
    assert compare.psnr(a, b) == pytest.approx(expected_psnr)
    assert compare.psnr(a, a) == float("inf")


def test_compare_shape_mismatch_raises():
    with pytest.raises(ValueError):
        compare.max_difference(Plane(2, 2), Plane(4, 4))


def test_yuv_format_parsing():
    assert YuvFormat.of_string("420").planar.value == "420"
    assert YuvFormat.of_string("yuv420p").planar.value == "420"
    assert YuvFormat.of_string("yuy2").packed is not None
    with pytest.raises(ValueError):
        YuvFormat.of_string("rgb24")


def test_yuv_crop():
    f = make_test_444()
    c = f.crop(1, 1, 2, 2)
    assert c.y.data.tolist() == [[11, 21], [12, 22]]
    f420 = planar_444.to_420(f)
    c420 = f420.crop(2, 2, 2, 2)
    assert c420.y.data.shape == (2, 2)
    assert c420.u.data.shape == (1, 1)


def test_play_sdl_dummy_driver(tmp_path, mini64_frames):
    """The interactive player's full event/render loop runs under the SDL
    dummy driver (headless CI): frames are decoded, transformed, blitted
    and counted exactly like a real display session."""
    import os

    pytest.importorskip("pygame")
    from video_coding_tpu.common.frame import ChromaSubsampling
    from video_coding_tpu.common.size import Size
    from video_coding_tpu.tools import play
    from video_coding_tpu.tools.yuv_format import YuvFormat

    src = mini64_frames[ChromaSubsampling.C420]
    raw = tmp_path / "clip.yuv"
    with open(raw, "wb") as f:
        for _ in range(3):
            src.output(f)
    old = os.environ.get("SDL_VIDEODRIVER")
    os.environ["SDL_VIDEODRIVER"] = "dummy"
    try:
        n = play.play_sdl(str(raw), Size(64, 64),
                          YuvFormat.of_string("420"), fps=1000.0,
                          stop_after=5)
    finally:
        if old is None:
            os.environ.pop("SDL_VIDEODRIVER", None)
        else:
            os.environ["SDL_VIDEODRIVER"] = old
    assert n == 5
