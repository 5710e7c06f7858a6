"""Plane/Frame/Size tests (reference common/src behaviors)."""

import io

import numpy as np
import pytest

from video_coding_tpu.common.frame import ChromaSubsampling, Frame
from video_coding_tpu.common.plane import EndOfImage, Plane
from video_coding_tpu.common.size import Offset, Range, Size


def test_plane_accessors():
    p = Plane(4, 3)
    p[2, 1] = 200
    assert p[2, 1] == 200
    assert p.data[1, 2] == 200  # (row, col) backing layout


def test_blit_available_overlap():
    src = Plane(4, 4)
    src.data[...] = 7
    dst = Plane(6, 2)
    src.blit_available(dst)
    assert (dst.data[:2, :4] == 7).all()
    assert (dst.data[:, 4:] == 0).all()


def test_plane_file_roundtrip():
    p = Plane(5, 3)
    p.data[...] = np.arange(15, dtype=np.uint8).reshape(3, 5)
    buf = io.BytesIO()
    p.output(buf)
    buf.seek(0)
    q = Plane.from_file(buf, 5, 3)
    assert (q.data == p.data).all()


def test_plane_short_read_raises():
    with pytest.raises(EndOfImage):
        Plane.from_file(io.BytesIO(b"123"), 2, 2)


def test_chroma_dims():
    assert ChromaSubsampling.C420.chroma_width(64) == 32
    assert ChromaSubsampling.C420.chroma_height(64) == 32
    assert ChromaSubsampling.C422.chroma_width(64) == 32
    assert ChromaSubsampling.C422.chroma_height(64) == 64
    assert ChromaSubsampling.C444.chroma_width(64) == 64


def test_infer_chroma_subsampling():
    y, u, v = Plane(64, 64), Plane(32, 32), Plane(32, 32)
    assert Frame.of_planes(y, u, v).chroma_subsampling is ChromaSubsampling.C420
    y, u, v = Plane(64, 64), Plane(32, 64), Plane(32, 64)
    assert Frame.of_planes(y, u, v).chroma_subsampling is ChromaSubsampling.C422
    y, u, v = Plane(64, 64), Plane(64, 64), Plane(64, 64)
    assert Frame.of_planes(y, u, v).chroma_subsampling is ChromaSubsampling.C444
    with pytest.raises(ValueError):
        Frame.of_planes(Plane(64, 64), Plane(16, 16), Plane(16, 16))


def test_frame_file_roundtrip():
    f = Frame.create(ChromaSubsampling.C420, 8, 8)
    f.y.data[...] = 1
    f.u.data[...] = 2
    f.v.data[...] = 3
    buf = io.BytesIO()
    f.output(buf)
    assert buf.getvalue() == b"\x01" * 64 + b"\x02" * 16 + b"\x03" * 16


def test_size_parsing():
    assert Size.of_string("1920x1080") == Size(1920, 1080)
    assert Size.of_string("1080p") == Size(1920, 1080)
    assert Size.of_string("qcif") == Size(176, 144)
    assert Size.of_string("4k") == Size(3840, 2160)
    with pytest.raises(ValueError):
        Size.of_string("notasize")


def test_range_parsing():
    assert Range.of_string("5") == Range(5, 5)
    assert Range.of_string("-9") == Range(0, 9)
    assert Range.of_string("2-9") == Range(2, 9)


def test_offset_parsing():
    assert Offset.of_string("3,4") == Offset(3, 4)
    assert Offset.of_string("3x4") == Offset(3, 4)
