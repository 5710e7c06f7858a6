"""End-to-end model codec tests.

Mirrors the reference cram tier (jpeg/test/*.t): decode a real camera JPEG
with max-diff ≤1 vs an independent decoder (libjpeg via PIL stands in for
ffmpeg, absent in this environment); encode→decode round-trip PSNR goldens
at q=95/50/30 and 420/422/444; non-multiple-of-16 sizes; plus this
framework's restart-interval extension.
"""

import io

import numpy as np
import pytest
from PIL import Image

from video_coding_tpu.common.bitstream import BitReader
from video_coding_tpu.common.frame import ChromaSubsampling, Frame
from video_coding_tpu.common.plane import Plane
from video_coding_tpu.model import decoder as mdec
from video_coding_tpu.model import encoder as menc


def pil_luma(data: bytes) -> np.ndarray:
    im = Image.open(io.BytesIO(data))
    im.draft("YCbCr", im.size)
    return np.asarray(im.convert("YCbCr"))[:, :, 0]


def test_decode_mouse_vs_libjpeg(mouse_jpg):
    """mouse-decode.t:1-13 analog: luma max diff ≤ 1 vs independent
    decoder."""
    frame = mdec.decode_a_frame(mouse_jpg)
    assert (frame.width, frame.height) == (480, 320)
    assert frame.chroma_subsampling is ChromaSubsampling.C420
    ref = pil_luma(mouse_jpg)
    assert np.abs(frame.y.data.astype(int) - ref.astype(int)).max() <= 1


def test_decode_mini_jpg():
    with open("/root/reference/jpeg/test_data/mini.jpg", "rb") as f:
        data = f.read()
    frame = mdec.decode_a_frame(data)
    ref = pil_luma(data)
    assert ref.shape == (frame.height, frame.width)
    assert np.abs(frame.y.data.astype(int) - ref.astype(int)).max() <= 1


GOLDEN_PSNR = {
    # model-encode-and-decode.t goldens (q, subsampling) → (y, u, v) dB
    (95, ChromaSubsampling.C420): (46.769, 46.760, 47.567),
    (50, ChromaSubsampling.C420): (36.133, 38.498, 39.515),
    (30, ChromaSubsampling.C420): (33.699, 37.782, 38.815),
    (75, ChromaSubsampling.C422): (39.167, 42.122, 43.173),
    (75, ChromaSubsampling.C444): (39.167, 43.877, 44.543),
}

ENCODERS = {
    ChromaSubsampling.C420: menc.encode_420,
    ChromaSubsampling.C422: menc.encode_422,
    ChromaSubsampling.C444: menc.encode_444,
}


@pytest.mark.parametrize("q,sub", list(GOLDEN_PSNR))
def test_roundtrip_psnr_goldens(q, sub, mini64_frames, psnr_fn):
    src = mini64_frames[sub]
    data = ENCODERS[sub](src, q)
    dec = mdec.decode_a_frame(data)
    for plane, golden in zip("yuv", GOLDEN_PSNR[(q, sub)]):
        got = psnr_fn(getattr(src, plane).data, getattr(dec, plane).data)
        assert got == pytest.approx(golden, abs=0.005), (plane, got, golden)


@pytest.mark.parametrize("q", [30, 50, 95])
def test_encoded_stream_decodes_with_libjpeg(q, mini64_frames):
    """model-encode-and-decode.t analog: our stream decoded by an
    independent decoder matches our decode within ±1."""
    src = mini64_frames[ChromaSubsampling.C420]
    data = menc.encode_420(src, q)
    ours = mdec.decode_a_frame(data)
    ref = pil_luma(data)
    assert np.abs(ours.y.data.astype(int) - ref.astype(int)).max() <= 1


def test_nonstandard_size_52x44(mini64_frames, psnr_fn):
    """test-nonstandard-sizes.t analog: non-multiple-of-16 crop path."""
    src64 = mini64_frames[ChromaSubsampling.C444]
    y = Plane(data=src64.y.data[:44, :52].copy())
    u = Plane(data=src64.u.data[:22, :26].copy())
    v = Plane(data=src64.v.data[:22, :26].copy())
    src = Frame.of_planes(y, u, v)
    assert src.chroma_subsampling is ChromaSubsampling.C420
    data = menc.encode_420(src, 75)
    dec = mdec.decode_a_frame(data)
    assert (dec.width, dec.height) == (52, 44)
    assert (dec.u.width, dec.u.height) == (26, 22)
    assert psnr_fn(src.y.data, dec.y.data) > 30


def test_monochrome_roundtrip(mini64_frames, psnr_fn):
    src = mini64_frames[ChromaSubsampling.C444]
    p = Plane(data=src.y.data.copy())
    data = menc.encode_monochrome(p, 90)
    bits = BitReader(data)
    header = mdec.Header.decode(bits)
    d = mdec.Decoder(header, bits)
    d.decode()
    out = d.get_planes()[0]
    assert psnr_fn(p.data, out.data) > 40


def test_restart_interval_stream_decodes_identically(mini64_frames):
    """Restart-marker streams (our parallel-entropy format) must decode to
    exactly the same pixels as the non-restart stream."""
    src = mini64_frames[ChromaSubsampling.C420]
    plain = mdec.decode_a_frame(menc.encode_420(src, 75))
    for interval in (1, 2, 7):
        rst = mdec.decode_a_frame(
            menc.encode_420(src, 75, restart_interval=interval))
        for plane in "yuv":
            assert (getattr(rst, plane).data
                    == getattr(plain, plane).data).all()


def test_restart_interval_stream_decodes_with_libjpeg(mini64_frames):
    src = mini64_frames[ChromaSubsampling.C420]
    data = menc.encode_420(src, 75, restart_interval=2)
    ours = mdec.decode_a_frame(data)
    ref = pil_luma(data)
    assert np.abs(ours.y.data.astype(int) - ref.astype(int)).max() <= 1


def test_sequenced_block_api_matches_bulk_decode(mouse_jpg):
    """The per-block lockstep API (decoder.ml For_testing.Sequenced analog)
    reconstructs the same pixels as the bulk path."""
    bits = BitReader(mouse_jpg)
    header = mdec.Header.decode(bits)
    seq_dec = mdec.Decoder(header, bits)
    count = 0
    for comp in seq_dec.decode_blocks_seq():
        count += 1
        if count >= 64:
            break
    bits2 = BitReader(mouse_jpg)
    header2 = mdec.Header.decode(bits2)
    bulk = mdec.Decoder(header2, bits2)
    bulk.decode()
    # 64 blocks ≈ 10 MCUs at 4:2:0 → the first 8 luma MCUs (128 cols) of
    # the top row are certainly decoded; they must agree with bulk decode.
    assert (seq_dec.components[0].plane.data[:8, :128]
            == bulk.components[0].plane.data[:8, :128]).all()


def test_rle_corner_cases_all_zero_and_coef63(psnr_fn):
    """test_rle.ml analog driven through the full pipeline: an all-flat
    block (all-zero ACs) and a stream exercising EOB/ZRL paths."""
    rng = np.random.default_rng(0)
    flat = Plane(data=np.full((16, 16), 128, dtype=np.uint8))
    data = menc.encode_monochrome(flat, 50)
    bits = BitReader(data)
    d = mdec.Decoder(mdec.Header.decode(bits), bits)
    d.decode()
    assert (np.abs(d.get_planes()[0].data.astype(int) - 128) <= 1).all()

    noisy = Plane(data=rng.integers(0, 256, (16, 16), dtype=np.uint8))
    data = menc.encode_monochrome(noisy, 100)
    bits = BitReader(data)
    d = mdec.Decoder(mdec.Header.decode(bits), bits)
    d.decode()
    assert psnr_fn(noisy.data, d.get_planes()[0].data) > 30


def test_reconstruction_error_debug_path(mini64_frames):
    src = mini64_frames[ChromaSubsampling.C420]
    params = menc.Parameters.c420(64, 64, 75)
    enc = menc.Encoder(params, compute_reconstruction_error=True)
    enc.load_frame(src)
    enc.write_headers()
    enc.encode()
    enc.complete_and_write_eoi()
    assert enc.last_error_sum > 0  # lossy at q=75
    # error per pixel should be small
    assert enc.last_error_sum / (64 * 64 * 1.5) < 10
